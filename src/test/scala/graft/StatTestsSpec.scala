package graft

import graft.stats.StatTests

class StatTestsSpec extends SparkTestBase {

  // deterministic pseudo-noise (LCG), no external RNG
  private def noise(n: Int, seed: Long = 42): Array[Double] = {
    var s = seed
    Array.fill(n) {
      s = (s * 6364136223846793005L + 1442695040888963407L)
      (s >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
  }

  test("acf(0) is 1 and acf of noise decays") {
    val r = StatTests.acf(noise(500), 5)
    assert(math.abs(r(0) - 1.0) < 1e-12)
    assert(r.drop(1).forall(v => math.abs(v) < 0.15))
  }

  test("pacf(1) equals acf(1)") {
    val y = noise(300)
    assert(math.abs(StatTests.pacf(y, 3)(1) - StatTests.acf(y, 3)(1)) < 1e-12)
  }

  test("ADF: white noise is stationary, random walk is not") {
    val wn = noise(400)
    val rw = wn.scanLeft(0.0)(_ + _).drop(1) // cumulative sum
    assert(StatTests.adf(wn).stationary)
    assert(!StatTests.adf(rw).stationary)
  }

  test("ADF on AR(1) phi=0.5 is stationary") {
    val e = noise(400, 7)
    val y = new Array[Double](400)
    for (i <- 1 until 400) y(i) = 0.5 * y(i - 1) + e(i)
    assert(StatTests.adf(y).stationary)
  }

  test("Durbin-Watson of noise is near 2") {
    val dw = StatTests.durbinWatson(noise(1000))
    assert(dw > 1.8 && dw < 2.2, s"dw=$dw")
  }

  test("adfPerSeries runs distributed over events") {
    val out = StatTests.adfPerSeries(Tables.events(spark, SF), "value", "ts", "user_id")
    assert(out.count() > 0)
    assert(out.columns.contains("stationary"))
  }

  test("adfPerSeries skips degenerate (constant) series instead of failing the job") {
    import spark.implicits._
    val good = (0 until 50).map(i => (1L, i.toDouble, math.sin(i * 0.7) + 0.1 * i))
    val const = (0 until 50).map(i => (2L, i.toDouble, 3.14))
    // adfPerSeries casts tsCol to double internally — a numeric time axis is fine
    val df = (good ++ const).toDF("sid", "tsd", "value")
    val out = StatTests.adfPerSeries(df, "value", "tsd", "sid").collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L), "constant series should be skipped, good one kept")
  }
}
