package graft

import graft.stats.StatTests

class StatTestsSpec extends SparkTestBase {

  // deterministic pseudo-noise (LCG), no external RNG
  private def noise(n: Int, seed: Long = 42): Array[Double] = {
    val r = graft.core.DetRandom.doubles(seed)
    Array.fill(n)(r())
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

  test("Ljung-Box: small on noise, large on strongly autocorrelated series") {
    val wn = noise(500)
    val lbNoise = StatTests.ljungBox(wn, 3)
    // chi2(3) 99th percentile ~ 11.34; white noise should sit well below
    assert(lbNoise < 11.34, s"lb=$lbNoise")
    val y = new Array[Double](500)
    for (i <- 1 until 500) y(i) = 0.9 * y(i - 1) + wn(i)
    assert(StatTests.ljungBox(y, 3) > 100.0)
    // p-values: high for noise, ~0 for the AR(1)
    assert(StatTests.chiSquareSf(lbNoise, 3) > 0.01)
    assert(StatTests.chiSquareSf(StatTests.ljungBox(y, 3), 3) < 1e-6)
  }

  test("Jarque-Bera: small on symmetric data, large on skewed data") {
    val wn = noise(2000)
    val (jbU, _, _) = StatTests.jarqueBera(wn)
    // uniform noise is symmetric (skew~0) but platykurtic (exKurt=-1.2),
    // so JB is large; check the components instead
    val (_, skew, exK) = StatTests.jarqueBera(wn)
    assert(math.abs(skew) < 0.15, s"skew=$skew")
    assert(exK < -0.9 && exK > -1.5, s"exKurt=$exK")
    assert(jbU > 50.0) // correctly flags non-normal (uniform) data
    val skewed = wn.map(v => math.exp(3.0 * v)) // log-uniform: heavy right skew
    val (jbS, s2, _) = StatTests.jarqueBera(skewed)
    assert(s2 > 0.5 && jbS > jbU)
  }

  test("breakVar: ~1 on homoskedastic noise, large when variance breaks") {
    val wn = noise(900)
    val h = StatTests.breakVar(wn)
    assert(h > 0.5 && h < 2.0, s"het=$h")
    val break_ = wn.zipWithIndex.map { case (v, i) => if (i >= 600) v * 5 else v }
    assert(StatTests.breakVar(break_) > 10.0)
  }

  test("ADF p-value surface hits the MacKinnon anchors and is monotone") {
    assert(math.abs(StatTests.adfPValue(-3.43) - 0.01) < 0.002)
    assert(math.abs(StatTests.adfPValue(-2.86) - 0.05) < 0.005)
    assert(math.abs(StatTests.adfPValue(-2.57) - 0.10) < 0.01)
    // branch continuity at the switch point
    assert(math.abs(StatTests.adfPValue(-1.6099) - StatTests.adfPValue(-1.6101)) < 0.01)
    // monotone increasing in tau; clamped at the tails
    val taus = (-190 to 27).map(_ / 10.0)
    val ps = taus.map(StatTests.adfPValue)
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b + 1e-12 })
    assert(StatTests.adfPValue(-20.0) == 0.0 && StatTests.adfPValue(3.0) == 1.0)
    // rejection decision and p-value agree at the 5% line
    val rw = noise(400).scanLeft(0.0)(_ + _).drop(1)
    assert(StatTests.adf(rw).pValue > 0.05)
    assert(StatTests.adf(noise(400)).pValue < 0.05)
  }

  test("chiSquareSf matches known values") {
    // chi2(2): sf(x) = exp(-x/2) exactly
    for (x <- Seq(0.5, 2.0, 5.0, 10.0))
      assert(math.abs(StatTests.chiSquareSf(x, 2) - math.exp(-x / 2)) < 1e-12)
    // chi2(3) 95th percentile 7.8147
    assert(math.abs(StatTests.chiSquareSf(7.814728, 3) - 0.05) < 1e-4)
  }

  test("rootsOutsideUnitCircle: stationary AR accepted, unit root rejected") {
    assert(StatTests.rootsOutsideUnitCircle(Array.empty[Double])) // order 0
    assert(StatTests.rootsOutsideUnitCircle(Array(0.5)))          // root at 2
    assert(!StatTests.rootsOutsideUnitCircle(Array(1.0)))         // unit root
    assert(!StatTests.rootsOutsideUnitCircle(Array(1.2)))         // explosive
    // AR(2) phi=(0.5, 0.3): stationary (roots of 1-.5z-.3z^2 outside)
    assert(StatTests.rootsOutsideUnitCircle(Array(0.5, 0.3)))
    // AR(2) phi=(0.9, 0.2): phi1+phi2 > 1 -> non-stationary
    assert(!StatTests.rootsOutsideUnitCircle(Array(0.9, 0.2)))
  }

  test("diagnosticsPerSeries runs distributed and agrees with local math") {
    import spark.implicits._
    val y = noise(120, 3)
    val rows = y.zipWithIndex.map { case (v, i) => (7L, i.toDouble, v) }
    val out = StatTests.diagnosticsPerSeries(rows.toSeq.toDF("sid", "tsd", "value"),
      "value", "tsd", "sid").collect()
    assert(out.length == 1)
    val r = out.head
    val mu = y.sum / y.length
    val e = y.map(_ - mu)
    assert(math.abs(r.getDouble(1) - StatTests.durbinWatson(e)) < 1e-9)
    assert(math.abs(r.getDouble(2) - StatTests.ljungBox(e, 3)) < 1e-9)
    assert(math.abs(r.getDouble(4) - StatTests.jarqueBera(e)._1) < 1e-9)
    assert(math.abs(r.getDouble(6) - StatTests.breakVar(e)) < 1e-9)
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

  test("psiBins: identical splits read ~0, a shifted split crosses the 0.25 action line") {
    import spark.implicits._
    val base = noise(2000).toSeq
    val same = base.map(v => ("a", v * 10)) ++ base.map(v => ("b", v * 10))
    val psiSame = graft.stats.DriftAudit.psiBins(same.toDF("sp", "v"), "v", "sp", 10)
      .collect().map(_.getDouble(5)).sum
    assert(psiSame < 1e-9, s"identical distributions must read ~0 PSI, got $psiSame")
    // shift split b by 40% of the range: heavy mass migration across bins
    val drifted = base.map(v => ("a", v * 10)) ++ base.map(v => ("b", v * 10 + 4.0))
    val psiDrift = graft.stats.DriftAudit.psiBins(drifted.toDF("sp", "v"), "v", "sp", 10)
      .collect().map(_.getDouble(5)).sum
    assert(psiDrift > 0.25, s"a 40%-of-range shift must cross the action line, got $psiDrift")
  }

  test("psiBins: per-bin counts conserve and shares are smoothed-normalized") {
    import spark.implicits._
    val rows = (1 to 500).map(i => (if (i % 2 == 0) "a" else "b", (i % 97).toDouble))
    val out = graft.stats.DriftAudit.psiBins(rows.toDF("sp", "v"), "v", "sp", 8).collect()
    assert(out.map(_.getLong(1)).sum == 250 && out.map(_.getLong(2)).sum == 250)
    val (spa, spb) = (out.map(_.getDouble(3)).sum, out.map(_.getDouble(4)).sum)
    assert(math.abs(spa - 1.0) < 1e-9 && math.abs(spb - 1.0) < 1e-9,
      s"smoothed shares must sum to 1 when all bins are present: $spa, $spb")
  }

  test("chiSquareIndependence: hand-computed 2x2, zero cells grid-completed, p sane") {
    import spark.implicits._
    // balanced 2x2 with association: every e = 20, chi2 = 4 * 100/20 = 20
    val assoc = (Seq.fill(30)(("x", 0)) ++ Seq.fill(10)(("x", 1)) ++
                 Seq.fill(10)(("y", 0)) ++ Seq.fill(30)(("y", 1))).toDF("a", "b")
    val r1 = graft.stats.DriftAudit.chiSquareIndependence(assoc, "a", "b").collect()(0)
    assert(r1.getLong(0) == 80 && r1.getLong(3) == 1)
    assert(math.abs(r1.getDouble(4) - 20.0) < 1e-6, s"chi2 ${r1.getDouble(4)} != 20")
    assert(StatTests.chiSquareSf(r1.getDouble(4), 1) < 1e-4, "strong association, tiny p")
    // y never appears with b in {0,1}: the zero cells MUST contribute
    // their expected mass (hand value 30.0; skipping them gives 23.3)
    val sparse = (Seq.fill(10)(("x", 0)) ++ Seq.fill(10)(("x", 1)) ++
                  Seq.fill(10)(("y", 2))).toDF("a", "b")
    val r2 = graft.stats.DriftAudit.chiSquareIndependence(sparse, "a", "b").collect()(0)
    assert(math.abs(r2.getDouble(4) - 30.0) < 1e-6,
      s"zero cells not grid-completed: chi2 ${r2.getDouble(4)} != 30")
    assert(r2.getLong(3) == 2)
  }

  test("ksStatistic: hand-computed two-sample D, invariance to monotone transform") {
    import spark.implicits._
    // a = {1,2,3,4}, b = {3,4,5,6}: F_a - F_b maximal at x in [2,3): |2/4 - 0/4| = 0.5
    val df = (Seq(1, 2, 3, 4).map(v => ("a", v.toDouble)) ++
              Seq(3, 4, 5, 6).map(v => ("b", v.toDouble))).toDF("sp", "v")
    val r = graft.stats.DriftAudit.ksStatistic(df, "v", "sp").collect()(0)
    assert(math.abs(r.getDouble(0) - 0.5) < 1e-12, s"D should be 0.5, got ${r.getDouble(0)}")
    // KS depends only on ranks: x -> exp(x) leaves D unchanged
    val rT = graft.stats.DriftAudit.ksStatistic(
        df.withColumn("v", org.apache.spark.sql.functions.exp($"v")), "v", "sp")
      .collect()(0)
    assert(rT.getDouble(0) == r.getDouble(0), "monotone transform must not move D")
  }

  test("scaledBacktest: hand-computed MASE and pinball; constant train gives null MASE") {
    import spark.implicits._
    // series 1: train [1,2,4,7] (one-step MAE 2), holdout [8,9,10] vs
    // naive 7 (MAE 2) -> MASE 1.0; q(0.9) = 4th smallest = 7 ->
    // pinball = 0.9*(1+2+3)/3 = 1.8
    // series 2: constant train [5,5,5] -> null MASE; q = 5 ->
    // pinball vs holdout [6,6,6] = 0.9*1 = 0.9
    val rows = Seq(1.0, 2.0, 4.0, 7.0, 8.0, 9.0, 10.0).zipWithIndex
      .map { case (y, i) => (1L, i.toLong, i.toLong, y) } ++
      Seq(5.0, 5.0, 5.0, 6.0, 6.0, 6.0).zipWithIndex
        .map { case (y, i) => (2L, i.toLong, i.toLong, y) }
    val out = graft.stats.Metrics.scaledBacktest(
        rows.toDF("sid", "ts", "eid", "y"), "y", "ts", Seq("sid"), h = 3,
        tau = 0.9, tieBreak = Seq("eid"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]), r.getDouble(3))).toMap
    assert(out(1L)._1 == 4L)
    assert(math.abs(out(1L)._2.get - 1.0) < 1e-9, s"MASE: ${out(1L)._2}")
    assert(math.abs(out(1L)._3 - 1.8) < 1e-9, s"pinball: ${out(1L)._3}")
    assert(out(2L)._2.isEmpty, "constant train must yield null MASE")
    assert(math.abs(out(2L)._3 - 0.9) < 1e-9)
  }

  test("gainsCurve: hand-computed cumulative recall/precision/lift at each cutoff") {
    import spark.implicits._
    // scores desc: 0.9 (1 pos), 0.5 (1 pos + 1 neg), 0.1 (1 neg)
    // cutoff 0.9: cum 1/1 pos -> recall .5, precision 1, lift 2
    // cutoff 0.5: cum 3/2 pos -> recall 1, precision 2/3, lift 4/3
    // cutoff 0.1: cum 4/2 pos -> recall 1, precision .5, lift 1
    val df = Seq((0.9, 1), (0.5, 1), (0.5, 0), (0.1, 0)).toDF("s", "l")
    val out = graft.stats.Metrics.gainsCurve(df, "s", "l")
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out(0.9) == ((1L, 1L, 0.5, 1.0, 2.0)), s"${out(0.9)}")
    val (n5, p5, r5, pr5, l5) = out(0.5)
    assert(n5 == 3L && p5 == 2L && r5 == 1.0)
    assert(math.abs(pr5 - 2.0 / 3) < 1e-12 && math.abs(l5 - 4.0 / 3) < 1e-12)
    assert(out(0.1) == ((4L, 2L, 1.0, 0.5, 1.0)), s"${out(0.1)}")
  }

  test("calibrationBins: hand-computed bins, p=1.0 clamps into the top bin") {
    import spark.implicits._
    val df = Seq((0.95, 1), (0.85, 1), (0.85, 0), (0.05, 0), (1.0, 1))
      .toDF("p", "label")
    val out = graft.stats.DriftAudit.calibrationBins(df, "p", "label", 10)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out.keySet == Set(0, 8, 9))
    val (n9, mp9, fp9, gap9, br9) = out(9)
    assert(n9 == 2L && math.abs(mp9 - 0.975) < 1e-9 && fp9 == 1.0)
    assert(math.abs(gap9 - 0.025) < 1e-9 && math.abs(br9 - 0.00125) < 1e-9)
    val (n8, mp8, fp8, gap8, br8) = out(8)
    assert(n8 == 2L && math.abs(mp8 - 0.85) < 1e-9 && fp8 == 0.5)
    assert(math.abs(gap8 - 0.35) < 1e-9 && math.abs(br8 - 0.3725) < 1e-9)
    val (n0, mp0, fp0, _, br0) = out(0)
    assert(n0 == 1L && math.abs(mp0 - 0.05) < 1e-9 && fp0 == 0.0 &&
      math.abs(br0 - 0.0025) < 1e-9)
  }
}
