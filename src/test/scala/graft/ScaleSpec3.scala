package graft

import org.apache.spark.sql.functions._
import graft.scale.{PerSeriesForecast, QualityFilters}
import graft.stats.StatTests

/** Specs for the round-12 additions: KPSS, Mann–Kendall, TSB, damped
  * Holt, and the Gopher rule battery. */
class ScaleSpec3 extends SparkTestBase {
  import spark.implicits._

  // deterministic pseudo-noise (no Math.random in tests — LCG like the
  // multimodal fixtures)
  private def lcg(seed: Long, n: Int): Array[Double] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 40) % 1000) / 1000.0 // in [0, 1)
    }
  }

  // ---- KPSS ------------------------------------------------------------

  test("kpss: matches an independent ungridded implementation") {
    // plain-double KPSS written independently of the gridded fold
    def naive(y: Array[Double], lag: Int): Double = {
      val n = y.length
      val mean = y.sum / n
      val e = y.map(_ - mean)
      val s = e.scanLeft(0.0)(_ + _).drop(1)
      val a = s.map(x => (x / n) * (x / n)).sum
      val gamma = (0 to lag).map(j =>
        (j until n).map(i => e(i) * e(i - j)).sum / n)
      val lrv = gamma.head + 2.0 * (1 to lag)
        .map(j => (1.0 - j.toDouble / (lag + 1)) * gamma(j)).sum
      a / lrv
    }
    val y = lcg(7L, 200).map(v => 50.0 + v * 10.0)
    val cents = y.map(v => math.floor(v * 100 + 0.5).toLong)
    val Some((eta, n)) = StatTests.kpss(cents, 4): @unchecked
    assert(n == 200L)
    // grids quantize inputs to cents and terms to 1e-6 — small drift only
    assert(math.abs(eta - naive(cents.map(_ / 100.0), 4)) < 1e-4)
  }

  test("kpss: stationary noise accepts, random walk rejects") {
    val noise = lcg(11L, 300).map(v => 100.0 + v * 10.0)
    val walk = lcg(13L, 300).map(v => v - 0.5).scanLeft(100.0)(_ + _).tail
    val etaNoise = StatTests.kpss(noise.map(v => math.floor(v * 100 + 0.5).toLong), 4).get._1
    val etaWalk = StatTests.kpss(walk.map(v => math.floor(v * 100 + 0.5).toLong), 4).get._1
    assert(etaNoise < 0.463, s"stationary noise should accept, eta=$etaNoise")
    assert(etaWalk > 0.739, s"random walk should reject at 1%, eta=$etaWalk")
  }

  test("kpss: constant and too-short series return None") {
    assert(StatTests.kpss(Array.fill(50)(100L), 4).isEmpty)
    assert(StatTests.kpss(Array(1L, 2L, 3L), 4).isEmpty)
  }

  test("kpssPerSeries: per-series frame over a two-series fixture") {
    val walk = lcg(17L, 100).map(v => v - 0.5).scanLeft(10.0)(_ + _).tail
    val noise = lcg(19L, 100).map(v => 10.0 + v)
    val rows = walk.zipWithIndex.map { case (v, i) => (1L, i.toDouble, v) } ++
      noise.zipWithIndex.map { case (v, i) => (2L, i.toDouble, v) }
    val out = StatTests.kpssPerSeries(
        rows.toSeq.toDF("sid", "ts", "y"), "y", "ts", "sid")
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out(1L), "walk series should reject at 5%")
    assert(!out(2L), "noise series should accept at 5%")
  }

  // ---- Mann–Kendall ----------------------------------------------------

  test("mannKendall: hand-computed tie-corrected example") {
    // [1,2,2,3]: S = 5; Var = (4*3*13 - 2*1*9)/18 = 138/18
    val (s, varS, z) = StatTests.mannKendall(Array(1L, 2L, 2L, 3L))
    assert(s == 5L)
    assert(math.abs(varS - 138.0 / 18) < 1e-12)
    assert(math.abs(z.get - 4.0 / math.sqrt(138.0 / 18)) < 1e-12)
  }

  test("mannKendall: inversion count equals the O(n^2) definition") {
    val a = lcg(23L, 400).map(v => (v * 50).toLong) // plenty of ties
    def brute(x: Array[Long]): Long = {
      var s = 0L
      for (i <- x.indices; j <- i + 1 until x.length)
        s += java.lang.Long.signum(x(j) - x(i))
      s
    }
    assert(StatTests.mannKendall(a)._1 == brute(a))
  }

  test("mannKendall: monotone, constant, and singleton verdicts") {
    val inc = Array.tabulate(30)(i => i.toLong)
    val (sInc, _, zInc) = StatTests.mannKendall(inc)
    assert(sInc == 30L * 29 / 2 && zInc.get > 1.96)
    val (sDec, _, zDec) = StatTests.mannKendall(inc.reverse)
    assert(sDec == -(30L * 29 / 2) && zDec.get < -1.96)
    assert(StatTests.mannKendall(Array.fill(20)(7L))._3.isEmpty)
    assert(StatTests.mannKendall(Array(5L))._3.isEmpty)
  }

  // ---- TSB -------------------------------------------------------------

  test("tsbForecast: equals the sequential recursion on a mixed fixture") {
    // demand at t=1, an interior gap, and a demand-free tail
    val y = Array(4.0, 0.0, 0.0, 6.0, 2.0, 0.0, 0.0, 0.0)
    val (alpha, beta) = (0.5, 0.5)
    var p = if (y(0) != 0.0) 1.0 else 0.0
    var z = y.find(_ != 0.0).getOrElse(0.0)
    var seenFirst = false
    for (t <- y.indices) {
      val d = if (y(t) != 0.0) 1.0 else 0.0
      if (t == 0) { p = d; seenFirst = d == 1.0; if (d == 1.0) z = y(t) }
      else {
        p = p + beta * (d - p)
        if (d == 1.0) {
          if (!seenFirst) { z = y(t); seenFirst = true }
          else z = z + alpha * (y(t) - z)
        }
      }
    }
    val df = y.zipWithIndex.map { case (v, i) => (1L, i.toDouble, v) }
      .toSeq.toDF("sid", "ts", "y")
    val out = PerSeriesForecast.tsbForecast(df, "y", "ts", Seq("sid"), 1, alpha, beta)
      .collect().head
    assert(math.abs(out.getAs[Double]("yhat") - p * z) < 1e-6)
    assert(math.abs(out.getAs[Double]("p_demand") - p) < 1e-6)
    assert(out.getAs[Long]("n_demands") == 3L)
  }

  test("tsbForecast: probability decays through an obsolescence tail") {
    // same demands, longer demand-free tail -> strictly lower p and yhat
    val head = Array(5.0, 0.0, 5.0, 5.0)
    def run(tail: Int): (Double, Double) = {
      val y = head ++ Array.fill(tail)(0.0)
      val df = y.zipWithIndex.map { case (v, i) => (1L, i.toDouble, v) }
        .toSeq.toDF("sid", "ts", "y")
      val r = PerSeriesForecast.tsbForecast(df, "y", "ts", Seq("sid"), 1)
        .collect().head
      (r.getAs[Double]("p_demand"), r.getAs[Double]("yhat"))
    }
    val (pShort, yShort) = run(1)
    val (pLong, yLong) = run(6)
    assert(pLong < pShort && yLong < yShort,
      s"TSB must decay toward obsolescence: $pLong !< $pShort")
  }

  test("tsbForecast: no-demand series are dropped") {
    val df = Seq((1L, 0.0, 0.0), (1L, 1.0, 0.0)).toDF("sid", "ts", "y")
    assert(PerSeriesForecast.tsbForecast(df, "y", "ts", Seq("sid"), 1).count() == 0L)
  }

  // ---- damped Holt -----------------------------------------------------

  test("holtForecast: phi=1 reproduces plain Holt bit-for-bit") {
    val y = lcg(29L, 60).map(v => 20.0 + v * 5)
    val df = y.zipWithIndex.map { case (v, i) => (1L, i.toDouble, v) }
      .toSeq.toDF("sid", "ts", "y")
    val plain = PerSeriesForecast.holtForecast(df, "y", "ts", "sid", 3, 0.5, 0.25)
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    val damped = PerSeriesForecast.holtForecast(df, "y", "ts", "sid", 3, 0.5, 0.25, phi = 1.0)
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    assert(plain == damped)
  }

  test("holtForecast: phi<1 flattens the horizon increments") {
    // strongly trending series: undamped increments are constant b_n,
    // damped increments shrink geometrically
    val y = Array.tabulate(40)(i => 10.0 + 3.0 * i)
    val df = y.zipWithIndex.map { case (v, i) => (1L, i.toDouble, v) }
      .toSeq.toDF("sid", "ts", "y")
    val f = PerSeriesForecast.holtForecast(df, "y", "ts", "sid", 3, 0.5, 0.25, phi = 0.8)
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    val (d1, d2) = (f(2) - f(1), f(3) - f(2))
    assert(d1 > 0 && d2 > 0 && d2 < d1, s"increments must shrink: $d1, $d2")
    assert(math.abs(d2 / d1 - 0.8) < 1e-9, "increment ratio IS phi")
  }

  test("holtForecast: beta=0 damped fold equals the closed form") {
    val y = lcg(31L, 50).map(v => 100.0 + v * 20)
    val (alpha, phi) = (0.5, 0.8)
    val n = y.length
    val b1 = y(1) - y(0)
    // l_n = Σ y·w_ses + Σ_{k>=1} (1-α)·b1·φ^k·(1-α)^(n-1-k)
    var lvl = math.pow(1 - alpha, n - 1) * y(0)
    for (k <- 1 until n)
      lvl += alpha * math.pow(1 - alpha, n - 1 - k) * y(k) +
        (1 - alpha) * b1 * math.pow(phi, k) * math.pow(1 - alpha, n - 1 - k)
    val df = y.zipWithIndex.map { case (v, i) => (1L, i.toDouble, v) }
      .toSeq.toDF("sid", "ts", "y")
    val f = PerSeriesForecast.holtForecast(df, "y", "ts", "sid", 2, alpha, 0.0, phi = phi)
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    val acc1 = phi
    val acc2 = phi + phi * phi
    assert(math.abs(f(1) - (lvl + b1 * math.pow(phi, n - 1) * acc1)) < 1e-8)
    assert(math.abs(f(2) - (lvl + b1 * math.pow(phi, n - 1) * acc2)) < 1e-8)
  }

  // ---- Pettitt ---------------------------------------------------------

  test("pettitt: locates a clean mean shift with a significant p") {
    val y = Array.fill(40)(100L) ++ Array.fill(40)(500L)
    val Some((k, tau, p)) = StatTests.pettitt(y): @unchecked
    // every (left, right) pair is a +1: K = 40*40 at the true break
    assert(k == 1600L && tau == 40L)
    assert(p < 0.05)
  }

  test("pettitt: matches the O(n^2) definition on noisy input") {
    val a = lcg(37L, 120).map(v => (v * 200).toLong)
    def brute(x: Array[Long]): (Long, Long) = {
      var k = 0L; var tau = 1L
      for (t <- 0 until x.length - 1) {
        var u = 0L
        for (i <- 0 to t; j <- t + 1 until x.length)
          u += java.lang.Long.signum(x(j) - x(i))
        if (math.abs(u) > k) { k = math.abs(u); tau = t + 1L }
      }
      (k, tau)
    }
    val (bk, btau) = brute(a)
    val Some((k, tau, _)) = StatTests.pettitt(a): @unchecked
    assert(k == bk && tau == btau)
  }

  test("pettitt: stationary noise is not flagged") {
    val a = lcg(47L, 100).map(v => 100L + (v * 50).toLong)
    val Some((_, _, p)) = StatTests.pettitt(a): @unchecked
    assert(p >= 0.05, s"stationary noise should not flag, p=$p")
    assert(StatTests.pettitt(Array(1L)).isEmpty)
  }

  // ---- Theil–Sen -------------------------------------------------------

  test("theilSen: exact line recovered, robust to a gross outlier") {
    // y = [1, 2, 3, 10] (cents): pair slopes [1,1,1,3,4,7] -> median 1
    val Some((slope, icept, np)) = StatTests.theilSen(Array(100L, 200L, 300L, 1000L)): @unchecked
    assert(np == 6L)
    assert(slope == 1.0 && icept == 0.0)
    // OLS on the same data is dragged far off the clean slope
    val n = 4; val sx = 10.0; val sy = 16.0; val sxy = 54.0; val sxx = 30.0
    val ols = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(ols - 1.0) > 1.0, s"OLS should be off, got $ols")
  }

  test("theilSen: lower-median convention at even pair counts") {
    // y = [0, 1] in cents -> single pair, slope .01/.01? use plain ints
    val Some((s1, _, _)) = StatTests.theilSen(Array(0L, 100L)): @unchecked
    assert(s1 == 1.0)
    // three points with distinct slopes: [0, 300, 400] -> slopes (3, 2, 1)
    // sorted [1,2,3], N=3 odd -> middle = 2
    val Some((s2, _, _)) = StatTests.theilSen(Array(0L, 300L, 400L)): @unchecked
    assert(s2 == 2.0)
  }

  // ---- seasonal Mann–Kendall -------------------------------------------

  test("seasonalMannKendall: trend-within-cycle detected, pure cycle null") {
    // strong period-3 cycle + small upward drift: every season's
    // subsequence is strictly increasing -> all within-season pairs
    // concordant -> z > 1.96
    val trendy = Array.tabulate(30)(t => (t % 3) * 1000.0 + t)
    val pure = Array.tabulate(30)(t => (t % 3) * 1000.0)
    def run(y: Array[Double]) = {
      val df = y.zipWithIndex.map { case (v, i) =>
        (1L, i.toDouble, (i % 3).toLong, v) }.toSeq.toDF("sid", "ts", "season", "y")
      StatTests.seasonalMannKendallPerSeries(df, "y", "ts", "season", "sid")
        .collect().head
    }
    val r1 = run(trendy)
    assert(r1.getAs[Long]("n_seasons") == 3L)
    // 3 seasons x C(10,2) concordant pairs each
    assert(r1.getAs[Long]("s") == 3L * 45L)
    assert(r1.getAs[Double]("z") > 1.96 && r1.getAs[String]("trend") == "increasing")
    val r2 = run(pure)
    assert(r2.isNullAt(r2.fieldIndex("z")) && r2.isNullAt(r2.fieldIndex("trend")),
      "a pure cycle has zero within-season variance -> null verdict")
  }

  test("seasonalMannKendall: variance numerator sums exactly across seasons") {
    // two seasons with ties: total Var(S) must equal the sum of the
    // per-season tie-corrected variances computed independently
    val s0 = Array(100L, 200L, 200L, 300L, 100L)
    val s1v = Array(50L, 50L, 75L)
    val df = (s0.zipWithIndex.map { case (v, i) => (1L, i * 2.0, 0L, v / 100.0) } ++
      s1v.zipWithIndex.map { case (v, i) => (1L, i * 2.0 + 1, 1L, v / 100.0) })
      .toSeq.toDF("sid", "ts", "season", "y")
    val r = StatTests.seasonalMannKendallPerSeries(df, "y", "ts", "season", "sid")
      .collect().head
    val (sA, vA, _) = StatTests.mannKendall(s0)
    val (sB, vB, _) = StatTests.mannKendall(s1v)
    assert(r.getAs[Long]("s") == sA + sB)
    assert(math.abs(r.getAs[Double]("var_s") - (vA + vB)) < 1e-9)
  }

  // ---- multiplicative Holt–Winters -------------------------------------

  test("holtWintersMult: exact reconstruction of a pure multiplicative cycle") {
    // y = L * r_phase, zero trend: init recovers L and the ratio
    // profile exactly, the recursion preserves them, the forecast is
    // exact at every phase
    val ratios = Seq(1.5, 0.8, 1.0, 1.2, 0.6, 1.3, 0.6)
    val y = (0 until 28).map(t => 40.0 * ratios(t % 7))
    val df = y.zipWithIndex.map { case (v, i) => (1L, i.toDouble, v) }
      .toSeq.toDF("sid", "ts", "y")
    val out = PerSeriesForecast.holtWintersMultForecast(df, "y", "ts", "sid", 7, 7)
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    for (h <- 1 to 7) {
      val want = 40.0 * ratios((28 - 1 + h) % 7)
      assert(math.abs(out(h) - want) < 1e-6, s"h=$h: ${out(h)} vs $want")
    }
  }

  test("holtWintersMult: equals an independent fold on a noisy fixture") {
    val (alpha, beta, gamma, m) = (0.5, 0.25, 0.25, 7)
    val y = lcg(53L, 40).map(v => 50.0 + v * 30.0)
    val y9 = y.map(v => math.floor(v * 1e9 + 0.5).toLong)
    val yq = y9.map(_ / 1e9)
    val n = yq.length
    var sum9 = 0L; var diff9 = 0L
    for (i <- 0 until m) { sum9 += y9(i); diff9 += y9(m + i) - y9(i) }
    var l = sum9.toDouble / m / 1e9
    var b = diff9.toDouble / (m.toLong * m) / 1e9
    val s = Array.tabulate(m)(i => yq(i) / l)
    for (t <- m until n) {
      val ph = t % m
      val lNew = alpha * (yq(t) / s(ph)) + (1 - alpha) * (l + b)
      b = beta * (lNew - l) + (1 - beta) * b
      s(ph) = gamma * (yq(t) / lNew) + (1 - gamma) * s(ph)
      l = lNew
    }
    val df = y.zipWithIndex.map { case (v, i) => (1L, i.toDouble, v) }
      .toSeq.toDF("sid", "ts", "y")
    val out = PerSeriesForecast.holtWintersMultForecast(df, "y", "ts", "sid", 2, m)
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    for (h <- 1 to 2)
      assert(math.abs(out(h) - (l + h * b) * s((n - 1 + h) % m)) < 1e-9)
  }

  test("holtWintersMult: non-positive and short series are skipped") {
    val bad = (0 until 20).map(t => (1L, t.toDouble, if (t == 5) 0.0 else 10.0)) ++
      (0 until 10).map(t => (2L, t.toDouble, 10.0)) // n < 2m
    val df = bad.toSeq.toDF("sid", "ts", "y")
    assert(PerSeriesForecast.holtWintersMultForecast(df, "y", "ts", "sid", 2, 7).count() == 0L)
  }

  // ---- FFD packing -----------------------------------------------------

  test("packFfd: hand fixture places first-fit-decreasing exactly") {
    // toks [6,5,4,3,2,1], budget 9, one shard:
    // 6->b1, 5->b2, 4->b2 (=9), 3->b1 (=9), 2->b3, 1->b3 (=3)
    val df = Seq((0L, 6L), (1L, 5L), (2L, 4L), (3L, 3L), (4L, 2L), (5L, 1L))
      .map { case (id, tk) => (id, tk, "g") }.toDF("doc_id", "toks", "source")
    val out = graft.scale.Packing.packFfdCounts(df, "toks", "doc_id", "source", 9L, 1)
      .collect().map(r => r.getAs[Long]("seq_id") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))).toMap
    assert(out == Map(1L -> ((2L, 9L)), 2L -> ((2L, 9L)), 3L -> ((2L, 3L))))
  }

  test("packFfd: over-budget docs open their own sequence (pk1 rule)") {
    val df = Seq((0L, 600L, "g"), (1L, 100L, "g")).toDF("doc_id", "toks", "source")
    val out = graft.scale.Packing.packFfdCounts(df, "toks", "doc_id", "source", 512L, 1)
      .collect().map(r => r.getAs[Long]("seq_id") -> r.getAs[Long]("n_tokens")).toMap
    assert(out == Map(1L -> 600L, 2L -> 100L))
  }

  test("packFfd: segment-tree first-fit equals the naive linear scan") {
    // 300 random docs through both the production fold and an
    // independent O(n·B) reference placement
    val toks = lcg(59L, 300).map(v => 1L + (v * 700).toLong) // some over 512
    val df = toks.zipWithIndex.map { case (tk, i) => (i.toLong, tk, "g") }
      .toSeq.toDF("doc_id", "toks", "source")
    val got = graft.scale.Packing.packFfdCounts(df, "toks", "doc_id", "source", 512L, 1)
      .collect().map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"))).sortBy(_._1).toSeq
    val sorted = toks.zipWithIndex.map { case (tk, i) => (i.toLong, tk) }
      .sortBy { case (id, tk) => (-tk, id) }
    val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
    val cnts = scala.collection.mutable.ArrayBuffer.empty[Long]
    for ((_, tk) <- sorted) {
      var i = 0
      while (i < fills.length && fills(i) + tk > 512L) i += 1
      if (i < fills.length) { fills(i) += tk; cnts(i) += 1 }
      else { fills += tk; cnts += 1L }
    }
    val want = fills.indices.map(i => ((i + 1).toLong, cnts(i), fills(i)))
    assert(got == want)
  }

  test("packFfd: never more bins than next-fit on the corpus, same token mass") {
    val docs = Tables.documents(spark, SF)
    val ffd = graft.scale.Packing.packFfd(docs, "text", "doc_id", "source", 512L, 8)
      .agg(count(lit(1)), sum(col("n_tokens"))).collect().head
    val nf = graft.scale.Packing.packGreedy(docs, "text", "doc_id", "source", 512L, 8)
      .agg(count(lit(1)), sum(col("n_tokens"))).collect().head
    assert(ffd.getLong(1) == nf.getLong(1), "token mass must be conserved")
    assert(ffd.getLong(0) <= nf.getLong(0),
      s"FFD bins ${ffd.getLong(0)} must not exceed next-fit ${nf.getLong(0)}")
  }

  // ---- frequency encoding ----------------------------------------------

  test("frequencyEncode: exact counts and shares, nulls are a real category") {
    val df = Seq(Some("a"), Some("a"), Some("b"), None, None, None)
      .zipWithIndex.map { case (v, i) => (i.toLong, v.orNull) }
      .toDF("id", "cat")
    val out = graft.core.Encoders.frequencyEncode(df, "cat")
      .collect().map(r => Option(r.getAs[String]("cat")) ->
        ((r.getAs[Long]("cat_count"), r.getAs[Double]("cat_freq")))).toMap
    assert(out(Some("a")) == ((2L, 2.0 / 6)))
    assert(out(Some("b")) == ((1L, 1.0 / 6)))
    assert(out(None) == ((3L, 3.0 / 6)), "null group must carry its count")
  }

  // ---- Gopher rules ----------------------------------------------------

  test("gopherRules: each rule trips on its designed offender") {
    val good = (Seq("the", "be", "and") ++ Seq.fill(47)("sensible")).mkString(" ")
    val docs = Seq(
      (1L, good),                                        // passes all
      (2L, "the be short doc"),                          // word count
      (3L, (Seq("the", "be") ++ Seq.fill(48)("a")).mkString(" ")), // mean len < 3
      (4L, (Seq("the", "be") ++ Seq.fill(48)("####word")).mkString(" ")), // symbols
      (5L, Seq.fill(50)("sensible").mkString(" ")),      // no stopwords
      (6L, (Seq("the", "be") ++ Seq.fill(48)("123456")).mkString(" ")), // alpha ratio
      (7L, (1 to 50).map(i => s"- the be bullet line$i").mkString("\n")), // bullets
      (8L, (1 to 50).map(i => s"the be trailing line$i...").mkString("\n")) // ellipses
    ).toDF("doc_id", "text")
    val out = QualityFilters.gopherRules(docs, "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(out(1L), "the control doc must pass")
    (2L to 8L).foreach(id => assert(!out(id), s"doc $id must fail its rule"))
  }

  test("gopherRules: corpus keep rate discriminates at the word-count bar") {
    val out = QualityFilters.gopherRules(
        Tables.documents(spark, SF), "text", minStopwords = 1L)
      .agg(avg(col("keep").cast("double"))).collect().head.getDouble(0)
    assert(out > 0.2 && out < 0.9, s"keep rate should split the corpus, got $out")
  }
}
