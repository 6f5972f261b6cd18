package graft

import org.apache.spark.sql.functions._
import graft.scale._
import graft.stats.{Econometrics, ExperimentDesign}

/** Round-12 session-3 additions: Granger causality, Engle–Granger
  * cointegration, GARCH(1,1), ADIDA, periodogram, R/S Hurst, Dirichlet
  * query likelihood + RRF, SRM and MDE. */
class ScaleSpec5 extends SparkTestBase {
  import spark.implicits._

  // ---- Granger causality ---------------------------------------------------

  /** x leads y by one step: y_t = 0.8·x_{t-1} + small AR noise. */
  private def grangerFixture = {
    val rnd = new scala.util.Random(7)
    val x = Array.iterate(1.0, 120)(v => 0.5 * v + 1.0 + rnd.nextGaussian())
    val y = new Array[Double](120)
    for (t <- 1 until 120)
      y(t) = 0.3 * y(t - 1) + 0.8 * x(t - 1) + 0.1 * rnd.nextGaussian()
    (0 until 120).map(t => (t.toLong, math.floor(x(t) * 100 + 0.5) / 100,
      math.floor(y(t) * 100 + 0.5) / 100)).toDF("t", "x", "y")
  }

  test("granger: a true x->y lead shows up as a large F one way and a " +
       "small one the other; RSS_u never exceeds RSS_r") {
    val out = Econometrics.grangerLag1(grangerFixture, "t", "x", "y")
      .collect().map(r => r.getAs[String]("direction") -> r).toMap
    val fXY = out("x=>y").getAs[Double]("f_stat")
    val fYX = out("y=>x").getAs[Double]("f_stat")
    assert(fXY > 50.0, s"x=>y must be strongly significant, got $fXY")
    assert(fXY > 10 * math.max(fYX, 1.0),
      s"x=>y ($fXY) must dominate y=>x ($fYX)")
    out.values.foreach { r =>
      assert(r.getAs[Double]("rss_u") <= r.getAs[Double]("rss_r") + 1e-9,
        "adding a regressor can never raise the RSS")
      assert(r.getAs[Long]("n") == 119)
    }
  }

  test("granger: coefficients reproduce a driver-side OLS replay") {
    val rows = grangerFixture.orderBy("t").collect()
      .map(r => (r.getAs[Double]("x"), r.getAs[Double]("y")))
    def g9(v: Double) = math.floor(v * 1e9 + 0.5) / 1e9
    val trips = rows.sliding(2).map { case Array((xp, yp), (_, y)) =>
      (yp, xp, y) }.toArray // (own=ly, cross=lx, dep=y)
    val n = trips.length.toDouble
    def s(f: ((Double, Double, Double)) => Double) = trips.map(t => g9(f(t))).sum
    val (s1, s2, sy) = (s(_._1), s(_._2), s(_._3))
    val (s11, s12, s22) = (s(t => t._1 * t._1), s(t => t._1 * t._2), s(t => t._2 * t._2))
    val (s1y, s2y) = (s(t => t._1 * t._3), s(t => t._2 * t._3))
    val (c11, c12, c22) = (s11 - s1 * s1 / n, s12 - s1 * s2 / n, s22 - s2 * s2 / n)
    val (c1y, c2y) = (s1y - s1 * sy / n, s2y - s2 * sy / n)
    val det = c11 * c22 - c12 * c12
    val bOwn = (c1y * c22 - c2y * c12) / det
    val bCross = (c2y * c11 - c1y * c12) / det
    val got = Econometrics.grangerLag1(grangerFixture, "t", "x", "y")
      .filter(col("direction") === "x=>y").collect().head
    assert(math.abs(got.getAs[Double]("b_own") - bOwn) < 1e-9)
    assert(math.abs(got.getAs[Double]("b_cross") - bCross) < 1e-9)
    assert(math.abs(bCross - 0.8) < 0.1, "must recover the generating 0.8 lead")
  }

  // ---- Engle–Granger cointegration ------------------------------------------

  test("engle-granger: a cointegrated pair rejects (strongly negative t) " +
       "and recovers the long-run beta; independent walks do not") {
    val rnd = new scala.util.Random(11)
    val x = Array.iterate(10.0, 300)(v => v + rnd.nextGaussian())
    val yCo = x.map(v => 2.0 * v + 0.5 * rnd.nextGaussian())
    val yInd = Array.iterate(20.0, 300)(v => v + rnd.nextGaussian())
    def frame(y: Array[Double]) = (0 until 300)
      .map(t => (t.toLong, math.floor(x(t) * 100 + 0.5) / 100,
        math.floor(y(t) * 100 + 0.5) / 100)).toDF("t", "x", "y")
    val co = Econometrics.engleGranger(frame(yCo), "t", "x", "y").collect().head
    val ind = Econometrics.engleGranger(frame(yInd), "t", "x", "y").collect().head
    assert(math.abs(co.getAs[Double]("beta") - 2.0) < 0.05,
      s"must recover beta=2, got ${co.getAs[Double]("beta")}")
    val tCo = co.getAs[Double]("t_stat")
    val tInd = ind.getAs[Double]("t_stat")
    assert(tCo < -6.0, s"cointegrated residual must reject hard, got $tCo")
    assert(tInd > -3.4, s"independent walks must not cross the EG 5% line, got $tInd")
    assert(co.getAs[Double]("rho") < 0, "stationary residual mean-reverts")
  }

  // ---- GARCH(1,1) ------------------------------------------------------------

  test("garch: exact replay of the recursion; variance floors at omega " +
       "and z*vol reassembles the return") {
    val y = Array(10.0, 12.0, 9.0, 15.0, 15.0, 15.0, 15.0, 15.0, 14.0)
    val df = y.zipWithIndex.map { case (v, i) => (1L, i.toDouble, i.toLong, v) }
      .toSeq.toDF("user_id", "ts", "event_id", "value")
    val out = PerSeriesForecast.garchFilter(df, "value", "ts", "user_id",
      "event_id", omega = 0.25, alpha = 0.25, beta = 0.5, h0 = 1.0)
      .orderBy("event_id").collect()
    assert(out.length == y.length - 1)
    // driver-side replay
    var h = 1.0; var prevR = 0.0
    for (t <- 1 until y.length) {
      val r = y(t) - y(t - 1)
      if (t > 1) h = 0.25 + 0.25 * prevR * prevR + 0.5 * h
      val row = out(t - 1)
      assert(row.getAs[Double]("r") == r)
      assert(row.getAs[Double]("h") == h, s"step $t")
      assert(row.getAs[Double]("vol") == math.sqrt(h))
      prevR = r
    }
    // calm stretch decays toward the unconditional variance w/(1-a-b) = 1
    val calm = out.takeRight(2).map(_.getAs[Double]("h"))
    assert(calm.head > calm.last || math.abs(calm.last - 1.0) < 0.6)
    out.foreach { r =>
      assert(r.getAs[Double]("h") >= 0.25, "h can never drop below omega... plus terms")
      val z = r.getAs[Double]("z")
      assert(math.abs(z * r.getAs[Double]("vol") - r.getAs[Double]("r")) < 1e-12)
    }
  }

  test("garch: a volatility burst raises h which then decays geometrically") {
    val y = Array.fill(20)(5.0) ++ Array(25.0, 5.0) ++ Array.fill(20)(5.0)
    val df = y.zipWithIndex.map { case (v, i) => (1L, i.toDouble, i.toLong, v) }
      .toSeq.toDF("user_id", "ts", "event_id", "value")
    val hs = PerSeriesForecast.garchFilter(df, "value", "ts", "user_id", "event_id")
      .orderBy("event_id").collect().map(_.getAs[Double]("h"))
    val preBurst = hs(18); val postBurst = hs.drop(21).take(3)
    assert(postBurst.head > 10 * preBurst, "burst must spike h")
    assert(postBurst(0) > postBurst(1) && postBurst(1) > postBurst(2),
      "h must decay after the burst")
  }

  // ---- ADIDA -------------------------------------------------------------------

  test("adida: constant demand forecasts itself exactly; the oldest " +
       "partial block is dropped") {
    // 11 periods of demand 3.0 -> drop oldest 3, blocks (4,4) of total 12
    val df = (1 to 11).map(i => (1L, i.toDouble, i.toLong, 3.0))
      .toDF("user_id", "ts", "event_id", "demand")
    val out = PerSeriesForecast.adidaForecast(df, "demand", "ts",
      Seq("user_id"), m = 4, alpha = 0.5, tieBreak = Seq("event_id"))
      .collect().head
    assert(out.getAs[Long]("n_blocks") == 2)
    assert(math.abs(out.getAs[Double]("yhat_block") - 12.0) < 1e-9)
    assert(math.abs(out.getAs[Double]("yhat_period") - 3.0) < 1e-9)
  }

  test("adida: SES weights favor recent blocks and short series drop") {
    // 8 periods: first block total 4, second block total 40
    val demands = Array(1.0, 1.0, 1.0, 1.0, 10.0, 10.0, 10.0, 10.0)
    val df = demands.zipWithIndex.map { case (v, i) => (1L, i.toDouble, i.toLong, v) }
      .toSeq.toDF("user_id", "ts", "event_id", "demand")
    val out = PerSeriesForecast.adidaForecast(df, "demand", "ts",
      Seq("user_id"), m = 4).collect().head
    // SES(alpha=.5) over blocks (4, 40): w1 = .5, w2 = .5 -> 22
    assert(math.abs(out.getAs[Double]("yhat_block") - 22.0) < 1e-9)
    val short = PerSeriesForecast.adidaForecast(
      (1 to 7).map(i => (1L, i.toDouble, i.toLong, 1.0))
        .toDF("user_id", "ts", "event_id", "demand"),
      "demand", "ts", Seq("user_id"), m = 4)
    assert(short.count() == 0, "series with < 2 full blocks must drop")
  }

  // ---- periodogram ----------------------------------------------------------

  test("periodogram: a pure period-4 cycle concentrates its power at p=4") {
    val y = (0 until 64).map(t => 10.0 + 5.0 * math.cos(2 * math.Pi * t / 4))
    val df = y.zipWithIndex.map { case (v, i) => (1L, i.toDouble, i.toLong, v) }
      .toSeq.toDF("user_id", "ts", "event_id", "value")
    val pw = SeriesDiagnostics.periodogram(df, "value", "ts", Seq("user_id"),
      periods = 2 to 8, minLen = 20, tieBreak = Seq("event_id"))
      .collect().map(r => r.getAs[Long]("p") -> r.getAs[Double]("power")).toMap
    val best = pw.maxBy(_._2)
    assert(best._1 == 4L, s"power must peak at p=4, got ${best._1}")
    (2 to 8).filter(_ != 4).foreach { p =>
      assert(pw(4L) > 20 * pw(p.toLong), s"p=4 must dominate p=$p")
    }
    pw.values.foreach(v => assert(v >= 0.0))
  }

  test("periodogram: white-ish noise has no dominant period and short " +
       "series are dropped") {
    val rnd = new scala.util.Random(3)
    val y = (0 until 64).map(_ => rnd.nextGaussian())
    val df = y.zipWithIndex.map { case (v, i) => (1L, i.toDouble, i.toLong, v) }
      .toSeq.toDF("user_id", "ts", "event_id", "value")
    val pw = SeriesDiagnostics.periodogram(df, "value", "ts", Seq("user_id"),
      periods = 2 to 8).collect().map(_.getAs[Double]("power"))
    assert(pw.max / pw.sum < 0.8,
      "noise must not concentrate its power on one line the way a real cycle does")
    val short = SeriesDiagnostics.periodogram(
      (1 to 10).map(i => (1L, i.toDouble, i.toLong, 1.0))
        .toDF("user_id", "ts", "event_id", "value"),
      "value", "ts", Seq("user_id"), periods = 2 to 8, minLen = 20)
    assert(short.count() == 0)
  }

  // ---- R/S Hurst ---------------------------------------------------------------

  test("hurst: a trending series is persistent (H near 1), an alternating " +
       "series is antipersistent (H well below 1/2)") {
    def frame(y: Seq[Double]) = y.zipWithIndex
      .map { case (v, i) => (1L, i.toDouble, i.toLong, v) }
      .toDF("user_id", "ts", "event_id", "value")
    val trend = SeriesDiagnostics.rsHurst(
      frame((0 until 128).map(_.toDouble * 0.5)), "value", "ts",
      Seq("user_id"), windows = Seq(8, 16, 32), tieBreak = Seq("event_id"))
      .collect().head.getAs[Double]("hurst")
    val alt = SeriesDiagnostics.rsHurst(
      frame((0 until 128).map(t => if (t % 2 == 0) 1.0 else -1.0)),
      "value", "ts", Seq("user_id"), windows = Seq(8, 16, 32))
      .collect().head.getAs[Double]("hurst")
    assert(trend > 0.85, s"pure trend must look persistent, got $trend")
    assert(alt < 0.2, s"alternating series must look antipersistent, got $alt")
  }

  test("hurst: R/S per block matches a driver-side replay on one block") {
    // one user, exactly one window of 8 -> rs = R/S of that block
    val y = Array(3.0, 7.0, 1.0, 9.0, 4.0, 6.0, 2.0, 8.0,
                  3.0, 7.0, 1.0, 9.0, 4.0, 6.0, 2.0, 8.0,
                  3.0, 7.0, 1.0, 9.0, 4.0, 6.0, 2.0, 8.0,
                  3.0, 7.0, 1.0, 9.0, 4.0, 6.0, 2.0, 8.0)
    val df = y.zipWithIndex.map { case (v, i) => (1L, i.toDouble, i.toLong, v) }
      .toSeq.toDF("user_id", "ts", "event_id", "value")
    val got = SeriesDiagnostics.rsHurst(df, "value", "ts", Seq("user_id"),
      windows = Seq(8, 16, 32)).collect()
    assert(got.length == 1 && got.head.getAs[Long]("min_blocks") == 1L)
    // driver replay of H from the three scales' mean R/S
    def rsOf(block: Array[Double]): Double = {
      val mean = block.sum / block.length
      val devs = block.scanLeft(0.0)(_ + _ - mean).drop(1)
      val r = math.max(devs.max, 0.0) - math.min(devs.min, 0.0)
      val sd = math.sqrt(block.map(v => (v - mean) * (v - mean)).sum / block.length)
      r / sd
    }
    def r6ln(v: Double) = math.floor(math.log(v) * 1e6 + 0.5) / 1e6
    val pts = Seq(8, 16, 32).map { w =>
      val rs = y.grouped(w).filter(_.length == w).map(b => math.floor(rsOf(b) * 1e9 + 0.5) / 1e9).toArray
      (r6ln(w.toDouble), r6ln(rs.sum / rs.length))
    }
    val n = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val h = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(got.head.getAs[Double]("hurst") - h) < 1e-6)
  }

  // ---- QLD + RRF -----------------------------------------------------------------

  private def retrievalCorpus = Seq(
    (1L, "spark join performance tuning for large tables"),
    (2L, "the cat sat on the mat and did nothing else"),
    (3L, "join performance join performance join performance"),
    (4L, "spark spark spark spark spark spark spark spark"),
    (5L, "window agg order by keys in spark"),
    (6L, "filler words beyond any query vocabulary entirely")
  ).toDF("doc_id", "text")

  test("qld: scores replay the Dirichlet formula and full-match docs beat " +
       "partial matches of similar length") {
    val q = Seq((0L, "spark join performance"))
    val out = TextAnalysis.qldTopK(retrievalCorpus, "text", "doc_id", q, k = 10)
      .orderBy("rank").collect()
    val ranked = out.map(_.getAs[Long]("doc_id"))
    assert(ranked.head == 1L || ranked.head == 3L,
      s"docs with the most query mass must lead, got ${ranked.toSeq}")
    assert(!ranked.contains(6L), "a doc with zero query terms is never a candidate")
    assert(!ranked.contains(2L))
    // driver-side replay for doc 1
    val docs = retrievalCorpus.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ")).toMap
    val ctot = docs.values.map(_.length).sum.toDouble
    def cf(t: String) = docs.values.map(_.count(_ == t)).sum.toDouble
    def score(d: Long) = Seq("spark", "join", "performance").map { t =>
      val tf = docs(d).count(_ == t).toDouble
      math.floor(math.log((tf + 2000.0 * cf(t) / ctot) / (docs(d).length + 2000.0)) * 1e9 + 0.5) / 1e9
    }.sum
    val got1 = out.find(_.getAs[Long]("doc_id") == 1L).get.getAs[Double]("score")
    assert(math.abs(got1 - math.floor(score(1L) * 1e6 + 0.5) / 1e6) < 1e-9)
  }

  test("rrf: identical input rankings preserve order; a doc in both lists " +
       "beats a doc of equal rank in one") {
    val r1 = Seq((0L, 10L, 1L), (0L, 20L, 2L), (0L, 30L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val same = TextAnalysis.rrfFuse(r1, r1, c = 60, k = 10)
      .orderBy("rank").collect().map(_.getAs[Long]("doc_id"))
    assert(same.toSeq == Seq(10L, 20L, 30L))
    val r2 = Seq((0L, 20L, 1L), (0L, 99L, 2L)).toDF("query_id", "doc_id", "rank")
    val fused = TextAnalysis.rrfFuse(r1, r2, c = 60, k = 10)
      .orderBy("rank").collect()
    assert(fused.head.getAs[Long]("doc_id") == 20L,
      "rank-2 + rank-1 must beat rank-1-only")
    val s = fused.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("rrf")).toMap
    assert(math.abs(s(10L) - math.floor(1e9 / 61) / 1e9) < 1e-12)
    assert(math.abs(s(20L) - (math.floor(1e9 / 62) + math.floor(1e9 / 61)) / 1e9) < 1e-12)
  }

  // ---- SRM + MDE -------------------------------------------------------------------

  test("srm: counts add up, chi2 replays the closed form, and a fair md5 " +
       "split never flags on a real population") {
    val ids = (1 to 4000).map(i => Tuple1(i.toLong)).toDF("user_id")
    val out = ExperimentDesign.srmCheck(ids, "user_id", Seq(1, 2, 3)).collect()
    assert(out.length == 3)
    out.foreach { r =>
      val (n, na, nb) = (r.getAs[Long]("n"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(na + nb == n && n == 4000)
      val e = n / 2.0
      val chi2 = (na - e) * (na - e) / e + (nb - e) * (nb - e) / e
      assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-9)
      assert(!r.getAs[Boolean]("srm") || chi2 > 3.841458820694124)
    }
    // a deliberately biased assignment WOULD flag: simulate by checking the
    // chi2 of a 60/40 split at this n clears the critical value
    val e = 2000.0; val biased = (2400 - e) * (2400 - e) / e * 2
    assert(biased > 3.841458820694124)
  }

  test("mde: replay of the power closed form; more units shrink the MDE") {
    val df = (1 to 400).flatMap { u =>
      Seq(("m", u.toLong, 10.0 + (u % 7)), ("m", u.toLong, 5.0))
    }.toDF("grp", "user_id", "value")
    val out = ExperimentDesign.mdeByGroup(df, "value", "user_id", "grp")
      .collect().head
    val perUnit = (1 to 400).map(u => 15.0 + (u % 7))
    val n = perUnit.length.toDouble
    val mean = perUnit.sum / n
    val sigma = math.sqrt(perUnit.map(v => (v - mean) * (v - mean)).sum / (n - 1))
    assert(math.abs(out.getAs[Double]("mean") - mean) < 1e-9)
    assert(math.abs(out.getAs[Double]("sigma") - sigma) < 1e-6)
    val mde = (ExperimentDesign.z975 + ExperimentDesign.z80) * sigma *
      math.sqrt(2.0 / 200.0)
    assert(math.abs(out.getAs[Double]("mde_abs") - mde) < 1e-6)
    // half the units -> MDE grows ~sqrt(2)
    val half = ExperimentDesign.mdeByGroup(
      df.filter(col("user_id") <= 200), "value", "user_id", "grp")
      .collect().head.getAs[Double]("mde_abs")
    assert(half > out.getAs[Double]("mde_abs") * 1.3)
  }

  // ---- Newey–West HAC ---------------------------------------------------------

  test("newey-west: positively autocorrelated residuals inflate the HAC se " +
       "above the naive OLS se; on near-iid residuals the two agree") {
    val rnd = new scala.util.Random(5)
    // AR(0.8) residuals around a trend
    var e = 0.0
    val ar = (1 to 200).map { t =>
      e = 0.8 * e + rnd.nextGaussian()
      (t.toLong, math.floor((0.05 * t + e) * 100 + 0.5) / 100) }
      .toDF("t", "y")
    val arRow = Econometrics.neweyWestTrend(ar, "t", "y", maxLag = 3)
      .collect().head
    assert(arRow.getAs[Double]("se_hac") > 1.4 * arRow.getAs[Double]("se_ols"),
      "AR(0.8) noise must inflate the HAC se well above OLS")
    assert(math.abs(arRow.getAs[Double]("slope") - 0.05) < 0.02)
    val iid = (1 to 200).map { t =>
      (t.toLong, math.floor((0.05 * t + rnd.nextGaussian()) * 100 + 0.5) / 100) }
      .toDF("t", "y")
    val iidRow = Econometrics.neweyWestTrend(iid, "t", "y", maxLag = 3)
      .collect().head
    val ratio = iidRow.getAs[Double]("se_hac") / iidRow.getAs[Double]("se_ols")
    assert(ratio > 0.6 && ratio < 1.5,
      s"iid noise: HAC and OLS se must be in the same band, got $ratio")
  }

  // ---- priority sampling --------------------------------------------------------

  test("priority sample: exact replay of the w/u top-k, tau is the " +
       "(k+1)-th priority, and the estimator is max(w, tau)") {
    val rows = (1 to 50).map(i => (i.toLong, (i % 7 + 1) * 10L))
    val df = rows.toDF("doc_id", "w")
    val got = graft.scale.Sampling.prioritySample(df, "doc_id", "w", k = 10, seed = 3L)
      .orderBy("rk").collect()
    assert(got.length == 10)
    // driver-side replay of u and q
    def u(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:3".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(13)
      (java.lang.Long.parseLong(hex, 16) + 0.5) / 4503599627370496.0
    }
    val replay = rows.map { case (id, w) => (id, w, w.toDouble / u(id)) }
      .sortBy { case (id, _, q) => (-q, id) }
    val tau = replay(10)._3
    got.zip(replay.take(10)).foreach { case (r, (id, w, q)) =>
      assert(r.getAs[Long]("doc_id") == id)
      assert(r.getAs[Double]("q") == q)
      assert(r.getAs[Double]("tau") == tau)
      assert(r.getAs[Double]("w_est") == math.max(w.toDouble, tau))
    }
    // degenerate population <= k: everyone kept, tau = 0, w_est = w
    val tiny = graft.scale.Sampling.prioritySample(
      rows.take(5).toDF("doc_id", "w"), "doc_id", "w", k = 10, seed = 3L)
      .collect()
    assert(tiny.length == 5)
    tiny.foreach { r =>
      assert(r.getAs[Double]("tau") == 0.0)
      assert(r.getAs[Double]("w_est") == r.getAs[Long]("w").toDouble)
    }
  }

  // ---- NDCG -------------------------------------------------------------------

  test("ndcg: the ideal ordering scores exactly 1, a reversed ordering " +
       "scores lower, and DCG replays the closed form") {
    val rel = Seq((0L, 1L, 3L), (0L, 2L, 2L), (0L, 3L, 1L))
      .toDF("query_id", "doc_id", "rel")
    def ranking(ids: Seq[Long]) = ids.zipWithIndex
      .map { case (d, i) => (0L, d, (i + 1).toLong) }
      .toDF("query_id", "doc_id", "rank")
    val ideal = TextAnalysis.ndcgAtK(ranking(Seq(1L, 2L, 3L)), rel, k = 10)
      .collect().head
    assert(ideal.getAs[Double]("ndcg") == 1.0)
    val rev = TextAnalysis.ndcgAtK(ranking(Seq(3L, 2L, 1L)), rel, k = 10)
      .collect().head
    assert(rev.getAs[Double]("ndcg") < 1.0 && rev.getAs[Double]("ndcg") > 0.5)
    // closed-form replay of the ideal DCG: gains 7,3,1 at the r6 discounts
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    def g9(v: Double) = math.floor(v * 1e9 + 0.5) / 1e9
    val want = Seq((7.0, 1), (3.0, 2), (1.0, 3))
      .map { case (g, r) => g9(g * r6(math.log(2) / math.log(r + 1.0))) }.sum
    assert(math.abs(ideal.getAs[Double]("dcg") - want) < 1e-9)
    // a doc outside the relevance table contributes zero gain
    val withJunk = TextAnalysis.ndcgAtK(ranking(Seq(99L, 1L, 2L, 3L)), rel, 10)
      .collect().head
    assert(withJunk.getAs[Double]("ndcg") < rev.getAs[Double]("ndcg") + 1e-12 ||
           withJunk.getAs[Double]("ndcg") < 1.0)
  }

  test("term relevance: counts distinct query terms only") {
    val docs = Seq(
      (1L, "spark join performance spark spark"),
      (2L, "join alone"),
      (3L, "nothing relevant here")).toDF("doc_id", "text")
    val rel = TextAnalysis.termRelevance(docs, "text", "doc_id",
      Seq((0L, "spark join performance")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rel")).toMap
    assert(rel(1L) == 3L, "repeats must not inflate the grade")
    assert(rel(2L) == 1L)
    assert(!rel.contains(3L))
  }

  // ---- Guerrero Box-Cox ---------------------------------------------------------

  test("guerrero: multiplicative noise picks log (lambda=0), additive " +
       "noise picks identity (lambda=1)") {
    val rnd = new scala.util.Random(13)
    // level ramps block to block; sigma proportional to level -> log wins
    val mult = (0 until 64).map { t =>
      val level = 10.0 * (1 + t / 8)
      (1L, t.toDouble, t.toLong, level * (1.0 + 0.2 * rnd.nextGaussian()))
    }.toDF("user_id", "ts", "event_id", "value")
    val mRow = SeriesDiagnostics.guerreroBoxCox(mult, "value", "ts",
      Seq("user_id"), m = 8, tieBreak = Seq("event_id")).collect().head
    assert(mRow.getAs[Double]("lambda") == 0.0,
      s"sigma ~ mu must pick log, got cv0=${mRow.getAs[Double]("cv0")} " +
      s"cv1=${mRow.getAs[Double]("cv1")}")
    // same ramp with CONSTANT sigma -> identity wins
    val add = (0 until 64).map { t =>
      val level = 10.0 * (1 + t / 8)
      (1L, t.toDouble, t.toLong, level + 2.0 * rnd.nextGaussian())
    }.toDF("user_id", "ts", "event_id", "value")
    val aRow = SeriesDiagnostics.guerreroBoxCox(add, "value", "ts",
      Seq("user_id"), m = 8, tieBreak = Seq("event_id")).collect().head
    assert(aRow.getAs[Double]("lambda") == 1.0,
      s"constant sigma must pick identity, got cv0=${aRow.getAs[Double]("cv0")} " +
      s"cv1=${aRow.getAs[Double]("cv1")}")
    assert(mRow.getAs[Long]("n_blocks") == 8)
  }

  // ---- tracking signal ------------------------------------------------------------

  test("tracking signal: persistent drift saturates TS toward +1 and " +
       "alarms; alternating errors stay near zero") {
    // strictly increasing series: every error = +2 -> TS = 1 exactly
    val up = (0 until 40).map(t => (1L, t.toDouble, t.toLong, 2.0 * t))
      .toDF("user_id", "ts", "event_id", "value")
    val u = SeriesDiagnostics.trackingSignal(up, "value", "ts",
      Seq("user_id"), alpha = 0.5, limit = 0.5, tieBreak = Seq("event_id"))
      .collect().head
    assert(u.getAs[Double]("ts") == 1.0)
    assert(u.getAs[Long]("alarm") == 1L)
    // alternating +2/-2 errors: smoothed error cancels, MAD = 2
    val alt = (0 until 40).map(t =>
      (1L, t.toDouble, t.toLong, if (t % 2 == 0) 0.0 else 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val a = SeriesDiagnostics.trackingSignal(alt, "value", "ts",
      Seq("user_id"), alpha = 0.5, limit = 0.5, tieBreak = Seq("event_id"))
      .collect().head
    assert(math.abs(a.getAs[Double]("ts")) < 0.4,
      s"alternating errors must not alarm, got ${a.getAs[Double]("ts")}")
    assert(a.getAs[Long]("alarm") == 0L)
    assert(math.abs(a.getAs[Double]("mad_smooth") - 2.0) < 1e-6)
  }

  // ---- tokenizer compression ---------------------------------------------------------

  test("bpe compression: with no merges every piece is a char " +
       "(chars_per_piece = 1); merges raise it; duals are consistent") {
    val docs = Seq((1L, "aa aa bb", "s1"), (2L, "aa bb bb", "s2"))
      .toDF("doc_id", "text", "source")
    val noMerges = Seq.empty[(Int, String, String)]
      .toDF("step", "left", "right")
    val flat = TextAnalysis.bpeCompression(docs, "text", "source", noMerges)
      .collect()
    flat.foreach { r =>
      assert(r.getAs[Double]("chars_per_piece") == 1.0)
      assert(r.getAs[Double]("pieces_per_kchar") == 1000.0)
      assert(r.getAs[Long]("n_chars") == r.getAs[Long]("n_pieces"))
    }
    val merged = Seq((0, "a", "a")).toDF("step", "left", "right")
    val comp = TextAnalysis.bpeCompression(docs, "text", "source", merged)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    // s1: aa aa bb -> pieces 1,1,2 over chars 2,2,2
    assert(comp("s1").getAs[Long]("n_pieces") == 4L)
    assert(comp("s1").getAs[Long]("n_chars") == 6L)
    assert(comp("s1").getAs[Double]("chars_per_piece") == 1.5)
  }

  // ---- silhouette ----------------------------------------------------------------

  test("silhouette: separated clusters score near 1, interleaved labels " +
       "score near 0 or below") {
    val rnd = new scala.util.Random(17)
    def vec(center: Double) = Seq.fill(8)(center + 0.01 * rnd.nextGaussian())
    val sep = ((1 to 40).map(i => (i.toLong, 0, vec(0.0))) ++
               (41 to 80).map(i => (i.toLong, 1, vec(10.0))))
      .toDF("vec_id", "label", "embedding")
    val s1 = Similarity.labelSilhouette(sep, "embedding", "label", "vec_id")
      .collect().map(_.getAs[Double]("mean_sil"))
    s1.foreach(v => assert(v > 0.9, s"separated clusters must score ~1, got $v"))
    // same points, labels assigned by parity of id -> labels carry no geometry
    val mixed = ((1 to 80).map(i =>
      (i.toLong, (i % 2).toInt, vec(if (i <= 40) 0.0 else 10.0))))
      .toDF("vec_id", "label", "embedding")
    val s2 = Similarity.labelSilhouette(mixed, "embedding", "label", "vec_id")
      .collect().map(_.getAs[Double]("mean_sil"))
    s2.foreach(v => assert(v < 0.2, s"geometry-free labels must score ~0, got $v"))
  }

  // ---- HyperLogLog -----------------------------------------------------------------

  test("hll: estimate lands within the sketch's error band on a 10k-id " +
       "population and the register math replays driver-side") {
    val ids = (1 to 10000).map(i => Tuple1(i.toLong)).toDF("user_id")
    val row = graft.stats.Sketches.hllDistinct(ids, "user_id", p = 8)
      .collect().head
    assert(row.getAs[Long]("n_exact") == 10000L)
    val est = row.getAs[Double]("estimate")
    val err = math.abs(est - 10000.0) / 10000.0
    assert(err < 0.15, s"p=8 HLL must land within ~15%, got $est ($err)")
    // driver-side replay of the register fold on a small fixture
    val small = (1 to 500).map(i => Tuple1(i.toLong)).toDF("user_id")
    val got = graft.stats.Sketches.hllDistinct(small, "user_id", p = 8)
      .collect().head
    val regs = scala.collection.mutable.Map.empty[Long, Long]
    (1 to 500).foreach { i =>
      val hx = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val bucket = java.lang.Long.parseLong(hx.take(2), 16)
      val w = java.lang.Long.parseLong(hx.slice(2, 15), 16)
      val rho = if (w == 0) 53L else 53L - java.lang.Long.toBinaryString(w).length
      regs(bucket) = math.max(regs.getOrElse(bucket, 0L), rho)
    }
    val vEmpty = 256L - regs.size
    assert(got.getAs[Long]("v_empty") == vEmpty)
    val zNum = regs.values.map(mr => 1L << (53 - mr)).sum +
      vEmpty * 9007199254740992L
    val eRaw = graft.stats.Sketches.alphaFor(256) * 256 * 256 /
      (zNum / 9007199254740992.0)
    assert(got.getAs[Double]("e_raw") == eRaw,
      "raw estimate must replay bit-for-bit from the register fold")
  }

  // ---- ARCH-LM ----------------------------------------------------------------

  test("arch-lm: volatility-clustered differences flag, homoskedastic " +
       "differences do not, and LM = n*R2 replays") {
    val rnd = new scala.util.Random(23)
    // regime-switching volatility: 30 calm, 30 wild, repeated
    var lvl = 100.0
    val clustered = (1 to 240).map { t =>
      val sigma = if ((t / 30) % 2 == 0) 0.2 else 6.0
      lvl += sigma * rnd.nextGaussian()
      (t.toLong, math.floor(lvl * 100 + 0.5) / 100)
    }.toDF("t", "y")
    val c = Econometrics.archLmTest(clustered, "t", "y").collect().head
    assert(c.getAs[Long]("arch_flag") == 1L,
      s"regime-switching vol must flag, lm=${c.getAs[Double]("lm_stat")}")
    assert(c.getAs[Double]("rho") > 0, "clustered z2 is positively autocorrelated")
    var lvl2 = 100.0
    val flat = (1 to 240).map { t =>
      lvl2 += 1.0 * rnd.nextGaussian()
      (t.toLong, math.floor(lvl2 * 100 + 0.5) / 100)
    }.toDF("t", "y")
    val f = Econometrics.archLmTest(flat, "t", "y").collect().head
    assert(f.getAs[Double]("lm_stat") < c.getAs[Double]("lm_stat") / 4,
      "homoskedastic walk must score far below the clustered one")
    assert(math.abs(c.getAs[Double]("lm_stat") -
      c.getAs[Long]("n").toDouble * c.getAs[Double]("r2")) < 1e-9)
  }

  // ---- quantile binning -----------------------------------------------------------

  test("quantile bins: 1..1000 splits into ten bins of exactly 100 with " +
       "contiguous ranges") {
    val df = (1 to 1000).map(i => Tuple1(i.toDouble)).toDF("v")
    val bins = graft.core.Encoders.quantileBin(df, "v", b = 10)
      .orderBy("bin").collect()
    assert(bins.length == 10)
    bins.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("bin") == i + 1)
      assert(r.getAs[Long]("cnt") == 100L, s"bin ${i + 1} must hold 100")
      assert(r.getAs[Double]("lo") == i * 100 + 1.0)
      assert(r.getAs[Double]("hi") == (i + 1) * 100.0)
    }
  }

  // ---- volatility pipeline ---------------------------------------------------------

  test("volatility pipeline: a lone burst flags few points; a constant " +
       "series flags none") {
    val y = Array.fill(20)(5.0) ++ Array(45.0, 5.0) ++ Array.fill(20)(5.0)
    val df = y.zipWithIndex.map { case (v, i) => (1L, i.toDouble, i.toLong, v) }
      .toSeq.toDF("user_id", "ts", "event_id", "value")
    val g = PerSeriesForecast.garchFilter(df, "value", "ts", "user_id", "event_id")
    val flagged = g.filter(abs(col("z")) > 2.5).count()
    assert(flagged >= 1 && flagged <= 4,
      s"adaptive sigma must flag the burst and little else, got $flagged")
    val const = (0 until 30).map(t => (2L, t.toDouble, t.toLong, 7.0))
      .toDF("user_id", "ts", "event_id", "value")
    val f2 = PerSeriesForecast.garchFilter(const, "value", "ts", "user_id", "event_id")
      .filter(abs(col("z")) > 2.5).count()
    assert(f2 == 0L)
  }

  // ---- source concentration --------------------------------------------------------

  test("concentration: uniform weights give gini/theil 0; a dominant doc " +
       "pushes gini toward (n-1)/n") {
    val uniform = (1 to 100).map(i => (i.toLong, "s1", 50L))
      .toDF("doc_id", "source", "n_chars")
    val u = TextAnalysis.sourceConcentration(uniform, "n_chars", "source", "doc_id")
      .collect().head
    assert(u.getAs[Double]("gini") == 0.0)
    assert(math.abs(u.getAs[Double]("theil")) < 1e-6)
    // 99 docs of 1 char + one of 9901: almost everything in one doc
    val skewed = ((1 to 99).map(i => (i.toLong, "s2", 1L)) :+ (100L, "s2", 9901L))
      .toDF("doc_id", "source", "n_chars")
    val s = TextAnalysis.sourceConcentration(skewed, "n_chars", "source", "doc_id")
      .collect().head
    assert(s.getAs[Double]("gini") > 0.95,
      s"one dominant doc must push gini toward 0.99, got ${s.getAs[Double]("gini")}")
    assert(s.getAs[Double]("theil") > 2.0)
    // exact gini replay on the skewed fixture
    val ws = (Seq.fill(99)(1L) :+ 9901L).sorted
    val n = ws.length; val tot = ws.sum
    val gini = ws.zipWithIndex.map { case (w, i0) =>
      (2L * (i0 + 1) - n - 1L) * w }.sum.toDouble / (n.toDouble * tot)
    assert(math.abs(s.getAs[Double]("gini") - gini) < 1e-12)
  }
}
