package graft.stats

import breeze.linalg.{DenseMatrix, DenseVector, inv}
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Stationarity & autocorrelation statistics (SURVEY §2.10 M10,
  * `utils/eda.py:204-314` ADF; `utils/eda.py:105-113` ACF/PACF plots).
  *
  * Design: the estimation math runs on a bounded per-series vector (as in
  * the reference, which tests ONE series at a time). At scale the engine
  * runs the same local math once per series via
  * `groupByKey(seriesId).flatMapGroups` — thousands of series in parallel,
  * each bounded — rather than trying to distribute a single OLS. */
object StatTests {

  // ---------- local (bounded-series) math ----------

  /** Sample autocorrelation r_k with full-series mean normalization
    * (statsmodels `acf` definition). */
  def acf(y: Array[Double], maxLag: Int): Array[Double] = {
    val n = y.length
    val mean = y.sum / n
    val c0 = y.map(v => (v - mean) * (v - mean)).sum
    (0 to maxLag).map { k =>
      var s = 0.0
      var t = k
      while (t < n) { s += (y(t) - mean) * (y(t - k) - mean); t += 1 }
      s / c0
    }.toArray
  }

  /** Partial autocorrelation via Durbin–Levinson on the ACF. */
  def pacf(y: Array[Double], maxLag: Int): Array[Double] = {
    val r = acf(y, maxLag)
    val phi = Array.ofDim[Double](maxLag + 1, maxLag + 1)
    val out = Array.ofDim[Double](maxLag + 1)
    out(0) = 1.0
    if (maxLag >= 1) { phi(1)(1) = r(1); out(1) = r(1) }
    for (k <- 2 to maxLag) {
      var num = r(k)
      var den = 1.0
      for (j <- 1 until k) { num -= phi(k - 1)(j) * r(k - j); den -= phi(k - 1)(j) * r(j) }
      phi(k)(k) = num / den
      for (j <- 1 until k) phi(k)(j) = phi(k - 1)(j) - phi(k)(k) * phi(k - 1)(k - j)
      out(k) = phi(k)(k)
    }
    out
  }

  /** OLS fit returning (coefficients, stdErrors, rss, nObs). */
  private def ols(x: DenseMatrix[Double], y: DenseVector[Double]): (DenseVector[Double], DenseVector[Double], Double, Int) = {
    val xtx = x.t * x
    val xtxInv = inv(xtx)
    val beta = xtxInv * (x.t * y)
    val resid = y - x * beta
    val rss = resid dot resid
    val dof = x.rows - x.cols
    val sigma2 = rss / dof
    val se = DenseVector((0 until x.cols).map(j => math.sqrt(sigma2 * xtxInv(j, j))).toArray)
    (beta, se, rss, x.rows)
  }

  case class AdfResult(stat: Double, lagUsed: Int, nObs: Int,
                       crit1: Double, crit5: Double, crit10: Double,
                       stationary: Boolean, pValue: Double = Double.NaN)

  /** MacKinnon (1994) approximate asymptotic p-value for the ADF tau
    * statistic, constant-only regression (the surface statsmodels'
    * `mackinnonp` evaluates): Φ of a polynomial in τ, small-p branch for
    * τ ≤ −1.61, large-p branch above, clamped outside [−18.83, 2.74].
    * Anchors: p(−3.43) ≈ 0.01, p(−2.86) ≈ 0.05, p(−2.57) ≈ 0.10, and the
    * two branches agree to 3 decimals at the switch point. */
  def adfPValue(tau: Double): Double = {
    def normCdf(x: Double) = 0.5 * (1.0 + breeze.numerics.erf(x / math.sqrt(2.0)))
    if (tau > 2.74) 1.0
    else if (tau < -18.83) 0.0
    else if (tau <= -1.61)
      normCdf(2.1659 + 1.4412 * tau + 0.038269 * tau * tau)
    else
      normCdf(1.7339 + 0.93202 * tau - 0.12745 * tau * tau - 0.010368 * tau * tau * tau)
  }

  /** Augmented Dickey–Fuller with constant, lag order selected by BIC over
    * 0..maxLag (reference: `adfuller(series, autolag='BIC')`,
    * `utils/eda.py:230`). Regression: Δy_t = α + γ·y_{t-1} + Σφ_i Δy_{t-i}.
    * Critical values: MacKinnon (2010) finite-sample approximations for
    * the constant-only case. */
  def adf(y: Array[Double], maxLagOpt: Option[Int] = None): AdfResult = {
    val n = y.length
    require(n >= 10, s"ADF needs >= 10 observations, got $n")
    val maxLag = maxLagOpt.getOrElse(
      math.min(math.ceil(12.0 * math.pow(n / 100.0, 0.25)).toInt, (n - 1) / 3))
    val dy = Array.tabulate(n - 1)(i => y(i + 1) - y(i))

    /** Fit with p lagged-diff terms. `startAt` aligns the sample: during
      * lag selection every candidate must use the SAME observations
      * (statsmodels does this too) — BIC values are not comparable across
      * different sample sizes and comparing them raw systematically
      * selects the largest lag. */
    def fitWithLag(p: Int, startAt: Int): (Double, Double, Int) = {
      val rows = dy.length - startAt
      val cols = 2 + p
      val x = DenseMatrix.zeros[Double](rows, cols)
      val b = DenseVector.zeros[Double](rows)
      for (i <- 0 until rows) {
        val t = i + startAt
        b(i) = dy(t)
        x(i, 0) = 1.0
        x(i, 1) = y(t) // y_{t-1} relative to dy(t) = y(t+1)-y(t)
        for (j <- 1 to p) x(i, 1 + j) = dy(t - j)
      }
      val (beta, se, rss, nobs) = ols(x, b)
      val tstat = beta(1) / se(1)
      val bic = nobs * math.log(rss / nobs) + cols * math.log(nobs)
      (tstat, bic, nobs)
    }

    // select lag on the common (maxLag-aligned) sample, then refit with
    // the winner using all available observations
    val bestLag = (0 to maxLag).minBy(p => fitWithLag(p, maxLag)._2)
    val (stat, _, nobs) = fitWithLag(bestLag, bestLag)
    val t = nobs.toDouble
    // MacKinnon (2010) response-surface, constant only (N=1)
    val c1  = -3.43035 - 6.5393 / t - 16.786 / (t * t) - 79.433 / (t * t * t)
    val c5  = -2.86154 - 2.8903 / t - 4.234 / (t * t) - 40.040 / (t * t * t)
    val c10 = -2.56677 - 1.5384 / t - 2.809 / (t * t)
    AdfResult(stat, bestLag, nobs, c1, c5, c10, stat < c5, adfPValue(stat))
  }

  /** M11 — Durbin–Watson statistic on a residual vector
    * (`ts_model_validation`, `utils/val.py:135-173`). */
  def durbinWatson(resid: Array[Double]): Double = {
    val num = resid.sliding(2).map { case Array(a, b) => (b - a) * (b - a) }.sum
    val den = resid.map(r => r * r).sum
    num / den
  }

  /** M11 — Ljung–Box Q statistic at lags 1..h
    * (`ts_model_validation`, `utils/val.py:148` `sercor_method='ljungbox'`;
    * the reference reports the largest-lag value):
    * Q = n(n+2) Σ_{k=1..h} r_k² / (n−k), chi-square with h dof under H0. */
  def ljungBox(resid: Array[Double], h: Int): Double = {
    val n = resid.length
    val r = acf(resid, h)
    n * (n + 2.0) * (1 to h).map(k => r(k) * r(k) / (n - k)).sum
  }

  /** M11 — Jarque–Bera normality statistic
    * (`ts_model_validation`, `utils/val.py:147` `norm_method='jarquebera'`).
    * Returns (stat, skewness, excess kurtosis); stat ~ chi-square(2). */
  def jarqueBera(resid: Array[Double]): (Double, Double, Double) = {
    val n = resid.length.toDouble
    val mu = resid.sum / n
    var m2 = 0.0; var m3 = 0.0; var m4 = 0.0
    resid.foreach { v =>
      val d = v - mu; val d2 = d * d
      m2 += d2; m3 += d2 * d; m4 += d2 * d2
    }
    m2 /= n; m3 /= n; m4 /= n
    val skew = m3 / math.pow(m2, 1.5)
    val exKurt = m4 / (m2 * m2) - 3.0
    (n / 6.0 * (skew * skew + exKurt * exKurt / 4.0), skew, exKurt)
  }

  /** M11 — break-variance heteroskedasticity ratio
    * (`ts_model_validation`, `utils/val.py:146` `het_method='breakvar'`,
    * statsmodels `test_heteroskedasticity`): H = Σ e² over the last
    * ⌊n/3⌋ residuals / Σ e² over the first ⌊n/3⌋. H ≈ 1 under
    * homoskedasticity; H ~ F(h, h) under normal H0. */
  def breakVar(resid: Array[Double]): Double = {
    val n = resid.length
    val h = n / 3
    require(h >= 1, s"breakVar needs >= 3 residuals, got $n")
    val head = resid.take(h).map(r => r * r).sum
    val tail = resid.takeRight(h).map(r => r * r).sum
    tail / head
  }

  /** Upper regularized incomplete gamma Q(a, x) — survival function of the
    * gamma distribution; `chiSquareSf(x, k) = Q(k/2, x/2)`. Series expansion
    * for x < a+1, Lentz continued fraction otherwise (standard numerics;
    * e.g. Press et al., public domain formulas). */
  private def regGammaQ(a: Double, x: Double): Double = {
    if (x <= 0.0) return 1.0
    val lnGammaA = breeze.numerics.lgamma(a)
    if (x < a + 1.0) {
      // P(a,x) by series, return 1 - P
      var ap = a; var sum = 1.0 / a; var del = sum
      var i = 0
      while (i < 500 && math.abs(del) > math.abs(sum) * 1e-15) {
        ap += 1.0; del *= x / ap; sum += del; i += 1
      }
      1.0 - sum * math.exp(-x + a * math.log(x) - lnGammaA)
    } else {
      // Q(a,x) by modified Lentz continued fraction
      val tiny = 1e-300
      var b = x + 1.0 - a; var c = 1.0 / tiny; var d = 1.0 / b; var hh = d
      var i = 1
      var done = false
      while (i <= 500 && !done) {
        val an = -i * (i - a)
        b += 2.0
        d = an * d + b; if (math.abs(d) < tiny) d = tiny
        c = b + an / c; if (math.abs(c) < tiny) c = tiny
        d = 1.0 / d
        val del = d * c
        hh *= del
        if (math.abs(del - 1.0) < 1e-15) done = true
        i += 1
      }
      math.exp(-x + a * math.log(x) - lnGammaA) * hh
    }
  }

  /** Chi-square survival function (p-value for an observed statistic). */
  def chiSquareSf(x: Double, df: Int): Double = regGammaQ(df / 2.0, x / 2.0)

  /** True iff all roots of the lag polynomial 1 − c₁z − … − c_p z^p lie
    * OUTSIDE the unit circle (stationarity for AR coefficients,
    * invertibility for MA) — the `arroots`/`maroots` check of
    * `ts_model_validation` (`utils/val.py:163-167`). Roots via eigenvalues
    * of the companion matrix of the reversed (monic) polynomial.
    * Vacuously true for an empty/zero coefficient vector, matching the
    * reference's "True when the order is 0" semantics. */
  def rootsOutsideUnitCircle(coeffs: Array[Double]): Boolean = {
    val trimmed = coeffs.reverse.dropWhile(c => c == 0.0).reverse
    val p = trimmed.length
    if (p == 0) return true
    if (p == 1) return math.abs(1.0 / trimmed(0)) > 1.0
    // roots of 1 - Σ c_i z^i  <=>  eigenvalues λ of the companion matrix of
    // z^p - (c_1/c_p') ...: substitute w = 1/z; w^p - c_1 w^(p-1) - ... - c_p
    // has roots w_i = 1/z_i, so all |z_i| > 1  <=>  all |w_i| < 1.
    val comp = DenseMatrix.zeros[Double](p, p)
    for (j <- 0 until p) comp(0, j) = trimmed(j)
    for (i <- 1 until p) comp(i, i - 1) = 1.0
    val ev = breeze.linalg.eig(comp)
    val moduli = (0 until p).map(i =>
      math.hypot(ev.eigenvalues(i), ev.eigenvaluesComplex(i)))
    moduli.forall(_ < 1.0)
  }

  // ---------- distributed per-series wrappers ----------

  /** ADF per series: one `flatMapGroups` pass — each task pulls ONE
    * bounded series, sorts by ts locally, runs the local ADF. Scales to
    * millions of series; a single series must fit in task memory (same
    * contract as the reference, which is single-machine pandas). */
  def adfPerSeries(df: DataFrame, valueCol: String, tsCol: String,
                   seriesCol: String, maxLag: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(seriesCol).cast("long"), col(tsCol).cast("double"), col(valueCol).cast("double"))
      .as[(Long, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (sid, it) =>
        // (ts, value) sort: deterministic on duplicate timestamps
        val series = it.toArray.sortBy(t => (t._2, t._3)).map(_._3)
        if (series.length < 10) Iterator.empty
        else
          // constant/collinear series make the OLS design singular — skip
          // that one series instead of failing the whole job (the operator
          // contract is "millions of series"; one degenerate series must
          // not poison the pass)
          scala.util.Try(adf(series, maxLag)).toOption match {
            case Some(r) =>
              Iterator((sid, r.stat, r.lagUsed.toLong, r.nObs.toLong, r.stationary, r.pValue))
            case None    => Iterator.empty
          }
      }
      .toDF(seriesCol, "adf_stat", "lag_used", "n_obs", "stationary", "p_value")
  }

  /** ACF per series (k = 1..maxLag), same flatMapGroups pattern. */
  def acfPerSeries(df: DataFrame, valueCol: String, tsCol: String,
                   seriesCol: String, maxLag: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(seriesCol).cast("long"), col(tsCol).cast("double"), col(valueCol).cast("double"))
      .as[(Long, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (sid, it) =>
        val series = it.toArray.sortBy(t => (t._2, t._3)).map(_._3)
        if (series.length <= maxLag + 1) Iterator.empty
        else {
          val r = acf(series, maxLag)
          (1 to maxLag).iterator.map(k => (sid, k.toLong, r(k)))
        }
      }
      .toDF(seriesCol, "k", "acf")
  }

  /** PACF per series (k = 1..maxLag), same flatMapGroups pattern —
    * Durbin–Levinson on each series' local ACF. */
  def pacfPerSeries(df: DataFrame, valueCol: String, tsCol: String,
                    seriesCol: String, maxLag: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(seriesCol).cast("long"), col(tsCol).cast("double"), col(valueCol).cast("double"))
      .as[(Long, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (sid, it) =>
        val series = it.toArray.sortBy(t => (t._2, t._3)).map(_._3)
        if (series.length <= maxLag + 1) Iterator.empty
        else {
          val r = pacf(series, maxLag)
          (1 to maxLag).iterator.map(k => (sid, k.toLong, r(k)))
        }
      }
      .toDF(seriesCol, "k", "pacf")
  }

  /** M11 — full residual-diagnostics battery per series
    * (`ts_model_validation`, `utils/val.py:135-173`): Durbin–Watson,
    * Ljung–Box(h) serial correlation, Jarque–Bera normality, and
    * break-variance heteroskedasticity, on per-series demeaned values,
    * one `flatMapGroups` pass (same millions-of-series contract as
    * [[adfPerSeries]]). p-values via [[chiSquareSf]] for the two
    * chi-square statistics. */
  def diagnosticsPerSeries(df: DataFrame, valueCol: String, tsCol: String,
                           seriesCol: String, lbLag: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(seriesCol).cast("long"), col(tsCol).cast("double"), col(valueCol).cast("double"))
      .as[(Long, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (sid, it) =>
        val y = it.toArray.sortBy(t => (t._2, t._3)).map(_._3)
        val n = y.length
        if (n < math.max(12, lbLag + 2)) Iterator.empty
        else {
          val mu = y.sum / n
          val e = y.map(_ - mu)
          val dw = durbinWatson(e)
          val lb = ljungBox(e, lbLag)
          val (jb, _, _) = jarqueBera(e)
          val het = breakVar(e)
          Iterator((sid, dw, lb, chiSquareSf(lb, lbLag), jb, chiSquareSf(jb, 2), het))
        }
      }
      .toDF(seriesCol, "dw", "lb_stat", "lb_p", "jb_stat", "jb_p", "het_ratio")
  }

  /** KPSS level-stationarity statistic (Kwiatkowski, Phillips, Schmidt
    * & Shin 1992, J. Econometrics 54) on a bounded series — the
    * complement of [[adf]]: its null is STATIONARITY, so the pair
    * disambiguates "unit root" from "trend-stationary" the way the
    * classic ADF+KPSS decision table does.
    *   η = n⁻² Σ_t S_t² / s²(l),  S_t = Σ_{i≤t} e_i,  e_i = y_i − ȳ,
    *   s²(l) = γ₀ + 2 Σ_{j=1..l} (1 − j/(l+1)) γ_j  (Bartlett window)
    * with a FIXED lag l (no data-driven bandwidth — the choice is part
    * of the operator contract so both engines compute the identical
    * statistic).
    *
    * Cross-engine determinism: inputs quantize to integer cents, the
    * demeaned values to the 1e-9 grid, and both quadratic-form sums
    * accumulate per-term-floored 1e-6 integers — every aggregate is
    * exact, so η is bit-identical regardless of engine or partition
    * order. Returns None for series too short (n ≤ l+2) or with zero
    * long-run variance (constant series: 0/0 has no test value). */
  def kpss(cents: Array[Long], lag: Int): Option[(Double, Long)] = {
    val n = cents.length
    if (n <= lag + 2) return None
    val sumC = cents.sum
    val mean = (sumC / 100.0) / n
    // e on the 1e-9 grid: both engines see the identical integers
    val e9 = cents.map(c => math.floor((c / 100.0 - mean) * 1e9 + 0.5).toLong)
    val ed = e9.map(_ / 1e9)
    var s9 = 0L
    var a6 = 0L // Σ (S_t/n)² on the 1e-6 grid
    var t = 0
    while (t < n) {
      s9 += e9(t)
      val sn = s9 / 1e9 / n
      a6 += math.floor(sn * sn * 1e6 + 0.5).toLong
      t += 1
    }
    // γ_j numerators on the 1e-6 grid
    val g6 = Array.tabulate(lag + 1) { j =>
      var acc = 0L
      var i = j
      while (i < n) { acc += math.floor(ed(i) * ed(i - j) * 1e6 + 0.5).toLong; i += 1 }
      acc
    }
    val gamma = g6.map(g => (g / 1e6) / n)
    var lrv = gamma(0)
    var j = 1
    while (j <= lag) { lrv += 2.0 * (1.0 - j.toDouble / (lag + 1)) * gamma(j); j += 1 }
    if (lrv <= 0) None else Some(((a6 / 1e6) / lrv, n.toLong))
  }

  /** KPSS per series — one `flatMapGroups` pass (millions of series),
    * fixed Bartlett lag. `reject_*` flags compare η to the published
    * level-stationarity critical values (KPSS 1992, Table 1:
    * 0.347 / 0.463 / 0.739 at 10% / 5% / 1%) — η ABOVE the bar rejects
    * stationarity. */
  def kpssPerSeries(df: DataFrame, valueCol: String, tsCol: String,
                    seriesCol: String, lag: Int = 4,
                    tieBreak: Option[String] = None): DataFrame = {
    require(lag >= 0, s"need lag >= 0, got $lag")
    val spark = df.sparkSession
    import spark.implicits._
    val tie = tieBreak.map(col(_).cast("double")).getOrElse(lit(0.0))
    df.select(col(seriesCol).cast("long"), col(tsCol).cast("double"),
              tie, col(valueCol).cast("double"))
      .as[(Long, Double, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (sid, it) =>
        val cents = it.toArray.sortBy(t => (t._2, t._3))
          .map(t => math.floor(t._4 * 100 + 0.5).toLong)
        kpss(cents, lag) match {
          case Some((eta, n)) =>
            Iterator((sid, n, eta, eta > 0.347, eta > 0.463, eta > 0.739))
          case None => Iterator.empty
        }
      }
      .toDF(seriesCol, "n", "eta", "reject_10pct", "reject_5pct", "reject_1pct")
  }

  /** Mann–Kendall trend test (Mann 1945; Kendall 1975) on a bounded
    * series — the nonparametric trend detector (no linearity or
    * normality assumption):
    *   S = Σ_{i<j} sgn(y_j − y_i),
    *   Var(S) = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)] / 18
    * (tie-corrected), z = (S∓1)/√Var(S) with the continuity
    * correction.
    *
    * S is computed in O(n log n) — NOT the naive O(n²) pair scan — as
    * P − Q with Q the strict-inversion count from a counting merge
    * sort and P = C(n,2) − Q − T (T = same-value pairs from the tie
    * groups). Values compare on exact integer cents, so S, Var(S) and
    * T are exact integers on both engines and the only float ops are
    * one division and one sqrt. */
  def mannKendall(cents: Array[Long]): (Long, Double, Option[Double]) = {
    val (s, varNum) = mkCore(cents)
    val varS = varNum / 18.0
    val z = if (varS > 0) Some(
      if (s > 0) (s - 1) / math.sqrt(varS)
      else if (s < 0) (s + 1) / math.sqrt(varS)
      else 0.0) else None
    (s, varS, z)
  }

  /** (S, 18·Var(S)) with the variance numerator as an EXACT integer —
    * [[seasonalMannKendallPerSeries]] sums numerators across seasons and
    * divides once, so the cross-engine value never depends on
    * float-addition order. */
  private def mkCore(cents: Array[Long]): (Long, Long) = {
    val n = cents.length
    // counting merge sort: Q = #(i < j with a_i > a_j), strict
    def countInv(a: Array[Long]): Long = {
      val buf = new Array[Long](a.length)
      def go(lo: Int, hi: Int): Long = { // [lo, hi)
        if (hi - lo <= 1) 0L
        else {
          val mid = (lo + hi) >>> 1
          var inv = go(lo, mid) + go(mid, hi)
          var i = lo; var j = mid; var k = lo
          while (i < mid && j < hi) {
            if (a(j) < a(i)) { inv += mid - i; buf(k) = a(j); j += 1 }
            else { buf(k) = a(i); i += 1 }
            k += 1
          }
          while (i < mid) { buf(k) = a(i); i += 1; k += 1 }
          while (j < hi) { buf(k) = a(j); j += 1; k += 1 }
          System.arraycopy(buf, lo, a, lo, hi - lo)
          inv
        }
      }
      go(0, a.length)
    }
    val q = countInv(cents.clone())
    val total = n.toLong * (n - 1) / 2
    // tie groups from the sorted copy
    val sorted = cents.clone(); java.util.Arrays.sort(sorted)
    var ties = 0L; var tieVar = 0L
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && sorted(j) == sorted(i)) j += 1
      val t = (j - i).toLong
      ties += t * (t - 1) / 2
      tieVar += t * (t - 1) * (2 * t + 5)
      i = j
    }
    val s = (total - q - ties) - q
    (s, n.toLong * (n - 1) * (2L * n + 5) - tieVar)
  }

  /** Mann–Kendall per series — one `flatMapGroups` pass; `trend` labels
    * the two-sided 5% decision (|z| > 1.96). Degenerate series
    * (Var(S) = 0: constant, or n < 2) emit null z / no_trend. */
  def mannKendallPerSeries(df: DataFrame, valueCol: String, tsCol: String,
                           seriesCol: String,
                           tieBreak: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val tie = tieBreak.map(col(_).cast("double")).getOrElse(lit(0.0))
    df.select(col(seriesCol).cast("long"), col(tsCol).cast("double"),
              tie, col(valueCol).cast("double"))
      .as[(Long, Double, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (sid, it) =>
        val cents = it.toArray.sortBy(t => (t._2, t._3))
          .map(t => math.floor(t._4 * 100 + 0.5).toLong)
        if (cents.isEmpty) Iterator.empty
        else {
          val (s, varS, zOpt) = mannKendall(cents)
          val trend = zOpt match {
            case Some(z) if z > 1.96  => "increasing"
            case Some(z) if z < -1.96 => "decreasing"
            case Some(_)              => "no_trend"
            case None                 => null
          }
          Iterator((sid, cents.length.toLong, s, varS, zOpt,
                    Option(trend)))
        }
      }
      .toDF(seriesCol, "n", "s", "var_s", "z", "trend")
  }

  /** Pettitt changepoint test (Pettitt 1979, "A non-parametric approach
    * to the change-point problem", JRSS C 28) on a bounded series — the
    * rank-based single-changepoint locator that pairs with
    * [[mannKendall]] (same sign-pair machinery, split statistic instead
    * of global):
    *   U_t = Σ_{i≤t} Σ_{j>t} sgn(x_j − x_i),  K = max_t |U_t|,
    *   τ = first argmax,  p ≈ min(1, 2·exp(−6K² / (n³ + n²))).
    * Computed in O(n log n): U_t = U_{t−1} + V_t with
    * V_t = #{x_j > x_t} − #{x_j < x_t} read off one sorted copy —
    * never the O(n²·n) per-split scan. All counts are exact integers
    * on cents. Returns (K, τ, p); None for n < 2. */
  def pettitt(cents: Array[Long]): Option[(Long, Long, Double)] = {
    val n = cents.length
    if (n < 2) return None
    val sorted = cents.clone(); java.util.Arrays.sort(sorted)
    def lessThan(v: Long): Int = { // # strictly less via binary search
      var lo = 0; var hi = n
      while (lo < hi) { val m = (lo + hi) >>> 1; if (sorted(m) < v) lo = m + 1 else hi = m }
      lo
    }
    def atMost(v: Long): Int = {
      var lo = 0; var hi = n
      while (lo < hi) { val m = (lo + hi) >>> 1; if (sorted(m) <= v) lo = m + 1 else hi = m }
      lo
    }
    var u = 0L; var k = 0L; var tau = 1L
    var t = 0
    while (t < n - 1) { // splits after positions 1..n-1 (1-based t)
      val v = cents(t)
      val less = lessThan(v)
      val greater = n - atMost(v)
      u += greater - less
      if (math.abs(u) > k) { k = math.abs(u); tau = t + 1L }
      t += 1
    }
    val nd = n.toDouble
    val p = math.min(1.0, 2.0 * math.exp(-6.0 * k * k / (nd * nd * nd + nd * nd)))
    Some((k, tau, p))
  }

  /** Pettitt per series — one `flatMapGroups` pass; `changepoint` flags
    * p < 0.05. */
  def pettittPerSeries(df: DataFrame, valueCol: String, tsCol: String,
                       seriesCol: String,
                       tieBreak: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val tie = tieBreak.map(col(_).cast("double")).getOrElse(lit(0.0))
    df.select(col(seriesCol).cast("long"), col(tsCol).cast("double"),
              tie, col(valueCol).cast("double"))
      .as[(Long, Double, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (sid, it) =>
        val cents = it.toArray.sortBy(t => (t._2, t._3))
          .map(t => math.floor(t._4 * 100 + 0.5).toLong)
        pettitt(cents).map { case (k, tau, p) =>
          (sid, cents.length.toLong, k, tau, p, p < 0.05)
        }.iterator
      }
      .toDF(seriesCol, "n", "k_stat", "tau", "p_approx", "changepoint")
  }

  /** Theil–Sen estimator (Theil 1950; Sen 1968) on a bounded series —
    * the robust nonparametric slope completing the trend battery
    * ([[mannKendall]] decides DIRECTION, this measures MAGNITUDE,
    * both outlier-proof where OLS isn't):
    *   slope = median over pairs i<j of (y_j − y_i)/(j − i),
    *   intercept = median of (y_i − slope·i).
    * Medians are ORDER STATISTICS (the lower median at even counts,
    * ties broken by pair position) — never an interpolated percentile,
    * so both engines pick the identical element. O(n²) pairs per
    * series, bounded by the per-series contract (the oracle replays
    * the same pair set). Returns (slope, intercept, nPairs); None for
    * n < 2. */
  def theilSen(cents: Array[Long]): Option[(Double, Double, Long)] = {
    val n = cents.length
    if (n < 2) return None
    val slopes = new scala.collection.mutable.ArrayBuffer[(Double, Int, Int)](n * (n - 1) / 2)
    var i = 0
    while (i < n - 1) {
      var j = i + 1
      while (j < n) {
        slopes += (((cents(j) - cents(i)) / 100.0 / (j - i), i + 1, j + 1))
        j += 1
      }
      i += 1
    }
    val sorted = slopes.sortBy(identity)
    val slope = sorted((sorted.length - 1) / 2)._1
    val resid = Array.tabulate(n)(t => (cents(t) / 100.0 - slope * (t + 1), t + 1))
    val rSorted = resid.sortBy(identity)
    val icept = rSorted((n - 1) / 2)._1
    Some((slope, icept, slopes.length.toLong))
  }

  /** Theil–Sen per series — one `flatMapGroups` pass. */
  def theilSenPerSeries(df: DataFrame, valueCol: String, tsCol: String,
                        seriesCol: String,
                        tieBreak: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val tie = tieBreak.map(col(_).cast("double")).getOrElse(lit(0.0))
    df.select(col(seriesCol).cast("long"), col(tsCol).cast("double"),
              tie, col(valueCol).cast("double"))
      .as[(Long, Double, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (sid, it) =>
        val cents = it.toArray.sortBy(t => (t._2, t._3))
          .map(t => math.floor(t._4 * 100 + 0.5).toLong)
        theilSen(cents).map { case (slope, icept, np) =>
          (sid, cents.length.toLong, np, slope, icept)
        }.iterator
      }
      .toDF(seriesCol, "n", "n_pairs", "slope", "intercept")
  }

  /** Seasonal Mann–Kendall (Hirsch & Slack 1984, Water Resources Res.
    * 20): the [[mannKendall]] statistic computed WITHIN each season and
    * summed — trend detection that a strong seasonal cycle can't fool,
    * because no cross-season pair is ever compared:
    *   S = Σ_g S_g,  Var = Σ_g Var_g,  z = (S∓1)/√Var.
    * Input rows carry an integer season label (e.g. day-of-week from
    * portable epoch arithmetic); within a season the time order is the
    * global order restricted to that season. One `flatMapGroups` pass
    * per series, [[mannKendall]] per season group inside. */
  def seasonalMannKendallPerSeries(df: DataFrame, valueCol: String,
                                   tsCol: String, seasonCol: String,
                                   seriesCol: String,
                                   tieBreak: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val tie = tieBreak.map(col(_).cast("double")).getOrElse(lit(0.0))
    df.select(col(seriesCol).cast("long"), col(tsCol).cast("double"),
              tie, col(seasonCol).cast("long"), col(valueCol).cast("double"))
      .as[(Long, Double, Double, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (sid, it) =>
        val rows = it.toArray.sortBy(t => (t._2, t._3))
        if (rows.isEmpty) Iterator.empty
        else {
          var sTot = 0L; var varNum = 0L; var nSeasons = 0L
          rows.groupBy(_._4).toSeq.sortBy(_._1).foreach { case (_, grp) =>
            val cents = grp.map(t => math.floor(t._5 * 100 + 0.5).toLong)
            val (s, v18) = mkCore(cents)
            sTot += s; varNum += v18; nSeasons += 1
          }
          val varTot = varNum / 18.0
          val z = if (varTot > 0) Some(
            if (sTot > 0) (sTot - 1) / math.sqrt(varTot)
            else if (sTot < 0) (sTot + 1) / math.sqrt(varTot)
            else 0.0) else None
          val trend = z match {
            case Some(zz) if zz > 1.96  => "increasing"
            case Some(zz) if zz < -1.96 => "decreasing"
            case Some(_)                => "no_trend"
            case None                   => null
          }
          Iterator((sid, rows.length.toLong, nSeasons, sTot, varTot, z,
                    Option(trend)))
        }
      }
      .toDF(seriesCol, "n", "n_seasons", "s", "var_s", "z", "trend")
  }
}
