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
}
