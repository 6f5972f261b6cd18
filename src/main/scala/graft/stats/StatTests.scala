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
                       stationary: Boolean)

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
    AdfResult(stat, bestLag, nobs, c1, c5, c10, stat < c5)
  }

  /** M11 — Durbin–Watson statistic on a residual vector
    * (`ts_model_validation`, `utils/val.py:135-173`). */
  def durbinWatson(resid: Array[Double]): Double = {
    val num = resid.sliding(2).map { case Array(a, b) => (b - a) * (b - a) }.sum
    val den = resid.map(r => r * r).sum
    num / den
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
            case Some(r) => Iterator((sid, r.stat, r.lagUsed.toLong, r.nObs.toLong, r.stationary))
            case None    => Iterator.empty
          }
      }
      .toDF(seriesCol, "adf_stat", "lag_used", "n_obs", "stationary")
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
}
