package graft.models

import breeze.linalg.DenseVector
import breeze.optimize.{ApproximateGradientFunction, DiffFunction, LBFGS}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** M1–M3 — ARIMA(p,d,q) by conditional sum of squares (CSS) + grid search.
  *
  * The reference grid-searches itertools.product(p≤3, d≤1, q≤3) fitting
  * statsmodels ARIMA per cell and keeping min AIC/BIC with a 100-fit cap
  * (`models/ar_based/build_arima.py:37-186`). Here the objective is the
  * standard CSS innovations recursion minimized with L-BFGS (Breeze), and
  * the GRID is evaluated as a Spark job over a broadcast series — each
  * (p,d,q) cell is one task (SURVEY §4: the parallel-estimator scheduler),
  * which is exactly how the search scales on a cluster. */
object ArimaCss {

  case class Fit(p: Int, d: Int, q: Int, phi: Array[Double], theta: Array[Double],
                 c: Double, sigma2: Double, aic: Double, n: Int)

  /** CSS objective: innovations recursion e_t = w_t - c - Σφw - Σθe. */
  private def cssResiduals(w: Array[Double], c: Double,
                           phi: Array[Double], theta: Array[Double]): Array[Double] = {
    val p = phi.length; val q = theta.length
    val n = w.length
    val e = new Array[Double](n)
    val start = p
    var t = start
    while (t < n) {
      var pred = c
      var i = 0
      while (i < p) { pred += phi(i) * w(t - 1 - i); i += 1 }
      var j = 0
      while (j < q) { if (t - 1 - j >= start) pred += theta(j) * e(t - 1 - j); j += 1 }
      e(t) = w(t) - pred
      t += 1
    }
    e.drop(start)
  }

  private def diff(y: Array[Double], d: Int): Array[Double] =
    (0 until d).foldLeft(y)((cur, _) => cur.sliding(2).map(a => a(1) - a(0)).toArray)

  /** Fit one (p,d,q) cell by CSS/L-BFGS. */
  def fitOne(y: Array[Double], p: Int, d: Int, q: Int): Fit = {
    val w = diff(y, d)
    val n = w.length
    require(n > p + q + 2, s"series too short for ARIMA($p,$d,$q)")
    val obj = new DiffFunction[DenseVector[Double]] {
      private val inner = new ApproximateGradientFunction[Int, DenseVector[Double]](
        (x: DenseVector[Double]) => {
          val c = x(0)
          val phi = Array.tabulate(p)(i => x(1 + i))
          val theta = Array.tabulate(q)(j => x(1 + p + j))
          val e = cssResiduals(w, c, phi, theta)
          0.5 * e.map(v => v * v).sum
        })
      def calculate(x: DenseVector[Double]): (Double, DenseVector[Double]) = inner.calculate(x)
    }
    val init = DenseVector.zeros[Double](1 + p + q)
    init(0) = w.sum / n // start intercept at the mean
    val lbfgs = new LBFGS[DenseVector[Double]](maxIter = 200, m = 7)
    val xOpt = lbfgs.minimize(obj, init)
    val c = xOpt(0)
    val phi = Array.tabulate(p)(i => xOpt(1 + i))
    val theta = Array.tabulate(q)(j => xOpt(1 + p + j))
    val e = cssResiduals(w, c, phi, theta)
    val ne = e.length
    val sigma2 = e.map(v => v * v).sum / ne
    val k = p + q + 1
    val aic = ne * math.log(math.max(sigma2, 1e-300)) + 2.0 * (k + 1)
    Fit(p, d, q, phi, theta, c, sigma2, aic, ne)
  }

  /** Grid search as a Spark job over the broadcast series: one task per
    * (p,d,q) cell, min-AIC wins; budget-capped like the reference
    * (`param_finder.py:94-99`). */
  def gridSearch(spark: SparkSession, y: Array[Double],
                 maxP: Int = 3, maxD: Int = 1, maxQ: Int = 3,
                 budget: Int = 100): Fit = {
    val grid = (for {
      p <- 0 to maxP; d <- 0 to maxD; q <- 0 to maxQ
      if p + q > 0 && y.length - d > p + q + 8
    } yield (p, d, q)).take(budget)
    val bc = spark.sparkContext.broadcast(y)
    val fits = spark.sparkContext
      .parallelize(grid, grid.size)
      .map { case (p, d, q) =>
        try Some(fitOne(bc.value, p, d, q))
        catch { case _: Throwable => None }
      }
      .collect().flatten
    bc.destroy()
    require(fits.nonEmpty, "no ARIMA cell converged")
    fits.minBy(_.aic)
  }

  /** Recursive h-step forecast on the differenced scale, then inverse
    * differencing (cumsum restore, `build_pyflux.py:91-106` semantics). */
  def forecast(y: Array[Double], fit: Fit, h: Int): Array[Double] = {
    val w = diff(y, fit.d)
    val e = cssResiduals(w, fit.c, fit.phi, fit.theta)
    val eAll = Array.fill(fit.p)(0.0) ++ e // re-align residual indexing to w
    val wBuf = scala.collection.mutable.ArrayBuffer(w.toIndexedSeq: _*)
    val eBuf = scala.collection.mutable.ArrayBuffer(eAll.toIndexedSeq: _*)
    val out = new Array[Double](h)
    for (i <- 0 until h) {
      val t = wBuf.length
      var pred = fit.c
      for (j <- 0 until fit.p) pred += fit.phi(j) * wBuf(t - 1 - j)
      for (j <- 0 until fit.q; if t - 1 - j < e.length + fit.p && t - 1 - j >= 0)
        pred += fit.theta(j) * eBuf(t - 1 - j)
      wBuf += pred
      eBuf += 0.0 // future innovations have expectation 0
      out(i) = pred
    }
    if (fit.d == 0) out
    else {
      // inverse differencing: cumsum anchored at the last observed level(s)
      var cur = out
      for (_ <- 0 until fit.d) {
        var anchor = y.last // exact only for d=1; d≤1 in the reference grid
        cur = cur.map { dv => anchor += dv; anchor }
      }
      cur
    }
  }
}

/** ModelBuild wrapper: auto-ARIMA (grid-searched CSS) with expanding CV. */
class ArimaModel(maxP: Int = 3, maxD: Int = 1, maxQ: Int = 3) extends ModelBuild {
  val name = "auto_SARIMAX"

  private var series: LocalSeries = _
  private var intervalMs: Long = _
  private var best: ArimaCss.Fit = _

  def fit(df: DataFrame, schema: TsSchema, cv: Int, h: Int): CvScores = {
    series = LocalSeries.collect(df, schema)
    intervalMs = if (series.n >= 2) series.ts(1) - series.ts(0) else 86400000L
    val spark = df.sparkSession
    val scores = LocalSeries.foldBounds(series.n, cv, h).map { case (trainEnd, testEnd) =>
      val train = series.y.take(trainEnd)
      val f = ArimaCss.gridSearch(spark, train, maxP, maxD, maxQ)
      val pred = ArimaCss.forecast(train, f, testEnd - trainEnd)
      LocalSeries.score(series.y.slice(trainEnd, testEnd), pred)
    }
    best = ArimaCss.gridSearch(spark, series.y, maxP, maxD, maxQ)
    CvScores(scores.map(_._1), scores.map(_._2))
  }

  def predict(spark: SparkSession, h: Int, future: Option[DataFrame] = None): DataFrame = {
    val pred = ArimaCss.forecast(series.y, best, h)
    ForecastFrame.build(spark, series.ts.last, intervalMs, pred, math.sqrt(best.sigma2))
  }

  def bestOrder: (Int, Int, Int) = (best.p, best.d, best.q)
}
