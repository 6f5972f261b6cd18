package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema contract for every model (SURVEY §1.3): explicit event-time
  * column, one target, remaining columns exogenous. */
case class TsSchema(tsCol: String, target: String, exog: Seq[String] = Nil)

/** A fitted model's CV outcome: per-fold RMSEs + normalized RMSEs
  * (reference keeps both, `build_arima_base.py:193-199`). */
case class CvScores(foldRmse: Seq[Double], foldNormRmse: Seq[Double]) {
  def meanRmse: Double =
    if (foldRmse.isEmpty) Double.PositiveInfinity else foldRmse.sum / foldRmse.size
  def meanNormRmse: Double =
    if (foldNormRmse.isEmpty) Double.PositiveInfinity else foldNormRmse.sum / foldNormRmse.size
}

/** The reference's model contract (`models/build_base.py:8-91`): fit with
  * expanding-window CV, refit on the full series, forecast h steps ahead
  * returning the S5 sink schema (ts, yhat, mean_se, mean_ci_lower,
  * mean_ci_upper — `build_ml.py:674-683`). */
trait ModelBuild {
  def name: String

  /** Fit with `cv` expanding folds of horizon `h`; returns CV scores and
    * leaves the model refit on the full series. */
  def fit(df: DataFrame, schema: TsSchema, cv: Int, h: Int): CvScores

  /** Forecast `h` periods past the end of the training series. Exogenous
    * future values, when the model uses them, come from `future`. */
  def predict(spark: SparkSession, h: Int, future: Option[DataFrame] = None): DataFrame

  /** Persist the FITTED state to `dir` so predict survives the session
    * (reference `saved_model` at predict, `__init__.py:953-956`). Reload
    * with [[ModelIO.load]] — predictions are row-identical. */
  def save(dir: String): Unit
}

/** Collected bounded series (the unit local estimators work on — the
  * reference is single-series; at scale the same math runs once per
  * series inside flatMapGroups). */
object FutureExog {
  /** Collect a future frame's exog columns in ts order (shared by every
    * model that supports known-future exog at predict time). Bounded by
    * the forecast horizon. */
  def collect(f: org.apache.spark.sql.DataFrame, tsCol: String,
              exog: Seq[String]): Array[Array[Double]] = {
    import org.apache.spark.sql.functions.col
    f.orderBy(col(tsCol))
      .select(exog.map(c => col(c).cast("double")): _*)
      .collect().map(r => exog.indices.map(r.getDouble).toArray)
  }
}

case class LocalSeries(ts: Array[Long], y: Array[Double], exog: Array[Array[Double]]) {
  def n: Int = y.length
}

object LocalSeries {
  import org.apache.spark.sql.functions._

  /** Collect one bounded series to the driver, ordered by time.
    * Deliberately mirrors the reference contract (pandas in-memory); the
    * many-series scale path goes through flatMapGroups instead. */
  def collect(df: DataFrame, schema: TsSchema): LocalSeries = {
    val cols = Seq(col(schema.tsCol).cast("timestamp").cast("double") * 1000)
      .++(Seq(col(schema.target).cast("double")))
      .++(schema.exog.map(c => col(c).cast("double")))
    val rows = df.select(cols: _*).orderBy(col(schema.tsCol)).collect()
    LocalSeries(
      rows.map(_.getDouble(0).toLong),
      rows.map(_.getDouble(1)),
      rows.map(r => Array.tabulate(schema.exog.size)(i => r.getDouble(2 + i))))
  }

  /** RMSE + normalized RMSE of a forecast against actuals. */
  def score(actual: Array[Double], pred: Array[Double]): (Double, Double) = {
    val n = actual.length
    val rmse = math.sqrt(actual.zip(pred).map { case (a, p) => (a - p) * (a - p) }.sum / n)
    val mean = actual.sum / n
    val sd = math.sqrt(actual.map(a => (a - mean) * (a - mean)).sum / math.max(n - 1, 1))
    (rmse, if (sd > 0) rmse / sd else rmse)
  }

  /** Expanding-window fold boundaries on a local array (same arithmetic
    * as graft.cv.ExpandingWindowSplit). */
  def foldBounds(n: Int, cv: Int, h: Int): Seq[(Int, Int)] =
    graft.cv.ExpandingWindowSplit.folds(n, cv, h)
      .map(f => (f.trainEnd.toInt, f.testEnd.toInt))
}
