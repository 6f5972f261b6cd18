package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Error-metric aggregations (SURVEY §2.5, `auto_ts/utils/metrics.py`).
  * All are single-pass declarative aggregates — partial (map-side) +
  * final, no collect. Each returns a Column usable inside any agg. */
object Metrics {

  /** A1 — RMSE (`utils/metrics.py:11-23`). */
  def rmse(y: Column, yhat: Column): Column =
    sqrt(avg(pow(y - yhat, 2)))

  /** A2 — RMSE normalized by the std of actuals (`utils/metrics.py:23,34`).
    * Uses sample std (pandas default ddof=1). */
  def normalizedRmse(y: Column, yhat: Column): Column =
    rmse(y, yhat) / stddev_samp(y)

  /** A3 — MAE (`utils/metrics.py:65-73`). */
  def mae(y: Column, yhat: Column): Column = avg(abs(y - yhat))

  /** A3 — MSE. */
  def mse(y: Column, yhat: Column): Column = avg(pow(y - yhat, 2))

  /** A3 — MAPE in percent; zero actuals contribute null, matching the
    * reference's NaN guard (`utils/metrics.py:100-112`). */
  def mape(y: Column, yhat: Column): Column =
    avg(when(y =!= 0, abs((y - yhat) / y) * 100))

  /** A4 — RMSE normalized by the actuals' range (`utils/metrics.py:109`). */
  def minMaxNormalizedRmse(y: Column, yhat: Column): Column =
    rmse(y, yhat) / (max(y) - min(y))

  /** A9 — weighted average (`np.average(..., weights)`, `utils/val.py:108`). */
  def weightedAvg(x: Column, w: Column): Column = sum(x * w) / sum(w)

  /** All standard metrics in one aggregate pass. */
  def allMetrics(df: DataFrame, yCol: String, yhatCol: String,
                 groupCols: Seq[String] = Nil): DataFrame = {
    val y = col(yCol); val yh = col(yhatCol)
    val aggs = Seq(
      rmse(y, yh).as("rmse"),
      normalizedRmse(y, yh).as("norm_rmse"),
      mae(y, yh).as("mae"),
      mse(y, yh).as("mse"),
      mape(y, yh).as("mape"),
      minMaxNormalizedRmse(y, yh).as("minmax_rmse"),
      count(lit(1)).as("n"))
    if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
