package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.models.ArimaCss

/** Per-series ARIMA at scale: ONE `flatMapGroups` pass fits an
  * independent CSS model per series and emits its h-step forecast —
  * thousands-to-millions of series in parallel, each bounded in task
  * memory (the same local estimator the single-series `ArimaModel`
  * wraps; SURVEY §4's per-group fitting pattern, the complement of the
  * broadcast-grid search which parallelizes over CELLS of one series).
  * Degenerate series (constant, too short, non-converging) are skipped,
  * not fatal. */
object PerSeriesArima {

  /** Fit `spec` per series, forecast `h` steps.
    * Output: (seriesCol, h, yhat). */
  def forecastPerSeries(df: DataFrame, valueCol: String, tsCol: String,
                        seriesCol: String, spec: ArimaCss.Spec,
                        h: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(seriesCol).cast("long"), col(tsCol).cast("double"),
              col(valueCol).cast("double"))
      .as[(Long, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (sid, it) =>
        // (ts, value) sort: deterministic even with duplicate timestamps
        val y = it.toArray.sortBy(t => (t._2, t._3)).map(_._3)
        scala.util.Try {
          val fit = ArimaCss.fitOne(y, spec)
          val fc = ArimaCss.forecast(y, fit, h)
          fc.iterator.zipWithIndex.map { case (v, i) => (sid, (i + 1).toLong, v) }
        }.getOrElse(Iterator.empty)
      }
      .toDF(seriesCol, "h", "yhat")
  }
}
