package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-scale series diagnostics: robust anomaly flags and
  * changepoint location for EVERY series in one pass — the pre-fit data
  * audit a forecasting pipeline runs before pointing estimators at a
  * series (outliers in, garbage fit out; an undetected level shift
  * invalidates a global trend).  Both operators follow the repo's
  * determinism discipline so they are exactly oracle-checkable. */
object SeriesDiagnostics {

  /** Rolling-median/MAD anomaly flags (the Hampel filter): per row, the
    * median and MAD of the ±`halfWin` window around it; a point is
    * anomalous when |y − med| > `nSigmas`·MAD. Robust where rolling
    * mean/σ is not — one wild point inflates σ and masks itself, but
    * barely moves the median.
    *
    * Determinism: median is pinned to the LOWER sorted middle
    * (sorted[(n+1) div 2], 1-based) — no interpolation, so both engines
    * pick the same element. Shape: ONE window shuffle on the series key
    * (`collect_list` over a bounded ±halfWin frame, state O(window)),
    * then map-side array sorts of 2·halfWin+1 elements. */
  def rollingMadAnomaly(df: DataFrame, valueCol: String, tsCol: String,
                        seriesCols: Seq[String], halfWin: Int = 5,
                        nSigmas: Double = 3.5,
                        tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
      .rowsBetween(-halfWin, halfWin)
    val mid = "CAST((size(arr) + 1) div 2 AS INT)"
    df.withColumn("y", col(valueCol).cast("double"))
      .withColumn("arr", collect_list(col("y")).over(w))
      .withColumn("med", expr(s"element_at(array_sort(arr), $mid)"))
      .withColumn("mad", expr(
        s"element_at(array_sort(transform(arr, x -> abs(x - med))), $mid)"))
      .withColumn("is_anomaly",
        col("mad") > 0 && abs(col("y") - col("med")) > lit(nSigmas) * col("mad"))
      .drop("arr")
  }

  /** CUSUM changepoint locator: for each series, the position t*
    * maximizing |S_t| where S_t = Σ_{i≤t}(y_i − ȳ) — the classic
    * mean-shift statistic (Page 1954); a genuine level shift at t puts
    * the |CUSUM| peak there. Returns (series…, n, cp_t, cusum6,
    * direction) with cusum6 = n·Σ10⁶-quantized running sum at the peak.
    *
    * Determinism by construction: y is quantized to the 1e-6 grid and
    * everything after is INTEGER — the statistic is computed as
    * S'_t = n·(Σ_{i≤t} y6_i) − t·(Σ y6_i), an exact BIGINT identity
    * equal to n·10⁶·S_t, so there is no float accumulation anywhere and
    * any engine lands on identical values (running double sums would
    * differ: engines associate window sums differently). Ties break to
    * the smallest t. Shape: one window shuffle (running sum + totals on
    * the same key), one aggregate on the same key — single exchange. */
  def cusumChangepoint(df: DataFrame, valueCol: String, tsCol: String,
                       seriesCols: Seq[String],
                       tieBreak: Seq[String] = Nil): DataFrame = {
    val wOrd = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val wAll = Window.partitionBy(seriesCols.map(col): _*)
    df.withColumn("y6", floor(col(valueCol).cast("double") * 1e6 + 0.5).cast("long"))
      .withColumn("t", row_number().over(wOrd).cast("long"))
      .withColumn("run6", sum(col("y6")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("tot6", sum(col("y6")).over(wAll))
      .withColumn("s6", col("n") * col("run6") - col("t") * col("tot6"))
      .groupBy(seriesCols.map(col): _*)
      .agg(max(col("n")).as("n"),
        min_by(col("t"), struct((-abs(col("s6"))).as("a"), col("t").as("b"))).as("cp_t"),
        max(abs(col("s6"))).as("cusum6"),
        min_by(signum(col("s6")).cast("long"),
          struct((-abs(col("s6"))).as("a"), col("t").as("b"))).as("direction"))
  }
}
