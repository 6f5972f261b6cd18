package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quantile profiling (per-column percentiles drive the reference's EDA
  * and our corpus length/quality cut-offs).
  *
  * Exact `percentile` materializes every value per group — correct but
  * shuffle-heavy; it is the ORACLE path. At 100 TB use [[approx]]
  * (t-digest `approx_percentile`): mergeable sketches, map-side partials,
  * bounded memory — the error bound is spec-tested against exact. */
object Quantiles {

  /** Exact linear-interpolation percentiles of `valueCol` per group. */
  def exact(df: DataFrame, valueCol: String, groupCols: Seq[String],
            probs: Seq[Double]): DataFrame = {
    val arr = probs.map(p => s"${p}D").mkString("array(", ", ", ")")
    val g = df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile($valueCol, $arr)").as("qs"),
           count(lit(1)).as("n"))
    probs.zipWithIndex.foldLeft(g) { case (d, (p, i)) =>
      d.withColumn(s"q${(p * 100).round}", element_at(col("qs"), i + 1))
    }.drop("qs")
  }

  /** Sketch-based percentiles (the 100 TB path). `accuracy` trades memory
    * for error: 1/accuracy relative rank error. */
  def approx(df: DataFrame, valueCol: String, groupCols: Seq[String],
             probs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val arr = probs.map(p => s"${p}D").mkString("array(", ", ", ")")
    val g = df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"approx_percentile($valueCol, $arr, $accuracy)").as("qs"),
           count(lit(1)).as("n"))
    probs.zipWithIndex.foldLeft(g) { case (d, (p, i)) =>
      d.withColumn(s"q${(p * 100).round}", element_at(col("qs"), i + 1))
    }.drop("qs")
  }
}
