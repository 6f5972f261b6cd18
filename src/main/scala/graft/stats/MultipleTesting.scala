package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multiple-testing corrections over a family of per-group test results
  * — the gate that sits AFTER the per-group batteries ([[StatTests]],
  * [[Econometrics]], [[ExperimentDesign]]) when thousands of series /
  * segments / metrics are tested at once and raw p < 0.05 would flag
  * 5% of them by construction. */
object MultipleTesting {

  /** Benjamini–Hochberg step-up FDR control (Benjamini & Hochberg 1995,
    * "Controlling the false discovery rate"): sort the m p-values
    * ascending, find the largest i with p_(i) <= i·q/m, reject tests
    * 1..i. Emits every input row plus (rank, m, p_adj, reject) where
    * p_adj is the monotone adjusted p-value min_{j>=i}(m·p_(j)/j) capped
    * at 1 — reject ⇔ p_adj <= q, the standard report form.
    *
    * Determinism contract: p-values are quantized to the 1e-9 grid
    * (BIGINT — the repo-wide fold grid, coarse enough to absorb 1-ulp
    * libm differences in an upstream exp()/pow()) before ANY ranking or
    * arithmetic, so ordering, ranks and the adjusted values are
    * bit-identical cross-engine; m·p9 stays < 2^63 for m < 9·10^9
    * tests. Ties order by `idCol` (a unique key).
    *
    * Scale shape: one total-order sort of m rows (m = number of TESTS,
    * not data rows — the heavy per-group reduction happened upstream)
    * plus two windows over that same order; a single exchange. */
  def bhAdjust(df: DataFrame, pCol: String, idCol: String,
               q: Double = 0.1): DataFrame = {
    require(q > 0 && q < 1, s"need 0 < q < 1, got $q")
    val wOrd = Window.orderBy(col("__p9"), col(idCol))
    val wAll = Window.partitionBy()
    val wSuffix = Window.orderBy(col("rank"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    df.withColumn("__p9",
        floor(col(pCol).cast("double") * lit(1e9) + lit(0.5)).cast("long"))
      .withColumn("rank", row_number().over(wOrd).cast("long"))
      .withColumn("m", count(lit(1)).over(wAll).cast("long"))
      .withColumn("__raw",
        (col("m") * col("__p9")).cast("double") / col("rank") / lit(1e9))
      .withColumn("p_adj", least(min(col("__raw")).over(wSuffix), lit(1.0)))
      .withColumn("reject", col("p_adj") <= q)
      .drop("__p9", "__raw")
  }
}
