package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-free two-sample tests — the rank-based complement to
  * the parametric effect readouts ([[Cuped]], [[ExperimentDesign]]) and
  * the ECDF distances ([[graft.queries]]' a16 KS / a15 PSI): valid
  * under any metric distribution, which is what heavy-tailed
  * revenue-per-user metrics actually need. */
object RankTests {

  /** Mann–Whitney U / Wilcoxon rank-sum (Mann & Whitney 1947) of every
    * non-reference group against `refGroup`, with the normal
    * approximation and the standard tie correction:
    *   U₁ = n₁n₂ + n₁(n₁+1)/2 − R₁,
    *   σ² = n₁n₂/12 · ((n+1) − Σ(t³−t)/(n(n−1))),
    *   z = (U₁ − n₁n₂/2)/σ
    * where R₁ is the ref group's rank sum with AVERAGE ranks on ties
    * and t the tie-group sizes. Emits one row per (ref, other) pair:
    * (group, n_ref, n_other, u_ref, z).
    *
    * Determinism: average ranks live on the half-integer grid, carried
    * as DOUBLED ranks (2·avg = 2·min_rank + t − 1, pure integers), so
    * R₁ — and U₁ — are exact; Σ(t³−t) is an exact integer; z is a
    * fixed-op-order double. Scale shape: the reference sample is
    * replicated once per comparison group (|groups| bounded), then ONE
    * rank window per pair and one reduce — ranking shuffles (pair,
    * value) pairs, never the wide rows. t³ stays < 2^63 for tie groups
    * under ~2·10^6 rows. */
  def mwuTest(df: DataFrame, valueCol: String, groupCol: String,
              refGroup: String): DataFrame = {
    val vals = df.select(col(groupCol).cast("string").as("g"),
      col(valueCol).cast("long").as("v"))
    val targets = vals.select(col("g")).distinct()
      .filter(col("g") =!= refGroup).withColumnRenamed("g", "pair")
    val tagged = vals.filter(col("g") === refGroup)
      .crossJoin(broadcast(targets))
      .select(col("pair"), col("v"), lit(true).as("is_ref"))
      .unionByName(vals.filter(col("g") =!= refGroup)
        .select(col("g").as("pair"), col("v"), lit(false).as("is_ref")))
    val wOrd = Window.partitionBy(col("pair")).orderBy(col("v"))
    val wTie = Window.partitionBy(col("pair"), col("v"))
    val ranked = tagged
      .withColumn("rmin", rank().over(wOrd).cast("long"))
      .withColumn("t", count(lit(1)).over(wTie).cast("long"))
      .withColumn("r2", col("rmin") * 2L + col("t") - 1L) // 2·avg rank
    val ties = ranked.select(col("pair"), col("v"), col("t")).distinct()
      .groupBy(col("pair"))
      .agg(sum(col("t") * col("t") * col("t") - col("t")).as("tcorr"))
    ranked.groupBy(col("pair"))
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
           sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_other"),
           sum(when(col("is_ref"), col("r2")).otherwise(0L)).as("r2_ref"))
      .join(broadcast(ties), Seq("pair"))
      .withColumn("n", col("n_ref") + col("n_other"))
      .withColumn("u_ref",
        col("n_ref").cast("double") * col("n_other")
          + col("n_ref").cast("double") * (col("n_ref") + 1L) / 2.0
          - col("r2_ref").cast("double") / 2.0)
      .withColumn("sigma2",
        col("n_ref").cast("double") * col("n_other") / 12.0
          * ((col("n") + 1L).cast("double")
            - col("tcorr").cast("double")
              / (col("n").cast("double") * (col("n") - 1L))))
      .withColumn("z",
        when(col("sigma2") > 0.0,
          (col("u_ref") - col("n_ref").cast("double") * col("n_other") / 2.0)
            / sqrt(col("sigma2"))))
      .select(col("pair").as("group"), col("n_ref"), col("n_other"),
              col("u_ref"), col("z"))
  }
}
