package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Experiment-design gates that run BEFORE/ALONGSIDE the effect readouts
  * in [[Cuped]] and the ratio-CI machinery: sample-ratio-mismatch (the
  * assignment-integrity check every A/B platform fires first) and
  * minimum-detectable-effect sizing (the power-analysis readout that
  * says whether a metric can support a decision at the current n).
  *
  * Both are one map-side-combined aggregate over the unit table — no
  * state, no windows — so they run at any scale the metric aggregates
  * run at. */
object ExperimentDesign {

  /** z-quantiles as shared literals (no erf⁻¹ inside either engine):
    * two-sided α = 0.05 and power = 0.80 — the industry-default sizing. */
  val z975 = 1.959963984540054
  val z80 = 0.8416212335729143

  /** Sample-ratio mismatch over md5 hash assignments: for each salt,
    * units split 50/50 by the md5 half-space fence (the [[graft.scale
    * .Sampling.hashSplit]] convention); χ² goodness-of-fit with 1 df
    * against the expected equal split, flagged at the 5% critical value
    * 3.841458820694124 (a literal — no CDF inside the engines). A true
    * 50/50 hash split should essentially never flag; a flagged salt
    * means the assignment channel itself is biased (the Kohavi et al.
    * 2012 trustworthiness rule: don't read the experiment, fix the
    * instrument). One distinct-units pass, |salts| map-side counters. */
  def srmCheck(df: DataFrame, idCol: String, salts: Seq[Int]): DataFrame = {
    require(salts.nonEmpty, "need at least one salt")
    val units = df.select(col(idCol).cast("string").as("u")).distinct()
    // one pass: salts explode map-side (8-byte pairs), one combined reduce
    units
      .withColumn("salt", explode(array(salts.map(s => lit(s.toLong)): _*)))
      .withColumn("in_a",
        md5(concat(col("u"), lit(":"), col("salt"))) < lit("8000"))
      .groupBy(col("salt"))
      .agg(count(lit(1)).cast("long").as("n"),
           sum(when(col("in_a"), 1L).otherwise(0L)).cast("long").as("n_a"))
      .withColumn("n_b", col("n") - col("n_a"))
      .withColumn("e", col("n").cast("double") / 2.0)
      .withColumn("chi2",
        (col("n_a") - col("e")) * (col("n_a") - col("e")) / col("e")
          + (col("n_b") - col("e")) * (col("n_b") - col("e")) / col("e"))
      .withColumn("srm", col("chi2") > 3.841458820694124)
      .select(col("salt"), col("n"), col("n_a"), col("n_b"),
              col("chi2"), col("srm"))
  }

  /** Minimum detectable effect per metric group: for a two-arm test that
    * would split the observed units evenly, MDE_abs =
    * (z_{0.975} + z_{0.80})·σ·√(2/n_arm) with σ the sample standard
    * deviation of the per-unit metric and n_arm = n div 2 —
    * the standard two-sample power closed form (e.g. van Belle 2002).
    * Emits (group, n_units, mean, sigma, mde_abs, mde_rel).
    *
    * Determinism: the per-unit metric is folded on the cents grid
    * (exact BIGINT sums), σ² from exact integer moments under one
    * correctly-rounded sqrt. Two shuffles total (unit reduce, group
    * reduce), both map-side combined. */
  def mdeByGroup(df: DataFrame, valueCol: String, idCol: String,
                 groupCol: String): DataFrame = {
    val perUnit = df.groupBy(col(groupCol), col(idCol))
      .agg(sum(floor(col(valueCol) * 100 + 0.5).cast("long")).as("c"))
    perUnit.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_units"),
           sum(col("c")).as("sc"),
           sum(col("c") * col("c")).as("scc"))
      .filter(col("n_units") >= 4)
      .withColumn("nd", col("n_units").cast("double"))
      .withColumn("mean", col("sc").cast("double") / col("nd") / 100.0)
      .withColumn("var",
        (col("scc").cast("double") - col("sc").cast("double") * col("sc") / col("nd"))
          / (col("nd") - 1.0) / 10000.0)
      .withColumn("sigma", sqrt(col("var")))
      .withColumn("n_arm", expr("n_units div 2").cast("double"))
      .withColumn("mde_abs",
        lit(z975 + z80) * col("sigma") * sqrt(lit(2.0) / col("n_arm")))
      .withColumn("mde_rel", col("mde_abs") / col("mean"))
      .select(col(groupCol), col("n_units"), col("mean"), col("sigma"),
              col("mde_abs"), col("mde_rel"))
  }
}
