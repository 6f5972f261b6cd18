package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Group-sequential monitoring with O'Brien–Fleming-shaped boundaries
    * (O'Brien & Fleming 1979; the √(K/k) closed form per Pocock 1977's
    * framing): split the experiment window into `k` equal calendar
    * looks, compute the cumulative Welch z between the two md5
    * half-space arms at each look, and compare |z| against
    * b_k = z_{0.975}·√(K/k) — wide early, nominal at the final look,
    * the boundary family that lets an A/B platform peek K times while
    * holding overall α ≈ 0.05. A `crossed` look means the experiment
    * can stop early.
    *
    * Determinism: the look index is pure integer arithmetic on epoch
    * micros (((ts−t0)·K) div (t1−t0+1) + 1), arm sums fold the cents
    * grid exactly, and z/bound are fixed-op-order doubles off exact
    * integer moments. Scale shape: one reduce to 2K partial-moment
    * rows, one K-row cumulative window — the data shuffles once. */
  def sequentialLooks(df: DataFrame, idCol: String, valueCol: String,
                      tsCol: String, k: Int = 5,
                      salt: Long = 1L): DataFrame = {
    require(k >= 2, s"need k >= 2 looks, got $k")
    import org.apache.spark.sql.expressions.Window
    val span = df.agg(min(unix_micros(col(tsCol))).as("t0"),
                      max(unix_micros(col(tsCol))).as("t1"))
    val wCum = Window.orderBy(col("look"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val looks = df
      .crossJoin(broadcast(span))
      .withColumn("look",
        least(lit(k.toLong),
          expr(s"((unix_micros($tsCol) - t0) * $k) div (t1 - t0 + 1)") + 1L))
      .withColumn("in_a",
        md5(concat(col(idCol).cast("string"), lit(":"), lit(salt))) < lit("8000"))
      .withColumn("c", floor(col(valueCol) * 100 + 0.5).cast("long"))
      .groupBy(col("look"))
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("pna"),
           sum(when(col("in_a"), col("c")).otherwise(0L)).as("psa"),
           sum(when(col("in_a"), col("c") * col("c")).otherwise(0L)).as("pssa"),
           sum(when(!col("in_a"), 1L).otherwise(0L)).as("pnb"),
           sum(when(!col("in_a"), col("c")).otherwise(0L)).as("psb"),
           sum(when(!col("in_a"), col("c") * col("c")).otherwise(0L)).as("pssb"))
    looks
      .withColumn("n_a", sum(col("pna")).over(wCum))
      .withColumn("s_a", sum(col("psa")).over(wCum))
      .withColumn("ss_a", sum(col("pssa")).over(wCum))
      .withColumn("n_b", sum(col("pnb")).over(wCum))
      .withColumn("s_b", sum(col("psb")).over(wCum))
      .withColumn("ss_b", sum(col("pssb")).over(wCum))
      .filter(col("n_a") >= 2 && col("n_b") >= 2)
      .withColumn("m_a", col("s_a").cast("double") / col("n_a") / 100.0)
      .withColumn("m_b", col("s_b").cast("double") / col("n_b") / 100.0)
      .withColumn("v_a",
        (col("ss_a").cast("double")
          - col("s_a").cast("double") * col("s_a") / col("n_a"))
          / (col("n_a") - 1.0) / 10000.0)
      .withColumn("v_b",
        (col("ss_b").cast("double")
          - col("s_b").cast("double") * col("s_b") / col("n_b"))
          / (col("n_b") - 1.0) / 10000.0)
      .withColumn("z",
        (col("m_a") - col("m_b"))
          / sqrt(col("v_a") / col("n_a") + col("v_b") / col("n_b")))
      .withColumn("bound", lit(z975) * sqrt(lit(k.toDouble) / col("look")))
      .withColumn("crossed", abs(col("z")) > col("bound"))
      .select(col("look"), col("n_a"), col("n_b"), col("m_a"), col("m_b"),
              col("z"), col("bound"), col("crossed"))
  }

  /** Two-proportion z-test + unpooled CI between the md5 half-space
    * arms, per salt — the CONVERSION-rate companion to [[mdeByGroup]]'s
    * mean-metric sizing (Kohavi et al. 2020 ch. 17's default binary
    * readout): per unit, converted = satisfies `convCol`; per salt,
    *   z = (p̂_a − p̂_b) / √(p̂(1−p̂)(1/n_a + 1/n_b))   (pooled p̂)
    *   CI = (p̂_a − p̂_b) ± z_{.975}·√(p̂_a(1−p̂_a)/n_a + p̂_b(1−p̂_b)/n_b).
    * A null hash split should flag ≈ 5% of salts by construction.
    *
    * Determinism: all counts exact integers from one distinct-unit
    * reduce; proportions/z/CI fixed-op-order doubles. Shape: one
    * distinct-unit aggregate, salts explode map-side (the srmCheck
    * scan), |salts| output rows. */
  def twoProportionZ(df: DataFrame, idCol: String, convCol: Column,
                     salts: Seq[Int]): DataFrame = {
    require(salts.nonEmpty, "need at least one salt")
    val units = df.groupBy(col(idCol).cast("string").as("u"))
      .agg(max(when(convCol, 1L).otherwise(0L)).as("conv"))
    units
      .withColumn("salt", explode(array(salts.map(s => lit(s.toLong)): _*)))
      .withColumn("in_a",
        md5(concat(col("u"), lit(":"), col("salt"))) < lit("8000"))
      .groupBy(col("salt"))
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
           sum(when(col("in_a"), col("conv")).otherwise(0L)).as("x_a"),
           sum(when(!col("in_a"), 1L).otherwise(0L)).as("n_b"),
           sum(when(!col("in_a"), col("conv")).otherwise(0L)).as("x_b"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .withColumn("p_a", col("x_a").cast("double") / col("n_a"))
      .withColumn("p_b", col("x_b").cast("double") / col("n_b"))
      .withColumn("p_pool",
        (col("x_a") + col("x_b")).cast("double") / (col("n_a") + col("n_b")))
      .withColumn("z",
        when(col("p_pool") > 0.0 && col("p_pool") < 1.0,
          (col("p_a") - col("p_b"))
            / sqrt(col("p_pool") * (lit(1.0) - col("p_pool"))
              * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))))
      .withColumn("se_unpooled",
        sqrt(col("p_a") * (lit(1.0) - col("p_a")) / col("n_a")
          + col("p_b") * (lit(1.0) - col("p_b")) / col("n_b")))
      .withColumn("ci_lo", col("p_a") - col("p_b") - lit(z975) * col("se_unpooled"))
      .withColumn("ci_hi", col("p_a") - col("p_b") + lit(z975) * col("se_unpooled"))
      .select(col("salt"), col("n_a"), col("x_a"), col("n_b"), col("x_b"),
              col("p_a"), col("p_b"), col("z"), col("ci_lo"), col("ci_hi"))
  }
}
