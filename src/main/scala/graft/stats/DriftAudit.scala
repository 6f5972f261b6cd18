package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift audits between dataset splits — the check a
  * training pipeline runs before trusting a train/validation split or
  * before promoting a new data snapshot: has the feature distribution
  * moved?  (The reference's CV machinery assumes exchangeable folds;
  * these operators make that assumption testable at corpus scale.)
  *
  * Scale shape: both audits are two tiny aggregates over the full data —
  * a 2-row min/max scan broadcast back, then one map-side bin assignment
  * and a |bins|·|splits|-row count shuffle. The corpus itself never
  * sorts and never moves twice; output is O(bins), driver-safe at any
  * input size. */
object DriftAudit {

  /** Population Stability Index between the two values of `splitCol`,
    * over fixed-width bins of `valueCol` spanning the POOLED min/max
    * (shared edges are what make the two histograms comparable).
    *
    * Per bin i:  psi_i = (p_i − q_i) · ln(p_i / q_i), with Laplace-
    * smoothed shares p_i = (n_i + ½)/(N + ½·bins) so empty bins stay
    * finite (the standard guard).  Σ psi_i < 0.1 is the conventional
    * "no drift" read, 0.1–0.25 moderate, > 0.25 action.
    *
    * Emits ONE ROW PER BIN (bin, counts, shares, psi term) rather than a
    * pre-summed scalar — per-row arithmetic is exactly replayable
    * cross-engine, and the caller's Σ is over `bins` rows, not data. */
  def psiBins(df: DataFrame, valueCol: String, splitCol: String,
              bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need >= 2 bins, got $bins")
    val v = col(valueCol).cast("double")
    val mm = df.agg(min(v).as("lo"), max(v).as("hi"))
    val binned = df.crossJoin(broadcast(mm))
      .withColumn("bin",
        when(col("hi") === col("lo"), lit(0))
          .otherwise(least(
            floor((v - col("lo")) / (col("hi") - col("lo")) * bins).cast("int"),
            lit(bins - 1))))
      .groupBy(col("bin"))
      .pivot(splitCol)
      .count()
    val Array(a, b) = binned.columns.filter(_ != "bin").sorted
    val cnt = (c: String) => coalesce(col(s"`$c`"), lit(0L))
    // totals come from the O(bins) count table, NOT a second corpus
    // scan: Σ over ≤`bins` rows is free and keeps the plan at one
    // data-sized shuffle (the bin/pivot aggregate)
    val withCnt = binned.withColumn("n_a", cnt(a)).withColumn("n_b", cnt(b))
    val withTot = withCnt.crossJoin(broadcast(
      withCnt.agg(sum(col("n_a")).as("tot_a"), sum(col("n_b")).as("tot_b"))))
    withTot
      .withColumn("p_a", (col("n_a") + 0.5) / (col("tot_a") + 0.5 * bins))
      .withColumn("p_b", (col("n_b") + 0.5) / (col("tot_b") + 0.5 * bins))
      .withColumn("psi", (col("p_a") - col("p_b")) * log(col("p_a") / col("p_b")))
      .select(col("bin"), col("n_a"), col("n_b"), col("p_a"), col("p_b"), col("psi"))
  }

  /** Chi-square test of independence between two categorical columns —
    * the EDA association audit ("does event mix depend on weekday?").
    * Observed cells come from ONE (a, b) count shuffle; the expected
    * grid (row totals × column totals / N) is |a|·|b| rows of broadcast
    * arithmetic, with UNOBSERVED cells grid-completed (they still
    * contribute their expected mass — skipping them understates χ²).
    * Terms quantize to the 1e-9 grid and sum as BIGINT.
    *
    * Emits (n, r, c, dof, chi2); get the p-value from
    * [[StatTests.chiSquareSf]] on the driver side — the survival
    * function is a scalar, not a dataflow. */
  def chiSquareIndependence(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    val rowT = obs.groupBy(col("a")).agg(sum(col("o")).as("ra"))
    val colT = obs.groupBy(col("b")).agg(sum(col("o")).as("cb"))
    val tot = obs.agg(sum(col("o")).as("n"),
      countDistinct(col("a")).as("r"), countDistinct(col("b")).as("c"))
    rowT.crossJoin(colT)
      .join(obs, Seq("a", "b"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("e", col("ra") * col("cb") / col("n").cast("double"))
      .withColumn("term9",
        floor((col("o") - col("e")) * (col("o") - col("e")) / col("e") * 1e9 + 0.5)
          .cast("long"))
      .groupBy(col("n"), col("r"), col("c"))
      .agg((sum(col("term9")) / 1e9).as("chi2"))
      .withColumn("dof", ((col("r") - 1) * (col("c") - 1)).cast("long"))
      .select(col("n"), col("r"), col("c"), col("dof"), col("chi2"))
  }

  /** Two-sample Kolmogorov–Smirnov distance between the `splitCol`
    * groups: D = max_x |F_a(x) − F_b(x)|, computed exactly on the pooled
    * ORDER STATISTICS — one global sort of the (value, split) pairs, a
    * running-count window, and a 1-row max. Ties are resolved the
    * standard way (CDF steps AFTER all equal values: evaluate the gap at
    * each distinct value's last row). The D statistic is a ratio of
    * integer counts — exact cross-engine, no float accumulation.
    *
    * CONTRACT: the final running count is an unpartitioned window —
    * Spark executes it in one task over the DISTINCT-VALUE table (not
    * the corpus; ties are pre-aggregated by the grouped count). That is
    * exact and fine up to ~10⁸ distinct values; for routine 100-TB
    * monitoring use [[psiBins]] (fixed output size), or pre-quantize
    * `valueCol` to a grid so the distinct table is bounded. Same
    * oracle-twin pattern as d5: the exact form IS the contract. */
  def ksStatistic(df: DataFrame, valueCol: String, splitCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol).cast("double")
    val tots = df.groupBy(col(splitCol)).count()
    val labels = tots.collect().map(_.get(0).toString).sorted  // bounded label set
    require(labels.length == 2,
      s"two-sample statistic needs exactly 2 values of '$splitCol'; " +
        s"got ${labels.length}: ${labels.take(5).mkString(", ")}")
    val Array(a, b) = labels
    val byVal = df
      .withColumn("ia", when(col(splitCol) === a, 1L).otherwise(0L))
      .withColumn("ib", when(col(splitCol) === b, 1L).otherwise(0L))
      .groupBy(v.as("x"))
      .agg(sum(col("ia")).as("ca"), sum(col("ib")).as("cb"))
      .withColumn("ra", sum(col("ca")).over(Window.orderBy(col("x"))))
      .withColumn("rb", sum(col("cb")).over(Window.orderBy(col("x"))))
    byVal
      .crossJoin(broadcast(
        tots.groupBy()
          .agg(sum(when(col(splitCol) === a, col("count"))).as("na"),
               sum(when(col(splitCol) === b, col("count"))).as("nb"))))
      .select(max(abs(col("ra") * col("nb") - col("rb") * col("na"))).as("d_num"),
              first(col("na") * col("nb")).as("d_den"))
      .select((col("d_num").cast("double") / col("d_den")).as("ks_d"),
              col("d_num"), col("d_den"))
  }

  /** Two-sample Cramér–von Mises statistic (Anderson 1962) between the
    * two values of `splitCol` — the WHOLE-CDF companion to
    * [[ksStatistic]]'s supremum: T = (n·m/N²)·Σ_pooled (F(x)−G(x))²,
    * summed over every pooled observation (each distinct value weighted
    * by its multiplicity), so tail wiggles the KS max ignores all
    * register. Emits one row (n_a, n_b, t_cvm).
    *
    * Determinism: ECDF counts are exact integers from the same
    * distinct-value cumulative window as KS; each term
    * w·((ca·nb − cb·na)/(na·nb))² quantizes to the 1e-9 grid and folds
    * as BIGINT. Shape: identical to ksStatistic — a bounded
    * distinct-value table (the a16 contract) with one ordered window. */
  def cvmStatistic(df: DataFrame, valueCol: String, splitCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol).cast("double")
    val tots = df.groupBy(col(splitCol)).count()
    val labels = tots.collect().map(_.get(0).toString).sorted  // bounded label set
    require(labels.length == 2,
      s"two-sample statistic needs exactly 2 values of '$splitCol'; " +
        s"got ${labels.length}: ${labels.take(5).mkString(", ")}")
    val Array(a, b) = labels
    val byVal = df
      .withColumn("ia", when(col(splitCol) === a, 1L).otherwise(0L))
      .withColumn("ib", when(col(splitCol) === b, 1L).otherwise(0L))
      .groupBy(v.as("x"))
      .agg(sum(col("ia")).as("ca"), sum(col("ib")).as("cb"))
      .withColumn("ra", sum(col("ca")).over(Window.orderBy(col("x"))))
      .withColumn("rb", sum(col("cb")).over(Window.orderBy(col("x"))))
    byVal
      .crossJoin(broadcast(
        tots.groupBy()
          .agg(sum(when(col(splitCol) === a, col("count"))).as("na"),
               sum(when(col(splitCol) === b, col("count"))).as("nb"))))
      .withColumn("diff",
        (col("ra") * col("nb") - col("rb") * col("na")).cast("double")
          / (col("na").cast("double") * col("nb")))
      .withColumn("t9",
        floor((col("ca") + col("cb")).cast("double") * col("diff") * col("diff")
          * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy()
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
           sum(col("t9")).as("s9"))
      .withColumn("t_cvm",
        col("n_a").cast("double") * col("n_b")
          / ((col("n_a") + col("n_b")).cast("double")
            * (col("n_a") + col("n_b")))
          * (col("s9") / 1e9))
      .select(col("n_a"), col("n_b"), col("t_cvm"))
  }

  /** Calibration-reliability bins (Murphy 1973 reliability diagram +
    * per-bin Brier decomposition): a probability-like score in [0,1]
    * against a binary outcome, fixed-width deciles. Per bin:
    * n, mean predicted probability, observed positive fraction, the
    * |mean_p − frac_pos| reliability gap, and the bin's mean Brier
    * contribution. Σ(n·gap)/Σn is ECE; Σ(n·brier)/Σn is the corpus
    * Brier score — both one more tiny agg over these `bins` rows.
    *
    * The audit a curation stack runs on any learned quality/domain
    * classifier before thresholding on its probabilities (a
    * miscalibrated score makes "keep everything above 0.8" meaningless).
    *
    * Determinism: per-row terms quantize to the 1e-9 grid and sum as
    * BIGINT before the final divisions. Shape: pure map-side binning +
    * ONE O(bins) count shuffle — the [[psiBins]] shape. */
  def calibrationBins(df: DataFrame, probCol: String, labelCol: String,
                      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need bins >= 2, got $bins")
    val p = col(probCol).cast("double")
    val l = col(labelCol).cast("double")
    df.withColumn("bin", least(floor(p * bins), lit(bins - 1)).cast("int"))
      .withColumn("p9", floor(p * 1e9 + 0.5).cast("long"))
      .withColumn("pos", col(labelCol).cast("long"))
      .withColumn("sq9", floor(pow(p - l, 2) * 1e9 + 0.5).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("p9")).as("sp9"),
           sum(col("pos")).as("n_pos"), sum(col("sq9")).as("ssq9"))
      .select(col("bin"), col("n"),
        (col("sp9") / 1e9 / col("n")).as("mean_p"),
        (col("n_pos").cast("double") / col("n")).as("frac_pos"),
        abs(col("sp9") / 1e9 / col("n") -
            col("n_pos").cast("double") / col("n")).as("gap"),
        (col("ssq9") / 1e9 / col("n")).as("brier"))
  }
  /** Two-sample Anderson–Darling statistic (Scholz & Stephens 1987,
    * k = 2, grouped/discrete form over distinct pooled values): the
    * TAIL-WEIGHTED companion to [[ksStatistic]] (supremum) and
    * [[cvmStatistic]] (whole-CDF):
    *   A² = (1/N)·(1/n + 1/m)·Σ_j l_j·(N·M_j − n·B_j)² / (B_j·(N−B_j))
    * over distinct pooled values j (the last, B_j = N, excluded), with
    * B_j the pooled cumulative count, M_j sample A's cumulative count
    * and l_j the multiplicity — the 1/(B(N−B)) weight blows up in the
    * tails, which is exactly where KS and CvM are blind. Emits one row
    * (n_a, n_b, a2).
    *
    * Determinism: counts are exact integers off the same distinct-value
    * cumulative window as KS/CvM; each term quantizes to the 1e-9 grid
    * and folds as BIGINT; the (1/n + 1/m)/N constant applies once at the
    * end in a fixed op order. Shape: identical to ksStatistic — a
    * bounded distinct-value table (the a16 contract) with one ordered
    * window. */
  def adStatistic(df: DataFrame, valueCol: String, splitCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol).cast("double")
    val tots = df.groupBy(col(splitCol)).count()
    val labels = tots.collect().map(_.get(0).toString).sorted  // bounded label set
    require(labels.length == 2,
      s"two-sample statistic needs exactly 2 values of '$splitCol'; " +
        s"got ${labels.length}: ${labels.take(5).mkString(", ")}")
    val Array(a, b) = labels
    val byVal = df
      .withColumn("ia", when(col(splitCol) === a, 1L).otherwise(0L))
      .withColumn("ib", when(col(splitCol) === b, 1L).otherwise(0L))
      .groupBy(v.as("x"))
      .agg(sum(col("ia")).as("ca"), sum(col("ib")).as("cb"))
      .withColumn("ra", sum(col("ca")).over(Window.orderBy(col("x"))))
      .withColumn("rb", sum(col("cb")).over(Window.orderBy(col("x"))))
    byVal
      .crossJoin(broadcast(
        tots.groupBy()
          .agg(sum(when(col(splitCol) === a, col("count"))).as("na"),
               sum(when(col(splitCol) === b, col("count"))).as("nb"))))
      .withColumn("bj", col("ra") + col("rb"))
      .withColumn("nn", col("na") + col("nb"))
      .filter(col("bj") < col("nn")) // the last pooled group has zero weight
      .withColumn("d9",
        (col("nn") * col("ra") - col("na") * col("bj")).cast("double"))
      .withColumn("t9",
        floor((col("ca") + col("cb")).cast("double") * col("d9") * col("d9")
          / (col("bj").cast("double") * (col("nn") - col("bj")).cast("double"))
          * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy()
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
           sum(col("t9")).as("s9"))
      .withColumn("a2",
        (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")) * (col("s9") / 1e9)
          / (col("n_a") + col("n_b")).cast("double"))
      .select(col("n_a"), col("n_b"), col("a2"))
  }
}
