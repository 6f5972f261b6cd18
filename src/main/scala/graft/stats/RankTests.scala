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

  /** Spearman rank correlation between two per-row metrics (Spearman
    * 1904, tie-corrected form = Pearson over average ranks): the
    * monotone-association readout that survives the heavy tails where
    * Pearson (a10) is all outlier. Emits one row (n, rho).
    *
    * Determinism: both variables rank with DOUBLED average ranks
    * (2·avg = 2·min_rank + t − 1 — exact integers, the [[mwuTest]]
    * trick), so all five Pearson moments are exact BIGINT sums and rho
    * is a fixed-op-order double. Contract: Σ(2r)² ≈ 4n³/3 must stay
    * < 2^63 — fine to ~10^6 rows per test.
    *
    * Scale shape: ranks are a pure function of the VALUE, so they are
    * computed on the distinct-value table (group-reduce, then one
    * cumulative window over distinct values — the ksStatistic
    * bounded-cardinality contract) and joined back by value. Rows never
    * pass through a single-partition window; only the distinct-value
    * grids do. 2·avg_rank for a value with cumulative count c and tie
    * count t is 2·(c − t + 1) + t − 1 = 2c − t + 1. */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val base = df.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
    def rankMap(c: String) = base
      .groupBy(col(c))
      .agg(count(lit(1)).as("__t"))
      .withColumn("__c", sum(col("__t")).over(Window.orderBy(col(c))))
      .select(col(c), (col("__c") * 2L - col("__t") + 1L).as(s"r$c"))
    val r = base
      .join(rankMap("x"), Seq("x"))
      .join(rankMap("y"), Seq("y"))
    r.agg(count(lit(1)).cast("long").as("n"),
        sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("rx") * col("ry")).as("sxy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"))
      .withColumn("nd", col("n").cast("double"))
      .withColumn("num",
        col("nd") * col("sxy") - col("sx").cast("double") * col("sy"))
      .withColumn("dx",
        col("nd") * col("sxx") - col("sx").cast("double") * col("sx"))
      .withColumn("dy",
        col("nd") * col("syy") - col("sy").cast("double") * col("sy"))
      .withColumn("rho",
        when(col("dx") > 0.0 && col("dy") > 0.0,
          col("num") / sqrt(col("dx") * col("dy"))))
      .select(col("n"), col("rho"))
  }

  /** Wald–Wolfowitz runs test (1940) for randomness of a sequence's
    * above/below-median signs — the residual-independence gate beside
    * the Durbin–Watson battery (m11): with n₁ above, n₂ below (median
    * ties dropped) and R observed runs,
    *   μ = 2n₁n₂/n + 1,  σ² = 2n₁n₂(2n₁n₂ − n)/(n²(n−1)),  z = (R−μ)/σ.
    * Too FEW runs = positive drift/autocorrelation; too many =
    * oscillation. Emits (n1, n2, runs, mu, z).
    *
    * Determinism: the median is the exact percentile, signs/run count
    * are integers off one lag window on the reduced single-task frame
    * (the grangerLag1 contract); μ/σ/z fixed-op-order doubles.
    *
    * CONTRACT — bounded input only: the run count is inherently
    * sequential, so this function `coalesce(1)`s its input and walks it
    * through ONE task. Callers MUST reduce to a bounded per-period
    * series first (the registered m20 aggregates events to a day grid
    * upstream); passing a raw data-sized frame will silently
    * single-partition it. For residual batteries over many series, use
    * the per-series (partitioned) diagnostics in
    * [[graft.scale.SeriesDiagnostics]] instead. */
  def runsTest(df: DataFrame, tCol: String, valueCol: String): DataFrame = {
    val w = Window.orderBy(col(tCol))
    val med = Quantiles.exact(df, valueCol, Nil, Seq(0.5))
      .select(col("q50").as("__med"))
    val signs = df.coalesce(1).crossJoin(broadcast(med))
      .filter(col(valueCol).cast("double") =!= col("__med"))
      .withColumn("s", when(col(valueCol).cast("double") > col("__med"), 1L)
        .otherwise(0L))
      .withColumn("ls", lag(col("s"), 1).over(w))
    signs.agg(
        sum(col("s")).as("n1"),
        sum(lit(1L) - col("s")).as("n2"),
        (sum(when(col("ls").isNull || col("s") =!= col("ls"), 1L)
          .otherwise(0L))).as("runs"))
      .withColumn("n", (col("n1") + col("n2")).cast("double"))
      .withColumn("mu",
        lit(2.0) * col("n1") * col("n2") / col("n") + 1.0)
      .withColumn("sig2",
        lit(2.0) * col("n1") * col("n2")
          * (lit(2.0) * col("n1") * col("n2") - col("n"))
          / (col("n") * col("n") * (col("n") - 1.0)))
      .withColumn("z",
        when(col("sig2") > 0.0,
          (col("runs").cast("double") - col("mu")) / sqrt(col("sig2"))))
      .select(col("n1"), col("n2"), col("runs"), col("mu"), col("z"))
  }
  /** Kendall's tau-b (Kendall 1945, ties-corrected) between two
    * grid-valued metrics: concordant/discordant pair counting over the
    * JOINT distinct-value table —
    *   tau_b = (C − D) / sqrt((n0 − n1)(n0 − n2)),
    * n0 = n(n−1)/2, n1/n2 = Σ t(t−1)/2 over x/y tie groups. The rank
    * correlation that reads as a probability (P[concordant] −
    * P[discordant]) where [[spearman]] reads as a Pearson-of-ranks.
    *
    * CONTRACT — bounded joint domain: C and D come from a broadcast
    * self-join of the (x, y, count) table, so the operator requires
    * |distinct (x, y)| ≤ `maxCombos` (checked, hard error) — pass
    * pre-binned/grid-valued metrics, the same discipline as the a16
    * distinct-value frames. All counts are exact BIGINTs; tau is one
    * fixed-op-order double. Pair products overflow signed 64-bit only
    * past ~4e9 rows per side — far above the bounded-domain regime this
    * contract pins. */
  def kendallTau(df: DataFrame, xCol: String, yCol: String,
                 maxCombos: Int = 20000): DataFrame = {
    val jd = df.select(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
    val nCombos = jd.count()
    require(nCombos <= maxCombos,
      s"kendallTau: $nCombos distinct (x, y) combos exceed maxCombos=" +
        s"$maxCombos — bin the inputs to a bounded grid first")
    val r = jd.select(col("x").as("x2"), col("y").as("y2"), col("c").as("c2"))
    val cd = jd.join(broadcast(r), col("x2") > col("x"))
      .agg(coalesce(sum(when(col("y2") > col("y"), col("c") * col("c2"))), lit(0L))
             .as("concordant"),
           coalesce(sum(when(col("y2") < col("y"), col("c") * col("c2"))), lit(0L))
             .as("discordant"))
    val nx = jd.groupBy(col("x")).agg(sum(col("c")).as("t"))
      .agg(coalesce(sum(expr("t*(t-1) div 2")), lit(0L)).as("n1"))
    val ny = jd.groupBy(col("y")).agg(sum(col("c")).as("t"))
      .agg(coalesce(sum(expr("t*(t-1) div 2")), lit(0L)).as("n2"))
    val nn = jd.agg(sum(col("c")).as("n"), count(lit(1)).as("n_combos"))
      .withColumn("n0", expr("n*(n-1) div 2"))
    cd.crossJoin(broadcast(nn)).crossJoin(broadcast(nx)).crossJoin(broadcast(ny))
      .withColumn("tau_b",
        when(col("n0") > col("n1") && col("n0") > col("n2"),
          (col("concordant") - col("discordant")).cast("double")
            / sqrt((col("n0") - col("n1")).cast("double")
                   * (col("n0") - col("n2")).cast("double"))))
      .select(col("n"), col("n_combos"), col("concordant"), col("discordant"),
              col("tau_b"))
  }
}
