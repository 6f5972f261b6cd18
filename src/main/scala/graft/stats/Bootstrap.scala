package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Poisson bootstrap (Chamandy et al. 2012, "Estimating Uncertainty for
  * Massive Data Streams", Google TR — the bootstrap that works when the
  * data can't be resampled with replacement because no node ever sees it
  * all): replicate j reweights every row by an independent Poisson(1)
  * draw instead of drawing n-with-replacement, so the "resample" is a
  * MAP-SIDE weight and replicate statistics are plain weighted
  * aggregates. E[w]=1 keeps each replicate an (asymptotically) faithful
  * resample; the replicate-mean spread IS the sampling distribution.
  *
  * Determinism contract: the Poisson draw inverts a shared cumulative
  * table (literal constants below) on the repo's md5-uniform convention
  * (13 hex chars + 0.5 over 2^52 — the weightedSample grid), values
  * quantize to the 1e-6 grid, replicate sums are EXACT integers, and the
  * CI bounds are ORDER STATISTICS of replicate means with (mean, j)
  * tie-break — the whole construction replays in DuckDB.
  *
  * Scale shape: the B-fold fan-out is map-side (a broadcast range join);
  * partial aggregation collapses it to |groups|·B rows before the one
  * shuffle, and the order-statistic window runs on that reduced table.
  * B is a constant knob (64 here): at 100 TB the fan-out costs B× map
  * CPU, never B× shuffle. */
object Bootstrap {

  /** Inverse-CDF thresholds for Poisson(1), k = 0..7 (mass above the
    * last threshold draws 8). Shared literals with the oracle SQL —
    * their absolute accuracy is irrelevant, only cross-engine equality. */
  val poissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253)

  /** SQL CASE text for the same inverse CDF over a uniform expression. */
  def poissonSql(u: String): String =
    poissonCdf.zipWithIndex
      .map { case (c, k) => s"WHEN $u < $c THEN $k" }
      .mkString("CASE ", " ", " ELSE 8 END")

  /** Per-group mean with a 90% percentile-bootstrap CI from B Poisson
    * replicates. Returns (group, n, mean, b_eff, lo, hi). */
  def poissonMeanCi(df: DataFrame, valueCol: String, idCol: String,
                    groupCol: String, b: Int = 64): DataFrame = {
    require(b >= 2, s"need b >= 2 replicates, got $b")
    val spark = df.sparkSession
    val base = df.select(col(groupCol).as("grp"),
        col(idCol).cast("string").as("rid"),
        floor(col(valueCol).cast("double") * 1e6 + 0.5).cast("long").as("x6"))
    // the B-fold fan-out is a GENERATE (explode of a constant sequence),
    // not a join — stays inside whole-stage codegen on the scan; one md5
    // serves FOUR replicates via the digest's four independent 32-bit
    // lanes (32 uniform bits are far more than the 8-bucket Poisson
    // inversion resolves). The fan-out is TWO-LEVEL so each digest is
    // hashed once and its four lanes read off it — a flat explode over j
    // re-evaluated md5 per replicate (4× the hashing for the same draws;
    // at B=64 that is 64 md5/row where 16 suffice — measured ~2× the
    // whole operator at sf0.1).
    val bound = base
      .withColumn("jq", explode(expr(s"sequence(0L, ${(b - 1) / 4}L)")))
      .withColumn("mstr", md5(concat(col("rid"), lit(":"), col("jq"))))
      .withColumn("lane", explode(expr("sequence(0, 3)")))
      .withColumn("j", (col("jq") * 4 + col("lane")).cast("long"))
      .filter(col("j") < b)
      .withColumn("u_col",
        (conv(expr("substring(mstr, 1 + 8*lane, 8)"), 16, 10)
          .cast("long") + 0.5) / lit(4294967296.0))
      .withColumn("w", expr(poissonSql("u_col")).cast("long"))
      .drop("jq", "lane", "mstr")
    val repMeans = bound.groupBy(col("grp"), col("j"))
      .agg(sum(col("w")).as("sw"), sum(col("w") * col("x6")).as("swx6"))
      .filter(col("sw") > 0L)
      .withColumn("rmean", col("swx6").cast("double") / col("sw") / 1e6)
    val wG = Window.partitionBy(col("grp")).orderBy(col("rmean"), col("j"))
    val ranked = repMeans
      .withColumn("rk", row_number().over(wG).cast("long"))
      .withColumn("beff", count(lit(1)).over(
        Window.partitionBy(col("grp"))).cast("long"))
      .withColumn("lo_rk", greatest(lit(1L), expr("(5*beff + 99) div 100")))
      .withColumn("hi_rk", expr("(95*beff + 99) div 100"))
    val ci = ranked.groupBy(col("grp"))
      .agg(max(col("beff")).as("b_eff"),
           max(when(col("rk") === col("lo_rk"), col("rmean"))).as("lo"),
           max(when(col("rk") === col("hi_rk"), col("rmean"))).as("hi"))
    val full = base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
           (sum(col("x6")).cast("double") / count(lit(1)) / 1e6).as("mean"))
    full.join(ci, Seq("grp"))
      .select(col("grp").as(groupCol), col("n"), col("mean"),
              col("b_eff"), col("lo"), col("hi"))
  }
}
