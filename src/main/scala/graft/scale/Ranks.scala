package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranks WITHOUT a global single-partition sort window —
  * the reusable form of the bucket-offset discipline used by
  * [[Sampling.deterministicShuffle]] (md5-prefix buckets),
  * [[Packing.snakeShard]] (token-count grid) and
  * [[TextAnalysis.heapsLaw]] (doc-range buckets).
  *
  * The problem shape: `row_number().over(Window.orderBy(...))` funnels
  * the ENTIRE input through one task — correct at any SF, wrong at
  * 100 TB (the round-13 g1/g2 finding). The decomposition here keeps
  * every window either partitioned or over a bounded grid:
  *
  *   rank(v, u) = off1(v) + off2(v, ubkt(u)) + rn_{v, ubkt}(u)
  *
  *   - off1(v): exclusive prefix count of rows whose v sorts strictly
  *     first — computed on the DISTINCT-v table, itself two-leveled
  *     (≤4097 range buckets of v get a bounded global cumulative
  *     window; values cumulate within their bucket under a partitioned
  *     window), so even a near-unique v column (timestamps, money)
  *     never single-partitions.
  *   - off2(v, b): exclusive prefix count over the u-range buckets
  *     WITHIN a value group — a window partitioned by v over ≤4097
  *     bucket rows per value; this is what keeps a heavily-TIED value
  *     (frequency = 1 for half the users) from collapsing into one
  *     window partition.
  *   - rn: row_number within (v, ubkt) ordered by u — partition size
  *     ≈ |value group| / 4096.
  *
  * Determinism: ranks are exact integers, identical under any
  * partitioning, and equal to the single-window definition
  * rank over (v `dir`, u ASC) — the ScaleSpec parity test pins this.
  * Requires v and u to be (castable to) BIGINT and u non-negative. */
object Ranks {

  /** df + column `out` = exact 1-based rank of each row under
    * (v `descending?DESC:ASC`, u ASC). `u` must be a unique non-negative
    * long id (ties on (v, u) would make "rank" ill-defined). */
  def globalRank(df: DataFrame, vCol: Column, uCol: Column,
                 descending: Boolean, out: String,
                 buckets: Int = 4096,
                 checkpointDir: Option[String] = None): DataFrame = {
    require(buckets >= 1, s"need buckets >= 1, got $buckets")
    val b = lit(buckets.toLong)
    // the input is consumed FOUR ways (distinct-v grid, u-span, the
    // u-bucket histogram, and the final join) — materialize it once so an
    // expensive upstream plan (a30's per-user aggregate, chained
    // globalRank calls) never re-executes per consumer (a30_rfm's
    // pre-fix plan held 104 parquet scans). Default localCheckpoint;
    // at cluster scale pass `checkpointDir` for the executor-loss-safe
    // reliable checkpoint (see [[Lineage.truncate]]).
    val base = Lineage.truncate(
      df.withColumn("__v", vCol.cast("long"))
        .withColumn("__u", uCol.cast("long")), checkpointDir)
    val vDir: Column => Column = c => if (descending) c.desc else c.asc

    // level 0: distinct-v counts, range-bucketed on v's own span
    val g1 = base.groupBy(col("__v")).agg(count(lit(1)).as("__c1"))
    val span = g1.agg(min(col("__v")).as("__vmin"), max(col("__v")).as("__vmax"))
    val g1b = g1.crossJoin(broadcast(span))
      .withColumn("__vb",
        expr(s"(__v - __vmin) div ((__vmax - __vmin) div ${buckets}L + 1)"))
    // bucket grid: ≤ buckets+1 rows, one bounded global window
    val wVb = Window.orderBy(vDir(col("__vb")))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offB = g1b.groupBy(col("__vb")).agg(sum(col("__c1")).as("__cb"))
      .withColumn("__offb", coalesce(sum(col("__cb")).over(wVb), lit(0L)))
      .select(col("__vb"), col("__offb"))
    // within-bucket: exclusive prefix over the values of one v-bucket
    val wInV = Window.partitionBy(col("__vb")).orderBy(vDir(col("__v")))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off1 = g1b.join(broadcast(offB), Seq("__vb"))
      .withColumn("__off1",
        col("__offb") + coalesce(sum(col("__c1")).over(wInV), lit(0L)))
      .select(col("__v"), col("__off1"))

    // level 1: u-range buckets within each value group
    val uspan = base.agg(max(col("__u")).as("__umax"))
    val bu = base.crossJoin(broadcast(uspan))
      .withColumn("__ub", expr(s"__u div (__umax div ${buckets}L + 1)"))
      .drop("__umax")
    val wUb = Window.partitionBy(col("__v")).orderBy(col("__ub"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off2 = bu.groupBy(col("__v"), col("__ub")).agg(count(lit(1)).as("__c2"))
      .withColumn("__off2", coalesce(sum(col("__c2")).over(wUb), lit(0L)))
      .select(col("__v"), col("__ub"), col("__off2"))

    // level 2: row_number within (v, ubkt)
    val wRn = Window.partitionBy(col("__v"), col("__ub")).orderBy(col("__u"))
    bu.join(off1, Seq("__v"))
      .join(off2, Seq("__v", "__ub"))
      .withColumn(out,
        col("__off1") + col("__off2") + row_number().over(wRn).cast("long"))
      .drop("__v", "__u", "__vb", "__ub", "__off1", "__off2")
  }
}
