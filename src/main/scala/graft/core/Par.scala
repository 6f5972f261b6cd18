package graft.core

import org.apache.spark.sql.DataFrame

/** Parallelism guard for CPU-heavy map-side operators.
  *
  * A parquet file is split at ROW-GROUP granularity: a single-row-group
  * file scans as ONE task no matter how many cores the cluster has, and
  * every narrow transformation chained onto that scan (tokenization,
  * shingle hashing, signature computation, media decode) inherits the
  * single thread until the first exchange. On a real multi-file dataset
  * the scan is already wide and this is a no-op; on a compact input it
  * trades one small round-robin shuffle of the RAW rows for full-width
  * execution of everything downstream — the right trade whenever the
  * per-row map work dwarfs a row's shuffle bytes. */
object Par {

  /** Round-robin repartition to the session default parallelism iff the
    * current plan has fewer partitions (planning-time check, no job).
    *
    * CONTRACT: wrap raw scans (or scan + narrow projections) only. The
    * width check physically plans `df` once — cheap for a scan, wasteful
    * for a join/aggregate subtree (and AQE may later coalesce what we
    * measured). Callers with a non-trivial upstream should widen the
    * scan itself before composing, or skip widening. Reads the planned
    * RDD via `queryExecution.toRdd` (cached on the Dataset; no extra
    * row-deserializing RDD DAG like `df.rdd` would build). */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions < target) df.repartition(target)
    else df
  }
}
