package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in `graft.queries.*`, one registry per operator family;
  * this object is just the aggregation point the driver calls. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("j1_star")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
    graft.queries.CoreQueries2.queries ++
    graft.queries.InferQueries.queries ++
    graft.queries.StatQueries.queries ++
    graft.queries.ModelQueries.queries ++
    graft.queries.ModelQueries2.queries ++
    graft.queries.ScaleQueries.queries ++
    graft.queries.ScaleQueries2.queries ++
    graft.queries.ScaleQueries3.queries ++
    graft.queries.ScaleQueries4.queries ++
    graft.queries.ScaleQueries5.queries ++
    graft.queries.ScaleQueries6.queries ++
    graft.queries.ScaleQueries7.queries ++
    graft.queries.ScaleQueries8.queries ++
    graft.queries.ScaleQueries9.queries ++
    graft.queries.ScaleQueries10.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracle ++
    graft.queries.CoreQueries2.oracle ++
    graft.queries.InferQueries.oracle ++
    graft.queries.StatQueries.oracle ++
    graft.queries.ModelQueries.oracle ++
    graft.queries.ModelQueries2.oracle ++
    graft.queries.ScaleQueries.oracle ++
    graft.queries.ScaleQueries2.oracle ++
    graft.queries.ScaleQueries3.oracle ++
    graft.queries.ScaleQueries4.oracle ++
    graft.queries.ScaleQueries5.oracle ++
    graft.queries.ScaleQueries6.oracle ++
    graft.queries.ScaleQueries7.oracle ++
    graft.queries.ScaleQueries8.oracle ++
    graft.queries.ScaleQueries9.oracle ++
    graft.queries.ScaleQueries10.oracle
}
