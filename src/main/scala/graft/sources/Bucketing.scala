package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins (SURVEY §4 / the
  * partitioning strategy): writing both sides of a hot join bucketed AND
  * sorted by the join key lets Spark plan a sort-merge join with NO
  * shuffle exchange and NO sort on either side — at 100 TB this turns
  * the fact-to-fact join from the dominant network cost into a local
  * merge. The bench star joins broadcast their dims instead (small
  * side), so this path is for fact-to-fact (e.g. lineitem ⋈ orders at
  * full scale, or events ⋈ sessions). */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (Parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketing tables on their bucket key — planner emits
    * an exchange-free sort-merge join when bucket counts match. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      org.apache.spark.sql.functions.col(leftKey) ===
        org.apache.spark.sql.functions.col(rightKey))
}
