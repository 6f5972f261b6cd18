package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scale-soak data generator: replicates an existing test-data dir R×
  * into an sf(R×) dataset, preserving the driver schema exactly so
  * `graft.Bench`/`graft.Verify` run against the output unmodified.
  *
  * Replication is key-shifted, not row-copied: replica i adds
  * `i * (max(key)+1)` to every entity key, so foreign-key joins keep
  * their fan-out (each order still finds exactly one customer, each
  * lineitem one order) and per-key group sizes stay constant — the
  * workload density of every operator is preserved while the row count
  * scales. Dimension tables (region, nation) stay fixed, as TPC-H does.
  *
  * Document text gets a per-replica token suffix (`regexp_replace` every
  * token) for replicas > 0: without it, each doc would gain R-1 exact
  * twins and the near-dup pair count would grow R²× instead of R×,
  * conflating "more data" with "more duplication". With disjoint shingle
  * vocabularies per replica, the duplicate DENSITY (pairs per doc) at
  * sf1 matches sf0.1 — which is the scaling claim under test.
  * Embedding vectors get a replica-dependent sign flip on one component
  * for the same reason (cosine near-dup density, not count², scales).
  *
  * Usage: runMain graft.tools.GenScale <srcDir> <outDir> <factor>
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = args(0); val out = args(1); val factor = args(2).toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-genscale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** Union of `factor` key-shifted replicas. `keys` are shifted by
      * i*(max+1) per replica; other columns pass through. */
    def replicate(df: DataFrame, keys: Seq[String])(perReplica: (DataFrame, Int) => DataFrame): DataFrame = {
      val offsets: Map[String, Long] =
        keys.map(k => k -> (df.agg(max(col(k))).head().getLong(0) + 1L)).toMap
      (0 until factor).map { i =>
        val shifted = keys.foldLeft(df)((d, k) =>
          d.withColumn(k, col(k) + lit(i * offsets(k))))
        perReplica(shifted, i)
      }.reduce(_ unionAll _)
    }
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[genscale] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    // fixed dimensions: copy once
    write(Tables.t(spark, src, "region"), "region")
    write(Tables.t(spark, src, "nation"), "nation")

    write(replicate(Tables.t(spark, src, "customer"), Seq("c_custkey"))((d, _) => d), "customer")
    write(replicate(Tables.t(spark, src, "supplier"), Seq("s_suppkey"))((d, _) => d), "supplier")
    write(replicate(Tables.t(spark, src, "part"), Seq("p_partkey"))((d, _) => d), "part")
    write(replicate(Tables.t(spark, src, "orders"), Seq("o_orderkey", "o_custkey"))((d, _) => d), "orders")
    write(replicate(Tables.t(spark, src, "lineitem"),
                    Seq("l_orderkey", "l_partkey", "l_suppkey"))((d, _) => d), "lineitem")
    // events: ts is read as raw nano longs (nanosAsLong) and written back
    // as int64 — Tables.events handles the long form transparently
    write(replicate(Tables.t(spark, src, "events"), Seq("event_id", "user_id"))((d, _) => d), "events")
    write(replicate(Tables.t(spark, src, "documents"), Seq("doc_id")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("text", regexp_replace(col("text"), "(\\S+)", "$1~r" + i))
            .withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents")
    write(replicate(Tables.t(spark, src, "embeddings"), Seq("vec_id")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("embedding",
        transform(col("embedding"), (v, j) =>
          when(j === (i % 8), -v).otherwise(v)))
    }, "embeddings")

    spark.stop()
  }
}
