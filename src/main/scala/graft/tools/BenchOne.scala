package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query timing probe (soak adjudication helper): runs one
  * registered query N times against a testdata dir and prints the
  * per-pass seconds + min. Same session shape as Bench, including the
  * SPARK_GRAFT_INIT_PARTS AQE knob, so a sf0.1-vs-sf1 pair of runs
  * isolates one query's scaling ratio without a full bench. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchOne <sfDir> <query> [passes]")
    val sfDir = args(0); val qName = args(1)
    val passes = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-one")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
              sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // comma-separated names share one JVM/session — a multi-query soak
    // probe pays Spark startup once, not per query
    qName.split(",").foreach { name =>
      val q = graft.SparkEntry.queries(name)
      q(spark, sfDir).count() // warmup: codegen + AQE shapes at this SF
      spark.sharedState.cacheManager.clearCache()
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        q(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        dt
      }
      println(f"""{"query":"$name","sf":"$sfDir","passes":[${times.map(t => f"$t%.3f").mkString(",")}],"min":${times.min}%.3f}""")
    }
    spark.stop()
  }
}
