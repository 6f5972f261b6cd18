package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off occupancy probe for the d11 corpus (base ∪ perturbed twins)
  * at a given SF dir — prints the lshBucketProfile row plus the top
  * occupancies, the data for choosing/judging the mega-bucket cap. */
object LshProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-lsh-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val em = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val offset = 1L << 40
    val twins = em.select((col("vec_id") + offset).as("vec_id"),
      expr("transform(embedding, (x, j) -> x * CASE WHEN j % 2 = 0 THEN 1.3 ELSE 0.7 END)")
        .as("embedding"))
    val all = em.unionByName(twins)
    graft.scale.Dedup.lshBucketProfile(all, "embedding", "vec_id",
        knownRows = 2L * em.count())
      .show(false)
    spark.stop()
  }
}
