package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-soak diagnostics main — the measurement side of the SOAK_r{N}
  * adjudications. Each mode prints ONE JSON line so soak tables can be
  * assembled mechanically (run via the no-sbt plain-java runner to keep
  * stdout undecorated). Modes:
  *
  *   d11occ <sfDir>  — the d11 fixture's LSH bucket-occupancy profile
  *                     ([[graft.scale.Dedup.lshBucketProfile]]) PLUS the
  *                     operator's actual output-pair count: distinguishes
  *                     "candidates grow because resolution is too coarse"
  *                     (cand_pairs ≫ out_pairs growth) from "the true
  *                     near-dup pair set itself grows super-linearly"
  *                     (out_pairs quadratic — an output-bound regime no
  *                     candidate policy can make linear).
  *   d12cells <sfDir> — semDedup cell-occupancy histogram + wall time of
  *                     one full evaluation (the two-level assignment
  *                     probe).
  */
object SoakProbe {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val sfDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-soak-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    mode match {
      case "d11occ" =>
        // the exact d11_cosine_lsh fixture: embeddings ∪ scaled twins
        val em = Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        val offset = 1L << 40
        val twins = em.select((col("vec_id") + offset).as("vec_id"),
          expr("transform(embedding, (x, j) -> x * CASE WHEN j % 2 = 0 THEN 1.3 ELSE 0.7 END)")
            .as("embedding"))
        val n = 2L * Tables.embeddings(spark, sfDir).count()
        val fixture = em.unionByName(twins)
        val prof = graft.scale.Dedup.lshBucketProfile(fixture,
            "embedding", "vec_id", knownRows = n).collect().head
        val t0 = System.nanoTime()
        val outPairs = graft.scale.Dedup.cosineNearDupLsh(fixture,
            "embedding", "vec_id", 0.9, knownRows = n).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(s"""{"mode":"d11occ","sf":"$sfDir","n":$n,""" +
          s""""n_buckets":${prof.getAs[Long]("n_buckets")},""" +
          s""""n_sigs":${prof.getAs[Long]("n_sigs")},""" +
          s""""max_occ":${prof.getAs[Long]("max_occ")},""" +
          s""""cand_pairs":${prof.getAs[Long]("cand_pairs")},""" +
          s""""dropped_buckets":${prof.getAs[Long]("dropped_buckets")},""" +
          s""""dropped_sigs":${prof.getAs[Long]("dropped_sigs")},""" +
          s""""capped_pairs":${prof.getAs[Long]("capped_pairs")},""" +
          f""""out_pairs":$outPairs,"wall_sec":$wall%.2f}""")

      case "d12cells" =>
        val em = Tables.embeddings(spark, sfDir)
        val n = em.count()
        val cells = math.max(8L, n / 2500L).toInt
        val t0 = System.nanoTime()
        val res = graft.scale.Dedup.semDedup(em, "embedding", "vec_id",
            0.4, nCells = cells, lloydIters = 1)
          .agg(count(lit(1)).as("n"),
               sum(when(col("kept"), 0L).otherwise(1L)).as("n_dropped"),
               countDistinct(col("cell")).as("n_cells_used")).collect().head
        val wall = (System.nanoTime() - t0) / 1e9
        println(s"""{"mode":"d12cells","sf":"$sfDir","n":$n,"n_cells":$cells,""" +
          s""""rows":${res.getLong(0)},"n_dropped":${res.getLong(1)},""" +
          f""""n_cells_used":${res.getLong(2)},"wall_sec":$wall%.2f}""")

      case other => sys.error(s"unknown probe mode: $other")
    }
    spark.stop()
  }
}
