package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 scale-soak probes (r10 verdict #2/#3) — measures the
  * INVARIANTS behind two scale claims instead of inferring them from
  * wall time:
  *
  *   d11 <sfDir>      — candidate-pair count + isolated wall for
  *                      `d11_cosine_lsh`'s exact input. The adaptive
  *                      bucket resolution pins expected candidates at
  *                      ≈ bands·n·targetBucket/2, so across SFs the
  *                      count must grow ≈ LINEARLY in n.
  *   densify <src> <dst> <permille> — writes a documents.parquet with
  *                      `permille`/1000 of docs' text REPLACED by one of
  *                      32 donor texts (plus a doc-unique 2-token tail so
  *                      exact-dedup stays non-trivial): duplicate DENSITY
  *                      rises at fixed rows — the regime where positional
  *                      gram joins (d13/d15) go quadratic without a cap.
  *   d13 <sfDir> [maxDf] — gram/dup-fingerprint/hit volumes + wall of
  *                      the span pipeline, with and without the cap.
  *   d15 <sfDir>      — cross-source shared-gram volume + wall.
  *
  * Each prints one JSON line; SOAK_r11.md collects them. */
object ScaleProbe {
  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
              sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  private def minWall(passes: Int)(f: => Unit): Double =
    (1 to passes).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScaleProbe d11|densify|d13|d15 ...")
    val spark = session()
    args(0) match {
      case "d11" =>
        val sfDir = args(1)
        val em = Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        val offset = 1L << 40
        val twins = em.select((col("vec_id") + offset).as("vec_id"),
          expr("transform(embedding, (x, j) -> x * CASE WHEN j % 2 = 0 THEN 1.3 ELSE 0.7 END)")
            .as("embedding"))
        val un = em.unionByName(twins)
        val n = 2L * Tables.embeddings(spark, sfDir).count()
        val ppb = math.max(4,
          math.ceil(math.log(n.toDouble / 32) / math.log(2)).toInt)
        val cands = graft.scale.Dedup.cosineLshCandidates(
            un, "embedding", "vec_id", knownRows = n).count()
        val q = graft.SparkEntry.queries("d11_cosine_lsh")
        q(spark, sfDir).count() // warm codegen/AQE at this SF
        val wall = minWall(3) { q(spark, sfDir).count() }
        println(f"""{"probe":"d11","sf":"$sfDir","n":$n,"ppb":$ppb,"candidates":$cands,"cand_per_n":${cands.toDouble / n}%.1f,"wall_min3":$wall%.2f}""")

      case "densify" =>
        val src = args(1); val dst = args(2); val permille = args(3).toInt
        val docs = Tables.documents(spark, src)
        val donors = docs.filter(col("doc_id") < 32)
          .select(pmod(col("doc_id"), lit(32)).as("__dk"),
                  col("text").as("__donor_text"))
        docs.withColumn("__dk", pmod(col("doc_id"), lit(32)))
          .join(broadcast(donors), Seq("__dk"), "left")
          .withColumn("text",
            when(pmod(col("doc_id"), lit(1000)) < permille,
                 concat(col("__donor_text"), lit(" uniq"),
                        col("doc_id").cast("string"), lit(" tail")))
              .otherwise(col("text")))
          .drop("__dk", "__donor_text")
          .write.mode("overwrite").parquet(s"$dst/documents.parquet")
        println(s"""{"probe":"densify","src":"$src","dst":"$dst","permille":$permille}""")

      case "d13" =>
        val sfDir = args(1)
        val maxDf = if (args.length > 2) Some(args(2).toLong) else None
        val docs = Tables.documents(spark, sfDir)
        val (nGrams, nDup, nHits) = graft.scale.Dedup.spanDedupStats(
          docs, "text", "doc_id", L = 6, minCount = 2, maxDf = maxDf)
        val wall = minWall(3) {
          graft.scale.Dedup.duplicatedSpans(docs, "text", "doc_id",
            L = 6, minCount = 2, maxDf = maxDf).count()
        }
        println(f"""{"probe":"d13","sf":"$sfDir","maxDf":${maxDf.getOrElse(-1L)},"n_grams":$nGrams,"n_dup_fps":$nDup,"n_hits":$nHits,"wall_min3":$wall%.2f}""")

      case "d15" =>
        val sfDir = args(1)
        val docs = Tables.documents(spark, sfDir)
        val ov = graft.scale.Dedup.crossGroupOverlap(docs, "text", "source", 6)
        val shared = ov.agg(sum(col("n_shared"))).head() match {
          case r if r.isNullAt(0) => 0L
          case r => r.getLong(0)
        }
        val wall = minWall(3) {
          graft.scale.Dedup.crossGroupOverlap(docs, "text", "source", 6).count()
        }
        println(f"""{"probe":"d15","sf":"$sfDir","n_shared_total":$shared,"wall_min3":$wall%.2f}""")

      case other => sys.error(s"unknown probe $other")
    }
    spark.stop()
  }
}
