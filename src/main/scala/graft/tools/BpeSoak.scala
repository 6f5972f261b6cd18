package graft.tools

import org.apache.spark.sql.SparkSession

/** Merge-count scaling measurement for [[graft.scale.TextAnalysis.bpeLearn]]
  * (r12 verdict ask #3): wall clock at a ladder of merge counts over one
  * corpus, printed as one JSON line per rung. The observable is the
  * per-merge cost curve — if the marginal cost per merge stays flat the
  * loop is job-overhead-plus-one-vocab-scan per merge, the expected
  * regime; super-linear growth would mean lineage/cache pathology.
  *
  * Usage: runMain graft.tools.BpeSoak <sfDir> [merges=20,100,1000] */
object BpeSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rungs = if (args.length > 1) args(1).split(",").map(_.toInt)
                else Array(20, 100, 1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bpe-soak")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
    docs.count() // footer/codegen warmup
    // warmup rung so JIT/codegen of the merge loop isn't billed to the
    // first measured rung
    graft.scale.TextAnalysis.bpeLearn(docs, "text", merges = 5).count()
    for (m <- rungs) {
      val t0 = System.nanoTime()
      val n = graft.scale.TextAnalysis.bpeLearn(docs, "text", merges = m).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"""{"tool":"bpe_soak","merges":$m,"learned":$n,"wall_s":$dt%.2f,"s_per_merge":${dt / m}%.4f,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
