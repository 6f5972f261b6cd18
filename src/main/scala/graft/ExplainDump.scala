package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: dumps the formatted physical plan of the given (or a
  * default set of) registered queries — the re-runnable source of the
  * README "physical-plan audit" section.
  * Usage: sbt 'runMain graft.ExplainDump [sfDir] [query ...]' */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("j1_star", "a1_metrics", "st_sessionize", "e4_scalers",
               "x1_text_stats", "t12_folds", "f1_drift_forecast", "j5_asof",
               "d2_ngram_jaccard", "d3_minhash_lsh", "d4_simhash", "st_sliding")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- names) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
