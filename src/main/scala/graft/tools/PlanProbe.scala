package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/volume probe for a registered query (dev tool). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val name = args(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    println("ROWS=" + df.count())
    spark.stop()
  }
}
