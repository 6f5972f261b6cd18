package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}
import graft.scale.Dedup

/** Scale-soak probe for the claims the per-query bench can't see: the
  * near-dup pipeline's CONVERGENCE behavior. Runs the exact d2→d8→d9
  * dedup chain at `SPARK_GRAFT_SF_DIR` and prints one JSON line with the
  * pair count, the number of pointer-jumping rounds the components
  * fixpoint took, cluster count, and stage wall times. At 10× data the
  * round count should hold (graph diameter, not size, drives it) — that
  * is the measurable form of the O(log D) scale claim. */
object ScaleSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-soak")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // same AQE exchange-sizing knob as Bench (SPARK_GRAFT_INIT_PARTS):
      // soak probes can lift initialPartitionNum to measure how a query
      // scales when AQE, not the fixed session count, sizes the exchange
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
              sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // warmup footers/codegen off the clock
    Tables.documents(spark, sfDir).count()
    Tables.orders(spark, sfDir).count()

    val docs = Tables.documents(spark, sfDir)
    // pairs are CACHED and materialized by the count, so components_sec
    // below times the fixpoint loop alone — not a recomputation of the
    // shingle join (which every loop round would otherwise re-trigger)
    val pairs = Dedup.ngramJaccard(docs, "text", "doc_id", 3, 0.5).cache()
    val (nPairs, tPairs) = timed { pairs.count() }
    val ((labels, rounds), tComp) = timed {
      val (l, r) = Dedup.componentsStats(pairs, "id_a", "id_b")
      (l.cache(), r)
    }
    pairs.unpersist()
    val nClusters = labels.select("component").distinct().count()
    val (nKept, tKeep) = timed {
      import org.apache.spark.sql.functions._
      val best = docs.join(labels, docs("doc_id") === labels("id"))
        .groupBy(col("component"))
        .agg(max(struct(col("n_chars"), col("doc_id"))).as("best"))
        .select(col("component"), col("best.doc_id").as("keep_id"))
      best.count()
    }
    labels.unpersist()
    val (nStar, tStar) = timed { SparkEntry.queries("j1_star")(spark, sfDir).count() }

    println(s"""{"metric":"soak","sf_dir":"$sfDir","pairs":$nPairs,"pairs_sec":${f"$tPairs%.3f"},""" +
      s""""component_rounds":$rounds,"components_sec":${f"$tComp%.3f"},"clusters":$nClusters,""" +
      s""""keep_best":$nKept,"keep_best_sec":${f"$tKeep%.3f"},"j1_rows":$nStar,"j1_sec":${f"$tStar%.3f"}}""")
    spark.stop()
  }
}
