package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketing

/** Proves the co-located-join layout: bucketed+sorted tables join with
  * NO shuffle exchange and NO sort — the physical plan property that
  * makes fact-to-fact joins survive a 100× scale-up. */
class BucketingSpec extends SparkTestBase {

  test("bucketed+sorted tables sort-merge join without exchange or sort") {
    val orders = Tables.orders(spark, SF)
    val lineitem = Tables.lineitem(spark, SF)
    Bucketing.writeBucketed(orders, "orders_bkt", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "lineitem_bkt", "l_orderkey", 4)
    // force SMJ so the assertion is about bucketing, not broadcast
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val j = Bucketing.colocatedJoin(spark, "lineitem_bkt", "orders_bkt",
        "l_orderkey", "o_orderkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // correctness: same row count as the plain join
      val expected = lineitem.join(orders, col("l_orderkey") === col("o_orderkey")).count()
      assert(j.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }
}
