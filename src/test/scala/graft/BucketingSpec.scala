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

  test("IncrementalAgg: merge of any slicing equals the whole, in any merge order") {
    import graft.sources.IncrementalAgg
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, SF)
    def exactCols(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_type"), col("cnt"), col("sum6"), col("min6"), col("max6"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val whole = exactCols(
      IncrementalAgg.partial(ev, Seq("event_type"), "value", "user_id"))
    // three uneven slices by user-id mod; two different merge groupings
    val slices = (0 to 2).map(i =>
      IncrementalAgg.partial(ev.filter(pmod(col("user_id"), lit(3)) === i),
        Seq("event_type"), "value", "user_id"))
    val flat = exactCols(IncrementalAgg.merge(slices))
    val nested = exactCols(IncrementalAgg.merge(Seq(
      IncrementalAgg.merge(Seq(slices(2), slices(0))), slices(1))))
    assert(flat == whole, "merged slices must equal the whole EXACTLY")
    assert(nested == whole, "merge must be order- and grouping-invariant")
  }

  test("IncrementalAgg: HLL distinct estimate survives the merge within sketch tolerance") {
    import graft.sources.IncrementalAgg
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, SF)
    val slices = (0 to 2).map(i =>
      IncrementalAgg.partial(ev.filter(pmod(col("user_id"), lit(3)) === i),
        Seq("event_type"), "value", "user_id"))
    val est = IncrementalAgg.finalize(IncrementalAgg.merge(slices))
      .select(col("event_type"), col("distinct_est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, d) =>
      assert(math.abs(est(k) - d).toDouble / d < 0.05,
        s"$k: HLL ${est(k)} vs exact $d drifted > 5%")
    }
  }
}
