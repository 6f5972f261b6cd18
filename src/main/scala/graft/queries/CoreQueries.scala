package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.core.{TimeSeriesOps => TS, CleanOps}
import graft.cv.ExpandingWindowSplit
import graft.stats.Metrics
import graft.queries.Det._

/** Oracle-checked queries for the core dataflow operators (SURVEY §2.2,
  * §2.3, §2.4 subset, §2.6, §2.7). One entry per ✔dt operator; each has a
  * DuckDB twin in [[oracle]]. Column names/ordering/rounding conventions:
  * see [[Det]]. */
object CoreQueries {

  type Q = (SparkSession, String) => DataFrame

  // ---- T1/T2: lag & lead over per-series ordered windows -------------

  private def t1Lag: Q = (s, d) => {
    val e = Tables.events(s, d)
    TS.addLags(e, Seq("value"), 3, "ts", Seq("user_id"), Seq("event_id"))
      .select(col("event_id"), col("user_id"), col("value"),
              col("value_lag1"), col("value_lag2"), col("value_lag3"))
  }

  private def t2Lead: Q = (s, d) => {
    val e = Tables.events(s, d)
    TS.addLeads(e, Seq("value"), 2, "ts", Seq("user_id"), Seq("event_id"))
      .select(col("event_id"), col("user_id"), col("value"),
              col("value_lead1"), col("value_lead2"))
  }

  // ---- T4/T5: differencing and cumulative restore ---------------------

  private def t4Diff: Q = (s, d) => {
    val e = Tables.events(s, d)
    TS.diff(TS.diff(e, "value", 1, "ts", Seq("user_id"), Seq("event_id")).withColumnRenamed("value_diff", "vd1"),
            "vd1", 1, "ts", Seq("user_id"), Seq("event_id"))
      .select(col("event_id"), col("user_id"),
              col("vd1").as("value_diff1"), col("vd1_diff").as("value_diff2"))
  }

  private def t5Cumsum: Q = (s, d) => {
    val e = Tables.events(s, d)
    val w = TS.seriesWindow("ts", Seq("user_id"), Seq("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.select(col("event_id"), col("user_id"),
             dround(sum(col("value")).over(w), 4).as("running_value"))
  }

  // ---- T6: calendar features ------------------------------------------

  private def t6Calendar: Q = (s, d) => {
    val e = Tables.events(s, d)
    TS.calendarFeatures(e.select("event_id", "ts"), "ts")
      .select(col("event_id"),
        col("hour").cast("long").as("hour"),
        col("minute").cast("long").as("minute"),
        col("dayofweek").cast("long").as("dayofweek"),
        col("quarter").cast("long").as("quarter"),
        col("month").cast("long").as("month"),
        col("year").cast("long").as("year"),
        col("dayofyear").cast("long").as("dayofyear"),
        col("dayofmonth").cast("long").as("dayofmonth"),
        col("weekofyear").cast("long").as("weekofyear"),
        col("weekend").cast("long").as("weekend"))
  }

  // ---- W3: rolling stats ----------------------------------------------

  private def w3Rolling: Q = (s, d) => {
    val e = Tables.events(s, d)
    TS.rollingStats(e, "value", 7, "ts", Seq("user_id"), Seq("event_id"))
      .select(col("event_id"), col("user_id"),
              dround(col("value_rollmean"), 4).as("roll_mean"),
              dround(col("value_rollstd"), 4).as("roll_std"))
  }

  // ---- P5/P6: null handling --------------------------------------------

  /** Nulls are injected deterministically (error events) since the test
    * tables are null-free; then forward-filled per series. */
  private def p5Ffill: Q = (s, d) => {
    val e = Tables.events(s, d)
      .withColumn("value_masked",
        when(col("event_type") === "error", lit(null)).otherwise(col("value")))
    TS.forwardFill(e, Seq("value_masked"), "ts", Seq("user_id"), Seq("event_id"))
      .select(col("event_id"), col("user_id"), col("value_masked").as("value_ffill"))
  }

  private def p6MissingFlag: Q = (s, d) => {
    val e = Tables.events(s, d)
      .withColumn("value_masked",
        when(col("event_type") === "error", lit(null)).otherwise(col("value")))
    CleanOps.missingFlags(e, Seq("value_masked"))
      .select(col("event_id"),
              col("value_masked_Missing_Flag").cast("long").as("missing_flag"))
  }

  // ---- T10: resample ----------------------------------------------------

  private def t10Resample: Q = (s, d) => {
    val o = Tables.orders(s, d)
    TS.resampleMean(o, "o_orderdate", "month", Seq("o_totalprice"))
      .select(tsStr(col("ts_bucket")).as("month_start"),
              dround(col("o_totalprice_mean"), 4).as("price_mean"),
              col("n"))
  }

  // ---- T11: future timestamp generation ---------------------------------

  private def t11Future: Q = (s, d) => {
    val o = Tables.orders(s, d)
    TS.futureTimestamps(o, "o_orderdate", 12, "1 month")
      .select(tsStr(col("o_orderdate")).as("future_ts"))
  }

  // ---- T12: expanding-window CV fold assignment --------------------------

  /** Per-series fold assignment (the scale path): every user's series gets
    * its own expanding folds in ONE partitioned window pass — no global
    * sort, no single-partition WindowExec. */
  private def t12Folds: Q = (s, d) => {
    val e = Tables.events(s, d)
    ExpandingWindowSplit.assignFolds(e, "ts", Seq("user_id"), 3, 20, Seq("event_id"))
      .groupBy(col("fold").cast("long").as("fold"))
      .agg(count(lit(1)).as("n"),
           min(col("rn").cast("long")).as("min_rn"),
           max(col("rn").cast("long")).as("max_rn"))
  }

  // ---- T13: prepend buffer (as-of style train tail + test) ---------------

  private def t13Prepend: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val cut = "1997-01-01"
    val train = o.filter(col("o_orderdate") < lit(cut))
    val test  = o.filter(col("o_orderdate") >= lit(cut))
    // deterministic "last 5" → top-5 by (date desc, key desc)
    val tail = train.orderBy(col("o_orderdate").desc, col("o_orderkey").desc).limit(5)
    tail.unionByName(test)
      .select(col("o_orderkey"), tsStr(col("o_orderdate")).as("o_date"))
  }

  // ---- T8: frequency inference decision table ----------------------------

  private def t8Freq: Q = (s, d) =>
    graft.infer.FreqInfer.freqPerSeries(Tables.events(s, d), "ts", "user_id", Seq("event_id"))

  // ---- J1: star join -----------------------------------------------------

  private def j1Star: Q = (s, d) => {
    // Pre-aggregate lineitem by its join key BEFORE the fact-fact join:
    // the grouping keys (region, month) are functionally dependent on the
    // order row, so revenue can be partial-summed per orderkey first.
    // This shrinks the join's probe side from |lineitem| rows to
    // |orderkeys| (and to 3 columns). In the shuffle-join regime (orders
    // too big to broadcast — the 100 TB case) the partial agg's hash
    // partitioning on l_orderkey is REUSED by the join, so one exchange
    // serves both; at test scale orders is broadcast instead and the agg
    // exchange stands alone (PlanAuditSpec's <=2-exchange budget covers
    // the broadcast regime). At 100 TB this is the difference between
    // shuffling the fact table wide and shuffling a third of it.
    // Measured at sf0.1: 1.20s -> 0.81s.
    // partial sums accumulate in decimal(18,2) after the SAME per-row
    // round moneySum applies, so two-level summation is exact and
    // order-independent (bit-identical to the one-level oracle)
    val li = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(dround(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2)
             .cast("decimal(18,2)")).as("rev"),
           count(lit(1)).as("cnt"))
    val o  = Tables.orders(s, d)
    val c  = Tables.customer(s, d)
    val n  = Tables.nation(s, d)
    val r  = Tables.region(s, d)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), date_trunc("month", col("o_orderdate")).as("m"))
      .agg(sum(col("rev")).cast("double").as("revenue"), sum(col("cnt")).as("n_items"))
      .select(col("r_name"), tsStr(col("m")).as("order_month"),
              col("revenue"), col("n_items"))
  }

  // ---- J2: union ----------------------------------------------------------

  private def j2Union: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val first  = o.filter(col("o_orderdate") <  lit("1996-01-01"))
    val second = o.filter(col("o_orderdate") >= lit("1996-01-01"))
    first.unionByName(second)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"))
  }

  // ---- A5: min/max + arg keys ---------------------------------------------

  private def a5MinMax: Q = (s, d) => {
    val o = Tables.orders(s, d)
    o.agg(
      min(col("o_totalprice")).as("min_value"),
      max(col("o_totalprice")).as("max_value"),
      min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("argmin_key"),
      max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey").unary_-)).as("argmax_key"))
  }

  // ---- A1-A4/A9: metric aggregates ------------------------------------------

  /** yhat := previous value (lag-1 forecast) per user; metrics by event_type. */
  private def a1Metrics: Q = (s, d) => {
    val e = Tables.events(s, d)
    val w = TS.seriesWindow("ts", Seq("user_id"), Seq("event_id"))
    val withPred = e.withColumn("yhat", lag(col("value"), 1).over(w)).na.drop(Seq("yhat"))
    Metrics.allMetrics(withPred, "value", "yhat", Seq("event_type"))
      .select(col("event_type"),
        dround(col("rmse"), 4).as("rmse"),
        dround(col("norm_rmse"), 4).as("norm_rmse"),
        dround(col("mae"), 4).as("mae"),
        dround(col("mse"), 4).as("mse"),
        dround(col("mape"), 4).as("mape"),
        dround(col("minmax_rmse"), 4).as("minmax_rmse"),
        col("n"))
  }

  // ---- A7: value counts / top-k ----------------------------------------------

  private def a7ValueCounts: Q = (s, d) => {
    Tables.events(s, d).groupBy(col("event_type")).agg(count(lit(1)).as("n"))
  }

  private def a7Top2: Q = (s, d) => {
    val c = Tables.customer(s, d)
    c.groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("c_mktsegment"))
      .limit(2)
  }

  // ---- A10: correlation -------------------------------------------------------

  private def a10Corr: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    li.groupBy(col("l_returnflag"))
      .agg(dround(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
           count(lit(1)).as("n"))
  }

  // ---- A11: class distribution --------------------------------------------------

  /** Single plan: the (total, k) scalar aggregate is broadcast into the
    * per-class aggregate — no driver-side count()/collect() actions. */
  private def a11ClassDist: Q = (s, d) => {
    val em = Tables.embeddings(s, d)
    val t = em.agg(count(lit(1)).cast("double").as("total"),
                   countDistinct(col("label")).cast("double").as("k"))
    em.groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(t))
      .select(col("label"), col("n"),
        dround(col("n") / col("total"), 6).as("pct"),
        dround(col("total") / (col("k") * col("n")), 6).as("class_weight"))
  }

  // ---- O2/O3: sorts & top-k ---------------------------------------------------

  private def o3TopK: Q = (s, d) => {
    val o = Tables.orders(s, d)
    o.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_totalprice"))
  }

  // =====================  registry  =====================

  val queries: Map[String, Q] = Map(
    "t1_lag"          -> t1Lag,
    "t2_lead"         -> t2Lead,
    "t4_diff"         -> t4Diff,
    "t5_cumsum"       -> t5Cumsum,
    "t6_calendar"     -> t6Calendar,
    "w3_rolling"      -> w3Rolling,
    "p5_ffill"        -> p5Ffill,
    "p6_missing_flag" -> p6MissingFlag,
    "t10_resample"    -> t10Resample,
    "t11_future"      -> t11Future,
    "t12_folds"       -> t12Folds,
    "t13_prepend"     -> t13Prepend,
    "t8_freq"         -> t8Freq,
    "j1_star"         -> j1Star,
    "j2_union"        -> j2Union,
    "a5_minmax"       -> a5MinMax,
    "a1_metrics"      -> a1Metrics,
    "a7_value_counts" -> a7ValueCounts,
    "a7_top2"         -> a7Top2,
    "a10_corr"        -> a10Corr,
    "a11_class_dist"  -> a11ClassDist,
    "o3_topk"         -> o3TopK
  )

  private val W = "(PARTITION BY user_id ORDER BY ts, event_id)"

  val oracle: Map[String, String] = Map(
    "t1_lag" ->
      s"""SELECT event_id, user_id, value,
         | lag(value,1) OVER $W AS value_lag1,
         | lag(value,2) OVER $W AS value_lag2,
         | lag(value,3) OVER $W AS value_lag3
         |FROM events""".stripMargin,

    "t2_lead" ->
      s"""SELECT event_id, user_id, value,
         | lead(value,1) OVER $W AS value_lead1,
         | lead(value,2) OVER $W AS value_lead2
         |FROM events""".stripMargin,

    "t4_diff" ->
      s"""WITH d1 AS (
         |  SELECT event_id, user_id, ts,
         |         value - lag(value,1) OVER $W AS vd1
         |  FROM events)
         |SELECT event_id, user_id, vd1 AS value_diff1,
         |       vd1 - lag(vd1,1) OVER $W AS value_diff2
         |FROM d1""".stripMargin,

    "t5_cumsum" ->
      s"""SELECT event_id, user_id,
         | ${droundSql(s"sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", 4)} AS running_value
         |FROM events""".stripMargin,

    "t6_calendar" ->
      """SELECT event_id,
        | hour(ts) AS hour, minute(ts) AS minute,
        | isodow(ts) - 1 AS dayofweek,
        | quarter(ts) AS quarter, month(ts) AS month, year(ts) AS year,
        | dayofyear(ts) AS dayofyear, day(ts) AS dayofmonth,
        | week(ts) AS weekofyear,
        | CAST(CASE WHEN isodow(ts) - 1 >= 5 THEN 1 ELSE 0 END AS BIGINT) AS weekend
        |FROM events""".stripMargin,

    "w3_rolling" ->
      s"""SELECT event_id, user_id,
         | ${droundSql("avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)", 4)} AS roll_mean,
         | ${droundSql("stddev_samp(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)", 4)} AS roll_std
         |FROM events""".stripMargin,

    "p5_ffill" ->
      s"""SELECT event_id, user_id,
         | last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END IGNORE NULLS)
         |   OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
         |FROM events""".stripMargin,

    "p6_missing_flag" ->
      """SELECT event_id,
        | CAST(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS BIGINT) AS missing_flag
        |FROM events""".stripMargin,

    "t10_resample" ->
      s"""SELECT ${tsStrSql("date_trunc('month', o_orderdate)")} AS month_start,
         | ${droundSql("avg(o_totalprice)", 4)} AS price_mean,
         | count(*) AS n
         |FROM orders GROUP BY date_trunc('month', o_orderdate)""".stripMargin,

    "t11_future" ->
      s"""SELECT ${tsStrSql("f")} AS future_ts FROM (
         |  SELECT unnest(generate_series(
         |    (SELECT max(o_orderdate) FROM orders) + INTERVAL 1 MONTH,
         |    (SELECT max(o_orderdate) FROM orders) + INTERVAL 12 MONTH,
         |    INTERVAL 1 MONTH)) AS f)""".stripMargin,

    "t12_folds" ->
      s"""WITH rn AS (
         |  SELECT row_number() OVER $W AS rn,
         |         count(*) OVER (PARTITION BY user_id) AS n
         |  FROM events)
         |SELECT CASE WHEN 3 - floor((n - rn) / 20.0) BETWEEN 1 AND 3
         |            THEN CAST(3 - floor((n - rn) / 20.0) AS BIGINT) ELSE 0 END AS fold,
         |       count(*) AS n, min(rn) AS min_rn, max(rn) AS max_rn
         |FROM rn GROUP BY 1""".stripMargin,

    "t13_prepend" ->
      s"""SELECT o_orderkey, ${tsStrSql("o_orderdate")} AS o_date FROM (
         |  SELECT o_orderkey, o_orderdate FROM orders
         |  WHERE o_orderdate < TIMESTAMP '1997-01-01'
         |  ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 5)
         |UNION ALL
         |SELECT o_orderkey, ${tsStrSql("o_orderdate")} AS o_date FROM orders
         |WHERE o_orderdate >= TIMESTAMP '1997-01-01'""".stripMargin,

    "t8_freq" ->
      graft.infer.FreqInfer.freqPerSeriesSql("events", "ts", "user_id", Seq("event_id")),

    "j1_star" ->
      s"""SELECT r_name, ${tsStrSql("date_trunc('month', o_orderdate)")} AS order_month,
         | ${moneySumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         | count(*) AS n_items
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |GROUP BY r_name, date_trunc('month', o_orderdate)""".stripMargin,

    "j2_union" ->
      s"""SELECT o_orderstatus, count(*) AS n, ${moneySumSql("o_totalprice")} AS total
         |FROM (
         |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
         |  UNION ALL
         |  SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01')
         |GROUP BY o_orderstatus""".stripMargin,

    "a5_minmax" ->
      """SELECT min(o_totalprice) AS min_value, max(o_totalprice) AS max_value,
        | (SELECT min(o_orderkey) FROM orders
        |   WHERE o_totalprice = (SELECT min(o_totalprice) FROM orders)) AS argmin_key,
        | (SELECT min(o_orderkey) FROM orders
        |   WHERE o_totalprice = (SELECT max(o_totalprice) FROM orders)) AS argmax_key
        |FROM orders""".stripMargin,

    "a1_metrics" ->
      s"""WITH p AS (
         |  SELECT event_type, value AS y, lag(value,1) OVER $W AS yhat
         |  FROM events)
         |SELECT event_type,
         | ${droundSql("sqrt(avg((y - yhat)*(y - yhat)))", 4)} AS rmse,
         | ${droundSql("sqrt(avg((y - yhat)*(y - yhat))) / stddev_samp(y)", 4)} AS norm_rmse,
         | ${droundSql("avg(abs(y - yhat))", 4)} AS mae,
         | ${droundSql("avg((y - yhat)*(y - yhat))", 4)} AS mse,
         | ${droundSql("avg(CASE WHEN y <> 0 THEN abs((y - yhat)/y)*100 END)", 4)} AS mape,
         | ${droundSql("sqrt(avg((y - yhat)*(y - yhat))) / (max(y) - min(y))", 4)} AS minmax_rmse,
         | count(*) AS n
         |FROM p WHERE yhat IS NOT NULL
         |GROUP BY event_type""".stripMargin,

    "a7_value_counts" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",

    "a7_top2" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |GROUP BY c_mktsegment ORDER BY n DESC, c_mktsegment LIMIT 2""".stripMargin,

    "a10_corr" ->
      s"""SELECT l_returnflag,
         | ${droundSql("corr(l_quantity, l_extendedprice)", 6)} AS corr_qty_price,
         | count(*) AS n
         |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "a11_class_dist" ->
      s"""WITH t AS (SELECT CAST(count(*) AS DOUBLE) AS total,
         |                  CAST(count(DISTINCT label) AS DOUBLE) AS k
         |           FROM embeddings)
         |SELECT CAST(label AS BIGINT) AS label, count(*) AS n,
         | ${droundSql("count(*) / any_value(t.total)", 6)} AS pct,
         | ${droundSql("any_value(t.total) / (any_value(t.k) * count(*))", 6)} AS class_weight
         |FROM embeddings, t GROUP BY label""".stripMargin,

    "o3_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin
  )
}
