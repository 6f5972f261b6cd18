package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Det._

/** Round-12 session-3 additions: the cross-series econometrics layer
  * (Granger causality, Engle–Granger cointegration), volatility and
  * temporal-aggregation forecasting (GARCH(1,1) filter, ADIDA),
  * frequency-domain and long-memory diagnostics (periodogram, R/S
  * Hurst), hybrid retrieval (Dirichlet query likelihood + reciprocal-
  * rank fusion), and the experiment-design gates (SRM, MDE sizing).
  * Every query pairs a Spark plan with a DuckDB oracle. */
object ScaleQueries7 {

  type Q = (SparkSession, String) => DataFrame

  /** 1e-9 grid in SQL — the twin of Econometrics' internal fold grid. */
  private def g9Sql(e: String): String =
    s"CAST(floor(($e)*1.0E9 + 0.5) AS BIGINT)"

  // ---- shared daily two-series frame (m14/m15) ---------------------------

  /** Daily (y = purchase dollars/1000 from exact cents, x = views/100):
    * O(1)-scaled, exact-grid inputs — the m4_var1 scaling discipline. */
  private def dailyXY(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(
        sum(when(col("event_type") === "purchase",
          floor(col("value") * 100 + 0.5).cast("long")).otherwise(0L)).as("pc"),
        count(when(col("event_type") === "view", 1)).cast("long").as("vc"))

  private val dailyXYSql =
    """SELECT date_trunc('day', ts) AS day,
      |  CAST(sum(CASE WHEN event_type = 'purchase'
      |    THEN CAST(floor(value*100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS pc,
      |  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS vc
      |FROM events GROUP BY 1""".stripMargin

  // ---- M14: Granger causality --------------------------------------------

  /** M14 — lag-1 Granger causality between daily view counts and daily
    * purchase totals, both directions: does x's past improve y's AR(1)
    * fit? F = (RSS_r − RSS_u)(n−3)/RSS_u. The exogenous-regressor gate
    * in front of the M1x/M4 paths. */
  private def m14Granger: Q = (s, d) => {
    val daily = dailyXY(s, d).select(col("day"),
      (col("pc").cast("double") / 100.0 / 1000.0).as("y"),
      (col("vc").cast("double") / 100.0).as("x"))
    graft.stats.Econometrics.grangerLag1(daily, "day", "x", "y")
      .select(col("direction"), col("n"),
        dround(col("b_own"), 6).as("b_own"),
        dround(col("b_cross"), 6).as("b_cross"),
        dround(col("rss_r"), 6).as("rss_r"),
        dround(col("rss_u"), 6).as("rss_u"),
        dround(col("f_stat"), 6).as("f_stat"))
  }

  /** One Granger direction in SQL: dep/own/cross column names splice in. */
  private def grangerDirSql(dir: String, dep: String, own: String,
                            cross: String): String =
    s"""SELECT '$dir' AS direction, n, ${droundSql("b_own", 6)} AS b_own,
       | ${droundSql("b_cross", 6)} AS b_cross,
       | ${droundSql("rss_r", 6)} AS rss_r, ${droundSql("rss_u", 6)} AS rss_u,
       | ${droundSql("(rss_r - rss_u)*(nd - 3.0)/rss_u", 6)} AS f_stat
       |FROM (
       |  SELECT n, nd, rss_r, det, b_own, b_cross,
       |    cyy - b_own*c1y - b_cross*c2y AS rss_u
       |  FROM (
       |    SELECT n, nd, cyy, c1y, c2y, det,
       |      cyy - c1y*c1y/c11 AS rss_r,
       |      (c1y*c22 - c2y*c12)/det AS b_own,
       |      (c2y*c11 - c1y*c12)/det AS b_cross
       |    FROM (
       |      SELECT n, nd, c11, c12, c22, c1y, c2y, cyy,
       |        c11*c22 - c12*c12 AS det
       |      FROM (
       |        SELECT n, nd,
       |          s11 - s1*s1/nd AS c11, s12 - s1*s2/nd AS c12,
       |          s22 - s2*s2/nd AS c22, s1y - s1*sy/nd AS c1y,
       |          s2y - s2*sy/nd AS c2y, syy - sy*sy/nd AS cyy
       |        FROM (
       |          SELECT CAST(count(*) AS BIGINT) AS n,
       |            CAST(count(*) AS DOUBLE) AS nd,
       |            CAST(sum(${g9Sql(own)}) AS BIGINT)/1.0E9 AS s1,
       |            CAST(sum(${g9Sql(cross)}) AS BIGINT)/1.0E9 AS s2,
       |            CAST(sum(${g9Sql(dep)}) AS BIGINT)/1.0E9 AS sy,
       |            CAST(sum(${g9Sql(s"($own)*($own)")}) AS BIGINT)/1.0E9 AS s11,
       |            CAST(sum(${g9Sql(s"($own)*($cross)")}) AS BIGINT)/1.0E9 AS s12,
       |            CAST(sum(${g9Sql(s"($cross)*($cross)")}) AS BIGINT)/1.0E9 AS s22,
       |            CAST(sum(${g9Sql(s"($own)*($dep)")}) AS BIGINT)/1.0E9 AS s1y,
       |            CAST(sum(${g9Sql(s"($cross)*($dep)")}) AS BIGINT)/1.0E9 AS s2y,
       |            CAST(sum(${g9Sql(s"($dep)*($dep)")}) AS BIGINT)/1.0E9 AS syy
       |          FROM r))))) """.stripMargin

  private val m14Sql =
    s"""WITH dd AS ($dailyXYSql),
       |xy AS (SELECT day, CAST(pc AS DOUBLE)/100.0/1000.0 AS y,
       |         CAST(vc AS DOUBLE)/100.0 AS x FROM dd),
       |l AS (SELECT y, x, lag(y) OVER (ORDER BY day) AS ly,
       |        lag(x) OVER (ORDER BY day) AS lx FROM xy),
       |r AS (SELECT * FROM l WHERE ly IS NOT NULL)
       |${grangerDirSql("x=>y", "y", "ly", "lx")}
       |UNION ALL
       |${grangerDirSql("y=>x", "x", "lx", "ly")}""".stripMargin

  // ---- M15: Engle–Granger cointegration ----------------------------------

  /** M15 — Engle–Granger two-step over the cumulative (I(1)) daily
    * levels: static OLS Y ~ X, then the Dickey–Fuller t-stat on the
    * residuals. The shared-stochastic-trend gate for level-on-level
    * regressions (spurious unless the residual is stationary). */
  private def m15Coint: Q = (s, d) => {
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val levels = dailyXY(s, d).coalesce(1)
      .withColumn("cpc", sum(col("pc")).over(w))
      .withColumn("cvc", sum(col("vc")).over(w))
      .select(col("day"),
        (col("cpc").cast("double") / 100.0 / 100000.0).as("yy"),
        (col("cvc").cast("double") / 100.0).as("xx"))
    graft.stats.Econometrics.engleGranger(levels, "day", "xx", "yy")
      .select(col("n"),
        dround(col("alpha"), 6).as("alpha"),
        dround(col("beta"), 6).as("beta"),
        dround(col("rho"), 6).as("rho"),
        dround(col("se_rho"), 6).as("se_rho"),
        dround(col("t_stat"), 6).as("t_stat"))
  }

  private val m15Sql =
    s"""WITH dd AS ($dailyXYSql),
       |lv AS (SELECT day,
       |    CAST(sum(pc) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS DOUBLE)/100.0/100000.0 AS yy,
       |    CAST(sum(vc) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS DOUBLE)/100.0 AS xx
       |  FROM dd),
       |m1 AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(count(*) AS DOUBLE) AS nd,
       |    CAST(sum(${g9Sql("xx")}) AS BIGINT)/1.0E9 AS sx,
       |    CAST(sum(${g9Sql("yy")}) AS BIGINT)/1.0E9 AS sy,
       |    CAST(sum(${g9Sql("xx*xx")}) AS BIGINT)/1.0E9 AS sxx,
       |    CAST(sum(${g9Sql("xx*yy")}) AS BIGINT)/1.0E9 AS sxy
       |  FROM lv),
       |fit AS (SELECT n, nd,
       |    (nd*sxy - sx*sy)/(nd*sxx - sx*sx) AS beta, sx, sy FROM m1),
       |fit2 AS (SELECT n, nd, beta, (sy - beta*sx)/nd AS alpha FROM fit),
       |e AS (SELECT lv.day, lv.yy - fit2.alpha - fit2.beta*lv.xx AS e,
       |        fit2.n, fit2.alpha, fit2.beta
       |      FROM lv CROSS JOIN fit2),
       |le AS (SELECT n, alpha, beta, e,
       |         lag(e) OVER (ORDER BY day) AS lee FROM e),
       |r AS (SELECT n, alpha, beta, lee AS le, e - lee AS de
       |      FROM le WHERE lee IS NOT NULL),
       |m2 AS (SELECT n, alpha, beta, CAST(count(*) AS DOUBLE) AS md,
       |    CAST(sum(${g9Sql("le*de")}) AS BIGINT)/1.0E9 AS sed,
       |    CAST(sum(${g9Sql("le*le")}) AS BIGINT)/1.0E9 AS see,
       |    CAST(sum(${g9Sql("de*de")}) AS BIGINT)/1.0E9 AS sdd
       |  FROM r GROUP BY 1, 2, 3),
       |f AS (SELECT n, alpha, beta, sed/see AS rho,
       |        sdd - (sed/see)*sed AS ssu, md, see FROM m2),
       |t AS (SELECT n, alpha, beta, rho,
       |        sqrt((ssu/(md - 1.0))/see) AS se_rho FROM f)
       |SELECT n, ${droundSql("alpha", 6)} AS alpha, ${droundSql("beta", 6)} AS beta,
       | ${droundSql("rho", 6)} AS rho, ${droundSql("se_rho", 6)} AS se_rho,
       | ${droundSql("rho/se_rho", 6)} AS t_stat
       |FROM t""".stripMargin

  // ---- F22: GARCH(1,1) volatility filter ----------------------------------

  /** F22 — GARCH(1,1) conditional variance over each user's first-
    * difference returns, fixed (ω, α, β) = (1/4, 1/4, 1/2): the
    * volatility trajectory + standardized residuals. Oracle replays the
    * exact recursion as a recursive CTE (the f16 Kalman pattern — every
    * step is IEEE ops on binary-fraction coefficients and grid inputs). */
  private def f22Garch: Q = (s, d) =>
    graft.scale.PerSeriesForecast.garchFilter(
        Tables.events(s, d), "value", "ts", "user_id", "event_id",
        omega = 0.25, alpha = 0.25, beta = 0.5, h0 = 1.0)
      .select(col("user_id"), col("event_id"),
        dround(col("r"), 2).as("r"),
        dround(col("h"), 6).as("h"),
        dround(col("vol"), 6).as("vol"),
        dround(col("z"), 6).as("z"))

  private val f22Sql =
    s"""WITH RECURSIVE s AS (SELECT user_id, event_id,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
       |    floor(CAST(value AS DOUBLE)*100 + 0.5)/100 AS y
       |  FROM events),
       |r AS (SELECT s.user_id, s.event_id, s.rn - 1 AS t, s.y - p.y AS ret
       |      FROM s JOIN s p ON p.user_id = s.user_id AND p.rn = s.rn - 1),
       |st(user_id, t, ret, h) AS (
       |  SELECT user_id, t, ret, CAST(1.0 AS DOUBLE) FROM r WHERE t = 1
       |  UNION ALL
       |  SELECT r.user_id, r.t, r.ret,
       |    0.25 + 0.25*st.ret*st.ret + 0.5*st.h
       |  FROM st JOIN r ON r.user_id = st.user_id AND r.t = st.t + 1)
       |SELECT r.user_id, r.event_id,
       |  ${droundSql("r.ret", 2)} AS r,
       |  ${droundSql("st.h", 6)} AS h,
       |  ${droundSql("sqrt(st.h)", 6)} AS vol,
       |  ${droundSql("r.ret/sqrt(st.h)", 6)} AS z
       |FROM r JOIN st ON st.user_id = r.user_id AND st.t = r.t""".stripMargin

  // ---- F21: ADIDA intermittent-demand forecast ----------------------------

  /** F21 — ADIDA over the per-user purchase-demand series: block-4
    * temporal aggregation, SES (α = 1/2 closed dyadic weights) on the
    * block series, uniform disaggregation back to period level. */
  private def f21Adida: Q = (s, d) =>
    graft.scale.PerSeriesForecast.adidaForecast(
        Tables.events(s, d).withColumn("demand",
          when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0))),
        "demand", "ts", Seq("user_id"), m = 4, alpha = 0.5, tieBreak = Seq("event_id"))
      .select(col("user_id"), col("n_periods"), col("n_blocks"),
        dround(col("yhat_block"), 6).as("yhat_block"),
        dround(col("yhat_period"), 6).as("yhat_period"))

  private val f21Sql =
    s"""WITH s AS (SELECT user_id,
       |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn,
       |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
       |    CASE WHEN event_type = 'purchase'
       |      THEN CAST(floor(value*100 + 0.5) AS BIGINT) ELSE 0 END AS c
       |  FROM events),
       |g AS (SELECT * FROM s WHERE n >= 8 AND rn > n % 4),
       |b AS (SELECT user_id, max(n) AS n, (rn - n % 4 - 1) // 4 + 1 AS b,
       |        CAST(sum(c) AS BIGINT) AS zc
       |      FROM g GROUP BY user_id, (rn - n % 4 - 1) // 4 + 1),
       |w AS (SELECT user_id, n, b, zc,
       |        CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS nb FROM b),
       |t AS (SELECT user_id, CAST(max(n) AS BIGINT) AS n_periods,
       |        CAST(max(nb) AS BIGINT) AS n_blocks,
       |        CAST(sum(CAST(floor((zc/100.0)
       |          * (CASE WHEN b = 1 THEN pow(0.5, nb - 1)
       |                  ELSE 0.5*pow(0.5, nb - b) END) * 1.0E9 + 0.5) AS BIGINT)) AS BIGINT) AS s9
       |      FROM w GROUP BY 1)
       |SELECT user_id, n_periods, n_blocks,
       |  ${droundSql("s9/1.0E9", 6)} AS yhat_block,
       |  ${droundSql("s9/1.0E9/4", 6)} AS yhat_period
       |FROM t""".stripMargin

  // ---- T26: DFT periodogram ----------------------------------------------

  private val t26Periods = 2 to 8

  /** T26 — periodogram power at candidate periods 2..8 per user series:
    * the frequency-domain seasonal detector (complement to the ACF-based
    * t9 pick). The cos/sin tables are 1e-6-grid literals shared verbatim
    * with the oracle — no trig runs inside either engine. */
  private def t26Periodogram: Q = (s, d) =>
    graft.scale.SeriesDiagnostics.periodogram(
        Tables.events(s, d), "value", "ts", Seq("user_id"),
        t26Periods, minLen = 20, tieBreak = Seq("event_id"))
      .select(col("user_id"), col("p"), dround(col("power"), 4).as("power"))

  private val t26Sql = {
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    val rows = t26Periods.flatMap { p =>
      (0 until p).map { j =>
        val c = r6(math.cos(2 * math.Pi * j / p))
        val sn = r6(math.sin(2 * math.Pi * j / p))
        s"($p, ${j + 1}, $c, $sn)"
      }
    }.mkString(", ")
    s"""WITH ct(p, j, c, s) AS (VALUES $rows),
       |sr AS (SELECT user_id,
       |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn,
       |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
       |    CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT))
       |      OVER (PARTITION BY user_id) AS BIGINT) AS sc,
       |    floor(value*100 + 0.5)/100.0 AS y
       |  FROM events),
       |g AS (SELECT user_id, rn,
       |        y - CAST(sc AS DOUBLE)/n/100.0 AS yd
       |      FROM sr WHERE n >= 20),
       |terms AS (SELECT g.user_id, ct.p,
       |    CAST(floor(g.yd * ct.c * 1.0E9 + 0.5) AS BIGINT) AS zc9,
       |    CAST(floor(g.yd * ct.s * 1.0E9 + 0.5) AS BIGINT) AS zs9
       |  FROM g JOIN ct ON ct.j = (g.rn - 1) % ct.p + 1),
       |a AS (SELECT user_id, p, CAST(sum(zc9) AS BIGINT) AS zc9,
       |        CAST(sum(zs9) AS BIGINT) AS zs9
       |      FROM terms GROUP BY 1, 2)
       |SELECT user_id, CAST(p AS BIGINT) AS p,
       |  ${droundSql("(zc9/1.0E9)*(zc9/1.0E9) + (zs9/1.0E9)*(zs9/1.0E9)", 4)} AS power
       |FROM a""".stripMargin
  }

  // ---- A39: R/S Hurst exponent --------------------------------------------

  /** A39 — rescaled-range statistics at dyadic windows {8,16,32} per
    * user series and the Hurst exponent as the grid-rounded log-log
    * slope: the long-memory diagnostic (H≈0.5 random walk, H>0.5
    * persistent — is there drift to model at all?). */
  private def a39Hurst: Q = (s, d) =>
    graft.scale.SeriesDiagnostics.rsHurst(
        Tables.events(s, d), "value", "ts", Seq("user_id"),
        windows = Seq(8, 16, 32), tieBreak = Seq("event_id"))
      .select(col("user_id"), col("min_blocks"),
        dround(col("hurst"), 6).as("hurst"))

  private val a39Sql =
    s"""WITH sr AS (SELECT user_id,
       |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn,
       |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
       |    CAST(floor(value*100 + 0.5) AS BIGINT) AS cents
       |  FROM events),
       |e AS (SELECT sr.*, CAST(ws.w AS BIGINT) AS w
       |      FROM sr JOIN (VALUES (8), (16), (32)) AS ws(w) ON true
       |      WHERE n >= 32 AND rn <= (n // ws.w) * ws.w),
       |bl AS (SELECT user_id, w, (rn - 1) // w AS b, (rn - 1) % w + 1 AS k, cents,
       |    CAST(sum(cents) OVER (PARTITION BY user_id, w, (rn - 1) // w
       |      ORDER BY rn) AS BIGINT) AS cum,
       |    CAST(sum(cents) OVER (PARTITION BY user_id, w, (rn - 1) // w) AS BIGINT) AS tot,
       |    CAST(sum(cents*cents) OVER (PARTITION BY user_id, w, (rn - 1) // w) AS BIGINT) AS sq
       |  FROM e),
       |dv AS (SELECT user_id, w, b,
       |        CAST(w*cum - k*tot AS DOUBLE)/(100.0*w) AS dev, tot, sq FROM bl),
       |pb AS (SELECT user_id, w, b, max(dev) AS dmax, min(dev) AS dmin,
       |        max(tot) AS tot, max(sq) AS sq FROM dv GROUP BY 1, 2, 3),
       |rsb AS (SELECT user_id, w,
       |    greatest(dmax, 0.0) - least(dmin, 0.0) AS rng,
       |    sqrt(CAST(w*sq - tot*tot AS DOUBLE))/(100.0*w) AS sd
       |  FROM pb),
       |rs9 AS (SELECT user_id, w,
       |    CAST(floor(rng/sd*1.0E9 + 0.5) AS BIGINT) AS rs9
       |  FROM rsb WHERE sd > 0),
       |ps AS (SELECT user_id, w, CAST(count(*) AS BIGINT) AS nb,
       |        CAST(sum(rs9) AS BIGINT) AS rs9 FROM rs9 GROUP BY 1, 2),
       |lg AS (SELECT user_id, nb,
       |    floor(ln(CAST(w AS DOUBLE))*1000000.0 + 0.5)/1000000.0 AS lx,
       |    floor(ln(rs9/1.0E9/nb)*1000000.0 + 0.5)/1000000.0 AS ly
       |  FROM ps),
       |h AS (SELECT user_id, CAST(count(*) AS DOUBLE) AS ns,
       |    CAST(sum(${g9Sql("lx")}) AS BIGINT)/1.0E9 AS sx,
       |    CAST(sum(${g9Sql("ly")}) AS BIGINT)/1.0E9 AS sy,
       |    CAST(sum(${g9Sql("lx*lx")}) AS BIGINT)/1.0E9 AS sxx,
       |    CAST(sum(${g9Sql("lx*ly")}) AS BIGINT)/1.0E9 AS sxy,
       |    CAST(min(nb) AS BIGINT) AS min_blocks
       |  FROM lg GROUP BY 1 HAVING count(*) = 3)
       |SELECT user_id, min_blocks,
       |  ${droundSql("(ns*sxy - sx*sy)/(ns*sxx - sx*sx)", 6)} AS hurst
       |FROM h""".stripMargin

  // ---- S18/S19: hybrid retrieval ------------------------------------------

  /** Shared keyword query set — verbatim with s7_bm25's. */
  private val retrQueries: Seq[(Long, String)] = Seq(
    (0L, "spark join performance"), (1L, "window agg order"),
    (2L, "customer value table"))

  private val retrQueriesSql =
    """(VALUES (0, 'spark join performance'), (1, 'window agg order'),
      |  (2, 'customer value table'))""".stripMargin

  /** S18 — Dirichlet query-likelihood retrieval (µ = 2000): the
    * language-modeling scorer next to s7's BM25. Missing query terms
    * still contribute smoothed mass. */
  private def s18Qld: Q = (s, d) =>
    graft.scale.TextAnalysis.qldTopK(Tables.documents(s, d), "text", "doc_id",
      retrQueries, k = 10, mu = 2000.0)

  /** QLD CTE chain up to the ranked list `NAME_rk` (shared by s18/s19). */
  private def qldCtes(rkName: String): String =
    s"""qterm AS (SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) AS t FROM queries),
       |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
       |stats AS (SELECT sum(dl)::DOUBLE AS ctot FROM dl),
       |tf AS (
       |  SELECT d.doc_id, tok.t, count(*)::DOUBLE AS tf
       |  FROM documents d, unnest(string_split(d.text, ' ')) AS tok(t)
       |  WHERE tok.t IN (SELECT DISTINCT t FROM qterm)
       |  GROUP BY 1, 2),
       |cf AS (SELECT t, sum(tf) AS cf FROM tf GROUP BY 1),
       |cand AS (SELECT DISTINCT q.query_id, tf.doc_id
       |         FROM qterm q JOIN tf ON tf.t = q.t),
       |qsc AS (
       |  SELECT c.query_id, c.doc_id,
       |    CAST(floor(ln((coalesce(tf.tf, 0.0) + 2000.0*cf.cf/stats.ctot)
       |      / (CAST(dl.dl AS DOUBLE) + 2000.0)) * 1e9 + 0.5) AS BIGINT) AS s9
       |  FROM cand c JOIN qterm q ON q.query_id = c.query_id
       |  JOIN cf ON cf.t = q.t
       |  JOIN dl ON dl.doc_id = c.doc_id
       |  LEFT JOIN tf ON tf.doc_id = c.doc_id AND tf.t = q.t
       |  CROSS JOIN stats),
       |qagg AS (SELECT query_id, doc_id, CAST(sum(s9) AS BIGINT) AS s9
       |         FROM qsc GROUP BY 1, 2),
       |$rkName AS (SELECT query_id, doc_id,
       |    floor((CAST(s9 AS DOUBLE) / 1e9) * 1e6 + 0.5) / 1e6 AS score,
       |    row_number() OVER (PARTITION BY query_id ORDER BY s9 DESC, doc_id) AS rk
       |  FROM qagg)""".stripMargin

  private val s18Sql =
    s"""WITH queries(query_id, qtext) AS $retrQueriesSql,
       |${qldCtes("rk")}
       |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score,
       |  CAST(rk AS BIGINT) AS rank
       |FROM rk WHERE rk <= 10""".stripMargin

  /** BM25 CTE chain up to `NAME_rk` — mirrors s7Sql (k1=1.2, b=0.75). */
  private def bm25Ctes(rkName: String): String =
    s"""bqterm AS (SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) AS t FROM queries),
       |bdl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
       |bstats AS (SELECT count(*)::DOUBLE AS n, (sum(dl)::DOUBLE / count(*)) AS avgdl FROM bdl),
       |btf AS (
       |  SELECT d.doc_id, tok.t, count(*)::DOUBLE AS tf
       |  FROM documents d, unnest(string_split(d.text, ' ')) AS tok(t)
       |  WHERE tok.t IN (SELECT DISTINCT t FROM bqterm)
       |  GROUP BY 1, 2),
       |bdf AS (SELECT t, count(*)::DOUBLE AS df FROM btf GROUP BY 1),
       |bsc AS (
       |  SELECT q.query_id, btf.doc_id,
       |    CAST(floor(
       |      ln((bstats.n - bdf.df + 0.5) / (bdf.df + 0.5) + 1.0) *
       |      (btf.tf * 2.2) / (btf.tf + 1.2 * (1 - 0.75 + 0.75 * bdl.dl / bstats.avgdl))
       |      * 1e9 + 0.5) AS BIGINT) AS s9
       |  FROM bqterm q JOIN btf ON q.t = btf.t
       |  JOIN bdf ON bdf.t = q.t JOIN bdl ON bdl.doc_id = btf.doc_id CROSS JOIN bstats),
       |bagg AS (SELECT query_id, doc_id, CAST(sum(s9) AS BIGINT) AS s9 FROM bsc GROUP BY 1, 2),
       |$rkName AS (SELECT query_id, doc_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY s9 DESC, doc_id) AS rk
       |  FROM bagg)""".stripMargin

  /** S19 — reciprocal-rank fusion (c = 60) of the BM25 and QLD top-20
    * lists into a hybrid top-10: the standard calibration-free combiner
    * (Cormack et al. 2009). */
  private def s19Rrf: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val r1 = graft.scale.TextAnalysis.bm25TopK(docs, "text", "doc_id",
      retrQueries, k = 20)
    val r2 = graft.scale.TextAnalysis.qldTopK(docs, "text", "doc_id",
      retrQueries, k = 20, mu = 2000.0)
    graft.scale.TextAnalysis.rrfFuse(r1, r2, c = 60, k = 10)
      .select(col("query_id"), col("doc_id"),
        dround(col("rrf"), 9).as("rrf"), col("rank"))
  }

  private val s19Sql =
    s"""WITH queries(query_id, qtext) AS $retrQueriesSql,
       |${bm25Ctes("brk")},
       |${qldCtes("qrk")},
       |p1 AS (SELECT query_id, doc_id,
       |    CAST(floor(1e9/(60 + rk)) AS BIGINT) AS p FROM brk WHERE rk <= 20),
       |p2 AS (SELECT query_id, doc_id,
       |    CAST(floor(1e9/(60 + rk)) AS BIGINT) AS p FROM qrk WHERE rk <= 20),
       |fu AS (SELECT coalesce(p1.query_id, p2.query_id) AS query_id,
       |    coalesce(p1.doc_id, p2.doc_id) AS doc_id,
       |    coalesce(p1.p, 0) + coalesce(p2.p, 0) AS s9
       |  FROM p1 FULL OUTER JOIN p2
       |    ON p1.query_id = p2.query_id AND p1.doc_id = p2.doc_id),
       |frk AS (SELECT query_id, doc_id, s9,
       |    row_number() OVER (PARTITION BY query_id ORDER BY s9 DESC, doc_id) AS rk
       |  FROM fu)
       |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
       |  ${droundSql("s9/1.0E9", 9)} AS rrf, CAST(rk AS BIGINT) AS rank
       |FROM frk WHERE rk <= 10""".stripMargin

  // ---- A40: sample-ratio mismatch -----------------------------------------

  /** A40 — SRM χ²(1 df) over five md5 half-space assignments of the
    * user population: the assignment-integrity gate (Kohavi et al.) in
    * front of the a37/a38 readouts. Critical value is a literal. */
  private def a40Srm: Q = (s, d) =>
    graft.stats.ExperimentDesign.srmCheck(
        Tables.events(s, d), "user_id", salts = Seq(1, 2, 3, 4, 5))
      .select(col("salt"), col("n"), col("n_a"), col("n_b"),
        dround(col("chi2"), 6).as("chi2"),
        when(col("srm"), 1L).otherwise(0L).as("srm_flag"))

  private val a40Sql =
    s"""WITH u AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS u FROM events),
       |e AS (SELECT u.u, CAST(s.salt AS BIGINT) AS salt
       |      FROM u CROSS JOIN (VALUES (1), (2), (3), (4), (5)) AS s(salt)),
       |a AS (SELECT salt, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN md5(u || ':' || CAST(salt AS VARCHAR)) < '8000'
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_a
       |  FROM e GROUP BY 1),
       |b AS (SELECT salt, n, n_a, n - n_a AS n_b,
       |        CAST(n AS DOUBLE)/2.0 AS ex FROM a),
       |c AS (SELECT salt, n, n_a, n_b,
       |    (n_a - ex)*(n_a - ex)/ex + (n_b - ex)*(n_b - ex)/ex AS chi2
       |  FROM b)
       |SELECT salt, n, n_a, n_b, ${droundSql("chi2", 6)} AS chi2,
       |  CAST(CASE WHEN chi2 > 3.841458820694124 THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
       |FROM c""".stripMargin

  // ---- A41: minimum detectable effect -------------------------------------

  /** A41 — MDE sizing per event_type: can this metric support a
    * two-arm readout at the current population? z-quantiles are shared
    * literals, σ from exact cents moments. */
  private def a41Mde: Q = (s, d) =>
    graft.stats.ExperimentDesign.mdeByGroup(
        Tables.events(s, d), "value", "user_id", "event_type")
      .select(col("event_type"), col("n_units"),
        dround(col("mean"), 6).as("mean"),
        dround(col("sigma"), 6).as("sigma"),
        dround(col("mde_abs"), 6).as("mde_abs"),
        dround(col("mde_rel"), 6).as("mde_rel"))

  private val a41Sql = {
    val zsum = graft.stats.ExperimentDesign.z975 + graft.stats.ExperimentDesign.z80
    s"""WITH pu AS (SELECT event_type, user_id,
       |    CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2),
       |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_units,
       |    CAST(sum(c) AS BIGINT) AS sc, CAST(sum(c*c) AS BIGINT) AS scc
       |  FROM pu GROUP BY 1),
       |f AS (SELECT event_type, n_units, CAST(n_units AS DOUBLE) AS nd,
       |    CAST(sc AS DOUBLE)/CAST(n_units AS DOUBLE)/100.0 AS mean,
       |    sqrt((CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE)*sc/CAST(n_units AS DOUBLE))
       |      /(CAST(n_units AS DOUBLE) - 1.0)/10000.0) AS sigma
       |  FROM g WHERE n_units >= 4),
       |m AS (SELECT event_type, n_units, mean, sigma,
       |    $zsum*sigma*sqrt(2.0/CAST(n_units // 2 AS DOUBLE)) AS mde_abs
       |  FROM f)
       |SELECT event_type, n_units, ${droundSql("mean", 6)} AS mean,
       |  ${droundSql("sigma", 6)} AS sigma, ${droundSql("mde_abs", 6)} AS mde_abs,
       |  ${droundSql("mde_abs/mean", 6)} AS mde_rel
       |FROM m""".stripMargin
  }

  // ---- registry -----------------------------------------------------------

  def queries: Map[String, Q] = Map(
    "m14_granger"     -> m14Granger,
    "m15_coint"       -> m15Coint,
    "f22_garch"       -> f22Garch,
    "f21_adida"       -> f21Adida,
    "t26_periodogram" -> t26Periodogram,
    "a39_hurst"       -> a39Hurst,
    "s18_qld"         -> s18Qld,
    "s19_rrf"         -> s19Rrf,
    "a40_srm"         -> a40Srm,
    "a41_mde"         -> a41Mde)

  def oracle: Map[String, String] = Map(
    "m14_granger"     -> m14Sql,
    "m15_coint"       -> m15Sql,
    "f22_garch"       -> f22Sql,
    "f21_adida"       -> f21Sql,
    "t26_periodogram" -> t26Sql,
    "a39_hurst"       -> a39Sql,
    "s18_qld"         -> s18Sql,
    "s19_rrf"         -> s19Sql,
    "a40_srm"         -> a40Sql,
    "a41_mde"         -> a41Sql)
}
