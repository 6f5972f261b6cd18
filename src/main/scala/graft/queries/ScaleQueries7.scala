package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Det._

/** Round-12 session-3 additions: the cross-series econometrics layer
  * (Granger causality m14, Engle–Granger cointegration m15, Newey–West
  * HAC m16, ARCH-LM m17), volatility and temporal-aggregation
  * forecasting (GARCH(1,1) f22 + streaming twin st_garch + pipe13,
  * ADIDA f21), frequency-domain / long-memory / transform diagnostics
  * (periodogram t26, R/S Hurst a39, Guerrero Box-Cox t28), forecast
  * monitoring (Trigg tracking signal a42 + streaming st_tracking),
  * hybrid retrieval and its evaluation (QLD s18, RRF s19, NDCG s20),
  * clustering quality (silhouette s21), sampling and sketches
  * (priority sampling sm22, deterministic HLL a43), the experiment-
  * design gates (SRM a40, MDE a41), tokenizer pricing (x29), and
  * exact quantile binning (e12). Every query pairs a Spark plan with
  * a DuckDB oracle. */
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

  // ---- ST: streaming GARCH twin --------------------------------------------

  /** st_garch — the deterministic batch twin of [[graft.streaming
    * .StreamGarch]]: the SAME absorb fold the stream runs, emitting
    * garchFilter's exact trajectory — so it reuses f22's recursive-CTE
    * oracle verbatim (hash equality proves stream ≡ batch ≡ oracle;
    * the split-invariance spec covers arbitrary micro-batching). */
  private def stGarch: Q = (s, d) =>
    graft.streaming.StreamGarch.garchExpandingBatch(
        Tables.events(s, d), "value", "ts", "user_id", "event_id")
      .select(col("user_id"), col("event_id"),
        dround(col("r"), 2).as("r"),
        dround(col("h"), 6).as("h"),
        dround(col("vol"), 6).as("vol"),
        dround(col("z"), 6).as("z"))

  // ---- M16: Newey–West HAC trend test --------------------------------------

  /** M16 — HAC-robust linear-trend significance over the daily purchase
    * series (Bartlett L=3): the serial-correlation-honest version of the
    * m5_trend t-stat. Reports the naive OLS t beside the HAC t. */
  private def m16Hac: Q = (s, d) => {
    val daily = dailyXY(s, d).select(col("day"),
      (col("pc").cast("double") / 100.0 / 1000.0).as("y"))
    graft.stats.Econometrics.neweyWestTrend(daily, "day", "y", maxLag = 3)
      .select(col("n"),
        dround(col("slope"), 6).as("slope"),
        dround(col("se_ols"), 6).as("se_ols"),
        dround(col("t_ols"), 6).as("t_ols"),
        dround(col("se_hac"), 6).as("se_hac"),
        dround(col("t_hac"), 6).as("t_hac"))
  }

  private val m16Sql =
    s"""WITH dd AS ($dailyXYSql),
       |xy AS (SELECT day, CAST(pc AS DOUBLE)/100.0/1000.0 AS y FROM dd),
       |b AS (SELECT y, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t FROM xy),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(count(*) AS DOUBLE) AS nd,
       |    CAST(sum(t) AS DOUBLE) AS st, CAST(sum(t*t) AS DOUBLE) AS stt,
       |    CAST(sum(${g9Sql("y")}) AS BIGINT)/1.0E9 AS sy,
       |    CAST(sum(${g9Sql("y*t")}) AS BIGINT)/1.0E9 AS sty
       |  FROM b),
       |f AS (SELECT n, nd, st, sy,
       |    stt - st*st/nd AS sxx, sty - st*sy/nd AS sxy FROM m),
       |f2 AS (SELECT n, nd, st, sy, sxx, sxy/sxx AS slope, st/nd AS tbar FROM f),
       |f3 AS (SELECT n, nd, sxx, slope, tbar,
       |    (sy - slope*st)/nd AS icept FROM f2),
       |v AS (SELECT f3.n, f3.nd, f3.sxx, f3.slope, b.t,
       |    b.y - f3.icept - f3.slope*b.t AS e,
       |    (b.t - f3.tbar)*(b.y - f3.icept - f3.slope*b.t) AS v
       |  FROM b CROSS JOIN f3),
       |vl AS (SELECT *, lag(v, 1) OVER (ORDER BY t) AS v1,
       |    lag(v, 2) OVER (ORDER BY t) AS v2,
       |    lag(v, 3) OVER (ORDER BY t) AS v3 FROM v),
       |g AS (SELECT n, nd, sxx, slope,
       |    CAST(sum(${g9Sql("e*e")}) AS BIGINT) AS ee9,
       |    CAST(sum(${g9Sql("v*v")}) AS BIGINT) AS g0,
       |    CAST(sum(${g9Sql("v*v1")}) AS BIGINT) AS g1,
       |    CAST(sum(${g9Sql("v*v2")}) AS BIGINT) AS g2,
       |    CAST(sum(${g9Sql("v*v3")}) AS BIGINT) AS g3
       |  FROM vl GROUP BY 1, 2, 3, 4),
       |h AS (SELECT n, slope,
       |    sqrt(((ee9/1.0E9)/(nd - 2.0))/sxx) AS se_ols,
       |    sqrt((g0/1.0E9 + 2.0*(0.75*(g1/1.0E9) + 0.5*(g2/1.0E9)
       |      + 0.25*(g3/1.0E9)))/(sxx*sxx)) AS se_hac
       |  FROM g)
       |SELECT n, ${droundSql("slope", 6)} AS slope,
       |  ${droundSql("se_ols", 6)} AS se_ols, ${droundSql("slope/se_ols", 6)} AS t_ols,
       |  ${droundSql("se_hac", 6)} AS se_hac, ${droundSql("slope/se_hac", 6)} AS t_hac
       |FROM h""".stripMargin

  // ---- SM22: priority sampling ---------------------------------------------

  /** SM22 — Duffield–Lund–Thorup priority sampling of the corpus,
    * char-weighted, k=100, seed 7: the weighted sample WITH the
    * subset-sum estimator ŵ = max(w, τ) that sm13's A-ES sample lacks.
    * The oracle IS the honest global sort; Spark's TakeOrdered route
    * hash-matching it proves the bounded path exact (the sm17 pattern). */
  private def sm22Priority: Q = (s, d) =>
    graft.scale.Sampling.prioritySample(Tables.documents(s, d),
        "doc_id", "n_chars", k = 100, seed = 7L)
      .select(col("doc_id"), col("n_chars"), col("rk"),
        dround(col("q"), 6).as("q"),
        dround(col("tau"), 6).as("tau"),
        dround(col("w_est"), 6).as("w_est"))

  private val sm22Sql =
    s"""WITH u AS (SELECT doc_id, n_chars,
       |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 13))::BIGINT + 0.5)
       |      / 4503599627370496.0 AS u
       |  FROM documents WHERE n_chars > 0),
       |q AS (SELECT doc_id, n_chars, CAST(n_chars AS DOUBLE)/u AS q FROM u),
       |r AS (SELECT doc_id, n_chars, q,
       |    CAST(row_number() OVER (ORDER BY q DESC, doc_id) AS BIGINT) AS rk FROM q),
       |t AS (SELECT coalesce(max(CASE WHEN rk = 101 THEN q END), 0.0) AS tau
       |      FROM r WHERE rk <= 101)
       |SELECT r.doc_id, r.n_chars, r.rk, ${droundSql("r.q", 6)} AS q,
       |  ${droundSql("t.tau", 6)} AS tau,
       |  ${droundSql("greatest(CAST(r.n_chars AS DOUBLE), t.tau)", 6)} AS w_est
       |FROM r CROSS JOIN t WHERE r.rk <= 100""".stripMargin

  // ---- S20: NDCG ranking-quality evaluation ---------------------------------

  /** S20 — NDCG@10 of the three retrieval rankers (BM25, QLD, RRF)
    * against graded term-overlap relevance: the ranking-quality readout
    * a retrieval pipeline publishes with every scorer change. Discount
    * literals are driver-injected (no libm log in either engine). */
  private def s20Ndcg: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    // NOT materialized (tried in r15, reverted on measurement): the
    // initial plan shows 40 corpus scans, but all legs execute in ONE
    // action and AQE stage reuse already collapses the identical
    // ranker/relevance subtrees — eager checkpoints only serialized the
    // three rankers' scans (2.58 s → 2.84 s at sf0.1).
    val rel = graft.scale.TextAnalysis.termRelevance(docs, "text", "doc_id",
      retrQueries)
    val bm25 = graft.scale.TextAnalysis.bm25TopK(docs, "text", "doc_id",
      retrQueries, k = 20)
    val qld = graft.scale.TextAnalysis.qldTopK(docs, "text", "doc_id",
      retrQueries, k = 20, mu = 2000.0)
    val rrf = graft.scale.TextAnalysis.rrfFuse(bm25, qld, c = 60, k = 10)
    Seq(("bm25", bm25), ("qld", qld), ("rrf", rrf)).map { case (name, rk) =>
      graft.scale.TextAnalysis.ndcgAtK(
          rk.select(col("query_id"), col("doc_id"), col("rank")), rel, k = 10)
        .select(lit(name).as("ranker"), col("query_id"),
          dround(col("dcg"), 6).as("dcg"),
          dround(col("idcg"), 6).as("idcg"),
          dround(col("ndcg"), 6).as("ndcg"))
    }.reduce(_ unionAll _)
  }

  private val s20Sql = {
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    val discRows = (1 to 10)
      .map(r => s"($r, ${r6(math.log(2) / math.log(r + 1.0))})").mkString(", ")
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
       |frk AS (SELECT query_id, doc_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY s9 DESC, doc_id) AS rk
       |  FROM fu),
       |rel AS (SELECT q.query_id, h.doc_id, CAST(count(*) AS BIGINT) AS rel
       |  FROM (SELECT DISTINCT d.doc_id, tok.t
       |        FROM documents d, unnest(string_split(d.text, ' ')) AS tok(t)
       |        WHERE tok.t IN (SELECT DISTINCT t FROM qterm)) h
       |  JOIN qterm q ON q.t = h.t GROUP BY 1, 2),
       |disc(rank, disc) AS (VALUES $discRows),
       |legs AS (
       |  SELECT 'bm25' AS ranker, query_id, doc_id, rk FROM brk WHERE rk <= 10
       |  UNION ALL
       |  SELECT 'qld', query_id, doc_id, rk FROM qrk WHERE rk <= 10
       |  UNION ALL
       |  SELECT 'rrf', query_id, doc_id, rk FROM frk WHERE rk <= 10),
       |dcg AS (SELECT legs.ranker, legs.query_id,
       |    CAST(sum(CAST(floor((pow(2.0, coalesce(rel.rel, 0)) - 1.0)
       |      * disc.disc * 1.0E9 + 0.5) AS BIGINT)) AS BIGINT) AS dcg9
       |  FROM legs JOIN disc ON disc.rank = legs.rk
       |  LEFT JOIN rel ON rel.query_id = legs.query_id AND rel.doc_id = legs.doc_id
       |  GROUP BY 1, 2),
       |ideal AS (SELECT query_id, rel,
       |    row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id) AS rk
       |  FROM rel),
       |idcg AS (SELECT ideal.query_id,
       |    CAST(sum(CAST(floor((pow(2.0, coalesce(ideal.rel, 0)) - 1.0)
       |      * disc.disc * 1.0E9 + 0.5) AS BIGINT)) AS BIGINT) AS idcg9
       |  FROM ideal JOIN disc ON disc.rank = ideal.rk
       |  WHERE ideal.rk <= 10 GROUP BY 1)
       |SELECT ranker, CAST(dcg.query_id AS BIGINT) AS query_id,
       |  ${droundSql("dcg9/1.0E9", 6)} AS dcg,
       |  ${droundSql("idcg9/1.0E9", 6)} AS idcg,
       |  ${droundSql("CAST(dcg9 AS DOUBLE)/idcg9", 6)} AS ndcg
       |FROM dcg JOIN idcg ON idcg.query_id = dcg.query_id""".stripMargin
  }

  // ---- T28: Guerrero Box-Cox λ selection ------------------------------------

  /** T28 — Guerrero variance-stabilization audit per user series:
    * block-8 (mean, σ) profiles, CV of σ/μ^(1−λ) across blocks for
    * λ ∈ {0, ½, 1}, argmin λ. The transform-selection gate in front of
    * the m6_logy path (λ=0 winning says: model the log). */
  private def t28Boxcox: Q = (s, d) =>
    graft.scale.SeriesDiagnostics.guerreroBoxCox(
        Tables.events(s, d), "value", "ts", Seq("user_id"), m = 8,
        tieBreak = Seq("event_id"))
      .select(col("user_id"), col("n_blocks"),
        dround(col("cv0"), 6).as("cv0"),
        dround(col("cv05"), 6).as("cv05"),
        dround(col("cv1"), 6).as("cv1"),
        col("lambda"))

  private val t28Sql =
    s"""WITH sr AS (SELECT user_id,
       |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn,
       |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
       |    CAST(floor(value*100 + 0.5) AS BIGINT) AS cents
       |  FROM events),
       |bl AS (SELECT user_id, (rn - 1) // 8 AS b,
       |    CAST(sum(cents) AS BIGINT) AS s, CAST(sum(cents*cents) AS BIGINT) AS sq
       |  FROM sr WHERE n >= 16 AND rn <= (n // 8) * 8
       |  GROUP BY 1, 2),
       |pb AS (SELECT user_id,
       |    CAST(s AS DOUBLE)/(100.0*8) AS mean,
       |    sqrt(CAST(8*sq - s*s AS DOUBLE))/(100.0*8) AS sd
       |  FROM bl),
       |rt AS (SELECT user_id, sd/mean AS r0, sd/sqrt(mean) AS r05, sd AS r1
       |       FROM pb WHERE mean > 0 AND sd > 0),
       |ag AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_blocks,
       |    CAST(sum(${g9Sql("r0")}) AS BIGINT) AS s0, CAST(sum(${g9Sql("r0*r0")}) AS BIGINT) AS q0,
       |    CAST(sum(${g9Sql("r05")}) AS BIGINT) AS s5, CAST(sum(${g9Sql("r05*r05")}) AS BIGINT) AS q5,
       |    CAST(sum(${g9Sql("r1")}) AS BIGINT) AS s1, CAST(sum(${g9Sql("r1*r1")}) AS BIGINT) AS q1
       |  FROM rt GROUP BY 1 HAVING count(*) >= 2),
       |cv AS (SELECT user_id, n_blocks, CAST(n_blocks AS DOUBLE) AS nb,
       |    sqrt(((q0/1.0E9) - (s0/1.0E9)*(s0/1.0E9)/CAST(n_blocks AS DOUBLE))/(CAST(n_blocks AS DOUBLE) - 1.0))/((s0/1.0E9)/CAST(n_blocks AS DOUBLE)) AS cv0,
       |    sqrt(((q5/1.0E9) - (s5/1.0E9)*(s5/1.0E9)/CAST(n_blocks AS DOUBLE))/(CAST(n_blocks AS DOUBLE) - 1.0))/((s5/1.0E9)/CAST(n_blocks AS DOUBLE)) AS cv05,
       |    sqrt(((q1/1.0E9) - (s1/1.0E9)*(s1/1.0E9)/CAST(n_blocks AS DOUBLE))/(CAST(n_blocks AS DOUBLE) - 1.0))/((s1/1.0E9)/CAST(n_blocks AS DOUBLE)) AS cv1
       |  FROM ag)
       |SELECT user_id, n_blocks, ${droundSql("cv0", 6)} AS cv0,
       |  ${droundSql("cv05", 6)} AS cv05, ${droundSql("cv1", 6)} AS cv1,
       |  CASE WHEN cv0 <= cv05 AND cv0 <= cv1 THEN 0.0
       |       WHEN cv05 <= cv1 THEN 0.5 ELSE 1.0 END AS lambda
       |FROM cv""".stripMargin

  // ---- A42: Trigg tracking signal --------------------------------------------

  /** A42 — smoothed tracking signal over one-step naive errors per user
    * series (Trigg & Leach 1967), alarm at |TS| > 1/2: the live
    * forecast-drift monitor. */
  private def a42Tracking: Q = (s, d) =>
    graft.scale.SeriesDiagnostics.trackingSignal(
        Tables.events(s, d), "value", "ts", Seq("user_id"),
        alpha = 0.5, limit = 0.5, tieBreak = Seq("event_id"))
      .select(col("user_id"), col("n_err"),
        dround(col("e_smooth"), 6).as("e_smooth"),
        dround(col("mad_smooth"), 6).as("mad_smooth"),
        dround(col("ts"), 6).as("ts"),
        col("alarm"))

  private val a42Sql =
    s"""WITH sr AS (SELECT user_id,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
       |    floor(value*100 + 0.5)/100.0 AS y
       |  FROM events),
       |er AS (SELECT s1.user_id, s1.rn - 1 AS i, s1.y - p.y AS e
       |  FROM sr s1 JOIN sr p ON p.user_id = s1.user_id AND p.rn = s1.rn - 1),
       |ne AS (SELECT user_id, CAST(count(*) AS BIGINT) AS ne FROM er GROUP BY 1),
       |w AS (SELECT er.user_id, er.e, ne.ne,
       |    CASE WHEN er.i = 1 THEN pow(0.5, ne.ne - 1)
       |         ELSE 0.5*pow(0.5, ne.ne - er.i) END AS wgt
       |  FROM er JOIN ne USING (user_id)),
       |a AS (SELECT user_id, CAST(max(ne) AS BIGINT) AS n_err,
       |    CAST(sum(${g9Sql("e*wgt")}) AS BIGINT) AS e9,
       |    CAST(sum(${g9Sql("abs(e)*wgt")}) AS BIGINT) AS m9
       |  FROM w GROUP BY 1)
       |SELECT user_id, n_err, ${droundSql("e9/1.0E9", 6)} AS e_smooth,
       |  ${droundSql("m9/1.0E9", 6)} AS mad_smooth,
       |  ${droundSql("(e9/1.0E9)/(m9/1.0E9)", 6)} AS ts,
       |  CAST(CASE WHEN abs((e9/1.0E9)/(m9/1.0E9)) > 0.5 THEN 1 ELSE 0 END AS BIGINT) AS alarm
       |FROM a WHERE m9 > 0""".stripMargin

  // ---- X29: tokenizer compression audit ---------------------------------------

  /** X29 — chars-per-piece and pieces-per-kchar per source under the
    * learned BPE merges: the budget-pricing dual of x28's fertility.
    * Oracle replays the FULL 6-round learn via BpeSql (the x28 chain). */
  private def x29Compression: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val merges = graft.scale.TextAnalysis.bpeLearn(docs, "text", 6)
    graft.scale.TextAnalysis.bpeCompression(docs, "text", "source", merges)
      .select(col("source"), col("n_chars"), col("n_pieces"),
        col("chars_per_piece"), col("pieces_per_kchar"))
  }

  private val x29Sql =
    s"""WITH ${BpeSql.learnCtes(6)},
       |sw AS (SELECT source, w, CAST(count(*) AS BIGINT) AS cnt
       |       FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS w
       |             FROM documents) z
       |       WHERE length(w) > 0 GROUP BY 1, 2),
       |p AS (SELECT w, CAST(len(syms) AS BIGINT) AS pieces FROM v6)
       |SELECT source, CAST(sum(cnt*length(w)) AS BIGINT) AS n_chars,
       |  CAST(sum(cnt*pieces) AS BIGINT) AS n_pieces,
       |  floor(CAST(sum(cnt*length(w)) AS DOUBLE)/sum(cnt*pieces)*1000000.0 + 0.5)/1000000.0 AS chars_per_piece,
       |  floor(CAST(sum(cnt*pieces) AS DOUBLE)/sum(cnt*length(w))*1000*1000000.0 + 0.5)/1000000.0 AS pieces_per_kchar
       |FROM sw JOIN p USING (w) GROUP BY 1""".stripMargin

  // ---- S21: label-partition silhouette ----------------------------------------

  /** S21 — simplified (centroid-based) silhouette of the embedding label
    * partition: the clustering-quality gate before a partition drives
    * dedup keeps or mixture splits. O(n·k) with broadcast centroids. */
  private def s21Silhouette: Q = (s, d) =>
    graft.scale.Similarity.labelSilhouette(
        Tables.embeddings(s, d), "embedding", "label", "vec_id")
      .select(col("label"), col("n"), dround(col("mean_sil"), 6).as("mean_sil"))

  private val s21Sql =
    s"""WITH cent AS (SELECT label AS label2, i AS dim,
       |    floor(avg(CAST(x AS DOUBLE))*1000000.0 + 0.5)/1000000.0 AS m6
       |  FROM (SELECT label, unnest(embedding) AS x,
       |          unnest(range(1, len(embedding) + 1)) AS i FROM embeddings)
       |  GROUP BY 1, 2),
       |dims AS (SELECT CAST(vec_id AS BIGINT) AS vid, CAST(label AS BIGINT) AS label,
       |    i AS dim, CAST(x AS DOUBLE) AS x
       |  FROM (SELECT vec_id, label, unnest(embedding) AS x,
       |          unnest(range(1, len(embedding) + 1)) AS i FROM embeddings) z),
       |d2 AS (SELECT d.vid, d.label, c.label2,
       |    CAST(sum(CAST(floor((d.x - c.m6)*(d.x - c.m6)*1.0E9 + 0.5) AS BIGINT)) AS BIGINT) AS d9
       |  FROM dims d JOIN cent c ON c.dim = d.dim GROUP BY 1, 2, 3),
       |ab AS (SELECT vid, label,
       |    max(CASE WHEN label = label2 THEN d9 END) AS a9,
       |    min(CASE WHEN label <> label2 THEN d9 END) AS b9
       |  FROM d2 GROUP BY 1, 2),
       |sv AS (SELECT label, sqrt(a9/1.0E9) AS a, sqrt(b9/1.0E9) AS b
       |       FROM ab WHERE a9 IS NOT NULL AND b9 IS NOT NULL),
       |s2 AS (SELECT label, (b - a)/greatest(a, b) AS s
       |       FROM sv WHERE greatest(a, b) > 0)
       |SELECT label, CAST(count(*) AS BIGINT) AS n,
       |  ${droundSql(
             "CAST(sum(CAST(floor(s*1.0E9 + 0.5) AS BIGINT)) AS BIGINT)/1.0E9/count(*)",
             6)} AS mean_sil
       |FROM s2 GROUP BY 1""".stripMargin

  // ---- A43: deterministic HyperLogLog -----------------------------------------

  /** A43 — md5-HLL distinct-user estimate (p=8, 256 registers) with the
    * exact count as the audit column: the mergeable cardinality sketch
    * whose ENTIRE register state replays in the oracle (engine-native
    * approx_count_distinct can't be cross-checked; this can). */
  private def a43Hll: Q = (s, d) =>
    graft.stats.Sketches.hllDistinct(Tables.events(s, d), "user_id", p = 8)
      .select(col("n_exact"), col("m"), col("v_empty"),
        dround(col("e_raw"), 4).as("e_raw"),
        dround(col("estimate"), 4).as("estimate"))

  private val a43Sql = {
    val alpha = graft.stats.Sketches.alphaFor(256)
    s"""WITH h AS (SELECT md5(CAST(user_id AS VARCHAR)) AS hx FROM events),
       |r AS (SELECT ('0x' || substr(hx, 1, 2))::BIGINT AS bucket,
       |        ('0x' || substr(hx, 3, 13))::BIGINT AS w FROM h),
       |rr AS (SELECT bucket,
       |        CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END AS rho FROM r),
       |regs AS (SELECT bucket, max(rho) AS mr FROM rr GROUP BY 1),
       |ex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact FROM events),
       |a AS (SELECT CAST(count(*) AS BIGINT) AS v_used,
       |    CAST(sum(CAST(1 AS BIGINT) << (53 - mr)) AS BIGINT) AS z_used FROM regs),
       |b AS (SELECT n_exact, CAST(256 AS BIGINT) AS m,
       |    CAST(256 - v_used AS BIGINT) AS v_empty,
       |    z_used + (256 - v_used)*9007199254740992 AS z_num
       |  FROM a CROSS JOIN ex),
       |c AS (SELECT n_exact, m, v_empty,
       |    ${alpha}e0*256*256/(z_num/9007199254740992.0) AS e_raw FROM b),
       |f AS (SELECT n_exact, m, v_empty, e_raw,
       |    CASE WHEN v_empty > 0 AND e_raw <= ${2.5 * 256}
       |      THEN floor(ln(CAST(m AS DOUBLE)/v_empty)*1000000.0 + 0.5)/1000000.0*256
       |      ELSE e_raw END AS estimate
       |  FROM c)
       |SELECT n_exact, m, v_empty, ${droundSql("e_raw", 4)} AS e_raw,
       |  ${droundSql("estimate", 4)} AS estimate
       |FROM f""".stripMargin
  }

  // ---- ST: streaming tracking-signal twin ---------------------------------

  /** st_tracking — the expanding batch twin of [[graft.streaming
    * .StreamTracking]]: per-error smoothed TS = E/M trajectory, the live
    * form of a42's end-of-series readout. Oracle replays the SES
    * recursion as a recursive CTE (the f16/f22 pattern). */
  private def stTracking: Q = (s, d) =>
    graft.streaming.StreamTracking.trackingExpandingBatch(
        Tables.events(s, d), "value", "ts", "user_id", "event_id")
      .select(col("user_id"), col("event_id"),
        dround(col("e"), 2).as("e"),
        dround(col("e_smooth"), 6).as("e_smooth"),
        dround(col("mad_smooth"), 6).as("mad_smooth"),
        when(col("ts").isNotNull, dround(col("ts"), 6)).as("ts"))

  private val stTrackingSql =
    s"""WITH RECURSIVE s AS (SELECT user_id, event_id,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
       |    floor(CAST(value AS DOUBLE)*100 + 0.5)/100 AS y
       |  FROM events),
       |r AS (SELECT s.user_id, s.event_id, s.rn - 1 AS t, s.y - p.y AS e
       |      FROM s JOIN s p ON p.user_id = s.user_id AND p.rn = s.rn - 1),
       |st(user_id, t, e, es, ms) AS (
       |  SELECT user_id, t, e, e, abs(e) FROM r WHERE t = 1
       |  UNION ALL
       |  SELECT r.user_id, r.t, r.e,
       |    st.es + 0.5*(r.e - st.es), st.ms + 0.5*(abs(r.e) - st.ms)
       |  FROM st JOIN r ON r.user_id = st.user_id AND r.t = st.t + 1)
       |SELECT r.user_id, r.event_id, ${droundSql("r.e", 2)} AS e,
       |  ${droundSql("st.es", 6)} AS e_smooth,
       |  ${droundSql("st.ms", 6)} AS mad_smooth,
       |  CASE WHEN st.ms > 0 THEN ${droundSql("st.es/st.ms", 6)} END AS ts
       |FROM r JOIN st ON st.user_id = r.user_id AND st.t = r.t""".stripMargin

  // ---- M17: Engle's ARCH-LM test ----------------------------------------------

  /** M17 — ARCH-LM(1) over first differences of the daily purchase
    * series: is there volatility clustering worth a GARCH filter?
    * LM = n·R² of z²_t ~ z²_{t-1}, χ²(1) literal at 5%. */
  private def m17ArchLm: Q = (s, d) => {
    val daily = dailyXY(s, d).select(col("day"),
      (col("pc").cast("double") / 100.0 / 100000.0).as("y"))
    graft.stats.Econometrics.archLmTest(daily, "day", "y")
      .select(col("n"),
        dround(col("rho"), 6).as("rho"),
        dround(col("r2"), 6).as("r2"),
        dround(col("lm_stat"), 6).as("lm_stat"),
        col("arch_flag"))
  }

  private val m17Sql =
    s"""WITH dd AS ($dailyXYSql),
       |xy AS (SELECT day, CAST(pc AS DOUBLE)/100.0/100000.0 AS y FROM dd),
       |l1 AS (SELECT day, y, lag(y) OVER (ORDER BY day) AS ly FROM xy),
       |z AS (SELECT day, (y - ly)*(y - ly) AS z2 FROM l1 WHERE ly IS NOT NULL),
       |l2 AS (SELECT z2, lag(z2) OVER (ORDER BY day) AS lz2 FROM z),
       |r AS (SELECT z2, lz2 FROM l2 WHERE lz2 IS NOT NULL),
       |a AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(count(*) AS DOUBLE) AS nd,
       |    CAST(sum(${g9Sql("lz2")}) AS BIGINT)/1.0E9 AS sx,
       |    CAST(sum(${g9Sql("z2")}) AS BIGINT)/1.0E9 AS sy,
       |    CAST(sum(${g9Sql("lz2*lz2")}) AS BIGINT)/1.0E9 AS sxx,
       |    CAST(sum(${g9Sql("lz2*z2")}) AS BIGINT)/1.0E9 AS sxy,
       |    CAST(sum(${g9Sql("z2*z2")}) AS BIGINT)/1.0E9 AS syy
       |  FROM r),
       |b AS (SELECT n, nd,
       |    sxx - sx*sx/nd AS cxx, sxy - sx*sy/nd AS cxy,
       |    syy - sy*sy/nd AS cyy FROM a),
       |c AS (SELECT n, nd, cxy/cxx AS rho,
       |    cxy*cxy/(cxx*cyy) AS r2 FROM b),
       |f AS (SELECT n, rho, r2, nd*r2 AS lm_stat FROM c)
       |SELECT n, ${droundSql("rho", 6)} AS rho, ${droundSql("r2", 6)} AS r2,
       |  ${droundSql("lm_stat", 6)} AS lm_stat,
       |  CAST(CASE WHEN lm_stat > 3.841458820694124 THEN 1 ELSE 0 END AS BIGINT) AS arch_flag
       |FROM f""".stripMargin

  // ---- E12: equal-frequency quantile binning ----------------------------------

  /** E12 — 10-bin equal-frequency discretization of o_totalprice: the
    * exact twin of MLlib's approximate QuantileDiscretizer (edges =
    * one exact-percentile aggregate broadcast back; swap in
    * Quantiles.approx at 100 TB, the winsorize contract). */
  private def e12Qbin: Q = (s, d) =>
    graft.core.Encoders.quantileBin(Tables.orders(s, d), "o_totalprice", b = 10)
      .select(col("bin"), col("cnt"),
        dround(col("lo"), 2).as("lo"), dround(col("hi"), 2).as("hi"))

  private val e12Sql = {
    val probs = (1 until 10).map(_.toDouble / 10)
    val arr = probs.mkString("[", ", ", "]")
    val cases = probs.indices.map(i =>
      s"(CASE WHEN o_totalprice > qs[${i + 1}] THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH e AS (SELECT quantile_cont(o_totalprice, $arr) AS qs FROM orders),
       |b AS (SELECT o_totalprice AS v, 1 + $cases AS bin
       |      FROM orders CROSS JOIN e)
       |SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS cnt,
       |  ${droundSql("min(v)", 2)} AS lo, ${droundSql("max(v)", 2)} AS hi
       |FROM b GROUP BY 1""".stripMargin
  }

  // ---- PIPE13: volatility-aware anomaly feed ------------------------------------

  /** PIPE13 — GARCH filter → standardized-residual outlier flags →
    * per-user risk summary, one declarative plan: the volatility-aware
    * anomaly channel (a fixed-σ z-score (st_zscore) flags every point
    * of a high-vol regime; GARCH's adaptive σ flags only what's
    * surprising GIVEN the regime). */
  private def pipe13Volatility: Q = (s, d) => {
    val g = graft.scale.PerSeriesForecast.garchFilter(
      Tables.events(s, d), "value", "ts", "user_id", "event_id")
    g.groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_returns"),
           sum(when(abs(col("z")) > 2.5, 1L).otherwise(0L)).cast("long")
             .as("n_flagged"),
           max(abs(col("z"))).as("max_absz"))
      .select(col("user_id"), col("n_returns"), col("n_flagged"),
        dround(col("max_absz"), 6).as("max_absz"))
  }

  private val pipe13Sql =
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
       |  FROM st JOIN r ON r.user_id = st.user_id AND r.t = st.t + 1),
       |z AS (SELECT r.user_id, r.ret/sqrt(st.h) AS z
       |      FROM r JOIN st ON st.user_id = r.user_id AND st.t = r.t)
       |SELECT user_id, CAST(count(*) AS BIGINT) AS n_returns,
       |  CAST(sum(CASE WHEN abs(z) > 2.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       |  ${droundSql("max(abs(z))", 6)} AS max_absz
       |FROM z GROUP BY 1""".stripMargin

  // ---- A44: per-source concentration ------------------------------------------

  /** A44 — Gini + Theil concentration of per-doc char mass within each
    * source: the imbalance readout in front of the sm7/sm16/sm18
    * mixture planners. Gini is exact rank-lattice arithmetic; Theil's
    * ln terms fold on the 1e-9 grid. */
  private def a44Gini: Q = (s, d) =>
    graft.scale.TextAnalysis.sourceConcentration(
        Tables.documents(s, d), "n_chars", "source", "doc_id")
      .select(col("source"), col("n_docs"),
        dround(col("gini"), 6).as("gini"),
        dround(col("theil"), 6).as("theil"))

  private val a44Sql =
    s"""WITH w AS (SELECT source, CAST(n_chars AS BIGINT) AS w,
       |    CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT) AS i,
       |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n,
       |    CAST(sum(CAST(n_chars AS BIGINT)) OVER (PARTITION BY source) AS BIGINT) AS tot
       |  FROM documents WHERE n_chars > 0),
       |t AS (SELECT source, w, i, n, tot, (2*i - n - 1)*w AS gnum,
       |    CAST(floor((CAST(w AS DOUBLE)/tot)
       |      * ln(CAST(w AS DOUBLE)/(CAST(tot AS DOUBLE)/n)) * 1.0E9 + 0.5) AS BIGINT) AS t9
       |  FROM w),
       |a AS (SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
       |    CAST(sum(gnum) AS BIGINT) AS gnum, CAST(max(tot) AS BIGINT) AS tot,
       |    CAST(sum(t9) AS BIGINT) AS t9
       |  FROM t GROUP BY 1)
       |SELECT source, n_docs,
       |  ${droundSql("CAST(gnum AS DOUBLE)/(CAST(n_docs AS DOUBLE)*tot)", 6)} AS gini,
       |  ${droundSql("t9/1.0E9", 6)} AS theil
       |FROM a""".stripMargin

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
    "a41_mde"         -> a41Mde,
    "st_garch"        -> stGarch,
    "m16_hac"         -> m16Hac,
    "sm22_priority"   -> sm22Priority,
    "s20_ndcg"        -> s20Ndcg,
    "t28_boxcox"      -> t28Boxcox,
    "a42_tracking"    -> a42Tracking,
    "x29_compression" -> x29Compression,
    "s21_silhouette"  -> s21Silhouette,
    "a43_hll"         -> a43Hll,
    "st_tracking"     -> stTracking,
    "m17_archlm"      -> m17ArchLm,
    "e12_qbin"        -> e12Qbin,
    "pipe13_volatility" -> pipe13Volatility,
    "a44_gini"        -> a44Gini)

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
    "a41_mde"         -> a41Sql,
    "st_garch"        -> f22Sql,
    "m16_hac"         -> m16Sql,
    "sm22_priority"   -> sm22Sql,
    "s20_ndcg"        -> s20Sql,
    "t28_boxcox"      -> t28Sql,
    "a42_tracking"    -> a42Sql,
    "x29_compression" -> x29Sql,
    "s21_silhouette"  -> s21Sql,
    "a43_hll"         -> a43Sql,
    "st_tracking"     -> stTrackingSql,
    "m17_archlm"      -> m17Sql,
    "e12_qbin"        -> e12Sql,
    "pipe13_volatility" -> pipe13Sql,
    "a44_gini"        -> a44Sql)
}
