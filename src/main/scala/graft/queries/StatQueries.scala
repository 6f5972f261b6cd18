package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.stats.StatTests
import graft.queries.Det._

/** Oracle-checked queries for the statistics layer (SURVEY §2.10 M10/M11,
  * §2.11 UDAF surface). ACF and Durbin–Watson are SQL-expressible and
  * hash-checked; the ADF regression itself is checked by property tests
  * (rows-only here). */
object StatQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Proper sample ACF (full-series-mean normalization) per series,
    * k = 1..3, via the distributed flatMapGroups path. */
  private def m10Acf: Q = (s, d) => {
    val e = Tables.events(s, d)
    StatTests.acfPerSeries(e, "value", "ts", "user_id", 3)
      .select(col("user_id"), col("k"), dround(col("acf"), 6).as("acf"))
  }

  private val m10AcfSql: String = {
    def term(k: Int) =
      s"""SELECT user_id, CAST($k AS BIGINT) AS k,
         | ${droundSql(s"sum((value - mu) * (l$k - mu)) / sum((value - mu) * (value - mu))", 6)} AS acf
         |FROM s GROUP BY user_id""".stripMargin
    s"""WITH s AS (
       |  SELECT user_id, value,
       |    lag(value,1) OVER w AS l1,
       |    lag(value,2) OVER w AS l2,
       |    lag(value,3) OVER w AS l3,
       |    avg(value) OVER (PARTITION BY user_id) AS mu
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, value))
       |${term(1)}
       |UNION ALL
       |${term(2)}
       |UNION ALL
       |${term(3)}""".stripMargin
  }

  /** PACF per series at maxLag=2 — Durbin–Levinson closes to a SQL form
    * at this depth (φ11 = ρ1, φ22 = (ρ2 − ρ1²)/(1 − ρ1²)), so the
    * distributed path is hash-checked end-to-end. */
  private def m10Pacf: Q = (s, d) => {
    val e = Tables.events(s, d)
    StatTests.pacfPerSeries(e, "value", "ts", "user_id", 2)
      .select(col("user_id"), col("k"), dround(col("pacf"), 6).as("pacf"))
  }

  private val m10PacfSql: String =
    s"""WITH s AS (
       |  SELECT user_id, value,
       |    lag(value,1) OVER w AS l1,
       |    lag(value,2) OVER w AS l2,
       |    avg(value) OVER (PARTITION BY user_id) AS mu
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)),
       |r AS (
       |  SELECT user_id,
       |    sum((value - mu) * (l1 - mu)) / sum((value - mu) * (value - mu)) AS r1,
       |    sum((value - mu) * (l2 - mu)) / sum((value - mu) * (value - mu)) AS r2
       |  FROM s GROUP BY user_id)
       |SELECT user_id, CAST(1 AS BIGINT) AS k, ${droundSql("r1", 6)} AS pacf FROM r
       |UNION ALL
       |SELECT user_id, CAST(2 AS BIGINT) AS k,
       | ${droundSql("(r2 - r1 * r1) / (1 - r1 * r1)", 6)} AS pacf FROM r""".stripMargin

  /** Dickey–Fuller at fixed lag 0: the regression Δy = α + γ·y_{t-1} is
    * simple OLS, whose t-stat closes to sums — so this configuration of
    * the distributed ADF path IS oracle-checkable (4-decimal rounding
    * absorbs the Breeze-solve vs closed-form float noise). The autolag-BIC
    * variant below stays rows-only. */
  private def m10Df0: Q = (s, d) => {
    val e = Tables.events(s, d)
    StatTests.adfPerSeries(e, "value", "ts", "user_id", maxLag = Some(0))
      .select(col("user_id"), dround(col("adf_stat"), 4).as("adf_stat"),
              col("n_obs"), col("stationary").cast("string").as("stationary"))
  }

  private val m10Df0Sql: String =
    s"""WITH s AS (
       |  SELECT user_id,
       |    value - lag(value,1) OVER w AS dy,
       |    lag(value,1) OVER w AS yl
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)),
       |a AS (
       |  SELECT user_id, CAST(count(*) AS DOUBLE) AS n1,
       |    sum(yl) AS sx, sum(yl*yl) AS sxx,
       |    sum(dy) AS sy, sum(dy*dy) AS syy, sum(yl*dy) AS sxy
       |  FROM s WHERE dy IS NOT NULL GROUP BY user_id),
       |b AS (
       |  SELECT user_id, n1,
       |    (n1*sxy - sx*sy) / (n1*sxx - sx*sx) AS slope,
       |    (n1*sxx - sx*sx) AS d, sx, sy, sxy, syy
       |  FROM a),
       |c AS (
       |  SELECT user_id, n1,
       |    slope / sqrt(((syy - ((sy - slope*sx)/n1)*sy - slope*sxy) / (n1-2)) * n1 / d) AS stat
       |  FROM b)
       |SELECT user_id, ${droundSql("stat", 4)} AS adf_stat,
       | CAST(n1 AS BIGINT) AS n_obs,
       | CAST(stat < (-2.86154 - 2.8903/n1 - 4.234/(n1*n1) - 40.040/(n1*n1*n1)) AS VARCHAR) AS stationary
       |FROM c""".stripMargin

  /** M10 — ADF stationarity decision per series (regression-based; no SQL
    * oracle — property-tested instead). */
  private def m10Adf: Q = (s, d) => {
    val e = Tables.events(s, d)
    StatTests.adfPerSeries(e, "value", "ts", "user_id")
      .select(col("user_id"), col("lag_used"), col("n_obs"),
              col("stationary").cast("string").as("stationary"),
              dround(col("p_value"), 6).as("p_value"))
  }

  /** M11 — Durbin–Watson on demeaned residuals per series. */
  private def m11Dw: Q = (s, d) => {
    val e = Tables.events(s, d)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val mu = Window.partitionBy(col("user_id"))
    val withE = e
      .withColumn("e", col("value") - avg(col("value")).over(mu))
      .withColumn("de", col("e") - lag(col("e"), 1).over(w))
    withE.groupBy(col("user_id"))
      .agg(dround(sum(col("de") * col("de")) / sum(col("e") * col("e")), 6).as("dw"))
  }

  private val m11DwSql: String =
    s"""WITH s AS (
       |  SELECT user_id, ts, event_id,
       |    value - avg(value) OVER (PARTITION BY user_id) AS e
       |  FROM events),
       |t AS (
       |  SELECT user_id, e,
       |    e - lag(e,1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS de
       |  FROM s)
       |SELECT user_id, ${droundSql("sum(de*de) / sum(e*e)", 6)} AS dw
       |FROM t GROUP BY user_id""".stripMargin

  /** M11 — full residual-diagnostics battery (`ts_model_validation`,
    * `utils/val.py:135-173`): Durbin–Watson + Ljung–Box(3) + Jarque–Bera +
    * break-variance heteroskedasticity per series, all four statistics
    * closing to SQL sums so the whole battery is hash-checked. Runs the
    * distributed flatMapGroups path end-to-end. */
  private def m11Battery: Q = (s, d) => {
    val e = Tables.events(s, d)
    StatTests.diagnosticsPerSeries(e, "value", "ts", "user_id", lbLag = 3)
      .select(col("user_id"),
              dround(col("dw"), 6).as("dw"),
              dround(col("lb_stat"), 6).as("lb_stat"),
              dround(col("jb_stat"), 6).as("jb_stat"),
              dround(col("het_ratio"), 6).as("het_ratio"))
  }

  private val m11BatterySql: String =
    s"""WITH s AS (
       |  SELECT user_id, ts, event_id,
       |    value - avg(value) OVER (PARTITION BY user_id) AS e
       |  FROM events),
       |w AS (
       |  SELECT user_id, e,
       |    e - lag(e,1) OVER win AS de,
       |    lag(e,1) OVER win AS l1,
       |    lag(e,2) OVER win AS l2,
       |    lag(e,3) OVER win AS l3,
       |    avg(e) OVER (PARTITION BY user_id) AS mu,
       |    row_number() OVER win AS rn,
       |    count(*) OVER (PARTITION BY user_id) AS n,
       |    CAST(floor(count(*) OVER (PARTITION BY user_id) / 3.0) AS BIGINT) AS h
       |  FROM s WINDOW win AS (PARTITION BY user_id ORDER BY ts, e)),
       |a AS (
       |  SELECT user_id,
       |    CAST(max(n) AS DOUBLE) AS nn,
       |    sum(de*de) / sum(e*e) AS dw,
       |    sum((e-mu)*(l1-mu)) / sum((e-mu)*(e-mu)) AS r1,
       |    sum((e-mu)*(l2-mu)) / sum((e-mu)*(e-mu)) AS r2,
       |    sum((e-mu)*(l3-mu)) / sum((e-mu)*(e-mu)) AS r3,
       |    avg((e-mu)*(e-mu)) AS m2,
       |    avg((e-mu)*(e-mu)*(e-mu)) AS m3,
       |    avg((e-mu)*(e-mu)*(e-mu)*(e-mu)) AS m4,
       |    sum(CASE WHEN rn > n - h THEN e*e END) / sum(CASE WHEN rn <= h THEN e*e END) AS het
       |  FROM w GROUP BY user_id HAVING max(n) >= 12)
       |SELECT user_id,
       | ${droundSql("dw", 6)} AS dw,
       | ${droundSql("nn*(nn+2.0)*(r1*r1/(nn-1) + r2*r2/(nn-2) + r3*r3/(nn-3))", 6)} AS lb_stat,
       | ${droundSql("nn/6.0 * (power(m3/power(m2,1.5),2) + power(m4/(m2*m2)-3.0,2)/4.0)", 6)} AS jb_stat,
       | ${droundSql("het", 6)} AS het_ratio
       |FROM a""".stripMargin

  val queries: Map[String, Q] = Map(
    "m10_acf"     -> m10Acf,
    "m10_pacf"    -> m10Pacf,
    "m10_df0"     -> m10Df0,
    "m10_adf"     -> m10Adf,
    "m11_dw"      -> m11Dw,
    "m11_battery" -> m11Battery
  )

  val oracle: Map[String, String] = Map(
    "m10_acf"     -> m10AcfSql,
    "m10_pacf"    -> m10PacfSql,
    "m10_df0"     -> m10Df0Sql,
    "m11_dw"      -> m11DwSql,
    "m11_battery" -> m11BatterySql
    // m10_adf: rows-only (regression-based statistic)
  )
}
