package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.core.{TimeSeriesOps => TS}
import graft.models.{DecomposableModel, TsSchema, VarModel}
import graft.queries.Det._

/** Oracle-checked TWINS of the estimator paths (the s4_ann_ivf_full
  * pattern from round 3: pick a configuration where the estimator's math
  * closes to a SQL-expressible form, and hash-check the REAL model code
  * end-to-end against DuckDB).
  *
  *  - m5_trend: DecomposableModel with fourierOrder=0, ridgeLambda=0
  *    degenerates to exact OLS on a linear trend (`build_prophet.py:82-346`
  *    trend component) — slope/intercept/σ/CI all close to sums.
  *  - m4_var1: VarModel at fixed p=1 is per-equation OLS with two lagged
  *    predictors + intercept (`build_var.py:53-160`) — the coefficient
  *    matrix closes to the centered 2×2 normal equations.
  *
  * Inputs are rounded through Det BEFORE fitting so both engines feed
  * bit-identical series into the regression. */
object ModelQueries2 {

  /** Shared driver-side twin of droundSql at 6 decimals — every hash-pass
    * model twin must round through the identical formula. */
  private def r6(v: Double): Double = math.floor(v * 1e6 + 0.5) / 1e6

  type Q = (SparkSession, String) => DataFrame

  /** Monthly (ts, y) series: y = dround₄(mean monthly o_totalprice). */
  private def monthlyY(s: SparkSession, d: String): DataFrame =
    TS.resampleMean(Tables.orders(s, d), "o_orderdate", "month", Seq("o_totalprice"))
      .select(col("ts_bucket").as("ts"),
              dround(col("o_totalprice_mean"), 4).as("y"))

  private val monthlyYSql =
    s"""SELECT date_trunc('month', o_orderdate) AS mo,
       | ${droundSql("avg(o_totalprice)", 4)} AS y
       |FROM orders GROUP BY date_trunc('month', o_orderdate)""".stripMargin

  // ---- m5_trend: trend-only decomposable model ≡ OLS on t ---------------

  private def m5Trend: Q = (s, d) => {
    val m = new DecomposableModel(seasonalPeriod = 12, fourierOrder = 0,
                                  ridgeLambda = 0.0)
    m.fit(monthlyY(s, d), TsSchema("ts", "y"), 2, 8)
    m.predict(s, 8).select(
      tsStr(col("ts")).as("ts"),
      dround(col("yhat"), 4).as("yhat"),
      dround(col("mean_se"), 4).as("mean_se"),
      dround(col("mean_ci_lower"), 4).as("mean_ci_lower"),
      dround(col("mean_ci_upper"), 4).as("mean_ci_upper"))
  }

  /** OLS closed form: slope=(nΣty−ΣtΣy)/(nΣtt−(Σt)²), σ²=SSR/(n−2);
    * forecast t = n−1+i for i=1..8, month-stepped timestamps. */
  private val m5TrendSql =
    s"""WITH m AS ($monthlyYSql),
       |s AS (SELECT y, CAST(row_number() OVER (ORDER BY mo) - 1 AS DOUBLE) AS t FROM m),
       |a AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(t) AS st, sum(t*t) AS stt,
       |             sum(y) AS sy, sum(y*y) AS syy, sum(t*y) AS sty FROM s),
       |b AS (SELECT n, st, sy, sty, syy, stt,
       |        (n*sty - st*sy)/(n*stt - st*st) AS slope FROM a),
       |c AS (SELECT n, slope, (sy - slope*st)/n AS icept,
       |        (syy - sy*sy/n) - slope*(sty - st*sy/n) AS ssr FROM b),
       |d AS (SELECT n, slope, icept, sqrt(ssr/(n-2)) AS sigma,
       |        (SELECT max(mo) FROM m) AS last_mo FROM c),
       |f AS (SELECT i, icept + slope*(n - 1 + i) AS p, sigma, last_mo
       |      FROM d, generate_series(1, 8) AS g(i))
       |SELECT ${tsStrSql("last_mo + to_months(CAST(i AS INTEGER))")} AS ts,
       | ${droundSql("p", 4)} AS yhat,
       | ${droundSql("sigma", 4)} AS mean_se,
       | ${droundSql("p - 1.96*sigma", 4)} AS mean_ci_lower,
       | ${droundSql("p + 1.96*sigma", 4)} AS mean_ci_upper
       |FROM f""".stripMargin

  // ---- m5_mult: multiplicative seasonality ≡ two-stage OLS ---------------

  /** DecomposableModel with seasonalityMode='multiplicative',
    * fourierOrder=1, λ=0: the 2-round backfit closes to exact OLS at
    * every stage — round 1 fits trend g₁ on y and the no-intercept
    * 2-column Fourier stage [sin, cos] on y/g₁ − 1 (2×2 normal
    * equations); round 2 refits the trend on the seasonally-adjusted
    * y/(1+s₁) and the Fourier stage on y/g₂ − 1. ŷ = g₂·(1+s₂),
    * σ² = SSE/(n−4). Hash-checks the REAL multiplicative decomposition
    * path (`build_prophet.py:73` seasonality_mode kwargs) end to end,
    * backfit and all. */
  private def m5Mult: Q = (s, d) => {
    val m = new DecomposableModel(seasonalPeriod = 12, fourierOrder = 1,
                                  ridgeLambda = 0.0,
                                  seasonalityMode = "multiplicative")
    m.fit(monthlyY(s, d), TsSchema("ts", "y"), 2, 8)
    m.predict(s, 8).select(
      tsStr(col("ts")).as("ts"),
      dround(col("yhat"), 4).as("yhat"),
      dround(col("mean_se"), 4).as("mean_se"),
      dround(col("mean_ci_lower"), 4).as("mean_ci_lower"),
      dround(col("mean_ci_upper"), 4).as("mean_ci_upper"))
  }

  /** One OLS trend leg (a + b·t on an input column yc) + one 2×2
    * no-intercept Fourier leg, repeated twice — the SQL mirror of the
    * model's fixed 2-round backfit. */
  private val m5MultSql = {
    def trendLeg(src: String, yc: String, tag: String) =
      s"""a$tag AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(t) AS st,
         |  sum(t*t) AS stt, sum($yc) AS sy, sum(t*$yc) AS sty FROM $src),
         |c$tag AS (SELECT n, (n*sty - st*sy)/(n*stt - st*st) AS slope,
         |  (sy - ((n*sty - st*sy)/(n*stt - st*st))*st)/n AS icept FROM a$tag)""".stripMargin
    def fourierLeg(src: String, rc: String, tag: String) =
      s"""q$tag AS (SELECT sum(sn*sn) AS qss, sum(cs*cs) AS qcc, sum(sn*cs) AS qsc,
         |  sum(sn*$rc) AS qsr, sum(cs*$rc) AS qcr FROM $src),
         |p$tag AS (SELECT (qcc*qsr - qsc*qcr)/(qss*qcc - qsc*qsc) AS ps,
         |  (qss*qcr - qsc*qsr)/(qss*qcc - qsc*qsc) AS pc FROM q$tag)""".stripMargin
    s"""WITH m AS ($monthlyYSql),
       |s AS (SELECT y, CAST(row_number() OVER (ORDER BY mo) - 1 AS DOUBLE) AS t FROM m),
       |sf AS (SELECT t, y, sin(2*pi()*t/12) AS sn, cos(2*pi()*t/12) AS cs FROM s),
       |${trendLeg("sf", "y", "1")},
       |g1 AS (SELECT sf.*, icept + slope*t AS gt FROM sf, c1),
       |r1 AS (SELECT g1.*, y/gt - 1 AS ratio FROM g1),
       |${fourierLeg("r1", "ratio", "1")},
       |y2 AS (SELECT sf.t, sf.y, sf.sn, sf.cs,
       |         sf.y / (1 + ps*sf.sn + pc*sf.cs) AS ya FROM sf, p1),
       |${trendLeg("y2", "ya", "2")},
       |g2 AS (SELECT y2.*, icept + slope*t AS gt FROM y2, c2),
       |r2 AS (SELECT g2.*, y/gt - 1 AS ratio FROM g2),
       |${fourierLeg("r2", "ratio", "2")},
       |e AS (SELECT sum(pow(y - gt*(1 + ps*sn + pc*cs), 2)) AS sse
       |      FROM r2, p2),
       |d AS (SELECT n, slope, icept, ps, pc, sqrt(sse/(n-4)) AS sigma,
       |        (SELECT max(mo) FROM m) AS last_mo FROM c2, p2, e),
       |f AS (SELECT i,
       |        (icept + slope*(n - 1 + i)) *
       |          (1 + ps*sin(2*pi()*(n - 1 + i)/12) + pc*cos(2*pi()*(n - 1 + i)/12)) AS p,
       |        sigma, last_mo
       |      FROM d, generate_series(1, 8) AS gs(i))
       |SELECT ${tsStrSql("last_mo + to_months(CAST(i AS INTEGER))")} AS ts,
       | ${droundSql("p", 4)} AS yhat,
       | ${droundSql("sigma", 4)} AS mean_se,
       | ${droundSql("p - 1.96*sigma", 4)} AS mean_ci_lower,
       | ${droundSql("p + 1.96*sigma", 4)} AS mean_ci_upper
       |FROM f""".stripMargin
  }

  // ---- m5_holiday: trend + holiday dummy ≡ 2-predictor OLS ---------------

  /** DecomposableModel with fourierOrder=0, λ=0 and a December-1st holiday
    * list (`build_prophet.py:139-151` add-holiday regressors) degenerates
    * to exact OLS on [1, t, holiday] — solvable in SQL by the centered 2×2
    * normal equations. The holiday list covers every December in the data
    * plus one future year, exactly how a Prophet user supplies past AND
    * future occurrences. */
  private def m5Holiday: Q = (s, d) => {
    val mdf = monthlyY(s, d)
    val yr = mdf.select(min(year(col("ts"))).as("y0"),
                        max(year(col("ts"))).as("y1")).head()
    val hol = (yr.getInt(0) to yr.getInt(1) + 1).map { y =>
      java.time.LocalDate.of(y, 12, 1).atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.toEpochMilli
    }.toSet
    val m = new DecomposableModel(seasonalPeriod = 12, fourierOrder = 0,
                                  ridgeLambda = 0.0, holidays = hol)
    m.fit(mdf, TsSchema("ts", "y"), 2, 8)
    m.predict(s, 8).select(
      tsStr(col("ts")).as("ts"),
      dround(col("yhat"), 4).as("yhat"),
      dround(col("mean_se"), 4).as("mean_se"),
      dround(col("mean_ci_lower"), 4).as("mean_ci_lower"),
      dround(col("mean_ci_upper"), 4).as("mean_ci_upper"))
  }

  /** Centered normal equations for 2 predictors (t, December dummy):
    * [b1,b2] = inv([[ctt,cth],[cth,chh]])·[cty,chy], σ²=SSR/(n−3);
    * future dummy recomputed from the stepped month. */
  private val m5HolidaySql =
    s"""WITH m AS ($monthlyYSql),
       |s AS (SELECT y, CAST(row_number() OVER (ORDER BY mo) - 1 AS DOUBLE) AS t,
       |        CASE WHEN month(mo) = 12 THEN 1.0 ELSE 0.0 END AS hd FROM m),
       |a AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(t) AS st, sum(hd) AS sh,
       |        sum(t*t) AS stt, sum(t*hd) AS sth, sum(hd*hd) AS shh,
       |        sum(y) AS sy, sum(y*y) AS syy, sum(t*y) AS sty, sum(hd*y) AS shy
       |      FROM s),
       |b AS (SELECT n, st/n AS mt, sh/n AS mh, sy/n AS my,
       |        stt - st*st/n AS ctt, sth - st*sh/n AS cth, shh - sh*sh/n AS chh,
       |        sty - st*sy/n AS cty, shy - sh*sy/n AS chy, syy - sy*sy/n AS cyy
       |      FROM a),
       |c AS (SELECT n, mt, mh, my, cty, chy, cyy,
       |        (chh*cty - cth*chy)/(ctt*chh - cth*cth) AS b1,
       |        (ctt*chy - cth*cty)/(ctt*chh - cth*cth) AS b2 FROM b),
       |e AS (SELECT n, b1, b2, my - b1*mt - b2*mh AS c0,
       |        cyy - b1*cty - b2*chy AS ssr FROM c),
       |d AS (SELECT n, b1, b2, c0, sqrt(ssr/(n-3)) AS sigma,
       |        (SELECT max(mo) FROM m) AS last_mo FROM e),
       |f AS (SELECT i, c0 + b1*(n - 1 + i)
       |        + b2*(CASE WHEN month(last_mo + to_months(CAST(i AS INTEGER))) = 12
       |              THEN 1.0 ELSE 0.0 END) AS p,
       |        sigma, last_mo
       |      FROM d, generate_series(1, 8) AS g(i))
       |SELECT ${tsStrSql("last_mo + to_months(CAST(i AS INTEGER))")} AS ts,
       | ${droundSql("p", 4)} AS yhat,
       | ${droundSql("sigma", 4)} AS mean_se,
       | ${droundSql("p - 1.96*sigma", 4)} AS mean_ci_lower,
       | ${droundSql("p + 1.96*sigma", 4)} AS mean_ci_upper
       |FROM f""".stripMargin

  // ---- m5_changepoint: piecewise trend ≡ 2-predictor hinge OLS ----------

  /** DecomposableModel with fourierOrder=0, λ=0 and ONE trend changepoint
    * (Prophet's piecewise-linear trend, `n_changepoints`/
    * `changepoint_range` in `build_prophet.py`'s Prophet ctor) closes to
    * exact OLS on [1, t, max(0, t−c)] with c = ⌊0.8·n/2⌋ — the same
    * centered 2×2 normal equations as m5_holiday, hinge in place of
    * dummy. Hash-checks the REAL changepoint fit and the last-slope
    * extrapolation end-to-end. */
  private def m5Changepoint: Q = (s, d) => {
    val m = new DecomposableModel(seasonalPeriod = 12, fourierOrder = 0,
                                  ridgeLambda = 0.0, nChangepoints = 1,
                                  changepointRange = 0.8)
    m.fit(monthlyY(s, d), TsSchema("ts", "y"), 2, 8)
    m.predict(s, 8).select(
      tsStr(col("ts")).as("ts"),
      dround(col("yhat"), 4).as("yhat"),
      dround(col("mean_se"), 4).as("mean_se"),
      dround(col("mean_ci_lower"), 4).as("mean_ci_lower"),
      dround(col("mean_ci_upper"), 4).as("mean_ci_upper"))
  }

  /** Centered normal equations for predictors (t, hinge(t−c)); the model
    * scales both by 1/n, which leaves OLS predictions/σ unchanged, so the
    * SQL works on the raw columns. */
  private val m5ChangepointSql =
    s"""WITH m AS ($monthlyYSql),
       |s0 AS (SELECT y, CAST(row_number() OVER (ORDER BY mo) - 1 AS DOUBLE) AS t FROM m),
       |cp AS (SELECT floor(0.8 * count(*) / 2) AS c FROM s0),
       |s AS (SELECT y, t, greatest(0.0, t - c) AS hd FROM s0, cp),
       |a AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(t) AS st, sum(hd) AS sh,
       |        sum(t*t) AS stt, sum(t*hd) AS sth, sum(hd*hd) AS shh,
       |        sum(y) AS sy, sum(y*y) AS syy, sum(t*y) AS sty, sum(hd*y) AS shy
       |      FROM s),
       |b AS (SELECT n, st/n AS mt, sh/n AS mh, sy/n AS my,
       |        stt - st*st/n AS ctt, sth - st*sh/n AS cth, shh - sh*sh/n AS chh,
       |        sty - st*sy/n AS cty, shy - sh*sy/n AS chy, syy - sy*sy/n AS cyy
       |      FROM a),
       |c AS (SELECT n, mt, mh, my, cty, chy, cyy,
       |        (chh*cty - cth*chy)/(ctt*chh - cth*cth) AS b1,
       |        (ctt*chy - cth*cty)/(ctt*chh - cth*cth) AS b2 FROM b),
       |e AS (SELECT n, b1, b2, my - b1*mt - b2*mh AS c0,
       |        cyy - b1*cty - b2*chy AS ssr FROM c),
       |d AS (SELECT n, b1, b2, c0, sqrt(ssr/(n-3)) AS sigma,
       |        (SELECT c FROM cp) AS c, (SELECT max(mo) FROM m) AS last_mo FROM e),
       |f AS (SELECT i, c0 + b1*(n - 1 + i) + b2*(n - 1 + i - c) AS p,
       |        sigma, last_mo
       |      FROM d, generate_series(1, 8) AS g(i))
       |SELECT ${tsStrSql("last_mo + to_months(CAST(i AS INTEGER))")} AS ts,
       | ${droundSql("p", 4)} AS yhat,
       | ${droundSql("sigma", 4)} AS mean_se,
       | ${droundSql("p - 1.96*sigma", 4)} AS mean_ci_lower,
       | ${droundSql("p + 1.96*sigma", 4)} AS mean_ci_upper
       |FROM f""".stripMargin

  // ---- m4_var1: VAR(1) coefficient matrix ≡ per-equation OLS ------------

  /** Monthly series scaled to O(1) so both solvers are far from any
    * conditioning cliff: y = price/1e5, x = orders-per-month/100. */
  private def monthlyYX(s: SparkSession, d: String): DataFrame =
    TS.resampleMean(Tables.orders(s, d), "o_orderdate", "month", Seq("o_totalprice"))
      .select(col("ts_bucket").as("ts"),
              (dround(col("o_totalprice_mean"), 4) / lit(100000.0)).as("y"),
              (col("n").cast("double") / lit(100.0)).as("x"))

  private def m4Var1: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    val m = new VarModel(maxP = 1, minP = 1)
    m.fit(monthlyYX(s, d), TsSchema("ts", "y", Seq("x")), 2, 8)
    val b = m.fittedCoefs
    Seq(("y", r6(b(0, 0)), r6(b(1, 0)), r6(b(2, 0))),
        ("x", r6(b(0, 1)), r6(b(1, 1)), r6(b(2, 1))))
      .toDF("eq", "c0", "c_y", "c_x")
  }

  /** Per-equation OLS via centered normal equations (2 predictors):
    * [a1,a2] = inv([[c11,c12],[c12,c22]])·[c1y,c2y], c0 = ȳ−a1x̄1−a2x̄2. */
  private val m4Var1Sql =
    s"""WITH m AS (
       |  SELECT date_trunc('month', o_orderdate) AS mo,
       |   (${droundSql("avg(o_totalprice)", 4)})/100000.0 AS y,
       |   count(*)/100.0 AS x
       |  FROM orders GROUP BY date_trunc('month', o_orderdate)),
       |s AS (SELECT y, x, lag(y) OVER (ORDER BY mo) AS ly,
       |             lag(x) OVER (ORDER BY mo) AS lx FROM m),
       |r AS (SELECT * FROM s WHERE ly IS NOT NULL),
       |a AS (SELECT CAST(count(*) AS DOUBLE) AS n,
       |  sum(ly) AS s1, sum(lx) AS s2,
       |  sum(ly*ly) AS s11, sum(ly*lx) AS s12, sum(lx*lx) AS s22,
       |  sum(y) AS sy, sum(ly*y) AS s1y, sum(lx*y) AS s2y,
       |  sum(x) AS sx, sum(ly*x) AS s1x, sum(lx*x) AS s2x FROM r),
       |b AS (SELECT n,
       |  s11 - s1*s1/n AS c11, s12 - s1*s2/n AS c12, s22 - s2*s2/n AS c22,
       |  s1y - s1*sy/n AS c1y, s2y - s2*sy/n AS c2y,
       |  s1x - s1*sx/n AS c1x, s2x - s2*sx/n AS c2x,
       |  s1/n AS m1, s2/n AS m2, sy/n AS my, sx/n AS mx FROM a),
       |c AS (SELECT
       |  (c22*c1y - c12*c2y)/(c11*c22 - c12*c12) AS by1,
       |  (c11*c2y - c12*c1y)/(c11*c22 - c12*c12) AS by2,
       |  (c22*c1x - c12*c2x)/(c11*c22 - c12*c12) AS bx1,
       |  (c11*c2x - c12*c1x)/(c11*c22 - c12*c12) AS bx2,
       |  my, mx, m1, m2 FROM b)
       |SELECT 'y' AS eq, ${droundSql("my - by1*m1 - by2*m2", 6)} AS c0,
       | ${droundSql("by1", 6)} AS c_y, ${droundSql("by2", 6)} AS c_x FROM c
       |UNION ALL
       |SELECT 'x', ${droundSql("mx - bx1*m1 - bx2*m2", 6)},
       | ${droundSql("bx1", 6)}, ${droundSql("bx2", 6)} FROM c""".stripMargin

  // ---- m21_var_irf: VAR(1) impulse responses = coefficient powers -------

  /** M21 — impulse-response functions from the m4_var1 VAR(1) fit:
    * Ψ_h = A^h (Lütkepohl 2005 §2.3.2; the MA(∞) representation's
    * coefficient matrices), h = 1..4 — THE structural readout a VAR is
    * fit for ("a one-unit y shock moves x by Ψ_h[x,y] after h months").
    * The Scala side powers the fitted 2×2 in the driver (bounded state);
    * the oracle unrolls the same four matrix products over the
    * normal-equation coefficients. Rounded at 1e-4 (matrix powers
    * amplify the two solvers' 1e-7 coefficient agreement ~‖A‖³·h). */
  private def m21VarIrf: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    val m = new VarModel(maxP = 1, minP = 1)
    m.fit(monthlyYX(s, d), TsSchema("ts", "y", Seq("x")), 2, 8)
    val b = m.fittedCoefs
    // A(row = responding var, col = shocked var): eq columns are (y, x)
    var a = Array(Array(b(1, 0), b(2, 0)), Array(b(1, 1), b(2, 1)))
    val a1 = Array(Array(a(0)(0), a(0)(1)), Array(a(1)(0), a(1)(1)))
    def r4(v: Double) = math.floor(v * 1e4 + 0.5) / 1e4
    (1 to 4).map { h =>
      val out = (h.toLong, r4(a(0)(0)), r4(a(0)(1)), r4(a(1)(0)), r4(a(1)(1)))
      a = Array(
        Array(a(0)(0) * a1(0)(0) + a(0)(1) * a1(1)(0),
              a(0)(0) * a1(0)(1) + a(0)(1) * a1(1)(1)),
        Array(a(1)(0) * a1(0)(0) + a(1)(1) * a1(1)(0),
              a(1)(0) * a1(0)(1) + a(1)(1) * a1(1)(1)))
      out
    }.toDF("h", "irf_yy", "irf_yx", "irf_xy", "irf_xx")
  }

  private val m21VarIrfSql =
    s"""WITH m AS (
       |  SELECT date_trunc('month', o_orderdate) AS mo,
       |   (${droundSql("avg(o_totalprice)", 4)})/100000.0 AS y,
       |   count(*)/100.0 AS x
       |  FROM orders GROUP BY date_trunc('month', o_orderdate)),
       |s AS (SELECT y, x, lag(y) OVER (ORDER BY mo) AS ly,
       |             lag(x) OVER (ORDER BY mo) AS lx FROM m),
       |r AS (SELECT * FROM s WHERE ly IS NOT NULL),
       |a AS (SELECT CAST(count(*) AS DOUBLE) AS n,
       |  sum(ly) AS s1, sum(lx) AS s2,
       |  sum(ly*ly) AS s11, sum(ly*lx) AS s12, sum(lx*lx) AS s22,
       |  sum(y) AS sy, sum(ly*y) AS s1y, sum(lx*y) AS s2y,
       |  sum(x) AS sx, sum(ly*x) AS s1x, sum(lx*x) AS s2x FROM r),
       |b AS (SELECT
       |  s11 - s1*s1/n AS c11, s12 - s1*s2/n AS c12, s22 - s2*s2/n AS c22,
       |  s1y - s1*sy/n AS c1y, s2y - s2*sy/n AS c2y,
       |  s1x - s1*sx/n AS c1x, s2x - s2*sx/n AS c2x FROM a),
       |p1 AS (SELECT
       |  (c22*c1y - c12*c2y)/(c11*c22 - c12*c12) AS yy,
       |  (c11*c2y - c12*c1y)/(c11*c22 - c12*c12) AS yx,
       |  (c22*c1x - c12*c2x)/(c11*c22 - c12*c12) AS xy,
       |  (c11*c2x - c12*c1x)/(c11*c22 - c12*c12) AS xx FROM b),
       |p2 AS (SELECT p.yy*q.yy + p.yx*q.xy AS yy, p.yy*q.yx + p.yx*q.xx AS yx,
       |  p.xy*q.yy + p.xx*q.xy AS xy, p.xy*q.yx + p.xx*q.xx AS xx
       |  FROM p1 p, p1 q),
       |p3 AS (SELECT p.yy*q.yy + p.yx*q.xy AS yy, p.yy*q.yx + p.yx*q.xx AS yx,
       |  p.xy*q.yy + p.xx*q.xy AS xy, p.xy*q.yx + p.xx*q.xx AS xx
       |  FROM p2 p, p1 q),
       |p4 AS (SELECT p.yy*q.yy + p.yx*q.xy AS yy, p.yy*q.yx + p.yx*q.xx AS yx,
       |  p.xy*q.yy + p.xx*q.xy AS xy, p.xy*q.yx + p.xx*q.xx AS xx
       |  FROM p3 p, p1 q)
       |SELECT CAST(1 AS BIGINT) AS h, ${droundSql("yy", 4)} AS irf_yy,
       |  ${droundSql("yx", 4)} AS irf_yx, ${droundSql("xy", 4)} AS irf_xy,
       |  ${droundSql("xx", 4)} AS irf_xx FROM p1
       |UNION ALL SELECT 2, ${droundSql("yy", 4)}, ${droundSql("yx", 4)},
       |  ${droundSql("xy", 4)}, ${droundSql("xx", 4)} FROM p2
       |UNION ALL SELECT 3, ${droundSql("yy", 4)}, ${droundSql("yx", 4)},
       |  ${droundSql("xy", 4)}, ${droundSql("xx", 4)} FROM p3
       |UNION ALL SELECT 4, ${droundSql("yy", 4)}, ${droundSql("yx", 4)},
       |  ${droundSql("xy", 4)}, ${droundSql("xx", 4)} FROM p4""".stripMargin

  // ---- m22_var_irf_orth: ORTHOGONALIZED impulse responses ---------------

  /** M22 — orthogonalized impulse responses Θ_h = Ψ_h·P with
    * P = chol(Σ̂u) (Lütkepohl 2005 §2.3.2): the readout the reference
    * actually surfaces — `build_var.py` calls
    * `impulse_responses(12, orthogonalized=True)` — which differs from
    * m21's plain Ψ_h whenever residuals are cross-correlated (ADVICE
    * r14). h = 0..4, Θ_0 = P (the impact response). Σ̂u is the
    * DoF-adjusted residual covariance of the final fit; a 2×2 Cholesky
    * is closed-form, so fit, residual moments, chol and matrix powers
    * ALL replay as normal-equation SQL. Grid 1e-4 as m21 (powers amplify
    * the two solvers' coefficient agreement). */
  private def m22VarIrfOrth: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    val m = new VarModel(maxP = 1, minP = 1)
    m.fit(monthlyYX(s, d), TsSchema("ts", "y", Seq("x")), 2, 8)
    def r4(v: Double) = math.floor(v * 1e4 + 0.5) / 1e4
    m.impulseResponses(4, orthogonalized = true).zipWithIndex.map { case (th, h) =>
      (h.toLong, r4(th(0, 0)), r4(th(0, 1)), r4(th(1, 0)), r4(th(1, 1)))
    }.toDF("h", "oirf_yy", "oirf_yx", "oirf_xy", "oirf_xx")
  }

  /** Shared CTE chain for the orthogonalized-VAR readouts (m22 IRF, m23
    * FEVD): monthly 2-series → lagged normal equations → coefficients +
    * intercepts → residual moments (n−3 DoF) → closed-form 2×2 Cholesky
    * (ch) → Ψ_h = A^h powers (ps1..ps4). */
  private val varOrthChainSql =
    s"""WITH m AS (
       |  SELECT date_trunc('month', o_orderdate) AS mo,
       |   (${droundSql("avg(o_totalprice)", 4)})/100000.0 AS y,
       |   count(*)/100.0 AS x
       |  FROM orders GROUP BY date_trunc('month', o_orderdate)),
       |s AS (SELECT mo, y, x, lag(y) OVER (ORDER BY mo) AS ly,
       |             lag(x) OVER (ORDER BY mo) AS lx FROM m),
       |r AS (SELECT y, x, ly, lx FROM s WHERE ly IS NOT NULL),
       |a AS (SELECT CAST(count(*) AS DOUBLE) AS n,
       |  sum(ly) AS s1, sum(lx) AS s2,
       |  sum(ly*ly) AS s11, sum(ly*lx) AS s12, sum(lx*lx) AS s22,
       |  sum(y) AS sy, sum(ly*y) AS s1y, sum(lx*y) AS s2y,
       |  sum(x) AS sx, sum(ly*x) AS s1x, sum(lx*x) AS s2x FROM r),
       |b AS (SELECT n,
       |  s11 - s1*s1/n AS c11, s12 - s1*s2/n AS c12, s22 - s2*s2/n AS c22,
       |  s1y - s1*sy/n AS c1y, s2y - s2*sy/n AS c2y,
       |  s1x - s1*sx/n AS c1x, s2x - s2*sx/n AS c2x,
       |  s1/n AS m1, s2/n AS m2, sy/n AS my, sx/n AS mx FROM a),
       |ic AS (SELECT n,
       |  (c22*c1y - c12*c2y)/(c11*c22 - c12*c12) AS ayy,
       |  (c11*c2y - c12*c1y)/(c11*c22 - c12*c12) AS ayx,
       |  (c22*c1x - c12*c2x)/(c11*c22 - c12*c12) AS axy,
       |  (c11*c2x - c12*c1x)/(c11*c22 - c12*c12) AS axx,
       |  my, mx, m1, m2 FROM b),
       |i2 AS (SELECT n, ayy, ayx, axy, axx,
       |  my - ayy*m1 - ayx*m2 AS c0y, mx - axy*m1 - axx*m2 AS c0x FROM ic),
       |u AS (SELECT y - c0y - ayy*ly - ayx*lx AS uy,
       |             x - c0x - axy*ly - axx*lx AS ux, n
       |  FROM r CROSS JOIN i2),
       |sg AS (SELECT sum(uy*uy)/(max(n) - 3) AS v11,
       |  sum(uy*ux)/(max(n) - 3) AS v21,
       |  sum(ux*ux)/(max(n) - 3) AS v22 FROM u),
       |ch AS (SELECT sqrt(v11) AS p11, v21/sqrt(v11) AS p21,
       |  sqrt(v22 - v21*v21/v11) AS p22 FROM sg),
       |ps1 AS (SELECT ayy AS yy, ayx AS yx, axy AS xy, axx AS xx FROM i2),
       |ps2 AS (SELECT p.yy*q.yy + p.yx*q.xy AS yy, p.yy*q.yx + p.yx*q.xx AS yx,
       |  p.xy*q.yy + p.xx*q.xy AS xy, p.xy*q.yx + p.xx*q.xx AS xx
       |  FROM ps1 p, ps1 q),
       |ps3 AS (SELECT p.yy*q.yy + p.yx*q.xy AS yy, p.yy*q.yx + p.yx*q.xx AS yx,
       |  p.xy*q.yy + p.xx*q.xy AS xy, p.xy*q.yx + p.xx*q.xx AS xx
       |  FROM ps2 p, ps1 q),
       |ps4 AS (SELECT p.yy*q.yy + p.yx*q.xy AS yy, p.yy*q.yx + p.yx*q.xx AS yx,
       |  p.xy*q.yy + p.xx*q.xy AS xy, p.xy*q.yx + p.xx*q.xx AS xx
       |  FROM ps3 p, ps1 q)""".stripMargin

  private val m22VarIrfOrthSql =
    s"""$varOrthChainSql
       |SELECT CAST(0 AS BIGINT) AS h, ${droundSql("p11", 4)} AS oirf_yy,
       |  ${droundSql("CAST(0.0 AS DOUBLE)", 4)} AS oirf_yx,
       |  ${droundSql("p21", 4)} AS oirf_xy, ${droundSql("p22", 4)} AS oirf_xx
       |FROM ch
       |UNION ALL SELECT 1, ${droundSql("yy*p11 + yx*p21", 4)},
       |  ${droundSql("yx*p22", 4)}, ${droundSql("xy*p11 + xx*p21", 4)},
       |  ${droundSql("xx*p22", 4)} FROM ps1, ch
       |UNION ALL SELECT 2, ${droundSql("yy*p11 + yx*p21", 4)},
       |  ${droundSql("yx*p22", 4)}, ${droundSql("xy*p11 + xx*p21", 4)},
       |  ${droundSql("xx*p22", 4)} FROM ps2, ch
       |UNION ALL SELECT 3, ${droundSql("yy*p11 + yx*p21", 4)},
       |  ${droundSql("yx*p22", 4)}, ${droundSql("xy*p11 + xx*p21", 4)},
       |  ${droundSql("xx*p22", 4)} FROM ps3, ch
       |UNION ALL SELECT 4, ${droundSql("yy*p11 + yx*p21", 4)},
       |  ${droundSql("yx*p22", 4)}, ${droundSql("xy*p11 + xx*p21", 4)},
       |  ${droundSql("xx*p22", 4)} FROM ps4, ch""".stripMargin

  // ---- m23_var_fevd: forecast-error variance decomposition ---------------

  /** M23 — FEVD (Lütkepohl 2005 §2.3.3): the share of each variable's
    * H-step forecast-error variance attributable to orthogonalized
    * shocks in each variable — Σ_{l<H} Θ_l[i,j]² row-normalized, the
    * standard "who drives whom, and by how much" readout next to the
    * m22 IRFs (statsmodels exposes it as VARResults.fevd on the same
    * fit the reference wraps). Rows sum to 1 by construction; the
    * oracle replays the squared-Θ cumulative sums over the shared
    * orthogonalized-VAR CTE chain. Grid 1e-4 as m21/m22. */
  private def m23VarFevd: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    val m = new VarModel(maxP = 1, minP = 1)
    m.fit(monthlyYX(s, d), TsSchema("ts", "y", Seq("x")), 2, 8)
    def r4(v: Double) = math.floor(v * 1e4 + 0.5) / 1e4
    m.fevd(4).zipWithIndex.map { case (f, i) =>
      ((i + 1).toLong, r4(f(0, 0)), r4(f(0, 1)), r4(f(1, 0)), r4(f(1, 1)))
    }.toDF("h", "fevd_yy", "fevd_yx", "fevd_xy", "fevd_xx")
  }

  private val m23VarFevdSql =
    s"""$varOrthChainSql,
       |t0 AS (SELECT 0 AS l, p11 AS tyy, CAST(0.0 AS DOUBLE) AS tyx,
       |  p21 AS txy, p22 AS txx FROM ch),
       |t1 AS (SELECT 1 AS l, yy*p11 + yx*p21, yx*p22, xy*p11 + xx*p21,
       |  xx*p22 FROM ps1, ch),
       |t2 AS (SELECT 2 AS l, yy*p11 + yx*p21, yx*p22, xy*p11 + xx*p21,
       |  xx*p22 FROM ps2, ch),
       |t3 AS (SELECT 3 AS l, yy*p11 + yx*p21, yx*p22, xy*p11 + xx*p21,
       |  xx*p22 FROM ps3, ch),
       |allt AS (SELECT * FROM t0 UNION ALL SELECT * FROM t1
       |  UNION ALL SELECT * FROM t2 UNION ALL SELECT * FROM t3),
       |fe AS (SELECT g.h AS h,
       |    sum(tyy*tyy) AS syy, sum(tyx*tyx) AS syx,
       |    sum(txy*txy) AS sxy, sum(txx*txx) AS sxx
       |  FROM allt, generate_series(1, 4) AS g(h)
       |  WHERE allt.l < g.h GROUP BY 1)
       |SELECT CAST(h AS BIGINT) AS h,
       | ${droundSql("syy/(syy + syx)", 4)} AS fevd_yy,
       | ${droundSql("syx/(syy + syx)", 4)} AS fevd_yx,
       | ${droundSql("sxy/(sxy + sxx)", 4)} AS fevd_xy,
       | ${droundSql("sxx/(sxy + sxx)", 4)} AS fevd_xx
       |FROM fe""".stripMargin

  // ---- m1_ar1: pure-AR CSS ≡ conditional least squares ------------------

  /** ArimaCss at fixed AR(1): CSS over pairs (w_{t-1}, w_t) IS simple OLS
    * (the pure-AR cells are solved by exact QR since round 4), and the
    * recursive forecast closes to c·(1−φʰ)/(1−φ) + φʰ·w_n — so the real
    * fit AND forecast paths (`build_arima.py:37-186` grid cells with q=0)
    * are hash-checkable end-to-end. Series scaled O(1) as in m4_var1. */
  private def m1Ar1: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    val y = monthlyY(s, d).orderBy(col("ts"))
      .select((col("y") / lit(100000.0)).as("y")).as[Double].collect()
    val f = graft.models.ArimaCss.fitOne(y, graft.models.ArimaCss.Spec(1, 0, 0))
    val fc = graft.models.ArimaCss.forecast(y, f, 4)
    (1 to 4).map(h => (h.toLong, r6(f.c), r6(f.phi(0)), r6(f.sigma2), r6(fc(h - 1))))
      .toDF("h", "c0", "phi", "sigma2", "yhat")
  }

  private val m1Ar1Sql =
    s"""WITH m0 AS ($monthlyYSql),
       |m AS (SELECT mo, y/100000.0 AS y FROM m0),
       |s AS (SELECT y, lag(y) OVER (ORDER BY mo) AS x FROM m),
       |r AS (SELECT y, x FROM s WHERE x IS NOT NULL),
       |a AS (SELECT CAST(count(*) AS DOUBLE) AS ne, sum(x) AS sx, sum(y) AS sy,
       |        sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy FROM r),
       |b AS (SELECT ne, sx, sy, sxy, syy,
       |        (ne*sxy - sx*sy)/(ne*sxx - sx*sx) AS phi FROM a),
       |c AS (SELECT ne, phi, (sy - phi*sx)/ne AS c0,
       |        ((syy - sy*sy/ne) - phi*(sxy - sx*sy/ne))/ne AS sigma2 FROM b),
       |l AS (SELECT y AS wl FROM m ORDER BY mo DESC LIMIT 1),
       |f AS (SELECT h, c0, phi, sigma2,
       |        c0*(1 - pow(phi, h))/(1 - phi) + pow(phi, h)*wl AS yhat
       |      FROM c, l, generate_series(1, 4) AS g(h))
       |SELECT h, ${droundSql("c0", 6)} AS c0, ${droundSql("phi", 6)} AS phi,
       | ${droundSql("sigma2", 6)} AS sigma2, ${droundSql("yhat", 6)} AS yhat
       |FROM f""".stripMargin

  // ---- m2_sar1: pure seasonal AR — the seasonal family's exact twin ----

  /** SARIMA(0,0,0)(1,0,0)[12]: the seasonal factor alone is LINEAR (no
    * cross terms), so the multiplicative router keeps it on the exact QR
    * solve and the fit + forecast close to lag-12 normal equations in
    * SQL — the seasonal-path analogue of `m1_ar1`. For h ≤ 4 < m the
    * forecast uses only OBSERVED lag-12 values: ŷ(T+h) = c + Φ·y(T+h−12). */
  private def m2Sar1: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    val y = monthlyY(s, d).orderBy(col("ts"))
      .select((col("y") / lit(100000.0)).as("y")).as[Double].collect()
    val f = graft.models.ArimaCss.fitOne(y, graft.models.ArimaCss.Spec(0, 0, 0, 1, 0, 0, 12))
    val fc = graft.models.ArimaCss.forecast(y, f, 4)
    (1 to 4).map(h => (h.toLong, r6(f.c), r6(f.phi(0)), r6(f.sigma2), r6(fc(h - 1))))
      .toDF("h", "c0", "sphi", "sigma2", "yhat")
  }

  private val m2Sar1Sql =
    s"""WITH m0 AS ($monthlyYSql),
       |m AS (SELECT mo, y/100000.0 AS y FROM m0),
       |s AS (SELECT y, lag(y, 12) OVER (ORDER BY mo) AS x FROM m),
       |r AS (SELECT y, x FROM s WHERE x IS NOT NULL),
       |a AS (SELECT CAST(count(*) AS DOUBLE) AS ne, sum(x) AS sx, sum(y) AS sy,
       |        sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy FROM r),
       |b AS (SELECT ne, sx, sy, sxy, syy,
       |        (ne*sxy - sx*sy)/(ne*sxx - sx*sx) AS sphi FROM a),
       |c AS (SELECT ne, sphi, (sy - sphi*sx)/ne AS c0,
       |        ((syy - sy*sy/ne) - sphi*(sxy - sx*sy/ne))/ne AS sigma2 FROM b),
       |l AS (SELECT y, row_number() OVER (ORDER BY mo DESC) AS rd FROM m),
       |f AS (SELECT g.h, c.c0, c.sphi, c.sigma2,
       |        c.c0 + c.sphi * l.y AS yhat
       |      FROM c, generate_series(1, 4) AS g(h)
       |      JOIN l ON l.rd = 13 - g.h)
       |SELECT h, ${droundSql("c0", 6)} AS c0, ${droundSql("sphi", 6)} AS sphi,
       | ${droundSql("sigma2", 6)} AS sigma2, ${droundSql("yhat", 6)} AS yhat
       |FROM f""".stripMargin

  // ---- m3_decision: the stepwise search's DECISION as a hash oracle -----

  /** Decision-equality twin for the stepwise auto-ARIMA (`m3_stepwise` is
    * ✖est rows-only; this makes the search's DECISION itself hash-
    * checkable): two fixed-seed synthetic series with strongly-identified
    * generating orders run through the REAL [[graft.models.ArimaCss
    * .stepwiseSearch]], and the chosen (p,d,q)(P,D,Q) per fixture is
    * compared against the order that GENERATED the data (the oracle just
    * states those orders — pmdarima on the same series makes the same
    * call, `build_autoarimax.py:16-88`).
    *
    *  - `ar2`: y_t = 1 + 0.75·y_{t−1} − 0.5·y_{t−2} + e_t — complex AR
    *    roots (pseudo-period ≈ 6), two-lag memory nothing shorter can
    *    mimic ⇒ (2,0,0).
    *  - `sar1`: y_t = 0.5·y_{t−12} + e_t — pure seasonal memory, Φ=0.5
    *    sits safely on the sD=0 side of the seasonal-strength ratio
    *    (var(Δ₁₂y)/var(y) = 2(1−Φ) = 1) ⇒ (0,0,0)(1,0,0)[12].
    *
    * Noise is a fixed-seed LCG (driver-side, bit-deterministic), so the
    * series — and therefore the decision — is identical on every run and
    * at every sf. */
  private def m3Decision: Q = (s, _) => {
    val spark = s
    import spark.implicits._
    val lcg = graft.core.DetRandom.doubles _
    val n = 300
    val e1 = lcg(7L)
    val a = new Array[Double](n)
    for (i <- 2 until n) a(i) = 1.0 + 0.75 * a(i - 1) - 0.5 * a(i - 2) + e1()
    val e2 = lcg(77L)
    val b = new Array[Double](n)
    for (i <- 0 until n) b(i) = 0.5 * (if (i >= 12) b(i - 12) else 0.0) + e2()
    val fits = Seq(("ar2", graft.models.ArimaCss.stepwiseSearch(s, a)),
                   ("sar1", graft.models.ArimaCss.stepwiseSearch(s, b, m = 12)))
    fits.map { case (k, f) =>
      (k, f.spec.p.toLong, f.spec.d.toLong, f.spec.q.toLong,
       f.spec.sP.toLong, f.spec.sD.toLong, f.spec.sQ.toLong)
    }.toDF("fixture", "p", "d", "q", "sp", "sd", "sq")
  }

  private val m3DecisionSql =
    """SELECT 'ar2' AS fixture, CAST(2 AS BIGINT) AS p, CAST(0 AS BIGINT) AS d,
      | CAST(0 AS BIGINT) AS q, CAST(0 AS BIGINT) AS sp, CAST(0 AS BIGINT) AS sd,
      | CAST(0 AS BIGINT) AS sq
      |UNION ALL
      |SELECT 'sar1', CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
      | CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)""".stripMargin

  // ---- m9_decision: the model-selection DECISION as a hash oracle -------

  /** Decision-equality twin for the leaderboard (`m9_leaderboard` is
    * ✖est): AutoTimeseries run on a fixed-seed fixture whose generating
    * process — a pure THRESHOLD response to an exogenous driver,
    * y = 10 + 20·1[x > 0.5] + small noise — lies exactly in the tree
    * family's hypothesis class (one split on x reproduces the truth)
    * and strictly outside every linear-in-exog family: Prophet, VAR,
    * and SARIMAX all regress on x linearly, leaving an irreducible
    * ~5-RMSE step residual, while the GBT's CV RMSE is at the noise
    * floor (~20× margin — the decision cannot flip on noise). The
    * WINNER is the hash-checkable fact (the reference's
    * `get_leaderboard().iloc[0]`). Emitted alongside: the family count
    * (all four candidates, VAR included since exog is present) and
    * whether every family scored — leaderboard completeness. */
  private def m9Decision: Q = (s, _) => {
    val spark = s
    import spark.implicits._
    val lcg = graft.core.DetRandom.doubles _
    val e = lcg(7L); val n = 300
    val rows = (0 until n).map { t =>
      val x = e() + 0.5 // uniform(0,1)
      val y = 10.0 + 20.0 * (if (x > 0.5) 1.0 else 0.0) + 0.3 * e()
      (java.sql.Timestamp.from(java.time.LocalDate.of(2000, 1, 1)
         .plusMonths(t.toLong).atStartOfDay(java.time.ZoneOffset.UTC).toInstant),
       y, x)
    }
    val at = new graft.automl.AutoTimeseries(cv = 2, forecastPeriod = 8,
      modelTypes = Seq("ML", "Prophet", "auto_SARIMAX", "VAR"))
    at.fit(rows.toDF("ts", "y", "x"), "ts", "y")
    val lb = at.leaderboard(s).collect()
    Seq((lb.head.getString(0), lb.length.toLong,
         lb.forall(r => !r.getDouble(1).isNaN).toString))
      .toDF("winner", "n_families", "all_scored")
  }

  private val m9DecisionSql =
    """SELECT 'ML' AS winner, CAST(4 AS BIGINT) AS n_families,
      | 'true' AS all_scored""".stripMargin

  // ---- m6_class_weights: the classification path's weight table ---------

  /** The classifier's 'balanced'-integer class weights
    * (`ml_models.py:390-457` — see [[graft.models.ClassWeights]]) over a
    * deliberately SKEWED derived label, so the whole normalization path
    * (min<1 ⇒ divide-by-min ⇒ floor) is exercised, not just the all-ones
    * balanced case. Deterministic ⇒ hash-checked. */
  private def m6ClassWeights: Q = (s, d) => {
    val sev = when(col("event_type") === "error",
                when(col("value") >= 80, "crit").otherwise("err"))
              .otherwise("ok")
    graft.models.ClassWeights.balanced(
      Tables.events(s, d).withColumn("sev", sev), "sev")
  }

  private val m6ClassWeightsSql =
    """WITH l AS (
      |  SELECT CASE WHEN event_type = 'error'
      |              THEN (CASE WHEN value >= 80 THEN 'crit' ELSE 'err' END)
      |              ELSE 'ok' END AS sev
      |  FROM events),
      |c AS (SELECT sev, count(*) AS n FROM l GROUP BY sev),
      |t AS (SELECT CAST(sum(n) AS DOUBLE) AS total,
      |             CAST(count(*) AS DOUBLE) AS k FROM c),
      |r AS (SELECT sev, n, total / (k * n) AS raw FROM c CROSS JOIN t),
      |m AS (SELECT min(raw) AS mn FROM r)
      |SELECT sev, CAST(n AS BIGINT) AS n,
      |  CAST(floor(CASE WHEN mn < 1 THEN raw / mn ELSE raw END) AS BIGINT) AS weight
      |FROM r CROSS JOIN m""".stripMargin

  // ---- m6_logy: the log_y transform's forward/backward arithmetic -------

  /** The ML path's `log_y` label transform (`ml_models.py:117,136-138,
    * 186-187` — see [[graft.models.GbtModel]]): forward = ln of the
    * target with the reference's zero guard (y==0 ⇒ 1e-15), backward =
    * exp. Hash-checks, per distinct quantity level (including a synthetic
    * zero at l_quantity=1), that the guard fires exactly where it should
    * and exp∘ln round-trips to the original value — the arithmetic every
    * logY fit and forecast goes through. */
  private def m6LogY: Q = (s, d) => {
    val y = (col("l_quantity").cast("double") - lit(1.0))
    Tables.lineitem(s, d)
      .select(y.as("y"))
      .withColumn("y_log", log(when(col("y") === 0.0, lit(1e-15)).otherwise(col("y"))))
      .withColumn("y_back", exp(col("y_log")))
      .groupBy(col("y").cast("long").as("y"))
      .agg(count(lit(1)).as("n"),
           dround(min(col("y_log")), 6).as("y_log"),
           dround(max(col("y_back")), 6).as("y_back"))
  }

  private val m6LogYSql =
    s"""WITH b AS (
       |  SELECT CAST(l_quantity AS DOUBLE) - 1.0 AS y FROM lineitem),
       |t AS (SELECT y, ln(CASE WHEN y = 0.0 THEN 1e-15 ELSE y END) AS y_log
       |      FROM b)
       |SELECT CAST(y AS BIGINT) AS y, count(*) AS n,
       | ${droundSql("min(y_log)", 6)} AS y_log,
       | ${droundSql("max(exp(y_log))", 6)} AS y_back
       |FROM t GROUP BY 1""".stripMargin

  // ---- m1x_exog: ARIMAX regression cell ≡ OLS on the exog ---------------

  /** ArimaCss.fitOneX at (0,0,0) with one exog: regression-with-ARMA-errors
    * degenerates to exact OLS of y on x (the QR `fitRegressionX` path), and
    * the h-step forecast with no supplied future exog holds the last
    * observed x flat — ŷ = c + β·x_last. Fit AND forecast of the REAL
    * ARIMAX code path (`build_arima_base.py:265-298` exog semantics) are
    * hash-checked end to end. y is dround₄'d pre-fit as in m1_ar1; x is an
    * exact integer count scaled O(1). */
  private def m1xExog: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    val rows = Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("mo"))
      .agg(dround(avg(col("o_totalprice")), 4).as("y0"), count(lit(1)).as("n"))
      .orderBy(col("mo"))
      .select((col("y0") / lit(100000.0)).as("y"), (col("n") / lit(1000.0)).as("x"))
      .as[(Double, Double)].collect()
    val y = rows.map(_._1)
    val xs = rows.map(r => Array(r._2))
    val f = graft.models.ArimaCss.fitOneX(y, xs, graft.models.ArimaCss.Spec(0, 0, 0))
    val fc = graft.models.ArimaCss.forecastX(y, xs, f, 2, Array.empty)
    (1 to 2).map(h => (h.toLong, r6(f.c), r6(f.beta(0)), r6(f.sigma2), r6(fc(h - 1))))
      .toDF("h", "c0", "beta", "sigma2", "yhat")
  }

  private val m1xExogSql =
    s"""WITH m AS (SELECT date_trunc('month', o_orderdate) AS mo,
       |        ${droundSql("avg(o_totalprice)", 4)}/100000.0 AS y,
       |        count(*)/1000.0 AS x
       |      FROM orders GROUP BY 1),
       |a AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
       |        sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy FROM m),
       |b AS (SELECT n, sx, sy, sxy, syy,
       |        (n*sxy - sx*sy)/(n*sxx - sx*sx) AS beta FROM a),
       |c AS (SELECT n, beta, (sy - beta*sx)/n AS c0,
       |        ((syy - sy*sy/n) - beta*(sxy - sx*sy/n))/n AS sigma2 FROM b),
       |l AS (SELECT x AS xl FROM m ORDER BY mo DESC LIMIT 1),
       |f AS (SELECT h, c0, beta, sigma2, c0 + beta*xl AS yhat
       |      FROM c, l, generate_series(1, 2) AS g(h))
       |SELECT h, ${droundSql("c0", 6)} AS c0, ${droundSql("beta", 6)} AS beta,
       | ${droundSql("sigma2", 6)} AS sigma2, ${droundSql("yhat", 6)} AS yhat
       |FROM f""".stripMargin

  /** m1x_forecast — the full auto-ARIMAX leg: grid search over (p,d,q)
    * where every cell is a regression-with-ARMA-errors fit on (y = monthly
    * mean order value, x = monthly order count), S5-sink forecast with the
    * exog held flat past the end (✖est: L-BFGS cells aren't
    * SQL-replayable; the beta-recovery and beats-exog-blind properties are
    * pinned in ModelsSpec). */
  private def m1xForecast: Q = (s, d) => {
    val df = Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("ts"))
      .agg(avg(col("o_totalprice")).as("y"),
           (count(lit(1)) / lit(1000.0)).as("x"))
    val m = new graft.models.ArimaModel(maxP = 2, maxD = 1, maxQ = 1)
    m.fit(df, TsSchema("ts", "y", Seq("x")), 2, 6)
    m.predict(s, 6)
  }

  // ---- m5_boot0: bootstrap intervals on a noiseless series ---------------

  /** M5 bootstrap hash twin (r11 task #6c): DecomposableModel in
    * `intervalMode = "bootstrap"` (fourierOrder = 0, λ = 0) fit on a
    * NOISELESS linear series y = 100 + 2.5·t over the orders months. The
    * residual pool is the deterministic all-≈0 sequence, so every
    * resampled path refits to the same β and every draw equals the point
    * forecast — the type-7 quantile band is the order statistic of a
    * constant sample: lo = hi = ŷ, se = 0, at dround(4). This runs the
    * REAL bootstrap machinery end-to-end (resample, k×n refit operator,
    * per-horizon quantiles, band assembly) and hash-checks its collapse
    * to the closed-form trend extrapolation; the random-pool behavior
    * (coverage ≈ nominal) stays pinned in ModelsSpec. */
  private def m5Boot0: Q = (s, d) => {
    val series = TS.resampleMean(Tables.orders(s, d), "o_orderdate", "month",
        Seq("o_totalprice"))
      .select(col("ts_bucket").as("ts"))
      .withColumn("t",
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col("ts"))) - 1)
      .select(col("ts"), (lit(100.0) + lit(2.5) * col("t")).as("y"))
    val m = new DecomposableModel(seasonalPeriod = 12, fourierOrder = 0,
      ridgeLambda = 0.0, intervalMode = "bootstrap", uncertaintySamples = 200)
    m.fit(series, TsSchema("ts", "y"), 2, 8)
    m.predict(s, 8).select(
      tsStr(col("ts")).as("ts"),
      dround(col("yhat"), 4).as("yhat"),
      dround(col("mean_se"), 4).as("mean_se"),
      dround(col("mean_ci_lower"), 4).as("mean_ci_lower"),
      dround(col("mean_ci_upper"), 4).as("mean_ci_upper"))
  }

  private val m5Boot0Sql =
    s"""WITH m AS (SELECT date_trunc('month', o_orderdate) AS mo
       |           FROM orders GROUP BY 1),
       |a AS (SELECT CAST(count(*) AS DOUBLE) AS n, max(mo) AS last_mo FROM m),
       |f AS (SELECT i, 100.0 + 2.5 * (n - 1 + i) AS p, last_mo
       |      FROM a, generate_series(1, 8) AS g(i))
       |SELECT ${tsStrSql("last_mo + to_months(CAST(i AS INTEGER))")} AS ts,
       | ${droundSql("p", 4)} AS yhat,
       | 0.0 AS mean_se,
       | ${droundSql("p", 4)} AS mean_ci_lower,
       | ${droundSql("p", 4)} AS mean_ci_upper
       |FROM f""".stripMargin

  val queries: Map[String, Q] = Map(
    "m1x_exog"   -> m1xExog,
    "m5_boot0"   -> m5Boot0,
    "m1x_forecast" -> m1xForecast,
    "m6_logy"    -> m6LogY,
    "m5_mult"    -> m5Mult,
    "m5_trend"   -> m5Trend,
    "m5_holiday" -> m5Holiday,
    "m4_var1"    -> m4Var1,
    "m21_var_irf" -> m21VarIrf,
    "m22_var_irf_orth" -> m22VarIrfOrth,
    "m23_var_fevd" -> m23VarFevd,
    "m1_ar1"     -> m1Ar1,
    "m2_sar1"    -> m2Sar1,
    "m3_decision" -> m3Decision,
    "m5_changepoint" -> m5Changepoint,
    "m9_decision" -> m9Decision,
    "m6_class_weights" -> m6ClassWeights
  )

  val oracle: Map[String, String] = Map(
    "m1x_exog"   -> m1xExogSql,
    "m5_boot0"   -> m5Boot0Sql,
    "m6_logy"    -> m6LogYSql,
    "m5_mult"    -> m5MultSql,
    "m5_trend"   -> m5TrendSql,
    "m5_holiday" -> m5HolidaySql,
    "m4_var1"    -> m4Var1Sql,
    "m21_var_irf" -> m21VarIrfSql,
    "m22_var_irf_orth" -> m22VarIrfOrthSql,
    "m23_var_fevd" -> m23VarFevdSql,
    "m1_ar1"     -> m1Ar1Sql,
    "m2_sar1"    -> m2Sar1Sql,
    "m3_decision" -> m3DecisionSql,
    "m5_changepoint" -> m5ChangepointSql,
    "m9_decision" -> m9DecisionSql,
    "m6_class_weights" -> m6ClassWeightsSql
  )
}
