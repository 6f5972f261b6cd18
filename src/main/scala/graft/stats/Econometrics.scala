package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classical two-series econometrics over aggregated (daily) frames:
  * Granger causality and Engle–Granger cointegration.
  *
  * Reference anchor: the reference validates fitted time-series models with
  * stationarity / serial-correlation checks (`auto_ts/utils/val.py`,
  * `models/ar_based/build_arima.py` ADF gating); these two operators extend
  * that diagnostic surface to the CROSS-series questions a forecasting
  * pipeline asks before adding an exogenous regressor (M1x/M4 paths): does
  * x help predict y (Granger 1969), and do x and y share a stochastic
  * trend (Engle & Granger 1987)?
  *
  * Scale shape: callers aggregate the raw table to a per-bucket series
  * FIRST (one map-side-combined shuffle); everything here runs on that
  * reduced frame (days/months — O(hundreds) rows), so the unpartitioned
  * lag windows below operate on a post-aggregation frame that fits one
  * task by construction. All sums are exact BIGINT folds of 1e-9-grid
  * products (the f20/f16 determinism contract), so the closed-form
  * algebra is bit-identical cross-engine. */
object Econometrics {

  /** floor(e*1e9 + 0.5) as BIGINT — the shared product grid. */
  private def g9(c: Column): Column = floor(c * lit(1e9) + lit(0.5)).cast("long")

  /** Lag-1 Granger causality, both directions, over a two-series frame.
    *
    * For direction "x=>y": restricted OLS y_t ~ (1, y_{t-1}) vs
    * unrestricted y_t ~ (1, y_{t-1}, x_{t-1}); F = (RSS_r − RSS_u)·(n−3)/RSS_u
    * with 1 and n−3 degrees of freedom. Coefficients via centered normal
    * equations (the m4_var1 closed form). Output one row per direction:
    * (direction, n, b_own, b_cross, rss_r, rss_u, f_stat).
    *
    * `df` must carry one row per bucket with columns (tCol orderable,
    * xCol, yCol numeric, already deterministically rounded). */
  def grangerLag1(df: DataFrame, tCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(tCol))
    // tiny post-aggregation frame: single-task window by construction
    val lagged = df.coalesce(1)
      .withColumn("ly", lag(col(yCol), 1).over(w))
      .withColumn("lx", lag(col(xCol), 1).over(w))
      .filter(col("ly").isNotNull)
    def dir(name: String, yc: Column, ownLag: Column, crossLag: Column) =
      lagged.agg(
        count(lit(1)).cast("long").as("n"),
        sum(g9(ownLag)).as("s1"), sum(g9(crossLag)).as("s2"),
        sum(g9(yc)).as("sy"),
        sum(g9(ownLag * ownLag)).as("s11"),
        sum(g9(ownLag * crossLag)).as("s12"),
        sum(g9(crossLag * crossLag)).as("s22"),
        sum(g9(ownLag * yc)).as("s1y"),
        sum(g9(crossLag * yc)).as("s2y"),
        sum(g9(yc * yc)).as("syy"))
      .select(lit(name).as("direction"), col("n"),
        (col("s1") / 1e9).as("s1"), (col("s2") / 1e9).as("s2"),
        (col("sy") / 1e9).as("sy"), (col("s11") / 1e9).as("s11"),
        (col("s12") / 1e9).as("s12"), (col("s22") / 1e9).as("s22"),
        (col("s1y") / 1e9).as("s1y"), (col("s2y") / 1e9).as("s2y"),
        (col("syy") / 1e9).as("syy"))
      .withColumn("nd", col("n").cast("double"))
      // centered moments
      .withColumn("c11", col("s11") - col("s1") * col("s1") / col("nd"))
      .withColumn("c12", col("s12") - col("s1") * col("s2") / col("nd"))
      .withColumn("c22", col("s22") - col("s2") * col("s2") / col("nd"))
      .withColumn("c1y", col("s1y") - col("s1") * col("sy") / col("nd"))
      .withColumn("c2y", col("s2y") - col("s2") * col("sy") / col("nd"))
      .withColumn("cyy", col("syy") - col("sy") * col("sy") / col("nd"))
      // restricted: y ~ own lag only
      .withColumn("rss_r", col("cyy") - col("c1y") * col("c1y") / col("c11"))
      // unrestricted: centered 2x2 solve
      .withColumn("det", col("c11") * col("c22") - col("c12") * col("c12"))
      .withColumn("b_own",
        (col("c1y") * col("c22") - col("c2y") * col("c12")) / col("det"))
      .withColumn("b_cross",
        (col("c2y") * col("c11") - col("c1y") * col("c12")) / col("det"))
      .withColumn("rss_u",
        col("cyy") - col("b_own") * col("c1y") - col("b_cross") * col("c2y"))
      .withColumn("f_stat",
        (col("rss_r") - col("rss_u")) * (col("nd") - 3.0) / col("rss_u"))
      .select(col("direction"), col("n"), col("b_own"), col("b_cross"),
              col("rss_r"), col("rss_u"), col("f_stat"))
    dir("x=>y", col(yCol), col("ly"), col("lx"))
      .unionAll(dir("y=>x", col(xCol), col("lx"), col("ly")))
  }

  /** Engle–Granger two-step cointegration test over a two-series frame
    * whose columns are LEVELS (I(1) candidates, e.g. cumulative sums).
    *
    * Step 1: static OLS y_t = α + β·x_t + e_t (exact closed form).
    * Step 2: Dickey–Fuller regression on the residuals WITHOUT intercept,
    * Δe_t = ρ·e_{t-1} + u_t: ρ̂ = Σe_{t-1}Δe_t / Σe²_{t-1},
    * se = sqrt((Σu²/(m−1)) / Σe²_{t-1}), t = ρ̂/se (compare against the
    * Engle–Granger critical values, not the standard t table). Output one
    * row: (n, alpha, beta, rho, se_rho, t_stat). */
  def engleGranger(df: DataFrame, tCol: String, xCol: String,
                   yCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(tCol))
    val base = df.coalesce(1)
    // step 1 moments (exact grid folds)
    val m1 = base.agg(
      count(lit(1)).cast("long").as("n"),
      sum(g9(col(xCol))).as("sx"), sum(g9(col(yCol))).as("sy"),
      sum(g9(col(xCol) * col(xCol))).as("sxx"),
      sum(g9(col(xCol) * col(yCol))).as("sxy"))
      .select(col("n"), (col("sx") / 1e9).as("sx"), (col("sy") / 1e9).as("sy"),
        (col("sxx") / 1e9).as("sxx"), (col("sxy") / 1e9).as("sxy"))
      .withColumn("nd", col("n").cast("double"))
      .withColumn("beta",
        (col("nd") * col("sxy") - col("sx") * col("sy")) /
        (col("nd") * col("sxx") - col("sx") * col("sx")))
      .withColumn("alpha", (col("sy") - col("beta") * col("sx")) / col("nd"))
    val fit = m1.select("n", "alpha", "beta")
    // residuals: e computed identically on both engines (α, β identical
    // doubles; inputs identical), then lagged for the DF regression
    val resid = base.crossJoin(broadcast(fit))
      .withColumn("e", col(yCol) - col("alpha") - col("beta") * col(xCol))
      .withColumn("le", lag(col("e"), 1).over(w))
      .filter(col("le").isNotNull)
      .withColumn("de", col("e") - col("le"))
    val m2 = resid.groupBy(col("n"), col("alpha"), col("beta")).agg(
      count(lit(1)).cast("long").as("m"),
      sum(g9(col("le") * col("de"))).as("sed"),
      sum(g9(col("le") * col("le"))).as("see"),
      sum(g9(col("de") * col("de"))).as("sdd"))
    m2.select(col("n"), col("alpha"), col("beta"),
        (col("sed") / 1e9).as("sed"), (col("see") / 1e9).as("see"),
        (col("sdd") / 1e9).as("sdd"), col("m").cast("double").as("md"))
      .withColumn("rho", col("sed") / col("see"))
      .withColumn("ssu", col("sdd") - col("rho") * col("sed"))
      .withColumn("se_rho",
        sqrt((col("ssu") / (col("md") - 1.0)) / col("see")))
      .withColumn("t_stat", col("rho") / col("se_rho"))
      .select(col("n"), col("alpha"), col("beta"), col("rho"),
              col("se_rho"), col("t_stat"))
  }

  /** Newey–West HAC-robust trend test (Newey & West 1987): OLS
    * y_t = a + b·t over the position-indexed series, then the slope's
    * variance corrected for serial correlation with Bartlett weights
    * w_l = 1 − l/(L+1): Var_HAC(b) = (γ₀ + 2·Σ_l w_l·γ_l)/Sxx² with
    * γ_l = Σ v_t·v_{t−l} and v_t = (t − t̄)·e_t. A trending-but-
    * autocorrelated series inflates the naive OLS t; HAC deflates it —
    * the honest version of the m5_trend significance readout.
    *
    * Emits one row: (n, slope, se_ols, t_ols, se_hac, t_hac). With
    * L = 3 the Bartlett weights are exact binary fractions; all moment
    * sums are 1e-9-grid BIGINT folds. Callers aggregate to the series
    * frame first (tiny by construction — the grangerLag1 contract). */
  def neweyWestTrend(df: DataFrame, tCol: String, yCol: String,
                     maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1, s"need maxLag >= 1, got $maxLag")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(tCol))
    val base = df.coalesce(1)
      .withColumn("t", row_number().over(w).cast("long"))
    val m = base.agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("t")).as("st"), sum(col("t") * col("t")).as("stt"),
      sum(g9(col(yCol))).as("sy9"),
      sum(g9(col(yCol) * col("t"))).as("sty9"))
      .select(col("n"), col("n").cast("double").as("nd"),
        col("st").cast("double").as("st"), col("stt").cast("double").as("stt"),
        (col("sy9") / 1e9).as("sy"), (col("sty9") / 1e9).as("sty"))
      .withColumn("sxx", col("stt") - col("st") * col("st") / col("nd"))
      .withColumn("sxy", col("sty") - col("st") * col("sy") / col("nd"))
      .withColumn("slope", col("sxy") / col("sxx"))
      .withColumn("tbar", col("st") / col("nd"))
      .withColumn("icept",
        (col("sy") - col("slope") * col("st")) / col("nd"))
    val fit = m.select("n", "nd", "sxx", "slope", "tbar", "icept")
    // v_t = (t − t̄)·e_t and its residual, identical doubles both engines
    val vt = base.crossJoin(broadcast(fit))
      .withColumn("e", col(yCol) - col("icept")
        - col("slope") * col("t").cast("double"))
      .withColumn("v", (col("t").cast("double") - col("tbar")) * col("e"))
    val lagged = (1 to maxLag).foldLeft(vt) { (acc, l) =>
      acc.withColumn(s"v$l", lag(col("v"), l).over(w))
    }
    val aggCols = sum(g9(col("e") * col("e"))).as("ee9") +:
      sum(g9(col("v") * col("v"))).as("g0") +:
      (1 to maxLag).map(l => sum(g9(col("v") * col(s"v$l"))).as(s"g$l"))
    val gam = lagged
      .groupBy(col("n"), col("nd"), col("sxx"), col("slope"))
      .agg(aggCols.head, aggCols.tail: _*)
    // Bartlett-weighted long-run variance of Σv, then slope variances
    val wsum = (1 to maxLag)
      .map(l => lit(1.0 - l.toDouble / (maxLag + 1)) * (col(s"g$l") / 1e9))
      .reduce(_ + _)
    gam
      .withColumn("var_hac",
        (col("g0") / 1e9 + lit(2.0) * wsum) / (col("sxx") * col("sxx")))
      .withColumn("var_ols",
        ((col("ee9") / 1e9) / (col("nd") - 2.0)) / col("sxx"))
      .withColumn("se_ols", sqrt(col("var_ols")))
      .withColumn("se_hac", sqrt(col("var_hac")))
      .select(col("n"), col("slope"),
        col("se_ols"), (col("slope") / col("se_ols")).as("t_ols"),
        col("se_hac"), (col("slope") / col("se_hac")).as("t_hac"))
  }

  /** Engle's ARCH-LM test (Engle 1982) at lag 1 over first differences:
    * regress z²_t on z²_{t-1} (z = Δy), LM = n·R² ~ χ²(1) under the
    * no-ARCH null; reject at the 3.841458820694124 literal. The
    * "should a GARCH filter run at all?" gate in front of
    * [[graft.scale.PerSeriesForecast.garchFilter]].
    *
    * Emits one row: (n, rho, r2, lm_stat, arch_flag 0/1). All moments
    * are 1e-9-grid BIGINT folds over the tiny aggregated frame (the
    * grangerLag1 contract — callers aggregate first and scale y O(1)). */
  def archLmTest(df: DataFrame, tCol: String, yCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(tCol))
    val sq = df.coalesce(1)
      .withColumn("ly", lag(col(yCol), 1).over(w))
      .filter(col("ly").isNotNull)
      .withColumn("z2", (col(yCol) - col("ly")) * (col(yCol) - col("ly")))
      .withColumn("lz2", lag(col("z2"), 1).over(w))
      .filter(col("lz2").isNotNull)
    sq.agg(
        count(lit(1)).cast("long").as("n"),
        sum(g9(col("lz2"))).as("sx"), sum(g9(col("z2"))).as("sy"),
        sum(g9(col("lz2") * col("lz2"))).as("sxx"),
        sum(g9(col("lz2") * col("z2"))).as("sxy"),
        sum(g9(col("z2") * col("z2"))).as("syy"))
      .select(col("n"), col("n").cast("double").as("nd"),
        (col("sx") / 1e9).as("sx"), (col("sy") / 1e9).as("sy"),
        (col("sxx") / 1e9).as("sxx"), (col("sxy") / 1e9).as("sxy"),
        (col("syy") / 1e9).as("syy"))
      .withColumn("cxx", col("sxx") - col("sx") * col("sx") / col("nd"))
      .withColumn("cxy", col("sxy") - col("sx") * col("sy") / col("nd"))
      .withColumn("cyy", col("syy") - col("sy") * col("sy") / col("nd"))
      .withColumn("rho", col("cxy") / col("cxx"))
      .withColumn("r2", col("cxy") * col("cxy") / (col("cxx") * col("cyy")))
      .withColumn("lm_stat", col("nd") * col("r2"))
      .withColumn("arch_flag",
        when(col("lm_stat") > 3.841458820694124, 1L).otherwise(0L))
      .select(col("n"), col("rho"), col("r2"), col("lm_stat"), col("arch_flag"))
  }

  /** Chow structural-break test (Chow 1960) of the linear trend y ~ t
    * at the series midpoint: fit the pooled OLS line and the two
    * segment lines, then
    *   F = ((RSS_p − RSS_1 − RSS_2)/k) / ((RSS_1 + RSS_2)/(n − 2k)),
    * k = 2 parameters per regime. The known-break companion to the
    * searched-break detectors (Pettitt a33, CUSUM t17): those locate a
    * break, this one prices whether a CANDIDATE break date (deploy,
    * policy change) actually split the trend. Break point = the
    * integer midpoint of the observed t range, so the whole statistic
    * is data-determined with no driver collect.
    *
    * Determinism: one combined aggregate of 1e-9-grid BIGINT moment
    * folds, three closed-form RSS values (cyy − cxy²/cxx), F in fixed
    * op order; the same single-task reduced-frame contract as
    * [[grangerLag1]]. Emits (n1, n2, break_t, rss_p, rss_1, rss_2,
    * f_stat). Degenerate segments (< 3 points) yield null F. */
  def chowTest(df: DataFrame, tCol: String, yCol: String): DataFrame = {
    val t = col(tCol).cast("long")
    val span = df.agg(min(t).as("t0"), max(t).as("t1"))
    val base = df.crossJoin(broadcast(span))
      .withColumn("brk", expr("(t0 + t1) div 2"))
      // re-index to the series origin: raw epoch-day t values square to
      // ~4e17 on the 1e-9 grid and overflow the BIGINT folds
      .withColumn("x", (t - col("t0")).cast("double"))
      .withColumn("pre", t <= col("brk"))
    def moments(tag: String, cond: Column) = Seq(
      sum(when(cond, 1L).otherwise(0L)).as(s"n$tag"),
      sum(when(cond, g9(col("x"))).otherwise(0L)).as(s"sx$tag"),
      sum(when(cond, g9(col(yCol))).otherwise(0L)).as(s"sy$tag"),
      sum(when(cond, g9(col("x") * col("x"))).otherwise(0L)).as(s"sxx$tag"),
      sum(when(cond, g9(col("x") * col(yCol))).otherwise(0L)).as(s"sxy$tag"),
      sum(when(cond, g9(col(yCol) * col(yCol))).otherwise(0L)).as(s"syy$tag"))
    val all = moments("p", lit(true)) ++ moments("1", col("pre")) ++
      moments("2", !col("pre"))
    val agg = base.groupBy(col("brk")).agg(all.head, all.tail: _*)
    def rss(tag: String): Column = {
      val n = col(s"n$tag").cast("double")
      val sx = col(s"sx$tag") / 1e9; val sy = col(s"sy$tag") / 1e9
      val sxx = col(s"sxx$tag") / 1e9; val sxy = col(s"sxy$tag") / 1e9
      val syy = col(s"syy$tag") / 1e9
      val cxx = sxx - sx * sx / n
      val cxy = sxy - sx * sy / n
      val cyy = syy - sy * sy / n
      cyy - cxy * cxy / cxx
    }
    agg
      .withColumn("rss_p", rss("p"))
      .withColumn("rss_1", rss("1"))
      .withColumn("rss_2", rss("2"))
      // a perfectly-fitting two-segment model (RSS_1 + RSS_2 = 0) has an
      // infinite F conceptually; emit null rather than divide by zero
      .withColumn("f_stat",
        when(col("n1") >= 3 && col("n2") >= 3
            && col("rss_1") + col("rss_2") > 0.0,
          ((col("rss_p") - col("rss_1") - col("rss_2")) / 2.0)
            / ((col("rss_1") + col("rss_2"))
              / (col("np") - 4L).cast("double"))))
      .select(col("n1"), col("n2"), col("brk").as("break_t"),
              col("rss_p"), col("rss_1"), col("rss_2"), col("f_stat"))
  }
}
