package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-series baseline forecasting as PURE DataFrame transforms — the
  * scale path for "forecast every series in the warehouse": no collect,
  * no per-series model object, one partitioned window or aggregate pass
  * regardless of series count. These are the standard M-competition
  * baselines (naive / drift / seasonal-naive) that the reference's model
  * zoo is benchmarked against; on 100 TB they are also the only family
  * you can afford on ALL series (the heavier ModelBuild estimators then
  * run on the series that matter).
  *
  * Output schema: (seriesCols..., h, yhat) for h = 1..horizon. */
object PerSeriesForecast {

  private def horizons(spark: SparkSession, h: Int) =
    spark.range(1, h + 1).select(col("id").cast("int").as("h"))

  /** First/last value + count per series in ONE aggregate (min_by/max_by
    * over the (ts, tieBreak) ordering struct — no sort, no window). */
  private def endpoints(df: DataFrame, valueCol: String, tsCol: String,
                        seriesCols: Seq[String], tieBreak: Seq[String]): DataFrame = {
    val ord = struct((tsCol +: tieBreak).map(col): _*)
    df.groupBy(seriesCols.map(col): _*)
      .agg(min_by(col(valueCol), ord).as("first_y"),
           max_by(col(valueCol), ord).as("last_y"),
           count(lit(1)).as("n"))
  }

  /** Naive: ŷ(t+h) = y(n) for every h. */
  def naive(df: DataFrame, valueCol: String, tsCol: String,
            seriesCols: Seq[String], horizon: Int,
            tieBreak: Seq[String] = Nil): DataFrame =
    endpoints(df, valueCol, tsCol, seriesCols, tieBreak)
      .crossJoin(broadcast(horizons(df.sparkSession, horizon)))
      .select(seriesCols.map(col) :+ col("h") :+ col("last_y").as("yhat"): _*)

  /** Drift: ŷ(t+h) = y(n) + h·(y(n) − y(1))/(n−1) — the line through the
    * first and last observations extended h steps. A single-observation
    * series degrades to naive (a 0-length baseline has no slope). */
  def drift(df: DataFrame, valueCol: String, tsCol: String,
            seriesCols: Seq[String], horizon: Int,
            tieBreak: Seq[String] = Nil): DataFrame =
    endpoints(df, valueCol, tsCol, seriesCols, tieBreak)
      .crossJoin(broadcast(horizons(df.sparkSession, horizon)))
      .select(seriesCols.map(col) :+ col("h") :+
        when(col("n") > 1,
          col("last_y") + col("h") * (col("last_y") - col("first_y")) / (col("n") - 1))
          .otherwise(col("last_y"))
          .as("yhat"): _*)

  /** Per-series linear-trend forecast: OLS of y on the row index t,
    * extended h steps — the distributed "million models" version of the
    * trend component (closed form ⇒ exactly oracle-checkable, unlike the
    * collected estimators). One partitioned window (row index) + one
    * aggregate on the SAME key — EnsureRequirements reuses the exchange,
    * so the whole fit is a single shuffle regardless of series count.
    * A single-observation series degrades to its mean (slope 0). */
  def trendForecast(df: DataFrame, valueCol: String, tsCol: String,
                    seriesCols: Seq[String], horizon: Int,
                    tieBreak: Seq[String] = Nil): DataFrame =
    trendFit(df, valueCol, tsCol, seriesCols, tieBreak)
      .crossJoin(broadcast(horizons(df.sparkSession, horizon)))
      .select(seriesCols.map(col) :+ col("h") :+
        (col("icept") + col("slope") * (col("n") - 1 + col("h"))).as("yhat"): _*)

  /** The shared per-series OLS fit (ONE slope formula for both the point
    * and the banded sink, so the two can never diverge in the last ulp):
    * slope = (n·Σty − Σt·Σy)/(n·Σtt − (Σt)²). */
  private def trendFit(df: DataFrame, valueCol: String, tsCol: String,
                       seriesCols: Seq[String],
                       tieBreak: Seq[String]): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    df.withColumn("t", (row_number().over(w) - 1).cast("double"))
      .withColumn("y", col(valueCol).cast("double"))
      .groupBy(seriesCols.map(col): _*)
      .agg(count(lit(1)).cast("double").as("n"),
           sum(col("t")).as("st"), sum(col("t") * col("t")).as("stt"),
           sum(col("y")).as("sy"), sum(col("y") * col("y")).as("syy"),
           sum(col("t") * col("y")).as("sty"))
      .withColumn("sxx", col("stt") - col("st") * col("st") / col("n"))
      .withColumn("slope", when(col("n") > 1 && col("sxx") > 0,
          (col("n") * col("sty") - col("st") * col("sy")) /
          (col("n") * col("stt") - col("st") * col("st"))).otherwise(lit(0.0)))
      .withColumn("icept", (col("sy") - col("slope") * col("st")) / col("n"))
  }

  /** [[trendForecast]] with the full forecast-sink schema (S5: yhat,
    * mean_se, mean_ci_lower/upper) — PROPER per-series OLS prediction
    * intervals, not a constant band: at future index t_f = n−1+h,
    *   se(h) = σ·√(1 + 1/n + (t_f − t̄)²/S_tt),  σ² = SSR/(n−2),
    * so the band WIDENS with horizon exactly as the single-series
    * models' theory says — for every series in the warehouse at once,
    * still one shuffle (the same window + aggregate pass, four more
    * sums). Degenerate series (n ≤ 2) emit null bands rather than a
    * fake zero-width interval. */
  def trendForecastBands(df: DataFrame, valueCol: String, tsCol: String,
                         seriesCols: Seq[String], horizon: Int,
                         tieBreak: Seq[String] = Nil): DataFrame = {
    val fit = trendFit(df, valueCol, tsCol, seriesCols, tieBreak)
      .withColumn("ssr",
        (col("syy") - col("sy") * col("sy") / col("n")) -
        col("slope") * (col("sty") - col("st") * col("sy") / col("n")))
      .withColumn("sigma", when(col("n") > 2,
          sqrt(greatest(col("ssr"), lit(0.0)) / (col("n") - 2)))
        .otherwise(lit(null).cast("double")))
    fit.crossJoin(broadcast(horizons(df.sparkSession, horizon)))
      .withColumn("tf", col("n") - 1 + col("h"))
      .withColumn("yhat", col("icept") + col("slope") * col("tf"))
      .withColumn("mean_se", col("sigma") *
        sqrt(lit(1.0) + lit(1.0) / col("n") +
             pow(col("tf") - col("st") / col("n"), 2) / col("sxx")))
      .select(seriesCols.map(col) ++ Seq(col("h"), col("yhat"),
        col("mean_se"),
        (col("yhat") - lit(1.96) * col("mean_se")).as("mean_ci_lower"),
        (col("yhat") + lit(1.96) * col("mean_se")).as("mean_ci_upper")): _*)
  }

  /** Seasonal naive: ŷ(t+h) = y(n − m + 1 + ((h−1) mod m)) — the value at
    * the same phase of the last observed season (period m). One
    * partitioned window computes reverse positions; the last season's m
    * rows broadcast-join a tiny (h → phase) table. */
  def seasonalNaive(df: DataFrame, valueCol: String, tsCol: String,
                    seriesCols: Seq[String], horizon: Int, m: Int,
                    tieBreak: Seq[String] = Nil): DataFrame = {
    val ordDesc = ((tsCol +: tieBreak)).map(c => col(c).desc)
    val w = Window.partitionBy(seriesCols.map(col): _*).orderBy(ordDesc: _*)
    val lastSeason = df
      .withColumn("rd", row_number().over(w))
      .filter(col("rd") <= m)
      .select(seriesCols.map(col) :+ col("rd") :+ col(valueCol).as("yhat"): _*)
    val phase = horizons(df.sparkSession, horizon)
      .withColumn("rd", lit(m) - ((col("h") - 1) % lit(m)))
    lastSeason.join(broadcast(phase), Seq("rd"))
      .select(seriesCols.map(col) :+ col("h") :+ col("yhat"): _*)
  }

  /** Simple exponential smoothing (flat-forecast ETS(A,N,N)), per series
    * in one pass: the recursion l₁ = y₁, l_t = α·y_t + (1−α)·l_{t−1} has
    * the closed form
    *   l_n = (1−α)^{n−1}·y₁ + α·Σ_{t=2..n} (1−α)^{n−t}·y_t,
    * a per-row weight — so "fit SES on every series in the warehouse" is
    * ONE window (row index + series length) and one aggregate on the same
    * key (single shuffle), never a per-series model object.
    *
    * Determinism contract: each weighted term is quantized to the 1e-9
    * grid and summed as BIGINT (order-free). For DYADIC α (0.5, 0.25,
    * 0.75…) the weights (1−α)^k are exact powers of two, so y·w is an
    * exact exponent shift and the terms — hence the level — are
    * bit-identical in any IEEE engine; that is what makes the oracle
    * query replayable. ŷ(t+h) = l_n for every h (flat). */
  def sesForecast(df: DataFrame, valueCol: String, tsCol: String,
                  seriesCols: Seq[String], horizon: Int,
                  alpha: Double = 0.5, tieBreak: Seq[String] = Nil): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"need 0 < alpha <= 1, got $alpha")
    val wOrd = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val wAll = Window.partitionBy(seriesCols.map(col): _*)
    val wgt = when(col("t") === 1, pow(lit(1 - alpha), col("n") - 1))
      .otherwise(lit(alpha) * pow(lit(1 - alpha), col("n") - col("t")))
    df.withColumn("t", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("term9",
        floor(col(valueCol).cast("double") * wgt * 1e9 + 0.5).cast("long"))
      .groupBy(seriesCols.map(col): _*)
      .agg((sum(col("term9")) / 1e9).as("level"))
      .crossJoin(broadcast(horizons(df.sparkSession, horizon)))
      .select(seriesCols.map(col) :+ col("h") :+ col("level").as("yhat"): _*)
  }

  /** Theta method (Assimakopoulos & Nikolopoulos 2000 — the M3
    * competition winner), classic Theta(0,2) form, per series in ONE
    * shuffle. The two theta lines are
    *   theta=0:  the OLS trend  A + B·t          (pure long-run signal)
    *   theta=2:  z_t = 2·y_t − (A + B·t)          (doubled curvature)
    * and ŷ(n+h) = ( [A + B·(n−1+h)]  +  SES_α(z) ) / 2.
    *
    * Scale shape: SES is linear in its inputs, so the theta=2 level
    * never needs a second pass over z —
    *   L(z) = 2·Σw_t·y_t − A·Σw_t − B·Σw_t·t
    * with w_t the SES weights from [[sesForecast]]. All three weighted
    * sums ride in the SAME aggregate as the OLS sums: one partitioned
    * window (row index) + one aggregate on the same key, exchange
    * reused — a million-series Theta fit costs exactly what the f4
    * trend fit costs.
    *
    * Determinism: weighted terms quantized to the 1e-9 grid and summed
    * as BIGINT (order-free); dyadic α keeps the weights exact powers of
    * two, so the oracle replay is bit-identical. A single-observation
    * series degrades to naive (slope 0 ⇒ both lines are y₁). */
  def thetaForecast(df: DataFrame, valueCol: String, tsCol: String,
                    seriesCols: Seq[String], horizon: Int,
                    alpha: Double = 0.5, tieBreak: Seq[String] = Nil): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"need 0 < alpha <= 1, got $alpha")
    val wOrd = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val wAll = Window.partitionBy(seriesCols.map(col): _*)
    val wgt = when(col("t1") === 1, pow(lit(1 - alpha), col("n") - 1))
      .otherwise(lit(alpha) * pow(lit(1 - alpha), col("n") - col("t1")))
    df.withColumn("t1", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("t", (col("t1") - 1).cast("double"))
      .withColumn("y", col(valueCol).cast("double"))
      .withColumn("wgt", wgt)
      .withColumn("wy9", floor(col("y") * col("wgt") * 1e9 + 0.5).cast("long"))
      .withColumn("wt9", floor(col("t") * col("wgt") * 1e9 + 0.5).cast("long"))
      .withColumn("w9", floor(col("wgt") * 1e9 + 0.5).cast("long"))
      .groupBy(seriesCols.map(col): _*)
      .agg(count(lit(1)).cast("double").as("nn"),
           sum(col("t")).as("st"), sum(col("t") * col("t")).as("stt"),
           sum(col("y")).as("sy"), sum(col("t") * col("y")).as("sty"),
           sum(col("wy9")).as("swy9"), sum(col("wt9")).as("swt9"),
           sum(col("w9")).as("sw9"))
      .withColumn("slope", when(col("nn") > 1,
          (col("nn") * col("sty") - col("st") * col("sy")) /
          (col("nn") * col("stt") - col("st") * col("st"))).otherwise(lit(0.0)))
      .withColumn("icept", (col("sy") - col("slope") * col("st")) / col("nn"))
      .withColumn("lvl2",
        lit(2.0) * col("swy9") / 1e9 - col("icept") * col("sw9") / 1e9 -
          col("slope") * col("swt9") / 1e9)
      .crossJoin(broadcast(horizons(df.sparkSession, horizon)))
      .select(seriesCols.map(col) :+ col("h") :+
        ((col("icept") + col("slope") * (col("nn") - 1 + col("h")) + col("lvl2")) / 2)
          .as("yhat"): _*)
  }

  /** Croston's method (Croston 1972) — THE baseline for intermittent
    * demand (spare parts, rare purchases: mostly-zero series where SES
    * over the raw values just decays to noise). The series splits into
    *   z_i — the i-th NONZERO demand size
    *   q_i — the inter-demand interval (q₁ = position of the first
    *          demand, counting from the series start)
    * each smoothed with its own SES, and the flat per-period rate
    * forecast is  ŷ = level(z) / level(q).
    *
    * Scale shape: one series-keyed window (position index), a nonzero
    * filter, a second window on the SAME key (demand index + lag for
    * the gaps — no new exchange), one aggregate. Series with no demand
    * at all emit no row (a rate of an empty set is undefined — sparse
    * output, like seasonalNaive with n < m).
    *
    * Determinism: both SES levels use the [[sesForecast]] closed form
    * with 1e-9 BIGINT term sums; dyadic α ⇒ exact weights ⇒ replayable
    * oracle. */
  def crostonForecast(df: DataFrame, valueCol: String, tsCol: String,
                      seriesCols: Seq[String], horizon: Int,
                      alpha: Double = 0.5, tieBreak: Seq[String] = Nil): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"need 0 < alpha <= 1, got $alpha")
    val wOrd = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val wNz = Window.partitionBy(seriesCols.map(col): _*).orderBy(col("t"))
    val wNzAll = Window.partitionBy(seriesCols.map(col): _*)
    val wgt = when(col("i") === 1, pow(lit(1 - alpha), col("nnz") - 1))
      .otherwise(lit(alpha) * pow(lit(1 - alpha), col("nnz") - col("i")))
    df.withColumn("t", row_number().over(wOrd).cast("long"))
      .withColumn("y", col(valueCol).cast("double"))
      .filter(col("y") =!= 0.0)
      .withColumn("i", row_number().over(wNz))
      .withColumn("nnz", count(lit(1)).over(wNzAll))
      .withColumn("q", (col("t") - coalesce(lag(col("t"), 1).over(wNz), lit(0L)))
        .cast("double"))
      .withColumn("wgt", wgt)
      .withColumn("wz9", floor(col("y") * col("wgt") * 1e9 + 0.5).cast("long"))
      .withColumn("wq9", floor(col("q") * col("wgt") * 1e9 + 0.5).cast("long"))
      .groupBy(seriesCols.map(col): _*)
      .agg(sum(col("wz9")).as("z9"), sum(col("wq9")).as("q9"),
           max(col("nnz")).as("n_demands"))
      .crossJoin(broadcast(horizons(df.sparkSession, horizon)))
      .select(seriesCols.map(col) ++ Seq(col("h"),
        ((col("z9") / 1e9) / (col("q9") / 1e9)).as("yhat"), col("n_demands")): _*)
  }

  /** Syntetos–Boylan approximation (SBA — Syntetos & Boylan 2005, "The
    * accuracy of intermittent demand estimates", IJF 21): Croston's
    * estimator is biased HIGH by E[1/q] > 1/E[q]; multiplying by
    * (1 − α/2) removes the bias to first order. This is the method the
    * [[SeriesDiagnostics]] SBC classifier (t20_sbc) actually recommends
    * for the intermittent/lumpy quadrants — the pairing a demand
    * pipeline runs. Same plan as [[crostonForecast]] plus one row-local
    * multiply; with α = 0.5 the factor 0.75 is exact binary, so the
    * hash contract carries over unchanged. */
  def crostonSbaForecast(df: DataFrame, valueCol: String, tsCol: String,
                         seriesCols: Seq[String], horizon: Int,
                         alpha: Double = 0.5,
                         tieBreak: Seq[String] = Nil): DataFrame =
    crostonForecast(df, valueCol, tsCol, seriesCols, horizon, alpha, tieBreak)
      .withColumn("yhat", col("yhat") * lit(1 - alpha / 2))

  /** TSB intermittent-demand method (Teunter, Syntetos & Babai 2011,
    * "Intermittent demand: Linking forecasting to inventory
    * obsolescence", EJOR 214) — the bias-corrected successor to
    * Croston: instead of smoothing the inter-demand INTERVAL it smooths
    * the demand PROBABILITY every period,
    *   p_t = p_{t−1} + β(d_t − p_{t−1})   (d_t = 1{y_t > 0}, all periods)
    *   z_t = z_{t−1} + α(y_t − z_{t−1})   (demand periods only)
    * with p₁ = d₁, z₁ = first demand size; flat ŷ = p_n·z_n. Unlike
    * Croston, p decays through demand-free tails, so obsolete items
    * forecast toward 0.
    *
    * Same closed-weight shape as [[crostonForecast]]: both recursions
    * are SES folds, so every period's contribution is an independent
    * pow() weight — and since d_t = 0 periods contribute nothing to
    * EITHER sum, the plan only materializes demand rows: the global
    * period index `t` and count `n` come from the pre-filter window,
    * then the corpus reduces to nonzero rows. Weights quantize to the
    * 1e-9 BIGINT grid per row, so both engine's sums are exact-integer
    * and the p·z product is deterministic. Series with no demand at all
    * are dropped (z undefined — the Croston contract). */
  def tsbForecast(df: DataFrame, valueCol: String, tsCol: String,
                  seriesCols: Seq[String], horizon: Int,
                  alpha: Double = 0.5, beta: Double = 0.2,
                  tieBreak: Seq[String] = Nil): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"need 0 < alpha <= 1, got $alpha")
    require(beta > 0 && beta <= 1, s"need 0 < beta <= 1, got $beta")
    val wOrd = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val wAll = Window.partitionBy(seriesCols.map(col): _*)
    val wNz = Window.partitionBy(seriesCols.map(col): _*).orderBy(col("t"))
    // probability weights over ALL periods (p₁ = d₁ ⇒ the t=1 row keeps
    // the init weight); zero-demand rows contribute 0 to both sums, so
    // they are filtered before any weight materializes
    val wgtP = when(col("t") === 1L, pow(lit(1 - beta), col("n") - 1))
      .otherwise(lit(beta) * pow(lit(1 - beta), col("n") - col("t")))
    val wgtZ = when(col("i") === 1, pow(lit(1 - alpha), col("nnz") - 1))
      .otherwise(lit(alpha) * pow(lit(1 - alpha), col("nnz") - col("i")))
    df.withColumn("t", row_number().over(wOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll).cast("long"))
      .withColumn("y", col(valueCol).cast("double"))
      .filter(col("y") =!= 0.0)
      .withColumn("i", row_number().over(wNz))
      .withColumn("nnz", count(lit(1)).over(wAll))
      .withColumn("wp9", floor(wgtP * 1e9 + 0.5).cast("long"))
      .withColumn("wz9", floor(col("y") * wgtZ * 1e9 + 0.5).cast("long"))
      .groupBy(seriesCols.map(col): _*)
      .agg(sum(col("wp9")).as("p9"), sum(col("wz9")).as("z9"),
           max(col("nnz")).as("n_demands"))
      .crossJoin(broadcast(horizons(df.sparkSession, horizon)))
      .select(seriesCols.map(col) ++ Seq(col("h"),
        ((col("p9") / 1e9) * (col("z9") / 1e9)).as("yhat"),
        (col("p9") / 1e9).as("p_demand"), col("n_demands")): _*)
  }

  /** Holt's linear-trend method (ETS(A,N,N)→(A,A,N) step up from
    * [[sesForecast]]): coupled level/trend recursions
    *   l_t = α·y_t + (1−α)(l_{t−1} + b_{t−1})
    *   b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
    * initialized l₁ = y₁, b₁ = y₂ − y₁; ŷ(n+h) = l_n + h·b_n. With
    * `phi` < 1 this is the DAMPED-trend variant (ETS(A,Ad,N)): φ
    * multiplies the trend in both recursions and the horizon sum
    * becomes Σφ^i, flattening toward l + b·φ/(1−φ) — the conservative
    * long-horizon default (Gardner & McKenzie 1985). φ=1 reproduces
    * plain Holt exactly (the Σ stays integer-valued in IEEE).
    *
    * The coupled recursion has no per-row weight independent of the
    * rest of the series, so this is the [[PerSeriesArima]] shape: ONE
    * `flatMapGroups` pass, each series folded locally in its task —
    * millions of series in parallel, no collect. Series with n < 2 fall
    * back to naive (no trend from one point).
    *
    * Oracle strategy (f9_holt0): at β = 0 the trend stays b₁ and the
    * level is EXACTLY a SES over z_t = y_t − b₁(t−1) —
    *   ŷ(n+h) = SES_α(z) + b₁(n−1) + h·b₁
    * — so the DuckDB closed form checks this Scala RECURSION
    * cross-implementation (stronger than replaying the same algebra);
    * the general-β path is spec-pinned against a local fold. */
  def holtForecast(df: DataFrame, valueCol: String, tsCol: String,
                   seriesCol: String, horizon: Int,
                   alpha: Double = 0.5, beta: Double = 0.25,
                   tieBreak: Option[String] = None,
                   phi: Double = 1.0): DataFrame = {
    require(alpha > 0 && alpha <= 1 && beta >= 0 && beta <= 1,
      s"need 0 < alpha <= 1 and 0 <= beta <= 1, got $alpha/$beta")
    require(phi > 0 && phi <= 1, s"need 0 < phi <= 1 (damping), got $phi")
    val spark = df.sparkSession
    import spark.implicits._
    val tie = tieBreak.map(col(_).cast("double")).getOrElse(lit(0.0))
    df.select(col(seriesCol).cast("long"), col(tsCol).cast("double"),
              tie, col(valueCol).cast("double"))
      .as[(Long, Double, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (sid, it) =>
        val y = it.toArray.sortBy(t => (t._2, t._3)).map(_._4)
        if (y.isEmpty) Iterator.empty
        else {
          val (ln, bn) =
            if (y.length == 1) (y(0), 0.0)
            else {
              var l = y(0)
              var b = y(1) - y(0)
              for (t <- 1 until y.length) {
                val lNew = alpha * y(t) + (1 - alpha) * (l + phi * b)
                b = beta * (lNew - l) + (1 - beta) * phi * b
                l = lNew
              }
              (l, b)
            }
          // damped-trend horizon: Σ_{i=1..h} φ^i (= h at φ=1, Hyndman
          // ETS(A,Ad,N)); the forecast flattens toward l + b·φ/(1−φ)
          var acc = 0.0
          var pw = 1.0
          (1 to horizon).iterator.map { h =>
            pw *= phi; acc += pw
            (sid, h, ln + acc * bn)
          }
        }
      }
      .toDF(seriesCol, "h", "yhat")
  }

  /** Holdout backtest + model selection for EVERY series at once — the
    * leaderboard decision (`automl/AutoTimeseries`) at warehouse scale:
    * the last `h` points of each series are held out, the three
    * closed-form baselines (naive / drift / SES_α) fit on the rest, and
    * the per-series winner is the lowest holdout MAE. This is "which
    * model family does each of my million series want" in TWO shuffles
    * (the index window + the same-key aggregates), no model objects, no
    * collect.
    *
    * Determinism: absolute errors quantize to the 1e-9 grid and sum as
    * BIGINT, so the winner comparison is INTEGER — no float argmin tie
    * ambiguity cross-engine; ties break naive < drift < ses (simpler
    * model wins). Series shorter than h+2 are skipped (no train side to
    * fit). Output: (series…, n_train, mae_naive, mae_drift, mae_ses,
    * winner). */
  def backtestBaselines(df: DataFrame, valueCol: String, tsCol: String,
                        seriesCols: Seq[String], h: Int,
                        alpha: Double = 0.5,
                        tieBreak: Seq[String] = Nil): DataFrame = {
    require(h >= 1, s"need h >= 1, got $h")
    require(alpha > 0 && alpha <= 1, s"need 0 < alpha <= 1, got $alpha")
    val wOrd = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val wAll = Window.partitionBy(seriesCols.map(col): _*)
    val indexed = df
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("y", col(valueCol).cast("double"))
      .withColumn("ntr", col("n") - h)
      .filter(col("ntr") >= 2)
    val sesW = when(col("rn") === 1, pow(lit(1 - alpha), col("ntr") - 1))
      .otherwise(lit(alpha) * pow(lit(1 - alpha), col("ntr") - col("rn")))
    val fit = indexed.filter(col("rn") <= col("ntr"))
      .withColumn("ses9", floor(col("y") * sesW * 1e9 + 0.5).cast("long"))
      .groupBy(seriesCols.map(col): _*)
      .agg(max(col("ntr")).as("ntr"),
           max_by(col("y"), col("rn")).as("last_y"),
           min_by(col("y"), col("rn")).as("first_y"),
           sum(col("ses9")).as("ses9"))
    val err9 = (p: org.apache.spark.sql.Column) =>
      floor(abs(col("y") - p) * 1e9 + 0.5).cast("long")
    val scored = indexed.filter(col("rn") > col("ntr"))
      .withColumn("k", (col("rn") - col("ntr")).cast("double"))
      .drop("ntr")
      .join(fit, seriesCols)
      .withColumn("e_naive", err9(col("last_y")))
      .withColumn("e_drift", err9(col("last_y") +
        col("k") * (col("last_y") - col("first_y")) / (col("ntr") - 1)))
      .withColumn("e_ses", err9(col("ses9") / 1e9))
      .groupBy(seriesCols.map(col): _*)
      .agg(max(col("ntr")).as("n_train"),
           sum(col("e_naive")).as("s_naive"),
           sum(col("e_drift")).as("s_drift"),
           sum(col("e_ses")).as("s_ses"))
    scored
      .withColumn("winner",
        when(col("s_naive") <= col("s_drift") && col("s_naive") <= col("s_ses"), "naive")
          .when(col("s_drift") <= col("s_ses"), "drift")
          .otherwise("ses"))
      .select(seriesCols.map(col) ++ Seq(col("n_train"),
        (col("s_naive") / h / 1e9).as("mae_naive"),
        (col("s_drift") / h / 1e9).as("mae_drift"),
        (col("s_ses") / h / 1e9).as("mae_ses"),
        col("winner")): _*)
  }

  /** Rolling-origin K-fold cross-validation for EVERY series — the
    * reference's expanding-window CV (`utils/val.py`, T12 + A8: score
    * each model on K successive holdouts, average, pick) distributed
    * per series. Fold k trains on rows 1..n−h·(K−k+1) and tests the
    * next h rows, so the K test windows tile the series tail
    * disjointly; each of the three closed-form baselines
    * (naive / drift / SES_α) is fit per fold and the winner minimizes
    * the TOTAL holdout error across folds (equal-n comparison by
    * construction — every model sees the same K×h test points).
    *
    * Scale shape — deliberately NOT the explode-by-fold form: K is a
    * plan-time constant, so the K fold fits become K conditional agg
    * columns in ONE series-keyed aggregate (`sum(when(rn ≤ ntr_k, …))`)
    * and each holdout row computes its own fold id arithmetically —
    * window, fit aggregate, holdout join, and error aggregate all key
    * on the series: a single data exchange, data never multiplies by K.
    * Same integer-quantization discipline as [[backtestBaselines]];
    * ties break naive < drift < ses. Series shorter than h·K+2 are
    * skipped (every fold needs ≥2 train rows).
    *
    * Output: (series…, n, mae_naive, mae_drift, mae_ses, winner) with
    * maes averaged over all K·h holdout points. */
  def rollingOriginCv(df: DataFrame, valueCol: String, tsCol: String,
                      seriesCols: Seq[String], h: Int, folds: Int,
                      alpha: Double = 0.5,
                      tieBreak: Seq[String] = Nil): DataFrame = {
    require(h >= 1 && folds >= 1, s"need h, folds >= 1, got $h/$folds")
    require(alpha > 0 && alpha <= 1, s"need 0 < alpha <= 1, got $alpha")
    val K = folds
    val wOrd = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val wAll = Window.partitionBy(seriesCols.map(col): _*)
    val indexed = df
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("y", col(valueCol).cast("double"))
      .filter(col("n") >= h.toLong * K + 2)
    def ntrK(k: Int) = col("n") - h.toLong * (K - k + 1)
    val sesW = (k: Int) =>
      when(col("rn") === 1, pow(lit(1 - alpha), ntrK(k) - 1))
        .otherwise(lit(alpha) * pow(lit(1 - alpha), ntrK(k) - col("rn")))
    val fitCols = (1 to K).flatMap { k =>
      val inTrain = col("rn") <= ntrK(k)
      Seq(
        max_by(when(inTrain, col("y")), when(inTrain, col("rn"))).as(s"last_$k"),
        sum(when(inTrain,
          floor(col("y") * sesW(k) * 1e9 + 0.5).cast("long"))).as(s"ses9_$k"))
    } ++ Seq(min_by(col("y"), col("rn")).as("first_y"), max(col("n")).as("n"))
    val fit = indexed.groupBy(seriesCols.map(col): _*)
      .agg(fitCols.head, fitCols.tail: _*)
    // holdout rows: fold id is pure arithmetic (test windows tile the tail)
    val hold = indexed.filter(col("rn") > col("n") - h.toLong * K)
      .withColumn("k", (lit(K) - floor((col("n") - col("rn")) / h)).cast("int"))
      .drop("n")
      .join(fit, seriesCols)
    def byK(f: Int => org.apache.spark.sql.Column) =
      (2 to K).foldLeft(when(col("k") === 1, f(1))) { (acc, k) =>
        acc.when(col("k") === k, f(k))
      }
    val ntr = byK(k => ntrK(k))
    val lastY = byK(k => col(s"last_$k"))
    val ses = byK(k => col(s"ses9_$k") / 1e9)
    val kk = (col("rn") - ntr).cast("double")
    val err9 = (p: org.apache.spark.sql.Column) =>
      floor(abs(col("y") - p) * 1e9 + 0.5).cast("long")
    val scored = hold
      .withColumn("e_naive", err9(lastY))
      .withColumn("e_drift", err9(lastY + kk * (lastY - col("first_y")) / (ntr - 1)))
      .withColumn("e_ses", err9(ses))
      .groupBy(seriesCols.map(col): _*)
      .agg(max(col("n")).as("n"),
           sum(col("e_naive")).as("s_naive"),
           sum(col("e_drift")).as("s_drift"),
           sum(col("e_ses")).as("s_ses"))
    val denom = h.toLong * K
    scored
      .withColumn("winner",
        when(col("s_naive") <= col("s_drift") && col("s_naive") <= col("s_ses"), "naive")
          .when(col("s_drift") <= col("s_ses"), "drift")
          .otherwise("ses"))
      .select(seriesCols.map(col) ++ Seq(col("n"),
        (col("s_naive") / denom / 1e9).as("mae_naive"),
        (col("s_drift") / denom / 1e9).as("mae_drift"),
        (col("s_ses") / denom / 1e9).as("mae_ses"),
        col("winner")): _*)
  }

  /** The fused per-series forecasting pipeline — clean → select →
    * forecast for EVERY series in one plan (the reference's
    * fit-then-predict lifecycle, `auto_ts/__init__.py:202,910`, at
    * warehouse scale):
    *  1. Hampel-clean: anomalous points (rolling-MAD flag,
    *     [[SeriesDiagnostics.rollingMadAnomaly]]) are replaced by their
    *     rolling median — fit on wild points, garbage out;
    *  2. model-select: [[backtestBaselines]] on the CLEANED series
    *     picks naive/drift/SES per series on a last-`h` holdout;
    *  3. forecast: the winner is refit on the FULL cleaned series
    *     (standard practice — the holdout was for selection only) and
    *     extended `h` steps, all three closed forms computed in ONE
    *     aggregate and the winner's taken per series.
    *
    * Scale shape: every stage keys on the SAME series columns, so the
    * Hampel window's exchange is reused by the backtest window, the
    * refit aggregate, and the winner join — the t19/pipe1 lesson
    * (never introduce a second data-sized exchange on a different key)
    * applied from the start. The horizon table joins broadcast.
    * Output: (series…, winner, h, yhat). */
  def cleanSelectForecast(df: DataFrame, valueCol: String, tsCol: String,
                          seriesCols: Seq[String], h: Int,
                          halfWin: Int = 5, nSigmas: Double = 3.5,
                          alpha: Double = 0.5,
                          tieBreak: Seq[String] = Nil): DataFrame = {
    require(h >= 1, s"need h >= 1, got $h")
    val cleaned = SeriesDiagnostics.rollingMadAnomaly(
        df, valueCol, tsCol, seriesCols, halfWin, nSigmas, tieBreak)
      .withColumn("y_clean",
        when(col("is_anomaly"), col("med")).otherwise(col("y")))
    val winners = backtestBaselines(cleaned, "y_clean", tsCol, seriesCols,
        h, alpha, tieBreak)
      .select(seriesCols.map(col) :+ col("winner"): _*)
    val wOrd = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val wAll = Window.partitionBy(seriesCols.map(col): _*)
    val indexed = cleaned
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("nn", count(lit(1)).over(wAll))
      .withColumn("yc", col("y_clean").cast("double"))
      .filter(col("nn") >= h + 2)
    val sesW = when(col("rn") === 1, pow(lit(1 - alpha), col("nn") - 1))
      .otherwise(lit(alpha) * pow(lit(1 - alpha), col("nn") - col("rn")))
    val fit = indexed
      .withColumn("ses9", floor(col("yc") * sesW * 1e9 + 0.5).cast("long"))
      .groupBy(seriesCols.map(col): _*)
      .agg(max(col("nn")).as("nn"),
           max_by(col("yc"), col("rn")).as("last_y"),
           min_by(col("yc"), col("rn")).as("first_y"),
           sum(col("ses9")).as("ses9"))
    fit.join(winners, seriesCols)
      .crossJoin(broadcast(horizons(df.sparkSession, h)))
      .select(seriesCols.map(col) ++ Seq(col("winner"), col("h"),
        when(col("winner") === "naive", col("last_y"))
          .when(col("winner") === "drift", col("last_y") +
            col("h") * (col("last_y") - col("first_y")) / (col("nn") - 1))
          .otherwise(col("ses9") / 1e9)
          .as("yhat")): _*)
  }

  /** Holt–Winters additive seasonal (ETS(A,A,A)) — the seasonal step up
    * from [[holtForecast]], completing the per-series ETS ladder
    * (SES → Holt → damped → HW) that the reference's model zoo
    * approximates with SARIMAX grids (`build_arima.py`'s seasonal
    * orders). Coupled level/trend/seasonal recursions at period `m`:
    *   l_t = α(y_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
    *   b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *   s_t = γ(y_t − l_t) + (1−γ)·s_{t−m}
    * with the standard two-cycle initialization: l = first-cycle mean,
    * b = mean cycle-over-cycle step (Σ(y_{m+i}−y_i)/m²), s_i = first-
    * cycle deviations from that mean. ŷ(n+h) = l_n + h·b_n + s_phase
    * (latest stored seasonal for the target phase). Series shorter than
    * 2m are SKIPPED — two full cycles are the minimum that pins both
    * trend and a full seasonal profile (Hyndman & Athanasopoulos §8.3).
    *
    * Determinism: y is quantized to the 1e-9 grid at entry, so the
    * initialization sums are exact integers and the whole recursion is
    * a fixed-order fold over exact-decimal inputs — cross-engine
    * reproducible to the 6-decimal output grid.
    *
    * Shape: the coupled recursion has no per-row closed form, so this
    * is the [[holtForecast]] shape — ONE `flatMapGroups` pass, each
    * series folded locally in its task; millions of series in parallel,
    * no collect, no model objects.
    *
    * Oracle strategy (f11_hw0): at β = γ = 0 the trend stays b₀ and the
    * seasonal profile stays the initial one, so the level is EXACTLY a
    * SES over ζ_t = (y_t − s_phase) − b₀·(t−m+1) plus a b₀ ramp — a
    * DuckDB closed form that checks this Scala RECURSION
    * cross-implementation; the general-β/γ path is spec-pinned against
    * an independent local fold plus the exact-reconstruction property
    * on a purely seasonal series. */
  /** Holdout backtest + model selection over the FULL per-series zoo —
    * [[backtestBaselines]] widened from the three closed-form baselines
    * to the whole ETS ladder: naive / drift / SES_α / Holt(β=0, the
    * closed-form damped-none variant of [[holtForecast]]) / Theta /
    * Croston / Holt–Winters(m). "Which model family does each of my
    * million series want", one `groupByKey` fold — each series scores
    * all eight candidates locally in one O(n) pass, no model objects,
    * no collect, no per-candidate shuffle.
    *
    * Determinism contract (the whole point of this variant): inputs
    * quantize to the 1e-9 grid at entry; every candidate's fit uses
    * either (a) order-free exact-integer sums (SES/Croston/Theta weight
    * sums as BIGINT; Theta's OLS moments as exact BigInt so the
    * slope/intercept doubles are identical on any engine at any scale)
    * or (b) a sequential recursion replayed identically cross-engine
    * (HW — the oracle runs the same recursion as a recursive CTE).
    * Holdout errors quantize per test point and sum as BIGINT, so the
    * winner argmin is INTEGER; ties break simplest-first in the order
    * naive < drift < ses < holt < theta < croston < hw.
    *
    * Candidate eligibility: Croston needs ≥1 nonzero train demand, HW
    * needs ntr ≥ 2m; ineligible candidates emit null MAE and can't win.
    * Series shorter than h+2 are skipped. Output: (series, n_train,
    * mae_naive, mae_drift, mae_ses, mae_holt, mae_theta, mae_croston,
    * mae_hw, winner). */
  /** The eight zoo candidates fit on the first `len` points of a
    * series — the per-series local math shared VERBATIM between
    * [[backtestZoo]] (len = ntr, holdout selection) and
    * [[cleanSelectForecastZoo]] (len = n, winner refit): identical
    * arithmetic order, so selection and refit are the same estimator. */
  /** Fixed damping rate for the zoo's damped-trend member (Gardner &
    * McKenzie; 0.8 is the conservative end of the standard 0.8–0.98
    * band). φ-powers are built by REPEATED MULTIPLICATION of the
    * literal — never `pow` — because libm `pow(0.8, k)` is not
    * guaranteed bit-identical between the JVM and DuckDB; the oracle
    * replays the same multiply chain in a recursive CTE, so every
    * power is the identical double on both engines. */
  private[scale] val zooPhi = 0.8

  private[scale] final case class ZooFit(
      lastY: Double, firstY: Double, sesLvl: Double, b1: Double,
      holtLvl: Double, slope: Double, icept: Double, lvl2: Double,
      crostonRate: Option[Double], hwState: Option[(Double, Double, Array[Double])],
      dampedLvl: Double, phiN1: Double,
      sbaRate: Option[Double], tsbLevel: Option[Double],
      intermittent: Boolean, quadrant: String) {
    /** k-step-ahead prediction of candidate `name` from this fit.
      * `sba`/`tsb` return their value whenever COMPUTABLE (a nonzero
      * demand exists) — the Syntetos–Boylan quadrant gate decides
      * candidate ELIGIBILITY at selection time, not computability, so a
      * refit on the full series never fails when the quadrant flips. */
    def predict(name: String, len: Int, k: Int, m: Int): Option[Double] = name match {
      case "naive"   => Some(lastY)
      case "drift"   => Some(lastY + k * (lastY - firstY) / (len - 1))
      case "ses"     => Some(sesLvl)
      case "holt"    => Some(holtLvl + k * b1)
      case "damped"  =>
        // Σ_{i=1..k} φ^i by the same multiply chain as the oracle's CTE
        var pw = 1.0; var acc = 0.0
        for (_ <- 1 to k) { pw *= zooPhi; acc += pw }
        Some(dampedLvl + b1 * phiN1 * acc)
      case "theta"   => Some((icept + slope * (len - 1 + k) + lvl2) / 2)
      case "croston" => crostonRate
      case "sba"     => sbaRate
      case "tsb"     => tsbLevel
      case "hw"      => hwState.map { case (l, b, s) => l + k * b + s((len - 1 + k) % m) }
    }
  }

  private[scale] def zooFit(y9: Array[Long], len: Int, m: Int,
                            alpha: Double, beta: Double,
                            gamma: Double): ZooFit = {
    val yq = y9.map(_ / 1e9)
    def sesW(t: Int, l: Int): Double = // t 1-based
      if (t == 1) math.pow(1 - alpha, l - 1)
      else alpha * math.pow(1 - alpha, l - t)
    def q9(x: Double): Long = math.floor(x * 1e9 + 0.5).toLong
    val lastY = yq(len - 1); val firstY = yq(0)
    var ses9 = 0L
    for (t <- 1 to len) ses9 += q9(yq(t - 1) * sesW(t, len))
    val sesLvl = ses9 / 1e9
    val b1 = yq(1) - yq(0)
    var hz9 = 0L
    for (t <- 1 to len) hz9 += q9((yq(t - 1) - b1 * (t - 1)) * sesW(t, len))
    val holtLvl = hz9 / 1e9 + b1 * (len - 1)
    var st = 0L; var stt = 0L
    var sy9 = BigInt(0); var sty9 = BigInt(0)
    var swy9 = 0L; var swt9 = 0L; var sw9 = 0L
    for (t <- 1 to len) {
      val ti = t - 1L
      st += ti; stt += ti * ti
      sy9 += y9(t - 1); sty9 += BigInt(ti) * y9(t - 1)
      val w = sesW(t, len)
      swy9 += q9(yq(t - 1) * w); swt9 += q9(ti * w); sw9 += q9(w)
    }
    val slope =
      if (len > 1)
        (BigInt(len) * sty9 - BigInt(st) * sy9).toDouble /
          (len * stt - st * st).toDouble / 1e9
      else 0.0
    val icept = (sy9.toDouble / 1e9 - slope * st) / len
    val lvl2 = 2.0 * swy9 / 1e9 - icept * sw9 / 1e9 - slope * swt9 / 1e9
    val nzIdx = (1 to len).filter(t => yq(t - 1) != 0.0)
    // croston rate AND the smoothed nonzero-size level z (TSB reuses z)
    val crostonPair: Option[(Double, Double)] =
      if (nzIdx.isEmpty) None
      else {
        val nnz = nzIdx.length
        var z9 = 0L; var g9 = 0L; var prev = 0L
        for ((t, i0) <- nzIdx.zipWithIndex) {
          val w = sesW(i0 + 1, nnz)
          z9 += q9(yq(t - 1) * w)
          g9 += q9((t - prev) * w)
          prev = t
        }
        Some(((z9 / 1e9) / (g9 / 1e9), z9 / 1e9))
      }
    val crostonRate = crostonPair.map(_._1)
    // SBA (Syntetos–Boylan 2005 approximation): Croston's rate is biased
    // high under stochastic intervals; the (1 − α/2) deflator corrects it
    val sbaRate = crostonRate.map(_ * (1 - alpha / 2))
    // TSB (Teunter–Syntetos–Babai 2011): smooth the demand PROBABILITY
    // every period (β weights over occurrence indicators — handles
    // obsolescence, unlike interval-based Croston) times the smoothed
    // nonzero size. Same weighted-sum closed form as the SES level:
    // w_β(t) = (1−β)^{len−1} for t=1, else β(1−β)^{len−t}; each
    // occ·w term folds on the 1e-9 grid.
    val tsbLevel: Option[Double] = crostonPair.map { case (_, z) =>
      var p9 = 0L
      for (t <- 1 to len) {
        val occ = if (y9(t - 1) != 0L) 1.0 else 0.0
        val w = if (t == 1) math.pow(1 - beta, len - 1)
                else beta * math.pow(1 - beta, len - t)
        p9 += q9(occ * w)
      }
      (p9 / 1e9) * z
    }
    // Syntetos–Boylan quadrant (2005 classification): ADI = len/nnz vs
    // 1.32 and CV² of nonzero sizes vs 0.49, both compared EXACTLY in
    // integers on the 1e-9 grid (100·len ≥ 132·nnz; 100·nnz·Σz² ≥
    // 149·(Σz)² over BigInt) — the gate that routes SBA/TSB in as
    // candidates only where the intermittency literature says they win.
    val nnzCount = nzIdx.length
    var gz = BigInt(0); var gzz = BigInt(0)
    for (t <- nzIdx) { val v = BigInt(y9(t - 1)); gz += v; gzz += v * v }
    val adiHigh = nnzCount == 0 || 100L * len >= 132L * nnzCount
    val cvHigh = nnzCount > 0 &&
      BigInt(100) * nnzCount * gzz >= BigInt(149) * gz * gz
    val quadrant =
      if (adiHigh && cvHigh) "lumpy"
      else if (adiHigh) "intermittent"
      else if (cvHigh) "erratic"
      else "smooth"
    val hwState: Option[(Double, Double, Array[Double])] =
      if (len < 2 * m) None
      else {
        var sum9 = 0L; var diff9 = 0L
        for (i <- 0 until m) { sum9 += y9(i); diff9 += y9(m + i) - y9(i) }
        var l = sum9.toDouble / m / 1e9
        var b = diff9.toDouble / (m.toLong * m) / 1e9
        val s = Array.tabulate(m)(i => yq(i) - l)
        for (t <- m until len) {
          val ph = t % m
          val lNew = alpha * (yq(t) - s(ph)) + (1 - alpha) * (l + b)
          b = beta * (lNew - l) + (1 - beta) * b
          s(ph) = gamma * (yq(t) - lNew) + (1 - gamma) * s(ph)
          l = lNew
        }
        Some((l, b, s))
      }
    // damped-trend (β=0, φ = zooPhi) level: the SES sum plus the
    // φ-geometric drip, both on the 1e-9 grid (the f13_damped0 algebra);
    // φ^j from the multiply chain, never pow — see zooPhi
    val phiPow = new Array[Double](len)
    if (len > 0) { phiPow(0) = 1.0
      for (j <- 1 until len) phiPow(j) = phiPow(j - 1) * zooPhi }
    var drip9 = 0L
    for (t <- 2 to len)
      drip9 += q9((1 - alpha) * b1 * phiPow(t - 1) * math.pow(1 - alpha, len - t))
    val dampedLvl = (ses9 + drip9) / 1e9
    val phiN1 = if (len > 1) phiPow(len - 1) else 1.0
    ZooFit(lastY, firstY, sesLvl, b1, holtLvl, slope, icept, lvl2,
           crostonRate, hwState, dampedLvl, phiN1,
           sbaRate, tsbLevel, intermittent = adiHigh, quadrant = quadrant)
  }

  // sba/tsb appended LAST: ties still break toward the simpler classical
  // families, so series the intermittency gate doesn't route keep the
  // exact winner they had before the gate existed
  private[scale] val zooOrder =
    Seq("naive", "drift", "ses", "holt", "damped", "theta", "croston", "hw",
        "sba", "tsb")

  def backtestZoo(df: DataFrame, valueCol: String, tsCol: String,
                  seriesCol: String, h: Int, m: Int = 7,
                  alpha: Double = 0.5, beta: Double = 0.25,
                  gamma: Double = 0.25,
                  tieBreak: Option[String] = None): DataFrame = {
    require(h >= 1 && m >= 2, s"need h >= 1 and m >= 2, got $h/$m")
    val spark = df.sparkSession
    import spark.implicits._
    val tie = tieBreak.map(col(_).cast("double")).getOrElse(lit(0.0))
    df.select(col(seriesCol).cast("long"), col(tsCol).cast("double"),
              tie, col(valueCol).cast("double"))
      .as[(Long, Double, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (sid, it) =>
        val y9 = it.toArray.sortBy(t => (t._2, t._3))
          .map(t => math.floor(t._4 * 1e9 + 0.5).toLong)
        val n = y9.length
        val ntr = n - h
        if (ntr < 2) Iterator.empty
        else {
          val yq = y9.map(_ / 1e9)
          // all eight candidates fit on the train prefix — the shared
          // [[zooFit]] local math (SES weights dyadic-exact, Theta
          // moments exact-integer, HW the batch recursion verbatim)
          val fit = zooFit(y9, ntr, m, alpha, beta, gamma)
          // --- holdout errors (exact-integer sums) --------------------
          val errs = scala.collection.mutable.LinkedHashMap(
            zooOrder.map(_ -> 0L): _*)
          for (k <- 1 to h) {
            val yt = yq(ntr - 1 + k)
            def e(p: Double): Long = math.floor(math.abs(yt - p) * 1e9 + 0.5).toLong
            for (nm <- zooOrder; p <- fit.predict(nm, ntr, k, m))
              errs(nm) += e(p)
          }
          val cands = zooOrder.map { nm =>
            val eligible = nm match {
              case "croston" => fit.crostonRate.isDefined
              // the intermittency gate: SBA/TSB are candidates only in
              // the ADI ≥ 1.32 half of the Syntetos–Boylan plane
              case "sba"     => fit.intermittent && fit.sbaRate.isDefined
              case "tsb"     => fit.intermittent && fit.tsbLevel.isDefined
              case "hw"      => fit.hwState.isDefined
              case _         => true
            }
            nm -> (if (eligible) Some(errs(nm)) else None)
          }
          val best = cands.flatMap { case (nm, e) => e.map(nm -> _) }
            .minBy(_._2)._2
          val winner = cands.collectFirst {
            case (nm, Some(e)) if e == best => nm }.get
          def mae(e: Option[Long]): Option[Double] = e.map(_ / h.toDouble / 1e9)
          val em = cands.toMap
          Iterator.single((sid, ntr.toLong,
            mae(em("naive")), mae(em("drift")), mae(em("ses")),
            mae(em("holt")), mae(em("damped")), mae(em("theta")),
            mae(em("croston")), mae(em("hw")),
            mae(em("sba")), mae(em("tsb")),
            fit.quadrant, winner))
        }
      }
      .toDF(seriesCol, "n_train", "mae_naive", "mae_drift", "mae_ses",
            "mae_holt", "mae_damped", "mae_theta", "mae_croston", "mae_hw",
            "mae_sba", "mae_tsb", "quadrant", "winner")
  }

  /** [[cleanSelectForecast]] widened to the FULL per-series zoo (r11
    * task #7): Hampel-clean → [[backtestZoo]]-select on the cleaned
    * series → the WINNER family refit on the full cleaned series and
    * extended `h` steps. Selection and refit share [[zooFit]] verbatim,
    * so "the model the backtest chose" and "the model the pipeline
    * ships" are the same estimator at two train lengths.
    *
    * Scale shape: ONE clean pass (the Hampel window exchange) feeds ONE
    * `groupByKey` fold per series that does select + refit + forecast
    * locally — no second data-sized exchange, no winner join, no model
    * objects. Output: (series, n, winner, h, yhat). */
  def cleanSelectForecastZoo(df: DataFrame, valueCol: String, tsCol: String,
                             seriesCol: String, h: Int, m: Int = 7,
                             alpha: Double = 0.5, beta: Double = 0.25,
                             gamma: Double = 0.25,
                             halfWin: Int = 5, nSigmas: Double = 3.5,
                             tieBreak: Option[String] = None): DataFrame = {
    require(h >= 1 && m >= 2, s"need h >= 1 and m >= 2, got $h/$m")
    val spark = df.sparkSession
    import spark.implicits._
    val cleaned = SeriesDiagnostics.rollingMadAnomaly(
        df, valueCol, tsCol, Seq(seriesCol), halfWin, nSigmas, tieBreak.toSeq)
      .withColumn("y_clean",
        when(col("is_anomaly"), col("med")).otherwise(col("y")))
    val tie = tieBreak.map(col(_).cast("double")).getOrElse(lit(0.0))
    cleaned.select(col(seriesCol).cast("long"), col(tsCol).cast("double"),
              tie, col("y_clean").cast("double"))
      .as[(Long, Double, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (sid, it) =>
        val y9 = it.toArray.sortBy(t => (t._2, t._3))
          .map(t => math.floor(t._4 * 1e9 + 0.5).toLong)
        val n = y9.length
        val ntr = n - h
        if (ntr < 2) Iterator.empty
        else {
          val yq = y9.map(_ / 1e9)
          val sel = zooFit(y9, ntr, m, alpha, beta, gamma)
          val errs = scala.collection.mutable.LinkedHashMap(
            zooOrder.map(_ -> 0L): _*)
          for (k <- 1 to h) {
            val yt = yq(ntr - 1 + k)
            def e(p: Double): Long = math.floor(math.abs(yt - p) * 1e9 + 0.5).toLong
            for (nm <- zooOrder; p <- sel.predict(nm, ntr, k, m))
              errs(nm) += e(p)
          }
          val cands = zooOrder.map { nm =>
            val eligible = nm match {
              case "croston" => sel.crostonRate.isDefined
              case "sba"     => sel.intermittent && sel.sbaRate.isDefined
              case "tsb"     => sel.intermittent && sel.tsbLevel.isDefined
              case "hw"      => sel.hwState.isDefined
              case _         => true
            }
            nm -> (if (eligible) Some(errs(nm)) else None)
          }
          val best = cands.flatMap { case (nm, e) => e.map(nm -> _) }
            .minBy(_._2)._2
          val winner = cands.collectFirst {
            case (nm, Some(e)) if e == best => nm }.get
          // winner refit on the FULL cleaned series — same local math
          val refit = zooFit(y9, n, m, alpha, beta, gamma)
          (1 to h).iterator.map { k =>
            (sid, n.toLong, winner, k.toLong,
             refit.predict(winner, n, k, m).get)
          }
        }
      }
      .toDF(seriesCol, "n", "winner", "h", "yhat")
  }

  def holtWintersForecast(df: DataFrame, valueCol: String, tsCol: String,
                          seriesCol: String, horizon: Int, m: Int,
                          alpha: Double = 0.5, beta: Double = 0.25,
                          gamma: Double = 0.25,
                          tieBreak: Option[String] = None): DataFrame = {
    require(m >= 2, s"need season length m >= 2, got $m")
    require(alpha > 0 && alpha <= 1 && beta >= 0 && beta <= 1 &&
            gamma >= 0 && gamma <= 1,
      s"need 0 < alpha <= 1 and 0 <= beta,gamma <= 1, got $alpha/$beta/$gamma")
    val spark = df.sparkSession
    import spark.implicits._
    val tie = tieBreak.map(col(_).cast("double")).getOrElse(lit(0.0))
    df.select(col(seriesCol).cast("long"), col(tsCol).cast("double"),
              tie, col(valueCol).cast("double"))
      .as[(Long, Double, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (sid, it) =>
        val y9 = it.toArray.sortBy(t => (t._2, t._3))
          .map(t => math.floor(t._4 * 1e9 + 0.5).toLong)
        val n = y9.length
        if (n < 2 * m) Iterator.empty
        else {
          val yq = y9.map(_ / 1e9)
          var sum9 = 0L; var diff9 = 0L
          for (i <- 0 until m) { sum9 += y9(i); diff9 += y9(m + i) - y9(i) }
          var l = sum9.toDouble / m / 1e9
          var b = diff9.toDouble / (m.toLong * m) / 1e9
          val s = Array.tabulate(m)(i => yq(i) - l)
          for (t <- m until n) {
            val ph = t % m
            val lNew = alpha * (yq(t) - s(ph)) + (1 - alpha) * (l + b)
            b = beta * (lNew - l) + (1 - beta) * b
            s(ph) = gamma * (yq(t) - lNew) + (1 - gamma) * s(ph)
            l = lNew
          }
          (1 to horizon).iterator.map { h =>
            (sid, h, l + h * b + s((n - 1 + h) % m))
          }
        }
      }
      .toDF(seriesCol, "h", "yhat")
  }

  /** Local-level Kalman filter per series (the structural "random walk
    * plus noise" model, Harvey 1989 §2; statsmodels' UnobservedComponents
    * 'local level' — the state-space counterpart of SES with a
    * PRINCIPLED, variance-adaptive gain instead of a fixed α):
    *   y_t = μ_t + ε_t,  ε ~ (0, r)
    *   μ_t = μ_{t−1} + η_t,  η ~ (0, q)
    * Filter recursion after init a₁ = y₁, p₁ = r:
    *   p′ = p + q;  k = p′/(p′+r);  a ← a + k(y_t − a);  p ← (1−k)p′
    * Emits one row PER EVENT: the one-step-ahead prediction made before
    * absorbing it (yhat_prior — the innovation base, the anomaly-score
    * hook), the posterior level, variance, and gain. The gain converges
    * to the steady state k* = (√(q²+4qr) − q)/(2r) + q-ish constant, so
    * the filter is SES with a learned α — but early observations get
    * the principled larger gains SES lacks.
    *
    * Determinism contract: inputs quantize to the cents grid; q and r
    * are binary fractions (defaults 1/4 and 1) so every +, ×, ÷ in the
    * recursion is one IEEE-754 op — DuckDB replays the SAME recursion
    * as a recursive CTE and matches bit-for-bit (the st_tsb precedent).
    * One flatMapGroups pass; O(n) per series, O(1) state. */
  def kalmanLocalLevel(df: DataFrame, valueCol: String, tsCol: String,
                       seriesCol: String, idCol: String,
                       q: Double = 0.25, r: Double = 1.0): DataFrame = {
    require(q > 0 && r > 0, s"need positive variances, got q=$q r=$r")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(seriesCol).cast("long"), col(tsCol).cast("double"),
              col(idCol).cast("long"), col(valueCol).cast("double"))
      .as[(Long, Double, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (sid, it) =>
        val rows = it.toArray.sortBy(t => (t._2, t._3))
        if (rows.isEmpty) Iterator.empty
        else {
          var a = math.floor(rows(0)._4 * 100 + 0.5) / 100
          var p = r
          val first = (sid, rows(0)._3, Option.empty[Double], a, p,
                       Option.empty[Double])
          Iterator.single(first) ++ rows.iterator.drop(1).map { t =>
            val y = math.floor(t._4 * 100 + 0.5) / 100
            val pPred = p + q
            val k = pPred / (pPred + r)
            val prior = a
            a = a + k * (y - a)
            p = (1 - k) * pPred
            (sid, t._3, Some(prior), a, p, Some(k))
          }
        }
      }
      .toDF(seriesCol, idCol, "yhat_prior", "level", "p_var", "k_gain")
  }

  /** Split-conformal forecast intervals per series (Vovk et al. 2005;
    * the distribution-free band construction modern forecasting evals
    * default to): hold out the last ⌊n/4⌋ points as a calibration set,
    * fit the base model (drift line through the TRAIN endpoints) on the
    * rest, take the calibration absolute residuals' ⌈(c+1)·cov⌉-th
    * order statistic as the band half-width q̂ — finite-sample coverage
    * ≥ cov under exchangeability, no distributional assumption the
    * Gaussian bands of [[trendForecastBands]] need.
    *
    * Everything is closed-form (endpoint drift + an ORDER-STATISTIC
    * quantile with (score, rn) tie-break — never interpolated), so the
    * whole construction hash-checks against a DuckDB window replay.
    * Plan shape: every window and aggregate partitions by the series
    * key — ONE exchange end to end, the f4/f5 contract. Series with
    * n < 16 are dropped (c ≥ 4 keeps the order-statistic rank ≤ c). */
  def conformalForecast(df: DataFrame, valueCol: String, tsCol: String,
                        seriesCol: String, horizon: Int,
                        covNum: Int = 8, covDen: Int = 10,
                        tieBreak: Option[String] = None): DataFrame = {
    require(covNum > 0 && covNum < covDen, s"need 0 < cov < 1")
    val tie = tieBreak.map(col).getOrElse(lit(0L))
    val wOrd = Window.partitionBy(col(seriesCol)).orderBy(col(tsCol), tie)
    val wAll = Window.partitionBy(col(seriesCol))
    val base = df
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll).cast("long"))
      .filter(col("n") >= 16L)
      .withColumn("c", expr("n div 4"))
      .withColumn("m", col("n") - col("c"))
      .withColumn("y", col(valueCol).cast("double"))
      .withColumn("y1", max(when(col("rn") === 1L, col("y"))).over(wAll))
      .withColumn("ym", max(when(col("rn") === col("m"), col("y"))).over(wAll))
      .withColumn("slope", (col("ym") - col("y1")) / (col("m") - 1L))
    val scored = base.filter(col("rn") > col("m"))
      .withColumn("score",
        floor(abs(col("y") - (col("ym") + (col("rn") - col("m")) * col("slope")))
          * 1e6 + 0.5) / 1e6)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(seriesCol)).orderBy(col("score"), col("rn"))))
      .withColumn("kq", expr(s"least(c, ($covNum*(c+1) + ${covDen - 1}) div $covDen)"))
    val fit = scored.groupBy(col(seriesCol))
      .agg(max(when(col("rk") === col("kq"), col("score"))).as("qhat"),
           max(col("n")).as("n"), max(col("c")).as("c"),
           max(col("m")).as("m"), max(col("ym")).as("ym"),
           max(col("slope")).as("slope"))
    fit.crossJoin(broadcast(horizons(df.sparkSession, horizon)))
      .withColumn("yhat", col("ym") + (col("n") - col("m") + col("h")) * col("slope"))
      .select(col(seriesCol), col("h"), col("n"), col("c"),
              col("qhat"), col("yhat"),
              (col("yhat") - col("qhat")).as("lo"),
              (col("yhat") + col("qhat")).as("hi"))
  }

  /** Holt–Winters MULTIPLICATIVE seasonal (the ETS(A,A,M) classic,
    * Hyndman & Athanasopoulos fpp3 §8.3) — the seasonal effect scales
    * WITH the level (retail/traffic shapes) where [[holtWintersForecast]]
    * adds a fixed offset:
    *   l_t = α·(y_t / s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
    *   b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}
    *   s_t = γ·(y_t / l_t) + (1−γ)s_{t−m}
    *   ŷ(n+h) = (l_n + h·b_n) · s_{n+h−m}
    * Init mirrors the additive form: l₀ = mean of the first season,
    * b₀ = Σ(y_{m+i} − y_i)/m², s_i = y_i / l₀ (RATIOS, not offsets).
    *
    * Multiplicative decomposition requires strictly positive data —
    * series with any y ≤ 0 are skipped (the standard contract; ratios
    * to zero/negative levels are undefined), as are series shorter
    * than 2m (no second cycle to estimate trend).
    *
    * Same [[holtWintersForecast]] shape: ONE flatMapGroups pass.
    * Oracle strategy (f15_hwm0): at β = γ = 0 the level recursion is
    * the SAME linear form as the additive twin with x_t = y_t/s_phase,
    * so the f11_hw0 closed form transfers verbatim with division in
    * place of subtraction and the forecast multiplied by the frozen
    * ratio. */
  def holtWintersMultForecast(df: DataFrame, valueCol: String, tsCol: String,
                              seriesCol: String, horizon: Int, m: Int,
                              alpha: Double = 0.5, beta: Double = 0.25,
                              gamma: Double = 0.25,
                              tieBreak: Option[String] = None): DataFrame = {
    require(m >= 2, s"need season length m >= 2, got $m")
    require(alpha > 0 && alpha <= 1 && beta >= 0 && beta <= 1 &&
            gamma >= 0 && gamma <= 1,
      s"need 0 < alpha <= 1 and 0 <= beta,gamma <= 1, got $alpha/$beta/$gamma")
    val spark = df.sparkSession
    import spark.implicits._
    val tie = tieBreak.map(col(_).cast("double")).getOrElse(lit(0.0))
    df.select(col(seriesCol).cast("long"), col(tsCol).cast("double"),
              tie, col(valueCol).cast("double"))
      .as[(Long, Double, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (sid, it) =>
        val y9 = it.toArray.sortBy(t => (t._2, t._3))
          .map(t => math.floor(t._4 * 1e9 + 0.5).toLong)
        val n = y9.length
        if (n < 2 * m || y9.exists(_ <= 0L)) Iterator.empty
        else {
          val yq = y9.map(_ / 1e9)
          var sum9 = 0L; var diff9 = 0L
          for (i <- 0 until m) { sum9 += y9(i); diff9 += y9(m + i) - y9(i) }
          var l = sum9.toDouble / m / 1e9
          var b = diff9.toDouble / (m.toLong * m) / 1e9
          val s = Array.tabulate(m)(i => yq(i) / l)
          for (t <- m until n) {
            val ph = t % m
            val lNew = alpha * (yq(t) / s(ph)) + (1 - alpha) * (l + b)
            b = beta * (lNew - l) + (1 - beta) * b
            s(ph) = gamma * (yq(t) / lNew) + (1 - gamma) * s(ph)
            l = lNew
          }
          (1 to horizon).iterator.map { h =>
            (sid, h, (l + h * b) * s((n - 1 + h) % m))
          }
        }
      }
      .toDF(seriesCol, "h", "yhat")
  }

  /** Inverse-MAE forecast combination (Bates & Granger 1969; "forecast
    * combination puzzle" — the equal/inverse-error-weighted average of
    * simple models routinely beats its best member, M4's headline
    * lesson): per series, backtest the naive/drift/SES trio on a
    * holdout ([[backtestBaselines]]), weight each ∝ 1/(MAE + ε), refit
    * all three on the FULL series, and forecast the weighted average.
    *
    * Every member is closed-form and the weights divide deterministic
    * doubles built from exact integer error sums, so the whole
    * construction — weights AND combined forecast — hash-checks against
    * a DuckDB replay. Shape: two series-keyed aggregate passes (backtest
    * + full refit) sharing one partitioning; weights and horizons are
    * row-local arithmetic. */
  def comboForecast(df: DataFrame, valueCol: String, tsCol: String,
                    seriesCol: String, h: Int, horizon: Int,
                    alpha: Double = 0.5,
                    tieBreak: Option[String] = None): DataFrame = {
    val bt = backtestBaselines(df, valueCol, tsCol, Seq(seriesCol), h,
                               alpha, tieBreak.toSeq)
    val wOrd = Window.partitionBy(col(seriesCol))
      .orderBy((tsCol +: tieBreak.toSeq).map(col): _*)
    val wAll = Window.partitionBy(col(seriesCol))
    val indexed = df
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("nf", count(lit(1)).over(wAll))
      .withColumn("y", col(valueCol).cast("double"))
    val sesW = when(col("rn") === 1, pow(lit(1 - alpha), col("nf") - 1))
      .otherwise(lit(alpha) * pow(lit(1 - alpha), col("nf") - col("rn")))
    val full = indexed
      .withColumn("ses9f", floor(col("y") * sesW * 1e9 + 0.5).cast("long"))
      .groupBy(col(seriesCol))
      .agg(max(col("nf")).as("nf"),
           max_by(col("y"), col("rn")).as("last_yf"),
           min_by(col("y"), col("rn")).as("first_yf"),
           sum(col("ses9f")).as("ses9f"))
    def iv(m: String) = lit(1.0) / (col(m) + lit(0.001))
    bt.join(full, seriesCol)
      .withColumn("iv_n", iv("mae_naive"))
      .withColumn("iv_d", iv("mae_drift"))
      .withColumn("iv_s", iv("mae_ses"))
      .withColumn("ws", col("iv_n") + col("iv_d") + col("iv_s"))
      .crossJoin(broadcast(horizons(df.sparkSession, horizon)))
      .withColumn("yh_d", col("last_yf") +
        col("h") * (col("last_yf") - col("first_yf")) / (col("nf") - 1))
      .select(col(seriesCol), col("h"),
        ((col("iv_n") / col("ws")) * col("last_yf")
          + (col("iv_d") / col("ws")) * col("yh_d")
          + (col("iv_s") / col("ws")) * (col("ses9f") / 1e9)).as("yhat"),
        (col("iv_n") / col("ws")).as("w_naive"),
        (col("iv_d") / col("ws")).as("w_drift"),
        (col("iv_s") / col("ws")).as("w_ses"))
  }

  /** GARCH(1,1) conditional-variance filter per series (Bollerslev 1986)
    * with FIXED coefficients — the volatility-tracking companion to
    * [[kalmanLocalLevel]]: over first differences r_t = y_t − y_{t-1},
    * h_t = ω + α·r²_{t-1} + β·h_{t-1}, h at the first return = h0.
    * Fixed (ω, α, β) keeps the filter a pure closed-form recursion (the
    * QMLE fit is a driver-side optimization the reference family also
    * doesn't distribute); pick binary-fraction coefficients and the whole
    * trajectory is bit-deterministic: y on the cents grid makes every
    * r·r exact, ω + α·r·r + β·h is three IEEE ops in fixed order.
    *
    * Emits one row per return: (series, id, r, h, vol = √h, z = r/√h).
    * Scale shape: ONE groupByKey exchange on the series key, O(1) state
    * per series inside the sorted fold — the f16 contract. */
  def garchFilter(df: DataFrame, valueCol: String, tsCol: String,
                  seriesCol: String, idCol: String,
                  omega: Double = 0.25, alpha: Double = 0.25,
                  beta: Double = 0.5, h0: Double = 1.0): DataFrame = {
    require(omega > 0 && alpha >= 0 && beta >= 0 && alpha + beta < 1,
      s"need stationarity: omega>0, alpha+beta<1; got ($omega,$alpha,$beta)")
    require(h0 > 0, s"need h0 > 0 (h0 seeds the variance recursion; " +
      s"h0 <= 0 yields vol=0 and z=r/0 on the first return), got $h0")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(seriesCol).cast("long"), col(tsCol).cast("double"),
              col(idCol).cast("long"), col(valueCol).cast("double"))
      .as[(Long, Double, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (sid, it) =>
        val rows = it.toArray.sortBy(t => (t._2, t._3))
        if (rows.length < 2) Iterator.empty
        else {
          def cents(v: Double) = math.floor(v * 100 + 0.5) / 100
          var h = h0
          var prevY = cents(rows(0)._4)
          var prevR = 0.0
          var first = true
          rows.iterator.drop(1).map { t =>
            val y = cents(t._4)
            val r = y - prevY
            if (!first) h = omega + alpha * prevR * prevR + beta * h
            first = false
            prevY = y; prevR = r
            val vol = math.sqrt(h)
            (sid, t._3, r, h, vol, r / vol)
          }
        }
      }
      .toDF(seriesCol, idCol, "r", "h", "vol", "z")
  }

  /** ADIDA intermittent-demand forecast (Nikolopoulos et al. 2011,
    * "An aggregate–disaggregate intermittent demand approach") — the
    * temporal-aggregation alternative to Croston/SBA/TSB: aggregate the
    * per-period demand series into non-overlapping blocks of `m` (most
    * recent first; the oldest n mod m periods are dropped), forecast the
    * next BLOCK with SES (closed dyadic-α weights), then disaggregate
    * uniformly back to the period level. Aggregation cancels
    * intermittency (many zero periods fold into nonzero blocks), which
    * is exactly why the method wins on lumpy series.
    *
    * Output per series: (n_periods, n_blocks, yhat_block, yhat_period).
    * Scale shape: one series-keyed window (position index), one
    * (series, block) aggregate, one series aggregate — the block key is
    * a pure function of the position so no extra exchange beyond the
    * croston contract. Determinism: block totals fold the cents grid
    * exactly; SES weights are exact powers of two; term sums are 1e-9
    * BIGINT folds. */
  def adidaForecast(df: DataFrame, valueCol: String, tsCol: String,
                    seriesCols: Seq[String], m: Int,
                    alpha: Double = 0.5,
                    tieBreak: Seq[String] = Nil): DataFrame = {
    require(m >= 1, s"need block size >= 1, got $m")
    require(alpha > 0 && alpha <= 1, s"need 0 < alpha <= 1, got $alpha")
    val wOrd = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val wAll = Window.partitionBy(seriesCols.map(col): _*)
    val blocks = df
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll).cast("long"))
      .filter(col("n") >= 2L * m)                      // >= 2 full blocks
      .filter(col("rn") > col("n") % m)                // drop oldest partial
      .withColumn("b", expr(s"(rn - n % $m - 1) div $m") + 1L)
      .groupBy((seriesCols.map(col) :+ col("b")): _*)
      .agg(max(col("n")).as("n"),
           (sum(floor(col(valueCol) * 100 + 0.5).cast("long")) / 100.0)
             .as("z"))
    val wgt = when(col("b") === 1, pow(lit(1 - alpha), col("nb") - 1))
      .otherwise(lit(alpha) * pow(lit(1 - alpha), col("nb") - col("b")))
    blocks
      .withColumn("nb", count(lit(1)).over(wAll).cast("long"))
      .withColumn("t9", floor(col("z") * wgt * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(seriesCols.map(col): _*)
      .agg(max(col("n")).as("n_periods"), max(col("nb")).as("n_blocks"),
           sum(col("t9")).as("s9"))
      .withColumn("yhat_block", col("s9") / 1e9)
      .withColumn("yhat_period", col("yhat_block") / m)
      .drop("s9")
  }

  /** IMAPA (Petropoulos & Kourentzes 2015, "Forecast combinations for
    * intermittent demand") — run [[adidaForecast]] at MULTIPLE temporal
    * aggregation levels and average the period-level forecasts: each
    * level sees a different bias/variance trade (fine levels track
    * recency, coarse levels cancel intermittency), and the equal-weight
    * combination is the paper's recommendation. Level m = 1 is plain SES
    * on the raw series, so IMAPA nests both endpoints.
    *
    * Only series long enough for EVERY level (n ≥ 2·max(levels)) are
    * emitted — a consistent panel, so the combination always averages
    * the same number of terms. Output per series: (n_periods, n_levels,
    * yhat_imapa).
    *
    * Scale shape: one scan per level over the same input (each the
    * adida shape — window + two reduces), then a final series-keyed
    * reduce over |levels| rows/series. Determinism: each level's
    * yhat_period lands on the 1e-6 grid as an exact BIGINT before the
    * equal-weight average (sum of ≤ a few 1e-6-grid longs is exact in
    * double), so the combined value is bit-identical cross-engine. */
  def imapaForecast(df: DataFrame, valueCol: String, tsCol: String,
                    seriesCols: Seq[String], levels: Seq[Int],
                    alpha: Double = 0.5,
                    tieBreak: Seq[String] = Nil): DataFrame = {
    require(levels.nonEmpty && levels.forall(_ >= 1), s"need levels >= 1, got $levels")
    val mMax = levels.max
    val perLevel = levels.map { m =>
      adidaForecast(df, valueCol, tsCol, seriesCols, m, alpha, tieBreak)
        .filter(col("n_periods") >= 2L * mMax)
        .withColumn("p6",
          floor(col("yhat_period") * lit(1e6) + lit(0.5)).cast("long"))
        .select((seriesCols.map(col) :+ col("n_periods") :+ col("p6")): _*)
    }.reduce(_ unionByName _)
    perLevel
      .groupBy(seriesCols.map(col): _*)
      .agg(max(col("n_periods")).as("n_periods"),
           count(lit(1)).cast("long").as("n_levels"),
           sum(col("p6")).as("ps"))
      .withColumn("yhat_imapa",
        floor(col("ps").cast("double") / col("n_levels") + lit(0.5)) / lit(1e6))
      .drop("ps")
  }
}
