package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-scale series diagnostics: robust anomaly flags and
  * changepoint location for EVERY series in one pass — the pre-fit data
  * audit a forecasting pipeline runs before pointing estimators at a
  * series (outliers in, garbage fit out; an undetected level shift
  * invalidates a global trend).  Both operators follow the repo's
  * determinism discipline so they are exactly oracle-checkable. */
object SeriesDiagnostics {

  /** Rolling-median/MAD anomaly flags (the Hampel filter): per row, the
    * median and MAD of the ±`halfWin` window around it; a point is
    * anomalous when |y − med| > `nSigmas`·MAD. Robust where rolling
    * mean/σ is not — one wild point inflates σ and masks itself, but
    * barely moves the median.
    *
    * Determinism: median is pinned to the LOWER sorted middle
    * (sorted[(n+1) div 2], 1-based) — no interpolation, so both engines
    * pick the same element. Shape: ONE window shuffle on the series key
    * (`collect_list` over a bounded ±halfWin frame, state O(window)),
    * then map-side array sorts of 2·halfWin+1 elements. */
  def rollingMadAnomaly(df: DataFrame, valueCol: String, tsCol: String,
                        seriesCols: Seq[String], halfWin: Int = 5,
                        nSigmas: Double = 3.5,
                        tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
      .rowsBetween(-halfWin, halfWin)
    val mid = "CAST((size(arr) + 1) div 2 AS INT)"
    df.withColumn("y", col(valueCol).cast("double"))
      .withColumn("arr", collect_list(col("y")).over(w))
      .withColumn("med", expr(s"element_at(array_sort(arr), $mid)"))
      .withColumn("mad", expr(
        s"element_at(array_sort(transform(arr, x -> abs(x - med))), $mid)"))
      .withColumn("is_anomaly",
        col("mad") > 0 && abs(col("y") - col("med")) > lit(nSigmas) * col("mad"))
      .drop("arr")
  }

  /** CUSUM changepoint locator: for each series, the position t*
    * maximizing |S_t| where S_t = Σ_{i≤t}(y_i − ȳ) — the classic
    * mean-shift statistic (Page 1954); a genuine level shift at t puts
    * the |CUSUM| peak there. Returns (series…, n, cp_t, cusum6,
    * direction) with cusum6 = n·Σ10⁶-quantized running sum at the peak.
    *
    * Determinism by construction: y is quantized to the 1e-6 grid and
    * everything after is INTEGER — the statistic is computed as
    * S'_t = n·(Σ_{i≤t} y6_i) − t·(Σ y6_i), an exact BIGINT identity
    * equal to n·10⁶·S_t, so there is no float accumulation anywhere and
    * any engine lands on identical values (running double sums would
    * differ: engines associate window sums differently). Ties break to
    * the smallest t. Shape: one window shuffle (running sum + totals on
    * the same key), one aggregate on the same key — single exchange. */
  def cusumChangepoint(df: DataFrame, valueCol: String, tsCol: String,
                       seriesCols: Seq[String],
                       tieBreak: Seq[String] = Nil): DataFrame = {
    val wOrd = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val wAll = Window.partitionBy(seriesCols.map(col): _*)
    df.withColumn("y6", floor(col(valueCol).cast("double") * 1e6 + 0.5).cast("long"))
      .withColumn("t", row_number().over(wOrd).cast("long"))
      .withColumn("run6", sum(col("y6")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("tot6", sum(col("y6")).over(wAll))
      .withColumn("s6", col("n") * col("run6") - col("t") * col("tot6"))
      .groupBy(seriesCols.map(col): _*)
      .agg(max(col("n")).as("n"),
        min_by(col("t"), struct((-abs(col("s6"))).as("a"), col("t").as("b"))).as("cp_t"),
        max(abs(col("s6"))).as("cusum6"),
        min_by(signum(col("s6")).cast("long"),
          struct((-abs(col("s6"))).as("a"), col("t").as("b"))).as("direction"))
  }

  /** Seasonal-strength feature (Wang–Hyndman–Smith / `tsfeatures`
    * seasonal_strength, ANOVA form): detrend each series with its OLS
    * line, then measure how much of the detrended variance the seasonal
    * phase means (t mod m) explain:
    *   strength = max(0, 1 − SS_within / SS_total)
    * over the detrended values — 1 ⇒ purely seasonal, 0 ⇒ the period
    * carries no signal. The pre-fit gate for the SARIMA/seasonal-naive
    * family: a warehouse of series is triaged to "seasonal at period m
    * or not" in two passes, no model fit.
    *
    * Shape: window (row index) + agg (OLS sums) on the series key, fit
    * joined back ON THE SAME KEY (no second data shuffle pattern: the
    * fit table is |series| rows), residuals map-side, then one
    * (series, phase) agg reduced to a per-series ANOVA. */
  def seasonalStrength(df: DataFrame, valueCol: String, tsCol: String,
                       seriesCols: Seq[String], m: Int,
                       tieBreak: Seq[String] = Nil): DataFrame = {
    require(m >= 2, s"need period m >= 2, got $m")
    val wOrd = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val indexed = df
      .withColumn("t", (row_number().over(wOrd) - 1).cast("double"))
      .withColumn("y", col(valueCol).cast("double"))
    val fit = indexed.groupBy(seriesCols.map(col): _*)
      .agg(count(lit(1)).cast("double").as("nn"),
           sum(col("t")).as("st"), sum(col("t") * col("t")).as("stt"),
           sum(col("y")).as("sy"), sum(col("t") * col("y")).as("sty"))
      .withColumn("slope", when(col("nn") > 1,
          (col("nn") * col("sty") - col("st") * col("sy")) /
          (col("nn") * col("stt") - col("st") * col("st"))).otherwise(lit(0.0)))
      .withColumn("icept", (col("sy") - col("slope") * col("st")) / col("nn"))
      .select(seriesCols.map(col) :+ col("slope") :+ col("icept"): _*)
    val phase = indexed.join(fit, seriesCols)
      .withColumn("d", col("y") - (col("icept") + col("slope") * col("t")))
      .withColumn("phase", pmod(col("t").cast("long"), lit(m)))
      .groupBy((seriesCols :+ "phase").map(col): _*)
      .agg(count(lit(1)).cast("double").as("np"),
           sum(col("d")).as("sd"), sum(col("d") * col("d")).as("sdd"))
    phase.groupBy(seriesCols.map(col): _*)
      .agg(sum(col("np")).as("n"),
           sum(col("sdd")).as("sstot_raw"), sum(col("sd")).as("sdall"),
           sum(col("sdd") - col("sd") * col("sd") / col("np")).as("ssw"))
      .withColumn("sstot",
        col("sstot_raw") - col("sdall") * col("sdall") / col("n"))
      // > 1e-9, not > 0: an exactly-constant series leaves ~1e-22 of
      // float dust in sstot (4.2 is not a dyadic rational), and a ratio
      // of dust is noise, not seasonality. A genuine series with total
      // detrended SS below 1e-9 is constant for every practical purpose.
      .withColumn("strength", when(col("sstot") > 1e-9,
          greatest(lit(0.0), lit(1.0) - col("ssw") / col("sstot")))
        .otherwise(lit(0.0)))
      .select(seriesCols.map(col) :+ col("n").cast("long").as("n") :+ col("strength"): _*)
  }

  /** Classical additive decomposition, per row for EVERY series (the
    * distributed `seasonal_decompose`): trend = the series' OLS line
    * (the global-trend variant — robust at any series length, no
    * moving-average edge loss), seasonal = per-phase mean of the
    * detrended values (t mod m), remainder = y − trend − seasonal.
    * The row-level companion to [[seasonalStrength]] (which reduces the
    * same decomposition to one ANOVA number).
    *
    * Shape: window (row index) + agg (OLS sums) + same-key join back,
    * then one (series, phase) agg whose |series|·m-row output joins
    * back broadcast-ish on the series key — the data shuffles on the
    * series key only. */
  def decompose(df: DataFrame, valueCol: String, tsCol: String,
                seriesCols: Seq[String], m: Int,
                tieBreak: Seq[String] = Nil): DataFrame = {
    require(m >= 2, s"need period m >= 2, got $m")
    val wOrd = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val indexed = df
      .withColumn("t", (row_number().over(wOrd) - 1).cast("double"))
      .withColumn("y", col(valueCol).cast("double"))
    val fit = indexed.groupBy(seriesCols.map(col): _*)
      .agg(count(lit(1)).cast("double").as("nn"),
           sum(col("t")).as("st"), sum(col("t") * col("t")).as("stt"),
           sum(col("y")).as("sy"), sum(col("t") * col("y")).as("sty"))
      .withColumn("slope", when(col("nn") > 1,
          (col("nn") * col("sty") - col("st") * col("sy")) /
          (col("nn") * col("stt") - col("st") * col("st"))).otherwise(lit(0.0)))
      .withColumn("icept", (col("sy") - col("slope") * col("st")) / col("nn"))
      .select(seriesCols.map(col) :+ col("slope") :+ col("icept"): _*)
    val detrended = indexed.join(fit, seriesCols)
      .withColumn("trend", col("icept") + col("slope") * col("t"))
      .withColumn("d", col("y") - col("trend"))
      .withColumn("phase", pmod(col("t").cast("long"), lit(m)))
    // phase means fold to a per-series MAP so the join back is keyed on
    // the SERIES alone — same partitioning as the window pass, exchange
    // reused. Joining on (series, phase) instead re-shuffles the whole
    // data on a new key: measured 3.9× at 10× data vs ≤2× in this form.
    val seasonal = detrended
      .groupBy((seriesCols :+ "phase").map(col): _*)
      .agg((sum(col("d")) / count(lit(1))).as("smean"))
      .groupBy(seriesCols.map(col): _*)
      .agg(map_from_entries(collect_list(struct(col("phase"), col("smean"))))
        .as("smap"))
    detrended.join(seasonal, seriesCols)
      .withColumn("seasonal", element_at(col("smap"), col("phase")))
      .withColumn("remainder", col("d") - col("seasonal"))
      .select(seriesCols.map(col) ++ Seq(col("t").cast("long").as("t"), col("y"),
        col("trend"), col("seasonal"), col("remainder")): _*)
  }

  /** Per-series ACF at lags 1..maxLag — the distributed form of the
    * single-series `StatTests.acf` (`m10_acf` pins that one to
    * statsmodels' convention; this computes the SAME statistic for
    * every series in the warehouse, the input to seasonality triage and
    * SARIMA order screening at scale). Convention: deviations from the
    * FULL-series mean, denominator Σ(y−ȳ)² over all n (statsmodels
    * `acf`), numerator expanded to raw sums so everything reduces in
    * one aggregate:
    *   r_k = (Σy_t·y_{t−k} − ȳ(A_k + B_k) + c_k·ȳ²) / (Σy² − S²/n).
    *
    * Scale shape — the f12 trick again: maxLag is a plan-time constant,
    * so the k lag columns ride ONE series-keyed window (same exchange)
    * and the per-k sums are conditional agg columns — a single
    * exchange, output one row per series, wide (r1..rL). Constant
    * series (zero denominator) and lags with no pairs give null. */
  def acfPerSeries(df: DataFrame, valueCol: String, tsCol: String,
                   seriesCols: Seq[String], maxLag: Int,
                   tieBreak: Seq[String] = Nil): DataFrame = {
    require(maxLag >= 1, s"need maxLag >= 1, got $maxLag")
    val wOrd = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val lagged = (1 to maxLag).foldLeft(
      df.withColumn("y", col(valueCol).cast("double"))) { (d, k) =>
        d.withColumn(s"yl$k", lag(col("y"), k).over(wOrd))
    }
    val aggs = Seq(
      count(lit(1)).cast("double").as("nn"),
      sum(col("y")).as("s"), sum(col("y") * col("y")).as("ss")) ++
      (1 to maxLag).flatMap { k =>
        val l = col(s"yl$k")
        Seq(sum(col("y") * l).as(s"p$k"),
            sum(when(l.isNotNull, col("y"))).as(s"a$k"),
            sum(l).as(s"b$k"),
            count(l).cast("double").as(s"c$k"))
      }
    val fit = lagged.groupBy(seriesCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .withColumn("ybar", col("s") / col("nn"))
      .withColumn("denom", col("ss") - col("s") * col("s") / col("nn"))
    val rCols = (1 to maxLag).map { k =>
      when(col(s"c$k") > 0 && col("denom") > 1e-12,
        (col(s"p$k") - col("ybar") * (col(s"a$k") + col(s"b$k")) +
         col(s"c$k") * col("ybar") * col("ybar")) / col("denom"))
        .as(s"r$k")
    }
    fit.select(seriesCols.map(col) ++
      Seq(col("nn").cast("long").as("n")) ++ rCols: _*)
  }

  /** Trend-strength feature (Wang–Hyndman–Smith / `tsfeatures`
    * trend-strength): F_trend = max(0, 1 − Var(R)/Var(T+R)) over the
    * [[decompose]] components — the companion of [[seasonalStrength]]
    * that completes the per-series triage pair ("is this series worth a
    * trend model at all" before pointing the estimator zoo at a million
    * series). T+R = y − S, so the statistic needs no extra pass over
    * the trend column; the variances reduce to raw sums and the n²
    * denominators cancel in the ratio: 1 − (nΣr²−(Σr)²)/(nΣa²−(Σa)²).
    * Residuals are near-zero-mean by construction, which keeps the
    * classic sum-of-squares cancellation benign at the 6-decimal output
    * grid. Shape: the decompose plan + ONE same-key aggregate — no new
    * exchange. Output: (series…, n, strength). */
  def trendStrength(df: DataFrame, valueCol: String, tsCol: String,
                    seriesCols: Seq[String], m: Int,
                    tieBreak: Seq[String] = Nil): DataFrame =
    decompose(df, valueCol, tsCol, seriesCols, m, tieBreak)
      .withColumn("ta", col("y") - col("seasonal"))
      .groupBy(seriesCols.map(col): _*)
      .agg(count(lit(1)).cast("double").as("nn"),
           sum(col("remainder")).as("sr"),
           sum(col("remainder") * col("remainder")).as("srr"),
           sum(col("ta")).as("sa"), sum(col("ta") * col("ta")).as("saa"))
      .select(seriesCols.map(col) ++ Seq(col("nn").cast("long").as("n"),
        when(col("nn") * col("saa") - col("sa") * col("sa") > 1e-9,
          greatest(lit(0.0), lit(1.0) -
            (col("nn") * col("srr") - col("sr") * col("sr")) /
            (col("nn") * col("saa") - col("sa") * col("sa"))))
          .otherwise(lit(0.0)).as("strength")): _*)

  /** Syntetos–Boylan demand categorization (SBC, 2005): routes every
    * series in the warehouse to its forecaster family by two numbers —
    *   ADI = n / n_demands        (average inter-demand interval)
    *   CV² = Var(z) / Mean(z)²    (population variance of the NONZERO
    *                               demand sizes z)
    * cut at the standard (1.32, 0.49) thresholds:
    *   smooth       (ADI < 1.32, CV² < 0.49) → SES-class models
    *   intermittent (ADI ≥ 1.32, CV² < 0.49) → Croston
    *   erratic      (ADI < 1.32, CV² ≥ 0.49) → SES-class, wide bands
    *   lumpy        (ADI ≥ 1.32, CV² ≥ 0.49) → Croston/SBA
    * The triage gate in front of [[PerSeriesForecast.crostonForecast]],
    * the way [[seasonalStrength]] gates the seasonal family.
    *
    * One window (series length) + one aggregate on the same key.
    * All-zero series emit nothing (no demand ⇒ nothing to classify —
    * same sparse contract as Croston). */
  def sbcClassify(df: DataFrame, valueCol: String, tsCol: String,
                  seriesCols: Seq[String]): DataFrame = {
    val wAll = Window.partitionBy(seriesCols.map(col): _*)
    val agg = df
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("y", col(valueCol).cast("double"))
      .filter(col("y") =!= 0.0)
      .groupBy(seriesCols.map(col): _*)
      .agg(max(col("n")).as("n"),
           count(lit(1)).as("n_demands"),
           sum(col("y")).as("sz"), sum(col("y") * col("y")).as("szz"))
      .withColumn("adi", col("n").cast("double") / col("n_demands"))
      .withColumn("mu", col("sz") / col("n_demands"))
      .withColumn("cv2",
        (col("szz") / col("n_demands") - col("mu") * col("mu")) /
          (col("mu") * col("mu")))
    agg
      .withColumn("class",
        when(col("adi") < 1.32 && col("cv2") < 0.49, "smooth")
          .when(col("adi") >= 1.32 && col("cv2") < 0.49, "intermittent")
          .when(col("adi") < 1.32, "erratic")
          .otherwise("lumpy"))
      .withColumn("recommended",
        when(col("adi") >= 1.32, "croston").otherwise("ses"))
      .select(seriesCols.map(col) ++ Seq(col("n"), col("n_demands"),
        col("adi"), col("cv2"), col("class"), col("recommended")): _*)
  }

  /** Lead–lag cross-correlation between two aligned series (the CCF):
    * Pearson r of (x_t, y_{t+lag}) for lag = 0..maxLag, computed on
    * hour-bucket aggregates of two event populations. Positive peaks at
    * lag k read "x leads y by k buckets" — the audit that justifies (or
    * kills) an exogenous regressor before T3 lag-alignment feeds it to
    * ARIMAX/VAR.
    *
    * Shape: each side reduces to its bucket table first (two small
    * shuffles on data VOLUME reduced to |buckets| rows), the lag table
    * broadcasts, the bucket join is |buckets|·|lags| — never a row-level
    * pairing. All sums are the f4-discipline closed-form corr. */
  def crossCorrelation(a: DataFrame, b: DataFrame, valueCol: String,
                       tsCol: String, maxLag: Int,
                       bucketSeconds: Long = 3600L): DataFrame = {
    require(maxLag >= 0, s"need maxLag >= 0, got $maxLag")
    def buckets(df: DataFrame, out: String): DataFrame =
      df.withColumn("b",
          floor(col(tsCol).cast("double") / lit(bucketSeconds.toDouble)).cast("long"))
        .groupBy(col("b")).agg(avg(col(valueCol).cast("double")).as(out))
    val lags = a.sparkSession.range(0, maxLag + 1)
      .select(col("id").cast("int").as("lag"))
    buckets(a, "x").crossJoin(broadcast(lags))
      .join(buckets(b, "y").withColumnRenamed("b", "b2"),
            col("b2") === col("b") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).cast("double").as("nn"),
           sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
           sum(col("y")).as("sy"), sum(col("y") * col("y")).as("syy"),
           sum(col("x") * col("y")).as("sxy"))
      .withColumn("den",
        sqrt((col("nn") * col("sxx") - col("sx") * col("sx")) *
             (col("nn") * col("syy") - col("sy") * col("sy"))))
      .withColumn("r", when(col("den") > 0,
        (col("nn") * col("sxy") - col("sx") * col("sy")) / col("den"))
        .otherwise(lit(null).cast("double")))
      .select(col("lag"), col("nn").cast("long").as("n"), col("r"))
  }

  /** Discrete-Fourier periodogram power at candidate integer periods,
    * per series — the frequency-domain seasonal detector (Schuster 1898;
    * the spectral companion to the ACF-based FreqInfer/t9 period pick).
    * For each period p in `periods`, over the position-indexed demeaned
    * series y′: P(p) = (Σ y′_t·cos(2πt/p))² + (Σ y′_t·sin(2πt/p))².
    * A genuine period-p cycle puts its energy at that frequency; white
    * noise spreads it flat.
    *
    * Determinism: the cos/sin tables are evaluated ONCE driver-side on
    * the 1e-6 grid and folded into the plan as literals (an oracle can
    * inject the identical literals), so no libm trig runs inside either
    * engine; products are 1e-9-grid BIGINT folds. Scale shape: one
    * series-keyed window for (rn, n, mean), a |periods|-way explode of
    * 8-byte terms (never the payload), one (series, p) aggregate with
    * map-side partials.
    *
    * Emits (series, p, power) for every candidate; the argmax is a
    * trivial downstream window. Series shorter than `minLen` drop. */
  def periodogram(df: DataFrame, valueCol: String, tsCol: String,
                  seriesCols: Seq[String], periods: Seq[Int],
                  minLen: Int = 20, tieBreak: Seq[String] = Nil): DataFrame = {
    require(periods.nonEmpty && periods.forall(_ >= 2), "periods must be >= 2")
    val wOrd = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val wAll = Window.partitionBy(seriesCols.map(col): _*)
    // driver-side 1e-6-grid trig tables, shared verbatim with oracles
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    val cosT = periods.map(p => (0 until p).map(j =>
      r6(math.cos(2 * math.Pi * j / p))))
    val sinT = periods.map(p => (0 until p).map(j =>
      r6(math.sin(2 * math.Pi * j / p))))
    val cosLit = array(cosT.map(row => array(row.map(lit): _*)): _*)
    val sinLit = array(sinT.map(row => array(row.map(lit): _*)): _*)
    val pLit = array(periods.map(lit): _*)
    df.withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll).cast("long"))
      .withColumn("sc",
        sum(floor(col(valueCol) * 100 + 0.5).cast("long")).over(wAll))
      .filter(col("n") >= minLen)
      .withColumn("yd", floor(col(valueCol) * 100 + 0.5) / 100.0
        - col("sc").cast("double") / col("n") / 100.0)
      .withColumn("pi", explode(sequence(lit(1), lit(periods.size))))
      .withColumn("p", element_at(pLit, col("pi")))
      .withColumn("j", ((col("rn") - 1) % col("p")).cast("int") + 1)
      .withColumn("c", element_at(element_at(cosLit, col("pi")), col("j")))
      .withColumn("s", element_at(element_at(sinLit, col("pi")), col("j")))
      .withColumn("zc9", floor(col("yd") * col("c") * lit(1e9) + lit(0.5)).cast("long"))
      .withColumn("zs9", floor(col("yd") * col("s") * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy((seriesCols.map(col) :+ col("p")): _*)
      .agg(sum(col("zc9")).as("zc9"), sum(col("zs9")).as("zs9"))
      .withColumn("power",
        (col("zc9") / 1e9) * (col("zc9") / 1e9)
          + (col("zs9") / 1e9) * (col("zs9") / 1e9))
      .select((seriesCols.map(col) :+ col("p").cast("long").as("p")
        :+ col("power")): _*)
  }

  /** Rescaled-range (R/S) statistics per series at dyadic window sizes,
    * plus the Hurst exponent as the log₂-log₂ slope (Hurst 1951;
    * Mandelbrot & Wallis 1969). For each window size w: chop the
    * position-indexed series into ⌊n/w⌋ complete blocks; per block,
    * R = range of the cumulative mean-deviation sums and S = population
    * σ; the scale's statistic is the mean of R/S over its blocks, and
    * H is the OLS slope of dround₆(ln(R/S)) on ln(w) (grid-rounded logs
    * on BOTH engines — the x22_zipf regression contract). H ≈ 0.5 is a
    * random walk; H > 0.5 long-range persistence — the memory diagnostic
    * that tells a pipeline whether drift models have anything to fit.
    *
    * Determinism: R is computed from INTEGER cumulative cents
    * (cumdev_k = (w·C_k − k·S_b)/(100·w) — exact ints inside), S from
    * exact integer moments under one correctly-rounded sqrt, per-block
    * R/S folded on the 1e-9 grid. Scale shape: one series-keyed window
    * pass, a |windows|-way explode of 16-byte terms, (series, w, block)
    * then (series, w) aggregates, then a tiny per-series pivot. */
  def rsHurst(df: DataFrame, valueCol: String, tsCol: String,
              seriesCols: Seq[String], windows: Seq[Int],
              tieBreak: Seq[String] = Nil): DataFrame = {
    require(windows.size >= 2 && windows.forall(_ >= 4), "need >= 2 window sizes, each >= 4")
    val wOrd = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val wAll = Window.partitionBy(seriesCols.map(col): _*)
    val minN = windows.max
    val wLit = array(windows.map(lit): _*)
    val kSeq = seriesCols.map(col)
    val blocks = df
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll).cast("long"))
      .filter(col("n") >= minN)
      .withColumn("cents", floor(col(valueCol) * 100 + 0.5).cast("long"))
      .withColumn("wi", explode(sequence(lit(1), lit(windows.size))))
      .withColumn("w", element_at(wLit, col("wi")).cast("long"))
      .filter(col("rn") <= expr("(n div w) * w"))
      .withColumn("b", expr("(rn - 1) div w"))
      .withColumn("k", ((col("rn") - 1) % col("w")) + 1L)
    val wBlk = Window.partitionBy((kSeq :+ col("w") :+ col("b")): _*)
    val wBlkOrd = wBlk.orderBy(col("k"))
    val perBlock = blocks
      .withColumn("cum", sum(col("cents")).over(
        wBlkOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum(col("cents")).over(wBlk))
      .withColumn("sq", sum(col("cents") * col("cents")).over(wBlk))
      // cumdev on the exact integer lattice: (w·C_k − k·S_b) / (100·w)
      .withColumn("dev", (col("w") * col("cum") - col("k") * col("tot"))
        .cast("double") / (lit(100.0) * col("w")))
      .groupBy((kSeq :+ col("w") :+ col("b")): _*)
      .agg(max(col("dev")).as("dmax"), min(col("dev")).as("dmin"),
           max(col("tot")).as("tot"), max(col("sq")).as("sq"))
      .withColumn("rng",
        greatest(col("dmax"), lit(0.0)) - least(col("dmin"), lit(0.0)))
      .withColumn("sd",
        sqrt((col("w") * col("sq") - col("tot") * col("tot")).cast("double"))
          / (lit(100.0) * col("w")))
      .filter(col("sd") > 0)
      .withColumn("rs9",
        floor(col("rng") / col("sd") * lit(1e9) + lit(0.5)).cast("long"))
    val perScale = perBlock
      .groupBy((kSeq :+ col("w")): _*)
      .agg(count(lit(1)).cast("long").as("nb"), sum(col("rs9")).as("rs9"))
      .withColumn("rs", col("rs9") / 1e9 / col("nb"))
      // grid-rounded logs — identical rounding in the oracle
      .withColumn("lx", floor(log(col("w").cast("double")) * 1e6 + 0.5) / 1e6)
      .withColumn("ly", floor(log(col("rs")) * 1e6 + 0.5) / 1e6)
    perScale
      .groupBy(kSeq: _*)
      .agg(count(lit(1)).cast("double").as("ns"),
           sum(floor(col("lx") * lit(1e9) + lit(0.5)).cast("long")).as("sx9"),
           sum(floor(col("ly") * lit(1e9) + lit(0.5)).cast("long")).as("sy9"),
           sum(floor(col("lx") * col("lx") * lit(1e9) + lit(0.5)).cast("long")).as("sxx9"),
           sum(floor(col("lx") * col("ly") * lit(1e9) + lit(0.5)).cast("long")).as("sxy9"),
           min(col("nb")).as("min_blocks"))
      .filter(col("ns") === windows.size)
      .withColumn("hurst",
        (col("ns") * (col("sxy9") / 1e9) - (col("sx9") / 1e9) * (col("sy9") / 1e9)) /
        (col("ns") * (col("sxx9") / 1e9) - (col("sx9") / 1e9) * (col("sx9") / 1e9)))
      .select((kSeq :+ col("min_blocks") :+ col("hurst")): _*)
  }

  /** Guerrero Box-Cox λ selection per series (Guerrero 1993, "Time-series
    * analysis supported by power transformations"): split the series into
    * complete blocks of `m`, per block compute (mean, σ), and for each
    * candidate λ the ratio r_b = σ_b / mean_b^(1−λ); the chosen λ
    * minimizes the coefficient of variation of r across blocks — a
    * variance-stabilizing transform picked WITHOUT likelihood iteration.
    * Candidates are fixed at {0, 1/2, 1} (log / sqrt / identity), which
    * keeps every mean^(1−λ) an exact IEEE op (1, sqrt, identity).
    *
    * Emits (series, n_blocks, cv0, cv05, cv1, lambda) with ties going to
    * the smaller λ (stronger stabilization). Determinism: block moments
    * from exact integer cents (the rsHurst lattice), ratios folded on
    * the 1e-9 grid, one sqrt per leg. Shape: one series-keyed window,
    * (series, block) then (series) aggregates. */
  def guerreroBoxCox(df: DataFrame, valueCol: String, tsCol: String,
                     seriesCols: Seq[String], m: Int = 8,
                     tieBreak: Seq[String] = Nil): DataFrame = {
    require(m >= 4, s"need block size >= 4, got $m")
    val wOrd = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val wAll = Window.partitionBy(seriesCols.map(col): _*)
    val kSeq = seriesCols.map(col)
    val perBlock = df
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll).cast("long"))
      .filter(col("n") >= 2L * m)
      .filter(col("rn") <= expr(s"(n div $m) * $m"))
      .withColumn("cents", floor(col(valueCol) * 100 + 0.5).cast("long"))
      .withColumn("b", expr(s"(rn - 1) div $m"))
      .groupBy((kSeq :+ col("b")): _*)
      .agg(sum(col("cents")).as("s"), sum(col("cents") * col("cents")).as("sq"))
      .withColumn("mean", col("s").cast("double") / (lit(100.0) * m))
      .withColumn("sd",
        sqrt((lit(m) * col("sq") - col("s") * col("s")).cast("double"))
          / (lit(100.0) * m))
      .filter(col("mean") > 0 && col("sd") > 0)
    def g9(c: Column) = floor(c * lit(1e9) + lit(0.5)).cast("long")
    val r0 = col("sd") / col("mean")          // λ=0: σ/μ
    val r05 = col("sd") / sqrt(col("mean"))   // λ=1/2: σ/√μ
    val r1 = col("sd")                        // λ=1: σ
    val agg = perBlock.groupBy(kSeq: _*).agg(
      count(lit(1)).cast("long").as("n_blocks"),
      sum(g9(r0)).as("s0"), sum(g9(r0 * r0)).as("q0"),
      sum(g9(r05)).as("s5"), sum(g9(r05 * r05)).as("q5"),
      sum(g9(r1)).as("s1"), sum(g9(r1 * r1)).as("q1"))
      .filter(col("n_blocks") >= 2)
    def cv(s: String, q: String) = {
      val nb = col("n_blocks").cast("double")
      val mean = (col(s) / 1e9) / nb
      val varr = ((col(q) / 1e9) - (col(s) / 1e9) * (col(s) / 1e9) / nb) /
        (nb - 1.0)
      sqrt(varr) / mean
    }
    agg
      .withColumn("cv0", cv("s0", "q0"))
      .withColumn("cv05", cv("s5", "q5"))
      .withColumn("cv1", cv("s1", "q1"))
      .withColumn("lambda",
        when(col("cv0") <= col("cv05") && col("cv0") <= col("cv1"), lit(0.0))
          .when(col("cv05") <= col("cv1"), lit(0.5))
          .otherwise(lit(1.0)))
      .select((kSeq :+ col("n_blocks") :+ col("cv0") :+ col("cv05")
        :+ col("cv1") :+ col("lambda")): _*)
  }

  /** Smoothed tracking signal per series (Trigg 1964; Trigg & Leach
    * 1967): over one-step naive forecast errors e_t = y_t − y_{t-1},
    * the exponentially smoothed error E and smoothed absolute error M
    * (both SES with dyadic α — closed weights), TS = E/M at the series
    * end, alarmed at |TS| > `limit`. The forecast-monitoring gate an
    * operations pipeline runs continuously: a drifting series saturates
    * TS toward ±1 long before accuracy metrics move.
    *
    * Emits (series, n_err, e_smooth, mad_smooth, ts, alarm 0/1).
    * Determinism: errors are exact cents; SES weights are exact powers
    * of two; both folds are 1e-9-grid BIGINT sums; one division. Shape:
    * one series-keyed window (lag), one aggregate. */
  def trackingSignal(df: DataFrame, valueCol: String, tsCol: String,
                     seriesCols: Seq[String], alpha: Double = 0.5,
                     limit: Double = 0.5,
                     tieBreak: Seq[String] = Nil): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"need 0 < alpha <= 1, got $alpha")
    val wOrd = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val kSeq = seriesCols.map(col)
    val errs = df
      .withColumn("y", floor(col(valueCol) * 100 + 0.5) / 100.0)
      .withColumn("ly", lag(col("y"), 1).over(wOrd))
      .filter(col("ly").isNotNull)
      .withColumn("e", col("y") - col("ly"))
      .withColumn("i", row_number().over(wOrd).cast("long"))
      .withColumn("ne", count(lit(1)).over(
        Window.partitionBy(seriesCols.map(col): _*)).cast("long"))
    val wgt = when(col("i") === 1, pow(lit(1 - alpha), col("ne") - 1))
      .otherwise(lit(alpha) * pow(lit(1 - alpha), col("ne") - col("i")))
    def g9(c: Column) = floor(c * lit(1e9) + lit(0.5)).cast("long")
    errs
      .groupBy(kSeq: _*)
      .agg(max(col("ne")).as("n_err"),
           sum(g9(col("e") * wgt)).as("e9"),
           sum(g9(abs(col("e")) * wgt)).as("m9"))
      .filter(col("m9") > 0)
      .withColumn("e_smooth", col("e9") / 1e9)
      .withColumn("mad_smooth", col("m9") / 1e9)
      .withColumn("ts", col("e_smooth") / col("mad_smooth"))
      .withColumn("alarm",
        when(abs(col("ts")) > limit, 1L).otherwise(0L))
      .select((kSeq :+ col("n_err") :+ col("e_smooth") :+ col("mad_smooth")
        :+ col("ts") :+ col("alarm")): _*)
  }

  /** Normalized spectral entropy per series (the tsfeatures `entropy`
    * readout, Goerg 2013's forecastability measure, over the
    * [[periodogram]]'s candidate-period powers): with p̂_k the share of
    * total power at candidate period k,
    *   H = −Σ p̂_k·ln p̂_k / ln K ∈ [0, 1]
    * — near 0 when one period dominates (strongly seasonal, very
    * forecastable), near 1 when power is flat (noise-like). Emits
    * (series, n_periods, peak_p, peak_share, entropy).
    *
    * Determinism: powers quantize to the 1e-9 grid (BIGINT) before the
    * total, so shares are ratios of exact integers; each −p̂·ln p̂ term
    * re-quantizes to the grid before the K-term fold; peak_p breaks
    * power ties toward the smaller period. Same scale shape as the
    * periodogram plus one series-keyed window over the K-row-per-series
    * power table. */
  def spectralEntropy(df: DataFrame, valueCol: String, tsCol: String,
                      seriesCols: Seq[String], periods: Seq[Int],
                      minLen: Int = 20,
                      tieBreak: Seq[String] = Nil): DataFrame = {
    val pow = periodogram(df, valueCol, tsCol, seriesCols, periods,
      minLen, tieBreak)
    val wAll = Window.partitionBy(seriesCols.map(col): _*)
    val wPeak = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(col("p9").desc, col("p"))
    pow
      .withColumn("p9", floor(col("power") * lit(1e9) + lit(0.5)).cast("long"))
      .withColumn("tot", sum(col("p9")).over(wAll))
      .filter(col("tot") > 0)
      .withColumn("sh", col("p9").cast("double") / col("tot"))
      .withColumn("t9",
        when(col("p9") > 0,
          floor(-col("sh") * log(col("sh")) * lit(1e9) + lit(0.5)).cast("long"))
        .otherwise(0L))
      .withColumn("rk", row_number().over(wPeak))
      .groupBy(seriesCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n_periods"),
           sum(col("t9")).as("s9"),
           max(when(col("rk") === 1, col("p"))).as("peak_p"),
           max(when(col("rk") === 1, col("sh"))).as("peak_share"))
      .withColumn("entropy",
        // ln(1) = 0: a series retaining a single candidate period has no
        // defined normalized entropy — emit null, never Infinity/NaN
        when(col("n_periods") > 1L,
          (col("s9") / 1e9) / log(col("n_periods").cast("double"))))
      .select((seriesCols.map(col) :+ col("n_periods") :+ col("peak_p")
        :+ col("peak_share") :+ col("entropy")): _*)
  }
}
