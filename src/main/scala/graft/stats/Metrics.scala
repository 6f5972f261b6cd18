package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Error-metric aggregations (SURVEY §2.5, `auto_ts/utils/metrics.py`).
  * All are single-pass declarative aggregates — partial (map-side) +
  * final, no collect. Each returns a Column usable inside any agg. */
object Metrics {

  /** A1 — RMSE (`utils/metrics.py:11-23`). */
  def rmse(y: Column, yhat: Column): Column =
    sqrt(avg(pow(y - yhat, 2)))

  /** A2 — RMSE normalized by the std of actuals (`utils/metrics.py:23,34`).
    * Uses sample std (pandas default ddof=1). */
  def normalizedRmse(y: Column, yhat: Column): Column =
    rmse(y, yhat) / stddev_samp(y)

  /** A3 — MAE (`utils/metrics.py:65-73`). */
  def mae(y: Column, yhat: Column): Column = avg(abs(y - yhat))

  /** A3 — MSE. */
  def mse(y: Column, yhat: Column): Column = avg(pow(y - yhat, 2))

  /** A3 — MAPE in percent; zero actuals contribute null, matching the
    * reference's NaN guard (`utils/metrics.py:100-112`). */
  def mape(y: Column, yhat: Column): Column =
    avg(when(y =!= 0, abs((y - yhat) / y) * 100))

  /** A4 — RMSE normalized by the actuals' range (`utils/metrics.py:109`). */
  def minMaxNormalizedRmse(y: Column, yhat: Column): Column =
    rmse(y, yhat) / (max(y) - min(y))

  /** A9 — weighted average (`np.average(..., weights)`, `utils/val.py:108`). */
  def weightedAvg(x: Column, w: Column): Column = sum(x * w) / sum(w)

  /** All standard metrics in one aggregate pass. */
  def allMetrics(df: DataFrame, yCol: String, yhatCol: String,
                 groupCols: Seq[String] = Nil): DataFrame = {
    val y = col(yCol); val yh = col(yhatCol)
    val aggs = Seq(
      rmse(y, yh).as("rmse"),
      normalizedRmse(y, yh).as("norm_rmse"),
      mae(y, yh).as("mae"),
      mse(y, yh).as("mse"),
      mape(y, yh).as("mape"),
      minMaxNormalizedRmse(y, yh).as("minmax_rmse"),
      count(lit(1)).as("n"))
    if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Exact binary AUC via the Mann–Whitney rank-sum with tie-averaged
    * ranks — the threshold-free companion of
    * [[graft.stats.DriftAudit.calibrationBins]] for auditing a learned
    * quality/domain score: AUC = P(score⁺ > score⁻) + ½P(tie).
    *
    * Integer-exact: scores collapse to the distinct-value table
    * (cnt, n_pos per score), the tie-averaged rank is carried DOUBLED
    * (rank2 = 2·cum − cnt + 1, an exact BIGINT) and
    * AUC = (Σ n_pos·rank2 − n⁺(n⁺+1)) / (2·n⁺·n⁻) is a ratio of exact
    * integers — no float rank arithmetic, any engine lands on the same
    * value. The running-rank window runs over the DISTINCT-SCORE table
    * (the `ksStatistic` bounded-cardinality contract — scores are
    * rounded/bucketed in practice; pre-round a continuous score).
    * Returns one row: (n_pos, n_neg, auc); degenerate single-class
    * input gives null. */
  def binaryAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val byScore = df
      .select(col(scoreCol).cast("double").as("x"),
              col(labelCol).cast("long").as("pos"))
      .groupBy(col("x"))
      .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("np"))
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("x"))))
      .withColumn("rank2", lit(2L) * col("cum") - col("cnt") + 1)
    byScore
      .agg(sum(col("np")).as("n_pos"),
           (sum(col("cnt")) - sum(col("np"))).as("n_neg"),
           sum(col("np") * col("rank2")).as("u2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("u2") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
          (lit(2L) * col("n_pos") * col("n_neg"))).as("auc"))
  }

  /** Cumulative gains curve over the distinct-score table — the
    * "keep everything above cutoff c" planning view that completes the
    * score-audit trio ([[DriftAudit.calibrationBins]]: is the score a
    * probability; [[binaryAuc]]: does it rank; this: what does a
    * THRESHOLD buy). One row per distinct score value, descending:
    * cum_n / cum_pos above-or-at the cutoff, recall, precision, and
    * lift = precision / base-rate. All counts are exact BIGINTs; the
    * ratios are fixed expressions over them. Distinct-score reduce +
    * bounded descending window (the ksStatistic cardinality contract).
    */
  def gainsCurve(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val byScore = df
      .select(col(scoreCol).cast("double").as("score"),
              col(labelCol).cast("long").as("pos"))
      .groupBy(col("score"))
      .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("np"))
    val wDesc = Window.orderBy(col("score").desc)
    byScore
      .withColumn("cum_n", sum(col("cnt")).over(wDesc))
      .withColumn("cum_pos", sum(col("np")).over(wDesc))
      .crossJoin(broadcast(byScore.agg(
        sum(col("cnt")).as("n_tot"), sum(col("np")).as("pos_tot"))))
      .select(col("score").as("cutoff"), col("cum_n"), col("cum_pos"),
        when(col("pos_tot") > 0,
          col("cum_pos").cast("double") / col("pos_tot")).as("recall"),
        (col("cum_pos").cast("double") / col("cum_n")).as("precision"),
        when(col("pos_tot") > 0,
          (col("cum_pos").cast("double") / col("cum_n")) /
          (col("pos_tot").cast("double") / col("n_tot"))).as("lift"))
  }

  /** Pinball (quantile) loss at level τ: the scoring rule for quantile
    * forecasts (Koenker & Bassett 1978) — τ·(y−q) when under-forecast,
    * (τ−1)·(y−q) when over. */
  def pinball(y: Column, q: Column, tau: Double): Column =
    avg(greatest(lit(tau) * (y - q), lit(tau - 1) * (y - q)))

  /** Scaled forecast errors per series — MASE (Hyndman & Koehler 2006)
    * plus pinball loss, on a last-`h` holdout: the naive forecast's
    * holdout MAE scaled by the TRAIN one-step naive MAE (MASE > 1 ⇒
    * worse than in-sample naive — the scale-free cross-series yardstick
    * the plain per-series RMSE table can't give you), and the pinball
    * loss of the train τ-quantile as a constant quantile forecast.
    *
    * The train quantile is pinned to the ⌈τ·n_train⌉-th SMALLEST train
    * value (quantile_disc semantics — an order statistic, no
    * interpolation), so both engines select the same element. Errors
    * quantize to the 1e-9 grid and sum as BIGINT; MASE is then a ratio
    * of exact integers. Series with a constant train side (zero scale
    * denominator) get a null MASE. Series shorter than h+2 are skipped.
    *
    * Shape: one row-index window + train-side lag on the SAME key +
    * same-key aggregates + same-key holdout join — a single exchange
    * end-to-end (the [[graft.scale.PerSeriesForecast.backtestBaselines]]
    * shape). The per-series `sort_array(collect_list)` for the order
    * statistic holds one series in one task — O(series length) state,
    * the same contract as every per-series fold in this repo. */
  def scaledBacktest(df: DataFrame, valueCol: String, tsCol: String,
                     seriesCols: Seq[String], h: Int, tau: Double = 0.9,
                     tieBreak: Seq[String] = Nil): DataFrame = {
    require(h >= 1, s"need h >= 1, got $h")
    require(tau > 0 && tau < 1, s"need 0 < tau < 1, got $tau")
    val wOrd = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val wAll = Window.partitionBy(seriesCols.map(col): _*)
    val indexed = df
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("y", col(valueCol).cast("double"))
      .withColumn("ntr", col("n") - h)
      .filter(col("ntr") >= 2)
    val train = indexed.filter(col("rn") <= col("ntr"))
      .withColumn("prev", lag(col("y"), 1).over(wOrd))
      .withColumn("d9", when(col("rn") > 1,
        floor(abs(col("y") - col("prev")) * 1e9 + 0.5).cast("long")))
    val fit = train
      .groupBy(seriesCols.map(col): _*)
      .agg(max(col("ntr")).as("ntr"),
           max_by(col("y"), col("rn")).as("last_y"),
           sum(col("d9")).as("sd9"),
           sort_array(collect_list(col("y"))).as("ys"))
      .withColumn("qidx",
        greatest(lit(1L), ceil(lit(tau) * col("ntr"))).cast("int"))
      .withColumn("q", element_at(col("ys"), col("qidx")))
      .drop("ys")
    indexed.filter(col("rn") > col("ntr")).drop("ntr")
      .join(fit, seriesCols)
      .withColumn("e9", floor(abs(col("y") - col("last_y")) * 1e9 + 0.5).cast("long"))
      .withColumn("pb9", floor(greatest(
          lit(tau) * (col("y") - col("q")),
          lit(tau - 1) * (col("y") - col("q"))) * 1e9 + 0.5).cast("long"))
      .groupBy(seriesCols.map(col): _*)
      .agg(max(col("ntr")).as("n_train"), max(col("sd9")).as("sd9"),
           sum(col("e9")).as("se9"), sum(col("pb9")).as("spb9"))
      .select(seriesCols.map(col) ++ Seq(col("n_train"),
        when(col("sd9") > 0,
          (col("se9").cast("double") / h) /
          (col("sd9").cast("double") / (col("n_train") - 1))).as("mase"),
        (col("spb9") / 1e9 / h).as("pinball")): _*)
  }
}
