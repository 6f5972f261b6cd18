package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quantile profiling (per-column percentiles drive the reference's EDA
  * and our corpus length/quality cut-offs).
  *
  * Exact `percentile` materializes every value per group — correct but
  * shuffle-heavy; it is the ORACLE path. At 100 TB use [[approx]]
  * (t-digest `approx_percentile`): mergeable sketches, map-side partials,
  * bounded memory — the error bound is spec-tested against exact. */
object Quantiles {

  /** Bound-column label for probability p. Whole percents keep the
    * compact `q25` form; fractional percents keep their digits
    * (`q5_4` for p=0.054) so nearby probs never collide into one
    * column name (which would break the downstream select/join). */
  /** Public alias of [[qLabel]] for cross-package callers (e.g. the
    * quantile-binning encoder reading the exact() column names). */
  def qLabelPublic(p: Double): String = qLabel(p)

  private[stats] def qLabel(p: Double): String = {
    val pct = BigDecimal(p) * 100
    "q" + pct.underlying.stripTrailingZeros.toPlainString
      .replace(".", "_").replace("-", "m")
  }

  /** Exact linear-interpolation percentiles of `valueCol` per group. */
  def exact(df: DataFrame, valueCol: String, groupCols: Seq[String],
            probs: Seq[Double]): DataFrame = {
    val arr = probs.map(p => s"${p}D").mkString("array(", ", ", ")")
    val g = df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile($valueCol, $arr)").as("qs"),
           count(lit(1)).as("n"))
    probs.zipWithIndex.foldLeft(g) { case (d, (p, i)) =>
      d.withColumn(qLabel(p), element_at(col("qs"), i + 1))
    }.drop("qs")
  }

  /** Winsorize: clip `valueCol` to the [lo, hi] per-group percentiles —
    * the standard outlier guard before scaling/fitting. The quantile
    * table is |groups| rows → broadcast back onto the data, so the big
    * side is never shuffled (one aggregation pass + one map-side join).
    * At 100 TB swap [[exact]] for [[approx]] via `useApprox`. */
  def winsorize(df: DataFrame, valueCol: String, groupCols: Seq[String],
                lo: Double, hi: Double, useApprox: Boolean = false): DataFrame = {
    val q = if (useApprox) approx(df, valueCol, groupCols, Seq(lo, hi))
            else exact(df, valueCol, groupCols, Seq(lo, hi))
    val loCol = qLabel(lo)
    val hiCol = qLabel(hi)
    val bounds = q.select(groupCols.map(col) :+ col(loCol) :+ col(hiCol): _*)
    df.join(broadcast(bounds), groupCols)
      .withColumn(s"${valueCol}_winsor",
        least(greatest(col(valueCol).cast("double"), col(loCol)), col(hiCol)))
      .drop(loCol, hiCol)
  }

  /** IQR outlier flags: mark rows outside [q25 − k·IQR, q75 + k·IQR] of
    * their group (Tukey's fences, k = 1.5 classically). Same scale shape
    * as [[winsorize]]: one per-group quantile aggregation broadcast back
    * onto the data — the big side never shuffles. */
  def iqrOutliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
                  k: Double = 1.5, useApprox: Boolean = false): DataFrame = {
    val q = if (useApprox) approx(df, valueCol, groupCols, Seq(0.25, 0.75))
            else exact(df, valueCol, groupCols, Seq(0.25, 0.75))
    // internal names that cannot collide with caller columns, dropped
    // from the output (mirroring winsorize's contract: input columns +
    // exactly one new column)
    val bounds = q.select(groupCols.map(col) :+ col("q25") :+ col("q75"): _*)
      .withColumn("__iqr_lo", col("q25") - lit(k) * (col("q75") - col("q25")))
      .withColumn("__iqr_hi", col("q75") + lit(k) * (col("q75") - col("q25")))
      .drop("q25", "q75")
    df.join(broadcast(bounds), groupCols)
      .withColumn("is_outlier",
        col(valueCol).cast("double") < col("__iqr_lo") ||
        col(valueCol).cast("double") > col("__iqr_hi"))
      .drop("__iqr_lo", "__iqr_hi")
  }

  /** Exact weighted median per group — the lower weighted median
    * (smallest value v with cumulative weight(≤ v) ≥ half the total;
    * Edgeworth 1888's weighted-median problem): the location readout
    * when rows carry mass (token counts, dollars) rather than counting
    * equally. Emits (group, n, w_total, wmedian).
    *
    * Determinism: weights are exact integer sums; values pre-aggregate
    * to the distinct-value grain so ties never reorder; the pick is a
    * pure integer comparison (2·cumw ≥ W avoids division). Shape: one
    * (group, value) reduce, then the cumulative weight via the
    * bucket-offset decomposition (≤4097 value-range buckets per group —
    * no window ever sees a whole group, so a near-unique value column
    * with few groups cannot funnel the table through |groups| tasks),
    * one argmin reduce. `valueCol` must be numeric (bucket boundaries
    * are computed on its long floor; ordering stays on the true value). */
  def weightedMedian(df: DataFrame, valueCol: String, weightCol: String,
                     groupCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // valueCol must be numeric (ADVICE r15): a non-numeric column would
    // cast(long) to null, fall out of the bucket join, and silently drop
    // its weight from the cumulative while still counting in the total.
    require(df.schema(valueCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"weightedMedian needs a numeric valueCol, got " +
      s"${df.schema(valueCol).dataType.simpleString} for '$valueCol'")
    // The cumulative weight is computed by the Ranks.globalRank
    // bucket-offset decomposition, NOT one window partitioned only by the
    // group columns: with few groups and a near-unique value column
    // (prices in cents) that window funnels ~n/|groups| rows through one
    // task each — the single-partition failure shape at 100 TB. Here the
    // value span buckets into ≤4097 ranges per group (the per-(group,
    // bucket) cumulative window is bounded; the within-bucket window sees
    // ~|group|/4096 rows), and the exclusive bucket offsets are exact
    // integer sums, so __cw is identical to the single-window cumulative.
    // NULL values are excluded from BOTH the cumulative and the total
    // (documented contract; ADVICE r15 — previously a null value's
    // weight counted in __tw but never in __cw, so a group with most of
    // its mass on nulls could emit no row)
    val byVal = df.groupBy((groupCols.map(col) :+ col(valueCol).as("__v")): _*)
      .agg(sum(col(weightCol).cast("long")).as("__w"),
           count(lit(1)).cast("long").as("__n"))
      .withColumn("__vl", col("__v").cast("long"))
      .filter(col("__vl").isNotNull)
    val gcols = groupCols.map(col)
    val span = byVal.groupBy(gcols: _*)
      .agg(min(col("__vl")).as("__vmin"), max(col("__vl")).as("__vmax"),
           sum(col("__w")).as("__tw"), sum(col("__n")).as("__tn"))
    val bucketed = byVal.join(broadcast(span), groupCols)
      .withColumn("__vb",
        expr("(__vl - __vmin) div ((__vmax - __vmin) div 4096 + 1)"))
    val wB = Window.partitionBy(gcols: _*).orderBy(col("__vb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offB = bucketed.groupBy((gcols :+ col("__vb")): _*)
      .agg(sum(col("__w")).as("__bw"))
      .withColumn("__offb", coalesce(sum(col("__bw")).over(wB), lit(0L)))
      .select((gcols :+ col("__vb") :+ col("__offb")): _*)
    val wIn = Window.partitionBy((gcols :+ col("__vb")): _*)
      .orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // offB is NOT broadcast-hinted (ADVICE r15): it is up to
    // 4097·|groups| rows, so a forced broadcast inverts the scale safety
    // on high-cardinality groups; the planner picks the strategy, and a
    // shuffle join on (group, __vb) shares the exchange the within-
    // bucket window needs anyway.
    bucketed.join(offB, groupCols :+ "__vb")
      .withColumn("__cw", col("__offb") + sum(col("__w")).over(wIn))
      .filter(col("__cw") * 2 >= col("__tw"))
      .groupBy(gcols: _*)
      .agg(max(col("__tn")).as("n"), max(col("__tw")).as("w_total"),
           min(col("__v")).as("wmedian"))
  }

  /** Robust outlier census via the median absolute deviation — the
    * breakdown-point-0.5 alternative to [[iqrOutliers]]' Tukey fences
    * (Iglewicz & Hoaglin 1993, "How to Detect and Handle Outliers"):
    * flag x when |0.6745·(x − med)/MAD| > `thresh` (their modified
    * z-score, default cut 3.5). Emits one row per group:
    * (group, n, med, mad, n_outliers).
    *
    * Scale shape: two per-group exact-percentile aggregations (median,
    * then median of |x − med| after broadcasting the |groups|-row median
    * table back) plus one counting reduce — the big side shuffles for
    * the percentile sort, never for the joins. At 100 TB swap both
    * [[exact]] calls for [[approx]] (same contract as winsorize).
    * A group with MAD = 0 (over half its mass on one value) reports
    * n_outliers over the x ≠ med rule instead — the standard fallback. */
  /** Trimmed and winsorized means per group (Tukey's robust location
    * family; Wilcox 2012 ch. 3): cut at the exact [lo, hi] percentiles,
    * then report (a) the TRIMMED mean — average of values strictly
    * inside the fences, discarding the tails, and (b) the WINSORIZED
    * mean — average after clamping the tails to the fences. Both are
    * what a revenue dashboard shows when a single whale would swamp the
    * plain mean; winsorized keeps n constant, trimmed does not.
    *
    * Determinism: `valueCol` is expected on an integer grid (cents);
    * fences are exact-percentile doubles on the half-grid; sums fold as
    * integers (trimmed) / half-grid-exact doubles folded on the cents
    * grid after clamping (winsorized — clamp values are quantized to
    * the 1e-4 grid before summing so the fold is order-free).
    * Same 100-TB shape as [[winsorize]]: one percentile aggregation
    * broadcast back, one reduce; big side shuffles once. */
  def trimmedMeans(df: DataFrame, valueCol: String, groupCols: Seq[String],
                   lo: Double = 0.1, hi: Double = 0.9): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1, got ($lo, $hi)")
    val q = exact(df, valueCol, groupCols, Seq(lo, hi))
    val loCol = qLabel(lo)
    val hiCol = qLabel(hi)
    val bounds = q.select(groupCols.map(col) :+
      col(loCol).as("__lo") :+ col(hiCol).as("__hi"): _*)
    df.join(broadcast(bounds), groupCols)
      .withColumn("__in",
        col(valueCol).cast("double") >= col("__lo") &&
        col(valueCol).cast("double") <= col("__hi"))
      .withColumn("__w4",
        floor(least(greatest(col(valueCol).cast("double"), col("__lo")),
          col("__hi")) * 1e4 + 0.5).cast("long"))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n"),
           sum(when(col("__in"), 1L).otherwise(0L)).as("n_kept"),
           sum(when(col("__in"), col(valueCol).cast("long")).otherwise(0L))
             .as("__ts"),
           sum(col("__w4")).as("__ws"))
      .withColumn("trimmed_mean",
        when(col("n_kept") > 0,
          col("__ts").cast("double") / col("n_kept")))
      .withColumn("winsorized_mean",
        col("__ws").cast("double") / 1e4 / col("n"))
      .drop("__ts", "__ws")
  }

  def madOutliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
                  thresh: Double = 3.5): DataFrame = {
    val med = exact(df, valueCol, groupCols, Seq(0.5))
      .select(groupCols.map(col) :+ col("q50").as("__med"): _*)
    val dev = df.join(broadcast(med), groupCols)
      .withColumn("__adev", abs(col(valueCol).cast("double") - col("__med")))
    val mad = exact(dev, "__adev", groupCols, Seq(0.5))
      .select(groupCols.map(col) :+ col("q50").as("__mad"): _*)
    dev.join(broadcast(mad), groupCols)
      .withColumn("__flag",
        when(col("__mad") > 0.0,
          lit(0.6745) * col("__adev") / col("__mad") > lit(thresh))
        .otherwise(col("__adev") > 0.0))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n"),
           max(col("__med")).as("med"), max(col("__mad")).as("mad"),
           sum(when(col("__flag"), 1L).otherwise(0L)).cast("long")
             .as("n_outliers"))
  }

  /** Sketch-based percentiles (the 100 TB path). `accuracy` trades memory
    * for error: 1/accuracy relative rank error. */
  def approx(df: DataFrame, valueCol: String, groupCols: Seq[String],
             probs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val arr = probs.map(p => s"${p}D").mkString("array(", ", ", ")")
    val g = df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"approx_percentile($valueCol, $arr, $accuracy)").as("qs"),
           count(lit(1)).as("n"))
    probs.zipWithIndex.foldLeft(g) { case (d, (p, i)) =>
      d.withColumn(qLabel(p), element_at(col("qs"), i + 1))
    }.drop("qs")
  }
}
