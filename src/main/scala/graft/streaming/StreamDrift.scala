package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming distribution-drift monitor: PSI of each event-time window
  * against a FIXED reference distribution — the production form of
  * [[graft.stats.DriftAudit.psiBins]] (which compares two static
  * splits). A feature pipeline runs this on its input stream and alarms
  * when a window's PSI crosses the 0.25 action line: upstream schema
  * drift, a broken producer, a seasonal regime the model never saw.
  *
  * Streaming-appropriate contract: bin edges are FIXED [lo, hi]·bins
  * parameters (a pooled min/max does not exist on an unbounded stream;
  * pick edges from the reference corpus), and the reference shares are
  * a ≤bins-row broadcast. The stream side runs ONE stateful operator —
  * the watermarked (window, bin) count, O(bins) state per open window —
  * and the PSI fold ([[psiFold]]) is pure batch arithmetic on the
  * closed windows' count rows, shared verbatim with the batch twin
  * (run it in `foreachBatch`, or over the appended sink table).
  *
  * Determinism: per-bin PSI terms quantize to the 1e-9 grid and sum as
  * BIGINT within each window (a ≤bins-element float sum is still
  * association-order-dependent), so the batch twin replays exactly. */
object StreamDrift {

  /** Laplace-smoothed reference shares over the fixed grid: (bin, q).
    * One aggregate over the reference corpus; all `bins` rows emitted
    * (zero-count bins get the smoothing floor) so window scoring never
    * fabricates missing bins. */
  def referenceShares(ref: DataFrame, valueCol: String,
                      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 2 && hi > lo, s"need bins >= 2 and hi > lo")
    val grid = ref.sparkSession.range(0, bins).select(col("id").cast("int").as("bin"))
    val counts = ref
      .withColumn("bin", binOf(col(valueCol), lo, hi, bins))
      .groupBy(col("bin")).count()
    grid.join(counts, Seq("bin"), "left")
      .withColumn("n", coalesce(col("count"), lit(0L)))
      .crossJoin(broadcast(ref.agg(count(lit(1)).as("tot"))))
      .withColumn("q", (col("n") + 0.5) / (col("tot") + 0.5 * bins))
      .select(col("bin"), col("q"))
  }

  /** Shared fixed-grid bin rule (clamped to the edge bins so outliers
    * land in the first/last bin instead of vanishing). */
  def binOf(v: org.apache.spark.sql.Column, lo: Double, hi: Double,
            bins: Int): org.apache.spark.sql.Column =
    least(greatest(
      floor((v.cast("double") - lo) / (hi - lo) * bins).cast("int"), lit(0)),
      lit(bins - 1))

  /** The PSI fold: (day, bin, count) rows → one (day, n_events, psi,
    * drifted) row per day. Pure O(windows·bins) arithmetic — missing
    * bins are re-gridded to the smoothing floor, reference shares
    * broadcast. Shared by [[psiPerDayBatch]] and the streaming sink. */
  def psiFold(counts: DataFrame, refShares: DataFrame, bins: Int): DataFrame = {
    val grid = counts.sparkSession.range(0, bins)
      .select(col("id").cast("int").as("bin"))
    // rename the second reference so the self-referencing join resolves
    // regardless of the counts' source (plan subtree vs sink table)
    val right = counts.select(col("day"), col("bin"), col("count"))
      .toDF("day2", "bin2", "cnt2")
    val full = counts.select(col("day")).distinct()
      .crossJoin(broadcast(grid))
      .join(right, col("day") === col("day2") && col("bin") === col("bin2"), "left")
      .withColumn("n", coalesce(col("cnt2"), lit(0L)))
      .select(col("day"), col("bin"), col("n"))
    val tots = full.groupBy(col("day")).agg(sum(col("n")).as("tot"))
      .toDF("day3", "tot")
    full.join(broadcast(tots), col("day") === col("day3")).drop("day3")
      .join(broadcast(refShares), "bin")
      .withColumn("p", (col("n") + 0.5) / (col("tot") + 0.5 * bins))
      .withColumn("term9",
        floor((col("p") - col("q")) * log(col("p") / col("q")) * 1e9 + 0.5)
          .cast("long"))
      .groupBy(col("day"))
      .agg(max(col("tot")).as("n_events"),
           (sum(col("term9")) / 1e9).as("psi"))
      .withColumn("drifted", col("psi") > 0.25)
  }

  /** Day-keyed (day, bin, count) table — batch form. ONE data-sized
    * shuffle; everything after is O(windows·bins). */
  def dayBinCountsBatch(events: DataFrame, valueCol: String, tsCol: String,
                        lo: Double, hi: Double, bins: Int): DataFrame =
    events
      .withColumn("day", floor(col(tsCol).cast("double") / 86400.0).cast("long"))
      .withColumn("bin", binOf(col(valueCol), lo, hi, bins))
      .groupBy(col("day"), col("bin")).count()

  /** Batch twin: one PSI row per day. */
  def psiPerDayBatch(events: DataFrame, valueCol: String, tsCol: String,
                     refShares: DataFrame,
                     lo: Double, hi: Double, bins: Int): DataFrame =
    psiFold(dayBinCountsBatch(events, valueCol, tsCol, lo, hi, bins),
            refShares, bins)

  /** Streaming form: the ONE stateful operator — watermarked tumbling
    * 1-day (window, bin) counts, emitted on window close (append).
    * Downstream, apply [[psiFold]] per micro-batch (`foreachBatch`) or
    * over the sink table; parity with [[psiPerDayBatch]] is spec-pinned. */
  def dayBinCounts(stream: DataFrame, valueCol: String, tsCol: String,
                   lo: Double, hi: Double, bins: Int,
                   watermark: String = "1 day"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .withColumn("bin", binOf(col(valueCol), lo, hi, bins))
      .groupBy(window(col(tsCol), "1 day"), col("bin")).count()
      .withColumn("day",
        floor(col("window.start").cast("double") / 86400.0).cast("long"))
      .select(col("day"), col("bin"), col("count"))
}
