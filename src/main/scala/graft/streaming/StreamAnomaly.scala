package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders => SqlEncoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming anomaly flags: each event is scored against the expanding
  * mean/σ of all PRIOR events of its series (one-sided — the score for
  * an event never changes once emitted), flagged when |z| > k. The
  * streaming complement to the batch Hampel filter
  * ([[graft.scale.SeriesDiagnostics.rollingMadAnomaly]]): Hampel is
  * robust and two-sided but needs the ±window; this is causal, O(1)
  * state per series (three integers), and runs on an unbounded stream.
  *
  * Determinism discipline (the [[OnlineForecast]] pattern): values are
  * cent-quantized and the state sums are EXACT integers (cents and
  * cents²), so the derived doubles — mean, σ, z — are bit-identical
  * between the streaming fold, the batch window twin, and the DuckDB
  * oracle (each double op runs on identical inputs in every engine).
  * Late events (at or behind the (ts, eventId) frontier) are dropped,
  * same contract as [[OnlineForecast.step]]. */
object StreamAnomaly {

  case class Pt(userId: Long, tsMs: Long, eventId: Long, value: Double)
  case class ZState(n: Long, syC: Long, syyC2: Long,
                    lastTsMs: Long, lastEventId: Long)
  case class Score(userId: Long, tsMs: Long, eventId: Long,
                   y: Double, z: Option[Double], isAnomaly: Boolean)

  /** The shared score formula: prior sums in exact integer cents →
    * doubles via one division each → identical scalar ops everywhere.
    * Needs ≥2 prior points and positive variance; else no score. */
  private def score(y2: Double, n: Long, syC: Long, syyC2: Long,
                    k: Double): (Option[Double], Boolean) = {
    if (n < 2) (None, false)
    else {
      val nd = n.toDouble
      val sy = syC / 100.0
      val syy = syyC2 / 10000.0
      val mean = sy / nd
      val varr = (syy - sy * sy / nd) / (nd - 1.0)
      if (varr > 0) {
        val z = (y2 - mean) / math.sqrt(varr)
        (Some(z), math.abs(z) > k)
      } else (None, false)
    }
  }

  /** Fold one micro-batch of a series (event-time order, id ties):
    * score each event against the state BEFORE absorbing it. */
  def step(k: Double)(userId: Long, events: Iterator[Pt],
                      state: GroupState[ZState]): Iterator[Score] = {
    var st = state.getOption.getOrElse(ZState(0L, 0L, 0L, Long.MinValue, Long.MinValue))
    val out = Seq.newBuilder[Score]
    for (e <- events.toSeq.sortBy(p => (p.tsMs, p.eventId))) {
      val late = e.tsMs < st.lastTsMs ||
        (e.tsMs == st.lastTsMs && e.eventId <= st.lastEventId)
      if (!late) {
        val yC = math.floor(e.value * 100.0 + 0.5).toLong
        val y2 = yC / 100.0
        val (z, flag) = score(y2, st.n, st.syC, st.syyC2, k)
        out += Score(userId, e.tsMs, e.eventId, e.value, z, flag)
        st = ZState(st.n + 1, st.syC + yC, st.syyC2 + yC * yC, e.tsMs, e.eventId)
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** Streaming form: per-series expanding z-scores, update mode. */
  def flags(events: Dataset[Pt], k: Double = 3.0): Dataset[Score] = {
    implicit val longEnc = SqlEncoders.scalaLong
    implicit val stEnc = SqlEncoders.product[ZState]
    implicit val outEnc = SqlEncoders.product[Score]
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (key: Long, it: Iterator[Pt], s: GroupState[ZState]) => step(k)(key, it, s))
  }

  /** Deterministic batch twin: identical scores as ONE window pass.
    * Prior sums accumulate in exact DECIMAL over the cent-quantized
    * value (windowed float sums are association-order-dependent across
    * engines; the variance cancellation amplifies that ulp), then cast
    * to double at exactly the points the streaming fold divides. */
  def flagsBatch(df: DataFrame, valueCol: String, tsCol: String,
                 seriesCols: Seq[String], tieCols: Seq[String],
                 k: Double = 3.0): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((col(tsCol) +: tieCols.map(col)): _*)
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    val v2 = (floor(col(valueCol).cast("double") * lit(100.0) + lit(0.5)) / lit(100.0))
      .cast("decimal(18,2)")
    val n = (col("rn") - 1).cast("double")
    val mean = col("sy") / n
    val varr = (col("syy") - col("sy") * col("sy") / n) / (n - lit(1.0))
    val z = (col("y2") - mean) / sqrt(varr)
    df.withColumn("v2", v2)
      .withColumn("y2", col("v2").cast("double"))
      .withColumn("rn", row_number().over(w))
      .withColumn("sy", sum(col("v2")).over(prior).cast("double"))
      .withColumn("syy",
        sum((col("v2") * col("v2")).cast("decimal(38,4)")).over(prior).cast("double"))
      .withColumn("z",
        when(col("rn") >= 3 && varr > 0, z).otherwise(lit(null).cast("double")))
      .withColumn("is_anomaly", coalesce(abs(col("z")) > k, lit(false)))
      .drop("v2", "rn", "sy", "syy")
  }
}
