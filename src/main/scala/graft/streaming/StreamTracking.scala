package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders => SqlEncoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online Trigg tracking-signal monitoring — the streaming form of
  * [[graft.scale.SeriesDiagnostics.trackingSignal]] (Trigg 1964): per
  * series the state is the smoothed error E and smoothed absolute error
  * M (both SES, dyadic α), updated on every one-step naive error
  * e_t = y_t − y_{t-1}; each error event emits TS = E/M — the live
  * forecast-drift alarm channel (TS saturating toward ±1 = the model is
  * biased NOW, long before batch accuracy metrics move).
  *
  * [[trackingExpandingBatch]] is the deterministic batch twin (the same
  * recursion folded per series, oracle-checked as `st_tracking` against
  * a recursive-CTE replay); [[track]] is the `flatMapGroupsWithState`
  * form, spec-pinned to agree under any in-order micro-batch split.
  * Late events are DROPPED (the [[OnlineForecast]] lateness contract).
  *
  * Determinism: levels quantize to cents before differencing; the SES
  * recursion E ← E + α(e − E) with α = 1/2 is two IEEE ops per step in
  * fixed order — bit-identical across engines and splits. */
object StreamTracking {

  case class Pt(userId: Long, tsMs: Long, eventId: Long, value: Double)
  case class TrackState(es: Double, ms: Double, prevY: Double,
                        started: Boolean, hasErr: Boolean,
                        lastTsMs: Long, lastEventId: Long)
  case class Out(userId: Long, tsMs: Long, eventId: Long, e: Double,
                 eSmooth: Double, mSmooth: Double, ts: Option[Double])

  val alpha = 0.5

  private def cents(v: Double) = math.floor(v * 100 + 0.5) / 100

  private def absorb(st: TrackState, tsMs: Long, eventId: Long,
                     value: Double, userId: Long)
      : (TrackState, Option[Out]) = {
    val y = cents(value)
    if (!st.started)
      (TrackState(0.0, 0.0, y, started = true, hasErr = false,
                  tsMs, eventId), None)
    else {
      val e = y - st.prevY
      val (es, ms) =
        if (!st.hasErr) (e, math.abs(e))
        else (st.es + alpha * (e - st.es),
              st.ms + alpha * (math.abs(e) - st.ms))
      val out = Out(userId, tsMs, eventId, e, es, ms,
                    if (ms > 0) Some(es / ms) else None)
      (TrackState(es, ms, y, started = true, hasErr = true, tsMs, eventId),
       Some(out))
    }
  }

  /** Fold one micro-batch of a series (sorted, late-dropped). */
  def step(userId: Long, events: Iterator[Pt],
           state: GroupState[TrackState]): Iterator[Out] = {
    var st = state.getOption.getOrElse(
      TrackState(0.0, 0.0, 0.0, started = false, hasErr = false,
                 Long.MinValue, Long.MinValue))
    val out = Seq.newBuilder[Out]
    for (e <- events.toSeq.sortBy(p => (p.tsMs, p.eventId))) {
      val late = e.tsMs < st.lastTsMs ||
        (e.tsMs == st.lastTsMs && e.eventId <= st.lastEventId)
      if (!late) {
        val (st2, o) = absorb(st, e.tsMs, e.eventId, e.value, userId)
        st = st2
        o.foreach(out += _)
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** Streaming form: O(1) state per series, update mode. */
  def track(events: Dataset[Pt]): Dataset[Out] = {
    implicit val longEnc = SqlEncoders.scalaLong
    implicit val stEnc = SqlEncoders.product[TrackState]
    implicit val outEnc = SqlEncoders.product[Out]
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (k: Long, it: Iterator[Pt], s: GroupState[TrackState]) => step(k, it, s))
  }

  /** Deterministic batch twin: the SAME absorb fold per series. */
  def trackingExpandingBatch(df: DataFrame, valueCol: String, tsCol: String,
                             seriesCol: String, tieCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(seriesCol).cast("long"), col(tsCol).cast("double"),
              col(tieCol).cast("long"), col(valueCol).cast("double"))
      .as[(Long, Double, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (sid, it) =>
        var st = TrackState(0.0, 0.0, 0.0, started = false, hasErr = false,
                            Long.MinValue, Long.MinValue)
        it.toArray.sortBy(t => (t._2, t._3)).iterator.flatMap {
          case (_, _, eid, v) =>
            val (st2, o) = absorb(st, st.lastTsMs + 1, eid, v, sid)
            st = st2
            o.map(x => (sid, eid, x.e, x.eSmooth, x.mSmooth, x.ts))
        }
      }
      .toDF(seriesCol, tieCol, "e", "e_smooth", "mad_smooth", "ts")
  }
}
