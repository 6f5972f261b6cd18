package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders => SqlEncoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online TSB intermittent-demand forecasting — the streaming form of
  * [[graft.scale.PerSeriesForecast.tsbForecast]] (Teunter–Syntetos–Babai
  * 2011): the demand PROBABILITY updates on every event (zeros decay it —
  * the obsolescence signal Croston can't see) and the demand SIZE updates
  * on demand events only. State is THREE numbers + a frontier per series:
  *   p ← p + β(d_t − p)          every event, p init d₁
  *   z ← z + α(y_t − z)          demand events, z init first demand size
  * Each event is emitted with the one-step-ahead forecast made BEFORE it
  * was absorbed (ŷ = p·z from the prior state; None until the series has
  * both a prior event and a prior demand).
  *
  * [[tsbExpandingBatch]] is the deterministic batch twin (one
  * flatMapGroups fold per series, oracle-checked as `st_tsb` against a
  * recursive-CTE replay of the SAME recursion); [[forecast]] is the
  * `flatMapGroupsWithState` streaming form, spec-pinned to agree with
  * the batch twin on any in-order micro-batch split. Late events (at or
  * behind the (ts, eventId) frontier) are DROPPED — emitted forecasts
  * are final (the [[OnlineForecast]] lateness contract).
  *
  * Determinism: demand sizes quantize to cents before entering the
  * recursion and α = β = 0.5 halves are the identical IEEE op chain on
  * both engines, so the oracle replay is bit-exact. */
object StreamTsb {

  case class Pt(userId: Long, tsMs: Long, eventId: Long, demand: Double)
  case class TsbState(p: Double, z: Double, seen: Boolean, started: Boolean,
                      lastTsMs: Long, lastEventId: Long)
  case class Out(userId: Long, tsMs: Long, eventId: Long, demand: Double,
                 yhat: Option[Double], pDemand: Option[Double])

  val alpha = 0.5
  val beta = 0.5

  private def absorb(st: TsbState, tsMs: Long, eventId: Long,
                     demand: Double): TsbState = {
    val y2 = math.floor(demand * 100.0 + 0.5) / 100.0
    val d = if (y2 != 0.0) 1.0 else 0.0
    if (!st.started)
      TsbState(d, if (d == 1.0) y2 else 0.0, d == 1.0, started = true,
               tsMs, eventId)
    else {
      val p = st.p + beta * (d - st.p)
      val (z, seen) =
        if (d == 1.0) {
          if (st.seen) (st.z + alpha * (y2 - st.z), true) else (y2, true)
        } else (st.z, st.seen)
      TsbState(p, z, seen, started = true, tsMs, eventId)
    }
  }

  private def emit(userId: Long, e: Pt, st: TsbState): Out =
    Out(userId, e.tsMs, e.eventId, e.demand,
        if (st.started && st.seen) Some(st.p * st.z) else None,
        if (st.started) Some(st.p) else None)

  /** Fold one micro-batch of a series (sorted, late-dropped): emit the
    * prior-state forecast for each event, then absorb it. */
  def step(userId: Long, events: Iterator[Pt],
           state: GroupState[TsbState]): Iterator[Out] = {
    var st = state.getOption.getOrElse(
      TsbState(0.0, 0.0, seen = false, started = false,
               Long.MinValue, Long.MinValue))
    val out = Seq.newBuilder[Out]
    for (e <- events.toSeq.sortBy(p => (p.tsMs, p.eventId))) {
      val late = e.tsMs < st.lastTsMs ||
        (e.tsMs == st.lastTsMs && e.eventId <= st.lastEventId)
      if (!late) {
        out += emit(userId, e, st)
        st = absorb(st, e.tsMs, e.eventId, e.demand)
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** Streaming form: O(1) state per series, update mode. */
  def forecast(events: Dataset[Pt]): Dataset[Out] = {
    implicit val longEnc = SqlEncoders.scalaLong
    implicit val stEnc = SqlEncoders.product[TsbState]
    implicit val outEnc = SqlEncoders.product[Out]
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (k: Long, it: Iterator[Pt], s: GroupState[TsbState]) => step(k, it, s))
  }

  /** Deterministic batch twin: the SAME recursion folded per series in
    * one flatMapGroups pass — what the stream would have emitted had
    * every event arrived in one batch. Oracle-checked as `st_tsb`. */
  def tsbExpandingBatch(df: DataFrame, demandCol: String, tsCol: String,
                        seriesCol: String, tieCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(seriesCol).cast("long"), col(tsCol).cast("double"),
              col(tieCol).cast("long"), col(demandCol).cast("double"))
      .as[(Long, Double, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (sid, it) =>
        var st = TsbState(0.0, 0.0, seen = false, started = false,
                          Long.MinValue, Long.MinValue)
        it.toArray.sortBy(t => (t._2, t._3)).iterator.map { case (_, _, eid, dem) =>
          val o = emit(sid, Pt(sid, 0L, eid, dem), st)
          st = absorb(st, 0L, eid, dem)
          (sid, eid, o.yhat, o.pDemand)
        }
      }
      .toDF(seriesCol, tieCol, "yhat", "p_demand")
  }
}
