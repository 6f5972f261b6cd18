package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders => SqlEncoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online GARCH(1,1) volatility tracking — the streaming form of
  * [[graft.scale.PerSeriesForecast.garchFilter]] (Bollerslev 1986 with
  * fixed binary-fraction coefficients): per series the state is FOUR
  * numbers (h, previous level, previous return, flags) + a lateness
  * frontier, updated per event:
  *   r ← y_t − y_{t-1}
  *   h ← ω + α·r²_{prev} + β·h        (from the second return on)
  * Each return event is emitted with its conditional variance h, vol √h
  * and standardized residual z = r/√h — the live anomaly/volatility
  * channel a risk monitor consumes.
  *
  * [[garchExpandingBatch]] is the deterministic batch twin (one
  * flatMapGroups fold — EXACTLY [[graft.scale.PerSeriesForecast
  * .garchFilter]]'s trajectory, so the `st_garch` registry row reuses
  * f22's recursive-CTE oracle verbatim); [[track]] is the
  * `flatMapGroupsWithState` streaming form, spec-pinned to agree with
  * the batch twin under any in-order micro-batch split. Late events (at
  * or behind the (ts, eventId) frontier) are DROPPED — emitted rows are
  * final (the [[OnlineForecast]] lateness contract).
  *
  * Determinism: levels quantize to cents before differencing and
  * (ω, α, β) = (1/4, 1/4, 1/2) keeps every step 3 IEEE ops in fixed
  * order — identical on both engines and across any split. */
object StreamGarch {

  case class Pt(userId: Long, tsMs: Long, eventId: Long, value: Double)
  case class GarchState(h: Double, prevY: Double, prevR: Double,
                        started: Boolean, hasRet: Boolean,
                        lastTsMs: Long, lastEventId: Long)
  case class Out(userId: Long, tsMs: Long, eventId: Long,
                 r: Double, h: Double, vol: Double, z: Double)

  val omega = 0.25
  val alpha = 0.25
  val beta = 0.5
  val h0 = 1.0

  private def cents(v: Double) = math.floor(v * 100 + 0.5) / 100

  /** Absorb one in-order event; returns (new state, emission if the
    * event produced a return). */
  private def absorb(st: GarchState, tsMs: Long, eventId: Long,
                     value: Double, userId: Long)
      : (GarchState, Option[Out]) = {
    val y = cents(value)
    if (!st.started)
      (GarchState(h0, y, 0.0, started = true, hasRet = false,
                  tsMs, eventId), None)
    else {
      val r = y - st.prevY
      val h = if (st.hasRet) omega + alpha * st.prevR * st.prevR + beta * st.h
              else st.h
      val vol = math.sqrt(h)
      (GarchState(h, y, r, started = true, hasRet = true, tsMs, eventId),
       Some(Out(userId, tsMs, eventId, r, h, vol, r / vol)))
    }
  }

  /** Fold one micro-batch of a series (sorted, late-dropped). */
  def step(userId: Long, events: Iterator[Pt],
           state: GroupState[GarchState]): Iterator[Out] = {
    var st = state.getOption.getOrElse(
      GarchState(h0, 0.0, 0.0, started = false, hasRet = false,
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
    implicit val stEnc = SqlEncoders.product[GarchState]
    implicit val outEnc = SqlEncoders.product[Out]
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (k: Long, it: Iterator[Pt], s: GroupState[GarchState]) => step(k, it, s))
  }

  /** Deterministic batch twin: the SAME absorb fold per series — emits
    * garchFilter's exact (user, event, r, h, vol, z) trajectory, so the
    * registry row hash-checks against f22's oracle. */
  def garchExpandingBatch(df: DataFrame, valueCol: String, tsCol: String,
                          seriesCol: String, tieCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(seriesCol).cast("long"), col(tsCol).cast("double"),
              col(tieCol).cast("long"), col(valueCol).cast("double"))
      .as[(Long, Double, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (sid, it) =>
        var st = GarchState(h0, 0.0, 0.0, started = false, hasRet = false,
                            Long.MinValue, Long.MinValue)
        it.toArray.sortBy(t => (t._2, t._3)).iterator.flatMap {
          case (_, _, eid, v) =>
            // batch rows are in-order by construction; use a synthetic
            // strictly-increasing frontier so the late gate never fires
            val (st2, o) = absorb(st, st.lastTsMs + 1, eid, v, sid)
            st = st2
            o.map(x => (sid, eid, x.r, x.h, x.vol, x.z))
        }
      }
      .toDF(seriesCol, tieCol, "r", "h", "vol", "z")
  }
}
