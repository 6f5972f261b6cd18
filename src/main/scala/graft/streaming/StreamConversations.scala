package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders => SqlEncoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversation assembly — the online form of
  * [[graft.scale.EventAnalytics.conversations]]: events arrive per user
  * in time order, accumulate into the OPEN session, and the finished
  * conversation document is emitted the moment a gap larger than
  * `gapMinutes` proves the session closed (a session can only be
  * rendered once its end is evidenced — emitting decisions are final,
  * the [[StreamPack]] contract, so the open session stays in state and
  * is NEVER partially emitted).
  *
  * State per user is the open session only: (session id, last ts, the
  * ordered turn buffer) — bounded by one session's length, not the
  * stream's (a production deployment adds a ProcessingTime timeout to
  * flush users that go silent forever; the fold is identical). Events at
  * or behind the (ts, id) frontier drop — in-order arrival per user is
  * the stream's responsibility, as (ts, id) visit order is the batch
  * form's.
  *
  * Parity (spec-pinned): over any micro-batch split, the emitted docs
  * equal the batch [[graft.scale.EventAnalytics.conversations]] rows for
  * every session whose close the stream has seen. */
object StreamConversations {

  case class Ev(userId: Long, tsMs: Long, eventId: Long, eventType: String)
  case class ConvState(sessionId: Long, lastTsMs: Long, lastId: Long,
                       turns: Seq[String])
  case class ConvDoc(userId: Long, sessionId: Long, nTurns: Long,
                     convo: String)

  def empty: ConvState = ConvState(0L, Long.MinValue, Long.MinValue, Seq.empty)

  /** Advance one user over one in-order slice, emitting every session the
    * slice closes. Gap rule identical to the batch window form: a new
    * session opens when the gap since the previous event exceeds the
    * threshold (strictly greater, matching `gap_s > gapMinutes*60`). */
  def foldUser(gapMinutes: Int)(userId: Long, evs: Iterator[Ev],
                                st0: ConvState): (ConvState, Seq[ConvDoc]) = {
    var st = st0
    val out = Seq.newBuilder[ConvDoc]
    val gapMs = gapMinutes * 60000L
    for (e <- evs.toSeq.sortBy(t => (t.tsMs, t.eventId))
         if e.tsMs > st.lastTsMs ||
            (e.tsMs == st.lastTsMs && e.eventId > st.lastId)) {
      if (st.sessionId == 0L) {
        st = ConvState(1L, e.tsMs, e.eventId, Seq(e.eventType))
      } else if (e.tsMs - st.lastTsMs > gapMs) {
        out += ConvDoc(userId, st.sessionId, st.turns.length,
                       st.turns.mkString(" "))
        st = ConvState(st.sessionId + 1, e.tsMs, e.eventId, Seq(e.eventType))
      } else {
        st = ConvState(st.sessionId, e.tsMs, e.eventId, st.turns :+ e.eventType)
      }
    }
    (st, out.result())
  }

  /** Streaming form: closed-session docs, open session held per user. */
  def assemble(events: Dataset[Ev], gapMinutes: Int = 30): Dataset[ConvDoc] = {
    implicit val stEnc = SqlEncoders.product[ConvState]
    implicit val outEnc = SqlEncoders.product[ConvDoc]
    implicit val longEnc = SqlEncoders.scalaLong
    val fold = foldUser(gapMinutes) _
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (k: Long, it: Iterator[Ev], state: GroupState[ConvState]) => {
          val (st, out) = fold(k, it, state.getOption.getOrElse(empty))
          state.update(st)
          out.iterator
        })
  }
}
