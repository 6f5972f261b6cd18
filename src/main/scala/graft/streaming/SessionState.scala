package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders => SqlEncoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: per-user sessionization with
  * `flatMapGroupsWithState` (SURVEY §7.1 step 5 — the
  * KeyValueGroupedDataset state API the batch reference has no analog
  * for). The same gap rule as [[EventWindows.sessionize]]; here sessions
  * are carried across micro-batches in managed state and emitted when
  * the gap closes them, so an unbounded stream needs O(users) state, not
  * O(events). */
object SessionState {

  case class Ev(userId: Long, tsMs: Long, value: Double)
  case class OpenSession(startMs: Long, lastMs: Long, n: Long, value: Double)
  case class ClosedSession(userId: Long, startMs: Long, endMs: Long,
                           n: Long, value: Double)

  /** Merge one micro-batch of a user's events (sorted by time) into the
    * open-session state; emit every session closed by a gap. */
  def step(userId: Long, events: Iterator[Ev],
           state: GroupState[OpenSession], gapMs: Long): Iterator[ClosedSession] = {
    val sorted = events.toSeq.sortBy(_.tsMs)
    var open = state.getOption
    val closed = Seq.newBuilder[ClosedSession]
    for (e <- sorted) {
      open match {
        case Some(s) if e.tsMs - s.lastMs <= gapMs =>
          open = Some(OpenSession(s.startMs, e.tsMs, s.n + 1, s.value + e.value))
        case Some(s) =>
          closed += ClosedSession(userId, s.startMs, s.lastMs, s.n, s.value)
          open = Some(OpenSession(e.tsMs, e.tsMs, 1, e.value))
        case None =>
          open = Some(OpenSession(e.tsMs, e.tsMs, 1, e.value))
      }
    }
    open.foreach(state.update)
    closed.result().iterator
  }

  /** The streaming query transform: group by user, carry open sessions in
    * state, append closed sessions. */
  def sessionize(events: Dataset[Ev], gapMinutes: Int): Dataset[ClosedSession] = {
    implicit val longEnc = SqlEncoders.scalaLong
    implicit val stEnc = SqlEncoders.product[OpenSession]
    implicit val outEnc = SqlEncoders.product[ClosedSession]
    val gapMs = gapMinutes * 60000L
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[Ev], st: GroupState[OpenSession]) => step(uid, it, st, gapMs))
  }
}
