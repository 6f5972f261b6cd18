package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders => SqlEncoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: per-user sessionization with
  * `flatMapGroupsWithState` (SURVEY §7.1 step 5 — the
  * KeyValueGroupedDataset state API the batch reference has no analog
  * for). The same gap rule as [[EventWindows.sessionize]]; sessions are
  * carried across micro-batches in managed state and emitted when the
  * gap closes them, so an unbounded stream needs O(users) state, not
  * O(events). */
object SessionState {

  case class Ev(userId: Long, tsMs: Long, value: Double)
  case class OpenSession(startMs: Long, lastMs: Long, n: Long, value: Double)
  case class ClosedSession(userId: Long, startMs: Long, endMs: Long,
                           n: Long, value: Double)

  /** Merge one micro-batch of a user's events (sorted by time) into the
    * open-session state; emit every session closed by a gap. Lateness
    * rules: an event within `gapMs` of the open session's WINDOW
    * ([startMs − gap, lastMs + gap]) merges without rewinding the
    * frontier past what the data supports (min/max, so endMs < startMs is
    * impossible); an event older than startMs − gap is DROPPED — by batch
    * semantics it belongs to an earlier, already-emitted session, and
    * resurrecting it would corrupt emitted output (this is the operator's
    * allowed-lateness bound; the watermarked form already filters such
    * rows before they reach state). */
  def step(userId: Long, events: Iterator[Ev],
           state: GroupState[OpenSession], gapMs: Long): Iterator[ClosedSession] = {
    val sorted = events.toSeq.sortBy(_.tsMs)
    var open = state.getOption
    val closed = Seq.newBuilder[ClosedSession]
    for (e <- sorted) {
      open match {
        case Some(s) if e.tsMs < s.startMs - gapMs =>
          () // beyond allowed lateness: drop
        case Some(s) if e.tsMs - s.lastMs <= gapMs =>
          open = Some(OpenSession(math.min(s.startMs, e.tsMs),
            math.max(s.lastMs, e.tsMs), s.n + 1, s.value + e.value))
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

  /** Test/demo harness form: no timeout — final open sessions are only
    * emitted when a later event closes them. Production streams should
    * use [[sessionizeWithTimeout]], which bounds state and flushes idle
    * sessions via the event-time clock. */
  def sessionize(events: Dataset[Ev], gapMinutes: Int): Dataset[ClosedSession] = {
    implicit val longEnc = SqlEncoders.scalaLong
    implicit val stEnc = SqlEncoders.product[OpenSession]
    implicit val outEnc = SqlEncoders.product[ClosedSession]
    val gapMs = gapMinutes * 60000L
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[Ev], st: GroupState[OpenSession]) => step(uid, it, st, gapMs))
  }

  /** Internal carrier for the watermarked form (public: Catalyst's
    * generated projections must be able to reach the constructor). */
  case class EvT(userId: Long, tsMs: Long, value: Double,
                 ets: java.sql.Timestamp)

  /** Production form: event-time timeout against the stream's watermark.
    * When no event arrives for a user within the gap (by event time), the
    * open session is emitted and its state REMOVED — so an idle or
    * churned user costs nothing and every session is eventually emitted
    * without sentinel traffic. */
  def sessionizeWithTimeout(events: Dataset[Ev], gapMinutes: Int,
                            watermarkDelay: String = "1 hour"): Dataset[ClosedSession] = {
    implicit val longEnc = SqlEncoders.scalaLong
    implicit val stEnc = SqlEncoders.product[OpenSession]
    implicit val outEnc = SqlEncoders.product[ClosedSession]
    implicit val evtEnc = SqlEncoders.product[EvT]
    val gapMs = gapMinutes * 60000L
    events
      .withColumn("ets", timestamp_millis(col("tsMs")))
      .withWatermark("ets", watermarkDelay)
      .as[EvT]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, it: Iterator[EvT], st: GroupState[OpenSession]) =>
          if (st.hasTimedOut) {
            val s = st.get
            st.remove()
            Iterator(ClosedSession(uid, s.startMs, s.lastMs, s.n, s.value))
          } else {
            val out = step(uid, it.map(e => Ev(e.userId, e.tsMs, e.value)), st, gapMs)
            st.getOption.foreach(s => st.setTimeoutTimestamp(s.lastMs + gapMs))
            out
          })
  }
}
