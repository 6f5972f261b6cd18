package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders => SqlEncoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online local-level Kalman filtering — the streaming form of
  * [[graft.scale.PerSeriesForecast.kalmanLocalLevel]] (Harvey 1989 §2):
  * each arriving event is emitted with the one-step-ahead prediction
  * made BEFORE it was absorbed (the innovation base an online anomaly
  * detector thresholds), then folded into the (level, variance) state.
  * Unlike [[StreamHoltWinters]]' fixed smoothing rates, the gain here is
  * variance-ADAPTIVE: young series get large principled gains, settled
  * series converge to the steady state — the right behavior for a
  * monitoring stream where series are born continuously.
  *
  * State is TWO doubles + the (tsMs, eventId) frontier per series —
  * O(1), watermark-free. Late events (at or behind the frontier) DROP:
  * emitted predictions are final (the [[OnlineForecast]] contract).
  * The absorb step is shared verbatim with the batch form's recursion,
  * so streaming == batch parity is structural and spec-pinned under
  * random micro-batch splits; the batch form is hash-checked against a
  * recursive-CTE oracle as `f16_kalman`. */
object StreamKalman {

  case class Pt(userId: Long, tsMs: Long, eventId: Long, value: Double)
  case class KState(a: Double, p: Double, started: Boolean,
                    lastTsMs: Long, lastEventId: Long)
  case class Out(userId: Long, tsMs: Long, eventId: Long,
                 yhatPrior: Option[Double], level: Double, pVar: Double,
                 kGain: Option[Double])

  val q = 0.25
  val r = 1.0

  def init: KState = KState(0.0, 0.0, started = false,
                            Long.MinValue, Long.MinValue)

  /** Emit the prior-state row for one event, then the absorbed state —
    * the identical op chain to the batch fold and the f16 oracle. */
  def absorbEmit(userId: Long, e: Pt, st: KState): (KState, Out) = {
    val y = math.floor(e.value * 100 + 0.5) / 100
    if (!st.started)
      (KState(y, r, started = true, e.tsMs, e.eventId),
       Out(userId, e.tsMs, e.eventId, None, y, r, None))
    else {
      val pPred = st.p + q
      val k = pPred / (pPred + r)
      val a = st.a + k * (y - st.a)
      val p = (1 - k) * pPred
      (KState(a, p, started = true, e.tsMs, e.eventId),
       Out(userId, e.tsMs, e.eventId, Some(st.a), a, p, Some(k)))
    }
  }

  /** Fold one micro-batch of a series (sorted, late-dropped). */
  def step(userId: Long, events: Iterator[Pt],
           state: GroupState[KState]): Iterator[Out] = {
    var st = state.getOption.getOrElse(init)
    val out = Seq.newBuilder[Out]
    for (e <- events.toSeq.sortBy(p => (p.tsMs, p.eventId))) {
      val late = e.tsMs < st.lastTsMs ||
        (e.tsMs == st.lastTsMs && e.eventId <= st.lastEventId)
      if (!late) {
        val (st2, o) = absorbEmit(userId, e, st)
        st = st2
        out += o
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** Streaming form: O(1) state per series, update mode. */
  def filter(events: Dataset[Pt]): Dataset[Out] = {
    implicit val longEnc = SqlEncoders.scalaLong
    implicit val stEnc = SqlEncoders.product[KState]
    implicit val outEnc = SqlEncoders.product[Out]
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (k: Long, it: Iterator[Pt], s: GroupState[KState]) => step(k, it, s))
  }
}
