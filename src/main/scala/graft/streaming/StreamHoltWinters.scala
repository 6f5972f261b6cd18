package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders => SqlEncoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online Holt–Winters — the streaming form of
  * [[graft.scale.PerSeriesForecast.holtWintersForecast]]: every event
  * gets the ONE-STEP-AHEAD seasonal forecast made before it was seen
  * (the residual stream a forecast-quality monitor consumes), and the
  * (level, trend, seasonal[m]) state advances by the identical
  * recursion. State is O(m) per series — the m seasonals plus two
  * scalars — never a window of rows; the first 2m events of a series
  * buffer for the standard two-cycle initialization (HW has no defined
  * state before two full cycles — those events emit a null forecast and
  * the buffer is bounded at 2m).
  *
  * The same fold (`foldSeries`) runs both the streaming
  * `flatMapGroupsWithState` path and the batch one-shot twin
  * ([[oneStepBatch]]) — shared verbatim, so streaming == batch parity
  * is structural, and the batch twin's final state reproduces the batch
  * estimator's forecasts exactly (spec-pinned both ways). Late events
  * (at or behind the (ts, eventId) frontier) are DROPPED — an emitted
  * forecast is final, same contract as [[OnlineForecast]]. */
object StreamHoltWinters {

  case class Pt(userId: Long, tsMs: Long, eventId: Long, value: Double)
  /** `warm` holds the 1e-9-grid quantized values as EXACT longs so the
    * 2m-point initialization can sum them in integer arithmetic exactly
    * as the batch estimator does (same last-ulp result on any value). */
  case class HwState(warm: List[Long], l: Double, b: Double,
                     s: List[Double], n: Long,
                     lastTsMs: Long, lastEventId: Long)
  case class Out(userId: Long, tsMs: Long, eventId: Long,
                 y: Double, yhat: Option[Double])

  def empty: HwState =
    HwState(Nil, 0.0, 0.0, Nil, 0L, Long.MinValue, Long.MinValue)

  /** Advance one series' state over one in-order slice of events,
    * emitting the pre-absorption one-step forecast per event. Identical
    * arithmetic to the batch estimator: y quantizes to the 1e-9 grid,
    * init is (first-cycle mean, mean cycle step, first-cycle
    * deviations), recursion is the coupled HW update. */
  def foldSeries(m: Int, alpha: Double, beta: Double, gamma: Double)(
      userId: Long, events: Iterator[Pt], st0: HwState): (HwState, Seq[Out]) = {
    var st = st0
    val out = Seq.newBuilder[Out]
    for (e <- events.toSeq.sortBy(p => (p.tsMs, p.eventId))) {
      val late = e.tsMs < st.lastTsMs ||
        (e.tsMs == st.lastTsMs && e.eventId <= st.lastEventId)
      if (!late) {
        val y9 = math.floor(e.value * 1e9 + 0.5).toLong
        val yq = y9 / 1e9
        if (st.n < 2L * m - 1) {
          // warm-up: no defined HW state yet
          out += Out(userId, e.tsMs, e.eventId, e.value, None)
          st = st.copy(warm = st.warm :+ y9, n = st.n + 1,
            lastTsMs = e.tsMs, lastEventId = e.eventId)
        } else if (st.n == 2L * m - 1) {
          // 2m-th point: the last warm-up event still has no forecast;
          // initialize from the full two cycles, then fold cycle two —
          // integer sums over the grid longs, IDENTICAL arithmetic to
          // the batch estimator (PerSeriesForecast.scala:612-623)
          out += Out(userId, e.tsMs, e.eventId, e.value, None)
          val w9 = (st.warm :+ y9).toArray
          val w = w9.map(_ / 1e9)
          var sum9 = 0L; var diff9 = 0L
          for (i <- 0 until m) { sum9 += w9(i); diff9 += w9(m + i) - w9(i) }
          var l = sum9.toDouble / m / 1e9
          var b = diff9.toDouble / (m.toLong * m) / 1e9
          val s = Array.tabulate(m)(i => w(i) - l)
          for (t <- m until 2 * m) {
            val ph = t % m
            val lNew = alpha * (w(t) - s(ph)) + (1 - alpha) * (l + b)
            b = beta * (lNew - l) + (1 - beta) * b
            s(ph) = gamma * (w(t) - lNew) + (1 - gamma) * s(ph)
            l = lNew
          }
          st = HwState(Nil, l, b, s.toList, st.n + 1, e.tsMs, e.eventId)
        } else {
          val ph = (st.n % m).toInt
          out += Out(userId, e.tsMs, e.eventId, e.value,
            Some(st.l + st.b + st.s(ph)))
          val lNew = alpha * (yq - st.s(ph)) + (1 - alpha) * (st.l + st.b)
          val bNew = beta * (lNew - st.l) + (1 - beta) * st.b
          st = st.copy(l = lNew, b = bNew,
            s = st.s.updated(ph, gamma * (yq - lNew) + (1 - gamma) * st.s(ph)),
            n = st.n + 1, lastTsMs = e.tsMs, lastEventId = e.eventId)
        }
      }
    }
    (st, out.result())
  }

  /** Streaming form: unbounded per-series one-step HW forecasts,
    * O(m) state, update mode. */
  def forecast(events: Dataset[Pt], m: Int, alpha: Double = 0.5,
               beta: Double = 0.25, gamma: Double = 0.25): Dataset[Out] = {
    implicit val longEnc = SqlEncoders.scalaLong
    implicit val stEnc = SqlEncoders.product[HwState]
    implicit val outEnc = SqlEncoders.product[Out]
    val fold = foldSeries(m, alpha, beta, gamma) _
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (k: Long, it: Iterator[Pt], state: GroupState[HwState]) => {
          val (st, out) = fold(k, it, state.getOption.getOrElse(empty))
          state.update(st)
          out.iterator
        })
  }

  /** Batch one-shot twin: the identical fold over a bounded table —
    * one series-keyed flatMapGroups, no state store. */
  def oneStepBatch(df: DataFrame, valueCol: String, tsCol: String,
                   seriesCol: String, idCol: String, m: Int,
                   alpha: Double = 0.5, beta: Double = 0.25,
                   gamma: Double = 0.25): Dataset[Out] = {
    val spark = df.sparkSession
    import spark.implicits._
    val fold = foldSeries(m, alpha, beta, gamma) _
    df.select(col(seriesCol).cast("long"),
        (col(tsCol).cast("double") * 1000).cast("long"),
        col(idCol).cast("long"), col(valueCol).cast("double"))
      .as[(Long, Long, Long, Double)]
      .map(t => Pt(t._1, t._2, t._3, t._4))
      .groupByKey(_.userId)
      .flatMapGroups((k: Long, it: Iterator[Pt]) => fold(k, it, empty)._2.iterator)
  }
}
