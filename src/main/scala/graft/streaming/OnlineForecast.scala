package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders => SqlEncoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online per-series trend forecasting — the streaming form of the
  * reference's recursive-forecast loop (`auto_ts/models/build_ml.py:595-670`
  * feeds one row at a time through a fitted model; here the model itself
  * is refit incrementally as rows arrive). Each event gets a one-step-ahead
  * forecast from an expanding-window OLS trend over all PRIOR events of its
  * series: ŷ_t = α + β·t fit on (1..t−1). The sufficient statistics
  * (n, Σy, Σt·y) are O(1) per series — the time-index sums Σt, Σt² are
  * closed-form — so streaming state is 3 numbers per series, never a
  * window of rows.
  *
  * [[expandingTrendBatch]] is the deterministic batch twin (one window
  * shuffle, oracle-checked as `st_forecast`); [[forecast]] is the
  * `flatMapGroupsWithState` streaming form, spec-pinned to agree with the
  * batch twin on any in-order micro-batch split. Late events (at or behind
  * the series frontier) are DROPPED — the emitted forecast for a step is
  * final, and rewinding state would silently corrupt everything after it. */
object OnlineForecast {

  case class Pt(userId: Long, tsMs: Long, eventId: Long, value: Double)
  case class TrendState(n: Long, sy: Double, sty: Double,
                        lastTsMs: Long, lastEventId: Long)
  case class Forecast(userId: Long, tsMs: Long, eventId: Long,
                      y: Double, yhat: Option[Double])

  /** One-step-ahead ŷ from the sufficient statistics (t = n+1 is the
    * index being predicted). n = 0 → None; n = 1 → the single prior value
    * (OLS needs two points); else closed-form simple regression with
    * Σt = n(n+1)/2 and Σt² = n(n+1)(2n+1)/6 exact in Long. */
  private def predict(st: TrendState): Option[Double] = st.n match {
    case 0 => None
    case 1 => Some(st.sy)
    case n =>
      val stS = (n * (n + 1) / 2).toDouble
      val stt = (n * (n + 1) * (2 * n + 1) / 6).toDouble
      val nd = n.toDouble
      val slope = (nd * st.sty - stS * st.sy) / (nd * stt - stS * stS)
      val icept = (st.sy - slope * stS) / nd
      Some(icept + slope * (nd + 1.0))
  }

  /** Fold one micro-batch of a series (sorted by event time, event-id
    * ties) into the running trend: emit the forecast made BEFORE each
    * observation, then absorb it. Events at or behind the (ts, eventId)
    * frontier are dropped — see the lateness contract above. */
  def step(userId: Long, events: Iterator[Pt],
           state: GroupState[TrendState]): Iterator[Forecast] = {
    var st = state.getOption.getOrElse(TrendState(0L, 0.0, 0.0, Long.MinValue, Long.MinValue))
    val out = Seq.newBuilder[Forecast]
    for (e <- events.toSeq.sortBy(p => (p.tsMs, p.eventId))) {
      val late = e.tsMs < st.lastTsMs ||
        (e.tsMs == st.lastTsMs && e.eventId <= st.lastEventId)
      if (!late) {
        out += Forecast(userId, e.tsMs, e.eventId, e.value, predict(st))
        // same cent-quantization as the batch twin so the two stay in
        // lockstep (the twin needs it for exact cross-engine sums)
        val y2 = math.floor(e.value * 100.0 + 0.5) / 100.0
        val t = st.n + 1
        st = TrendState(t, st.sy + y2, st.sty + y2 * t, e.tsMs, e.eventId)
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** Streaming form: per-series expanding-trend forecasts over an
    * unbounded stream, O(1) state per series. Update mode. */
  def forecast(events: Dataset[Pt]): Dataset[Forecast] = {
    implicit val longEnc = SqlEncoders.scalaLong
    implicit val stEnc = SqlEncoders.product[TrendState]
    implicit val outEnc = SqlEncoders.product[Forecast]
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (k: Long, it: Iterator[Pt], s: GroupState[TrendState]) => step(k, it, s))
  }

  /** Deterministic batch twin: the same one-step-ahead expanding OLS
    * forecast for every event, as ONE window pass (a single shuffle on
    * the series key; the two WindowExecs share its sort). The time-index
    * sums are closed-form in the row number; Σy and Σt·y accumulate in
    * EXACT decimal(·,2) after a cent-quantization of the value (the
    * Det.moneySum discipline) — windowed float sums are
    * association-order-dependent across engines, and the slope's
    * cancellation amplifies that ulp right onto rounding boundaries, so
    * the sums must be exact, not just ordered. Every remaining operation
    * is a scalar double op on identical inputs → bit-identical yhat. */
  def expandingTrendBatch(df: DataFrame, valueCol: String, tsCol: String,
                          seriesCols: Seq[String], tieCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((col(tsCol) +: tieCols.map(col)): _*)
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    val v2 = (floor(col(valueCol) * lit(100.0) + lit(0.5)) / lit(100.0))
      .cast("decimal(18,2)")
    val n = (col("rn") - 1).cast("double")
    val stS = (col("rn") - 1) * col("rn") / lit(2.0)
    val stt = (col("rn") - 1) * col("rn") * (lit(2) * col("rn") - 1) / lit(6.0)
    val slope = (n * col("sty") - stS * col("sy")) / (n * stt - stS * stS)
    val icept = (col("sy") - slope * stS) / n
    df.withColumn("rn", row_number().over(w))
      .withColumn("sy", sum(v2).over(prior).cast("double"))
      .withColumn("sty", sum(v2 * col("rn")).over(prior).cast("double"))
      .withColumn("yhat",
        when(col("rn") === 1, lit(null).cast("double"))
          .when(col("rn") === 2, col("sy"))
          .otherwise(icept + slope * col("rn").cast("double")))
      .drop("rn", "sy", "sty")
  }
}
