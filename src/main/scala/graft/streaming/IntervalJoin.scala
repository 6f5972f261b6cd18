package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: pair events of the same key whose event
  * times fall within a bounded gap — "which follow-up happened within 30
  * minutes of which trigger". The batch form is a plain self-equi-join
  * on the key with a range predicate (oracle-checkable); the streaming
  * form is Spark's watermarked stream-stream inner join, where the time
  * bound is what lets the engine evict join state (each side keeps only
  * `maxGap + watermark` of history — without the bound, state grows
  * forever). The reference is batch-only; this is north-star surface.
  *
  * At scale the join shuffles both sides on the key once; the range
  * predicate is evaluated inside the joined partition, so cost is
  * per-key-density bounded, not corpus-quadratic. */
object IntervalJoin {

  /** Batch: ordered pairs (a before b, within `maxGapMinutes`) per user.
    * `a.event_id < b.event_id` would pair unrelated simultaneous events
    * both ways; the (ts, id) lexicographic order keeps exactly one
    * direction and is deterministic under duplicate timestamps. */
  def selfJoinBatch(events: DataFrame, maxGapMinutes: Int): DataFrame = {
    val a = events.select(col("user_id"), col("event_id").as("id_a"),
                          col("ts").as("ts_a"), col("event_type").as("type_a"))
    val b = events.select(col("user_id"), col("event_id").as("id_b"),
                          col("ts").as("ts_b"), col("event_type").as("type_b"))
    a.join(b, Seq("user_id"))
      .filter(col("ts_b") >= col("ts_a") && col("ts_b") <= col("ts_a") + expr(s"INTERVAL $maxGapMinutes MINUTES") &&
              (col("ts_a") < col("ts_b") || (col("ts_a") === col("ts_b") && col("id_a") < col("id_b"))))
      .select(col("user_id"), col("id_a"), col("id_b"), col("type_a"), col("type_b"),
              (col("ts_b").cast("double") - col("ts_a").cast("double")).as("gap_s"))
  }

  /** Batch twin of the LEFT OUTER variant: triggers with no follow-up
    * keep a row with null follow-up columns (oracle-checkable shape for
    * [[selfJoinStreamingOuter]]). */
  def selfJoinBatchOuter(events: DataFrame, maxGapMinutes: Int): DataFrame = {
    val a = events.select(col("user_id"), col("event_id").as("id_a"),
                          col("ts").as("ts_a"), col("event_type").as("type_a"))
    val b = events.select(col("user_id").as("user_b"), col("event_id").as("id_b"),
                          col("ts").as("ts_b"), col("event_type").as("type_b"))
    a.join(b,
        col("user_id") === col("user_b") &&
        col("ts_b") >= col("ts_a") &&
        col("ts_b") <= col("ts_a") + expr(s"INTERVAL $maxGapMinutes MINUTES") &&
        col("id_a") =!= col("id_b"), "left_outer")
      .select(col("user_id"), col("id_a"), col("id_b"), col("type_a"), col("type_b"),
              (col("ts_b").cast("double") - col("ts_a").cast("double")).as("gap_s"))
  }

  /** Streaming LEFT OUTER interval join: matched pairs emit immediately;
    * an unmatched trigger emits with null follow-up columns only once
    * the watermark has passed its whole match window — the earliest
    * moment the engine can PROVE no match will arrive. Same state bound
    * as the inner form (watermark + maxGap per side). */
  def selfJoinStreamingOuter(left: DataFrame, right: DataFrame,
                             maxGapMinutes: Int, delay: String = "1 hour"): DataFrame = {
    val a = left.select(col("user_id").as("user_a"), col("event_id").as("id_a"),
                        col("ts").as("ts_a"), col("event_type").as("type_a"))
      .withWatermark("ts_a", delay)
    val b = right.select(col("user_id").as("user_b"), col("event_id").as("id_b"),
                         col("ts").as("ts_b"), col("event_type").as("type_b"))
      .withWatermark("ts_b", delay)
    a.join(b,
        col("user_a") === col("user_b") &&
        col("ts_b") >= col("ts_a") &&
        col("ts_b") <= col("ts_a") + expr(s"INTERVAL $maxGapMinutes MINUTES") &&
        col("id_a") =!= col("id_b"), "leftOuter")
      .select(col("user_a").as("user_id"), col("id_a"), col("id_b"),
              col("type_a"), col("type_b"),
              (col("ts_b").cast("double") - col("ts_a").cast("double")).as("gap_s"))
  }

  /** Streaming twin: watermark both sides, join with the same key + time
    * bound. Spark derives the state-retention horizon from the interval
    * condition; rows older than watermark + maxGap are evicted. */
  def selfJoinStreaming(left: DataFrame, right: DataFrame,
                        maxGapMinutes: Int, delay: String = "1 hour"): DataFrame = {
    val a = left.select(col("user_id").as("user_a"), col("event_id").as("id_a"),
                        col("ts").as("ts_a"), col("event_type").as("type_a"))
      .withWatermark("ts_a", delay)
    val b = right.select(col("user_id").as("user_b"), col("event_id").as("id_b"),
                         col("ts").as("ts_b"), col("event_type").as("type_b"))
      .withWatermark("ts_b", delay)
    a.join(b,
        col("user_a") === col("user_b") &&
        col("ts_b") >= col("ts_a") &&
        col("ts_b") <= col("ts_a") + expr(s"INTERVAL $maxGapMinutes MINUTES") &&
        (col("ts_a") < col("ts_b") || (col("ts_a") === col("ts_b") && col("id_a") < col("id_b"))))
      .select(col("user_a").as("user_id"), col("id_a"), col("id_b"),
              col("type_a"), col("type_b"),
              (col("ts_b").cast("double") - col("ts_a").cast("double")).as("gap_s"))
  }
}
