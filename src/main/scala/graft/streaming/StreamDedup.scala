package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.scale.Dedup.exact]]: exact content dedup
  * over an unbounded stream. State is the set of content hashes seen
  * within the watermark horizon — `dropDuplicatesWithinWatermark` evicts
  * state older than the delay, so memory is bounded by the dedup window
  * instead of the stream's lifetime (the standard trade at 100 TB/day:
  * duplicates farther apart than the horizon are handled by a periodic
  * batch `Dedup.exact` compaction pass). */
object StreamDedup {

  /** Keep the first arrival of each distinct `textCol` content within the
    * watermark horizon. 128-bit content hash — collision-safe at corpus
    * scale; the hash is also the (bounded) state key, not the full text. */
  def exact(df: DataFrame, textCol: String, tsCol: String, delay: String): DataFrame =
    df.withColumn("text_hash", md5(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("text_hash")
}
