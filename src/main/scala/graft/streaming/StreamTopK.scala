package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders => SqlEncoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters via Space-Saving (Metwally et al. 2005,
  * "Efficient Computation of Frequent and Top-k Elements in Data
  * Streams"): each shard keeps at most `m` counters; an untracked
  * arrival evicts the minimum counter and inherits its count as its
  * error bound. Guarantees per entry: true ≤ count AND count − err ≤
  * true; any key with true frequency > N/m is guaranteed tracked.
  *
  * Scale shape: keys are SHARDED (hash mod nShards), not replicated —
  * each key's traffic lands on exactly one shard, so the global top-k is
  * the top-k of the shard union and state is O(nShards·m) regardless of
  * stream length or vocabulary. This is the unbounded-vocabulary
  * complement to watermarked windowed counts (EventWindows): those give
  * exact counts over a bounded time window; this gives bounded-error
  * counts over the WHOLE stream with fixed memory. The batch twin
  * (`st_topk`'s exact count) is the oracle; the sketch's estimates are
  * arrival-order-dependent BETWEEN the bounds (a sketch property, not a
  * bug), so cross-batch parity is spec-pinned where m covers the shard
  * vocabulary and only the bounds are asserted where it does not. */
object StreamTopK {

  case class Item(shard: Int, key: String)
  case class SSEntry(key: String, count: Long, err: Long)
  case class Sketch(entries: Seq[SSEntry])
  case class HH(shard: Int, key: String, count: Long, err: Long)

  /** Deterministic shard of a key (String.hashCode is spec-pinned). */
  def shardOf(key: String, nShards: Int): Int =
    math.floorMod(key.hashCode, nShards)

  /** Offer one arrival into a capacity-m table. Eviction is
    * deterministic: (smallest count, then smallest key). */
  def offer(t: Map[String, (Long, Long)], x: String,
                               m: Int): Map[String, (Long, Long)] =
    t.get(x) match {
      case Some((c, e))       => t.updated(x, (c + 1, e))
      case None if t.size < m => t.updated(x, (1L, 0L))
      case None =>
        val (evK, (evC, _)) = t.minBy { case (k, (c, _)) => (c, k) }
        (t - evK).updated(x, (evC + 1, evC))
    }

  /** Merge one micro-batch of a shard's arrivals into its sketch state;
    * emit the shard's full table (Update-mode semantics: downstream
    * keeps the latest emission per shard). */
  def step(shard: Int, it: Iterator[Item], state: GroupState[Sketch],
           m: Int): Iterator[HH] = {
    var t: Map[String, (Long, Long)] = state.getOption
      .map(_.entries.map(e => e.key -> ((e.count, e.err))).toMap)
      .getOrElse(Map.empty)
    it.foreach(x => t = offer(t, x.key, m))
    state.update(Sketch(t.toSeq.map { case (k, (c, e)) => SSEntry(k, c, e) }
      .sortBy(e => (-e.count, e.key))))
    t.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
      .map { case (k, (c, e)) => HH(shard, k, c, e) }.iterator
  }

  /** Sharded Space-Saving over a stream of keys. */
  def heavyHitters(keys: Dataset[String], m: Int,
                   nShards: Int = 16): Dataset[HH] = {
    implicit val itemEnc = SqlEncoders.product[Item]
    implicit val intEnc = SqlEncoders.scalaInt
    implicit val hhEnc = SqlEncoders.product[HH]
    implicit val skEnc = SqlEncoders.product[Sketch]
    keys.map(k => Item(shardOf(k, nShards), k))
      .groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (s: Int, it: Iterator[Item], st: GroupState[Sketch]) => step(s, it, st, m))
  }
}
