package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders => SqlEncoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming greedy sequence packing — the online form of
  * [[graft.scale.Packing.packGreedy]] for a corpus that arrives as a
  * stream (the ingest side of a pretraining pipeline): each document is
  * assigned to the open training sequence of its (group, shard) key, or
  * opens a new sequence when it would overflow the token budget.
  *
  * State is O(1) per key — open sequence id, its fill, and the id
  * frontier — never a buffer of docs. Documents at or behind the id
  * frontier DROP: an emitted assignment is final (the
  * [[OnlineForecast]] contract), and in-order arrival is the stream's
  * responsibility, exactly as ascending-id visit order is the batch
  * form's. The same fold (`foldShard`) runs the streaming
  * `flatMapGroupsWithState` path and the batch one-shot twin
  * ([[assignBatch]]), so streaming == batch parity is structural, and
  * aggregating the assignment stream per sequence reproduces
  * `packGreedy`'s output row-for-row (both spec-pinned; the batch twin
  * is hash-checked against the pk1 oracle). */
object StreamPack {

  case class Doc(grp: String, shard: Long, id: Long, toks: Long)
  case class PackState(seqId: Long, acc: Long, lastId: Long)
  case class Assign(grp: String, shard: Long, id: Long, toks: Long,
                    seqId: Long)

  def empty: PackState = PackState(0L, 0L, Long.MinValue)

  /** Advance one shard's packing over one in-order slice of docs,
    * emitting each doc's sequence assignment. Identical decision rule
    * to the batch fold: a new sequence opens when none is open or when
    * the doc would push the open one past `budget` (an over-budget doc
    * therefore gets a sequence of its own). */
  def foldShard(budget: Long)(key: (String, Long), docs: Iterator[Doc],
                              st0: PackState): (PackState, Seq[Assign]) = {
    var st = st0
    val out = Seq.newBuilder[Assign]
    for (d <- docs.toSeq.sortBy(_.id) if d.id > st.lastId) {
      st =
        if (st.seqId == 0L || st.acc + d.toks > budget)
          PackState(st.seqId + 1, d.toks, d.id)
        else PackState(st.seqId, st.acc + d.toks, d.id)
      out += Assign(key._1, key._2, d.id, d.toks, st.seqId)
    }
    (st, out.result())
  }

  /** Streaming form: unbounded per-(group, shard) assignments, O(1)
    * state, update mode. */
  def assign(docs: Dataset[Doc], budget: Long): Dataset[Assign] = {
    implicit val keyEnc = SqlEncoders.product[(String, Long)]
    implicit val stEnc = SqlEncoders.product[PackState]
    implicit val outEnc = SqlEncoders.product[Assign]
    val fold = foldShard(budget) _
    docs.groupByKey(d => (d.grp, d.shard))
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (k: (String, Long), it: Iterator[Doc], state: GroupState[PackState]) => {
          val (st, out) = fold(k, it, state.getOption.getOrElse(empty))
          state.update(st)
          out.iterator
        })
  }

  /** Batch one-shot twin: the identical fold over a bounded corpus —
    * token counts map-side, one shard-keyed flatMapGroups, no state
    * store. Aggregated per sequence it IS `packGreedy`. */
  def assignBatch(df: DataFrame, textCol: String, idCol: String,
                  groupCol: String, budget: Long,
                  shards: Int = 8): Dataset[Assign] = {
    val spark = df.sparkSession
    import spark.implicits._
    val fold = foldShard(budget) _
    df.select(col(groupCol).cast("string"),
        pmod(col(idCol), lit(shards.toLong)),
        col(idCol).cast("long"),
        graft.scale.Packing.tokenCount(col(textCol)))
      .as[(String, Long, Long, Long)]
      .map(t => Doc(t._1, t._2, t._3, t._4))
      .groupByKey(d => (d.grp, d.shard))
      .flatMapGroups((k: (String, Long), it: Iterator[Doc]) =>
        fold(k, it, empty)._2.iterator)
  }
}
