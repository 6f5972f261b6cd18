package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders => SqlEncoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-source token-budget gate — the online form of corpus
  * budget enforcement for an ingest stream: each source keeps documents
  * while its running token total stays within its cap, then closes.
  *
  * Semantics are STRICT-STOP PREFIX, not greedy knapsack: the first
  * document that would push a source past the cap closes the source for
  * good (emitted decisions are final — the [[OnlineForecast]] contract —
  * and a later "it would have fit" doc can't reopen a closed source
  * without retracting the stream's history). That choice makes the rule
  * exactly one window cumsum in batch: kept ⟺ cum(toks by id) ≤ cap,
  * monotone because token counts are non-negative — so the batch twin is
  * hash-checkable in plain SQL and the stream fold needs only
  * (running total, id frontier) per source: O(1) state, never a doc
  * buffer. Quality-RANKED selection at rest is [[graft.scale.Packing
  * .budgetSelect]]; this is its arrival-order streaming counterpart.
  *
  * Docs at or behind the id frontier drop (in-order arrival is the
  * stream's responsibility, as ascending-id order is the batch's). */
object StreamBudget {

  case class Doc(grp: String, id: Long, toks: Long)
  case class BudgetState(acc: Long, lastId: Long)
  case class Decision(grp: String, id: Long, toks: Long, kept: Boolean,
                      cumTokens: Long)

  def empty: BudgetState = BudgetState(0L, Long.MinValue)

  /** Advance one source over one in-order slice: accumulate every doc's
    * tokens (kept or not — the cumsum the decision rule reads), keep
    * while the running total is within the cap. */
  def foldGrp(cap: Long)(grp: String, docs: Iterator[Doc],
                         st0: BudgetState): (BudgetState, Seq[Decision]) = {
    var st = st0
    val out = Seq.newBuilder[Decision]
    for (d <- docs.toSeq.sortBy(_.id) if d.id > st.lastId) {
      st = BudgetState(st.acc + d.toks, d.id)
      out += Decision(grp, d.id, d.toks, st.acc <= cap, st.acc)
    }
    (st, out.result())
  }

  /** Streaming form: per-source decisions, O(1) state, update mode. */
  def assign(docs: Dataset[Doc], cap: Long): Dataset[Decision] = {
    implicit val stEnc = SqlEncoders.product[BudgetState]
    implicit val outEnc = SqlEncoders.product[Decision]
    implicit val strEnc = SqlEncoders.STRING
    val fold = foldGrp(cap) _
    docs.groupByKey(_.grp)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (k: String, it: Iterator[Doc], state: GroupState[BudgetState]) => {
          val (st, out) = fold(k, it, state.getOption.getOrElse(empty))
          state.update(st)
          out.iterator
        })
  }

  /** Batch one-shot twin: the identical fold over a bounded corpus —
    * token counts map-side, one source-keyed flatMapGroups. Equals the
    * plain-SQL window rule kept ⟺ cum ≤ cap (hash-checked). */
  def assignBatch(df: DataFrame, textCol: String, idCol: String,
                  groupCol: String, cap: Long): Dataset[Decision] = {
    val spark = df.sparkSession
    import spark.implicits._
    val fold = foldGrp(cap) _
    df.select(col(groupCol).cast("string"),
        col(idCol).cast("long"),
        graft.scale.Packing.tokenCount(col(textCol)))
      .as[(String, Long, Long)]
      .map(t => Doc(t._1, t._2, t._3))
      .groupByKey(_.grp)
      .flatMapGroups((k: String, it: Iterator[Doc]) =>
        fold(k, it, empty)._2.iterator)
  }
}
