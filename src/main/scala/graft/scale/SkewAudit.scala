package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Join-key skew pre-flight audit — the "measure before you salt"
  * companion to `core/JoinOps.saltedJoin` and the AQE skew-join knobs:
  * one cheap pass that says whether a prospective join/groupBy key NEEDS
  * skew handling, and how bad it is.
  *
  * Scale shape: the corpus aggregates ONCE to per-key counts (the same
  * exchange the join itself would shuffle on, so the audit is strictly
  * cheaper than the join it de-risks); every statistic after that lives
  * on the counts table, whose cardinality is the key count, not the row
  * count. The Gini rank fold rides on [[Ranks.globalRank]] — no
  * single-partition window even for near-unique keys — and the top-k
  * share is a sort-limit (TakeOrderedAndProject: per-partition top-k +
  * driver merge, never a global sort). */
object SkewAudit {

  /** One-row skew profile of `df` grouped by `keyCol`:
    *
    *   - `n_keys`, `n_rows`, `max_count` — the raw shape
    *   - `max_share`   = max_count / n_rows (the single hottest key — the
    *     straggler-task bound: no partitioning can beat one key's mass)
    *   - `topk_share`  = Σ top-`topK` counts / n_rows (how concentrated
    *     the head is — the salting candidate list)
    *   - `gini`        = (2·Σᵢ rᵢ·cᵢ − (n+1)·Σc) / (n·Σc) over counts
    *     sorted ascending (rᵢ the exact 1-based rank) — 0 = uniform,
    *     →1 = one key owns everything
    *
    * Determinism: every term is an exact integer (ranks from
    * [[Ranks.globalRank]] with `keyCol` as the unique tie-break; the
    * Σ r·c fold accumulates in DECIMAL(38,0), so it is order-free and
    * overflow-safe past the BIGINT bound a 100-TB corpus with billions
    * of keys would hit) and the three shares are single IEEE divisions
    * of exact integers — bit-identical in any engine.
    *
    * `keyCol` must be (castable to) a non-negative BIGINT that uniquely
    * identifies the key (hash composite keys first). */
  def keySkewProfile(df: DataFrame, keyCol: Column,
                     topK: Int = 10): DataFrame = {
    require(topK >= 1, s"need topK >= 1, got $topK")
    val counts = df.groupBy(keyCol.as("k"))
      .agg(count(lit(1)).cast("long").as("c"))
    val ranked = Ranks.globalRank(counts, col("c"), col("k"),
      descending = false, out = "r")
    val agg = ranked.agg(
      count(lit(1)).cast("long").as("n_keys"),
      sum(col("c")).cast("long").as("n_rows"),
      max(col("c")).cast("long").as("max_count"),
      sum((col("r") * col("c")).cast(DecimalType(38, 0))).as("src"))
    val top = counts.orderBy(col("c").desc, col("k"))
      .limit(topK)
      .agg(coalesce(sum(col("c")), lit(0L)).cast("long").as("topk_rows"))
    agg.crossJoin(top).select(
      col("n_keys"), col("n_rows"), col("max_count"),
      (col("max_count").cast("double") / col("n_rows")).as("max_share"),
      (col("topk_rows").cast("double") / col("n_rows")).as("topk_share"),
      when(col("n_rows") > 0,
        (lit(2) * col("src") - (col("n_keys") + 1) * col("n_rows"))
          .cast("double") /
        (col("n_keys").cast("double") * col("n_rows").cast("double")))
        .as("gini"))
  }
}
