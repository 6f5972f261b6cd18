package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batch construction: greedily pack
  * documents into fixed-token-budget training sequences (the step after
  * curation/dedup that turns a document corpus into model inputs; see
  * e.g. the packing discussion in Raffel et al. 2020, "Exploring the
  * Limits of Transfer Learning", arXiv:1910.10683 §2.2 — examples are
  * concatenated and split to fill the sequence length).
  *
  * Greedy first-fit in a FIXED document order is the deterministic,
  * shardable form: within each (group, shard) the docs are visited in
  * ascending id and a new sequence starts whenever adding the next doc
  * would overflow `budget` (a doc longer than the budget gets a
  * sequence of its own — packing never truncates; truncation is the
  * trainer's policy decision).
  *
  * 100-TB shape: the token count is computed MAP-SIDE from the text and
  * only (group, shard, id, n_tok) — ~40 bytes/doc — ever shuffles; the
  * document text itself never moves. The greedy fold is inherently
  * sequential per shard, so parallelism comes from the shard fan-out:
  * `shards` is the knob that bounds docs-per-task (pick shards ≈
  * corpusDocs / 10M for ~10M-doc tasks of 40 MB each). Sharding changes
  * WHICH docs pack together — any fixed partition of the corpus is an
  * equally valid packing universe; what matters is determinism, which
  * `pmod(id, shards)` gives independent of cluster layout. */
object Packing {

  /** The §2.8 BPE-ish token pattern shared with `x4_token_count` —
    * alnum runs or single non-space symbols. */
  val tokPattern = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"

  def tokenCount(textCol: Column): Column =
    size(regexp_extract_all(textCol, lit(tokPattern), lit(0))).cast("long")

  /** Length-bucketed batching accounting (the bucket_by_sequence_length
    * recipe every varlen seq2seq/encoder trainer runs when it does NOT
    * concatenate-pack): each doc pads to the smallest bucket boundary
    * that fits it, batches form within a bucket, and the padding bill is
    * what bucketing saves vs padding everything to the max. One row per
    * (group, bucket): doc/batch counts, real and padded token mass, and
    * the fill rate. Docs over the last boundary report as bucket 0
    * (oversize — the trainer's truncation policy decision, not ours).
    *
    * Pure map-side bucket assignment + one |groups|·|buckets| aggregate —
    * at 100 TB this is scan-speed accounting. */
  def lengthBuckets(df: DataFrame, textCol: String, idCol: String,
                    groupCol: String, bounds: Seq[Long],
                    batchSize: Int = 32): DataFrame = {
    require(bounds.nonEmpty && bounds == bounds.sorted, "sorted bounds")
    require(batchSize >= 1, s"need batchSize >= 1, got $batchSize")
    val toks = tokenCount(col(textCol))
    val bucket = bounds.foldRight(lit(0L): Column)((b, acc) =>
      when(col("__toks") <= b, lit(b)).otherwise(acc))
    df.withColumn("__toks", toks)
      .withColumn("bucket", bucket)
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("__toks")).as("n_tokens"),
           sum(when(col("bucket") > 0L, col("bucket") - col("__toks"))
             .otherwise(0L)).as("pad_tokens"))
      .withColumn("n_batches",
        expr(s"(n_docs + ${batchSize - 1}) div $batchSize"))
      .withColumn("fill_permille",
        when(col("bucket") > 0L,
          floor(col("n_tokens").cast("double")
            / (col("bucket") * col("n_docs")) * 1000 + 0.5).cast("long")))
  }

  /** Per-sequence packing stats: (group, shard, seq_id, n_docs,
    * n_tokens), seq_id 1-based in doc-id order within its shard. */
  def packGreedy(df: DataFrame, textCol: String, idCol: String,
                 groupCol: String, budget: Long,
                 shards: Int = 8): DataFrame =
    packGreedyCounts(
      df.withColumn("__toks", tokenCount(col(textCol))),
      "__toks", idCol, groupCol, budget, shards)

  /** [[packGreedy]] over PRE-COMPUTED token counts — the composition
    * point for pipelines that already carry `n_tok` (selection →
    * packing chains tokenize once). */
  def packGreedyCounts(df: DataFrame, toksCol: String, idCol: String,
                       groupCol: String, budget: Long,
                       shards: Int = 8): DataFrame = {
    require(budget >= 1, s"need budget >= 1, got $budget")
    require(shards >= 1, s"need shards >= 1, got $shards")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string").as("grp"),
              pmod(col(idCol), lit(shards.toLong)).as("shard"),
              col(idCol).cast("long").as("id"),
              col(toksCol).cast("long").as("toks"))
      .as[(String, Long, Long, Long)]
      .groupByKey(t => (t._1, t._2))
      .flatMapGroups { (key: (String, Long), it: Iterator[(String, Long, Long, Long)]) =>
        val (grp, shard) = key
        // one shard folds in one task; memory = 16 B/doc, bounded by the
        // shard fan-out contract above
        val docs = it.map(t => (t._3, t._4)).toArray.sortBy(_._1)
        var seq = 0L; var acc = 0L; var nDocs = 0L
        val out = Iterator.newBuilder[(String, Long, Long, Long, Long)]
        for ((_, toks) <- docs) {
          if (seq == 0L || acc + toks > budget) {
            if (seq > 0L) out += ((grp, shard, seq, nDocs, acc))
            seq += 1; acc = toks; nDocs = 1
          } else { acc += toks; nDocs += 1 }
        }
        if (seq > 0L) out += ((grp, shard, seq, nDocs, acc))
        out.result()
      }
      .toDF("grp", "shard", "seq_id", "n_docs", "n_tokens")
      .withColumnRenamed("grp", groupCol)
  }

  /** Token-budget corpus selection (the FineWeb/DataComp-style step:
    * given a training-token budget, keep the highest-quality slice of
    * the corpus). SEMANTICS: rank every doc by (quality DESC, md5(id)
    * ASC, id ASC) — quality on [[TextAnalysis.qualityScore]]'s 2-decimal
    * grid, the content hash breaking score ties as an unbiased draw —
    * and keep the longest prefix whose running token total stays within
    * `budgetNum/budgetDen` of the corpus's total tokens.
    *
    * 100-TB shape: exact prefix selection WITHOUT a global sort, by
    * three-level threshold refinement (the `sm9` order-statistic
    * discipline, applied twice more at the boundary):
    *   L1 — cumulative over the ≤ 101-row distinct-score grid finds the
    *        boundary score q*; groups strictly inside the budget keep
    *        every doc.
    *   L2 — the q* group alone is histogrammed by its md5 3-hex-char
    *        prefix (4096 buckets, lexicographic = hash order); the
    *        bucket cumulative finds the boundary bucket b*.
    *   L3 — only the (q*, b*) docs — corpus/4096 of one score group —
    *        take a real (hash, id)-ordered window to cut the prefix
    *        exactly.
    * Every reduced table broadcasts back; the corpus itself is scanned
    * map-side, shuffled only for the final per-group aggregate.
    *
    * Returns one row per `groupCol` value: docs and tokens kept. */
  def budgetSelect(df: DataFrame, textCol: String, idCol: String,
                   groupCol: String, budgetNum: Long = 2L,
                   budgetDen: Long = 5L,
                   checkpointDir: Option[String] = None): DataFrame = {
    val c = cutFrames(df, textCol, idCol, groupCol, budgetNum, budgetDen,
      checkpointDir)
    // aggregate form: L1/L2 whole keeps come from the (grp, ·) grids —
    // the corpus pays ONE full text pass (gridG) plus the boundary-group
    // and boundary-bucket passes, never a per-doc keep1/keep2 rescan
    val keep1 = c.gridG.join(broadcast(c.keepQ), Seq("q"))
      .select(col("grp"), col("gn"), col("gtok"))
    val keep2 = c.bg.join(broadcast(c.keepB), Seq("bkt"))
      .select(col("grp"), col("bn").as("gn"), col("btok").as("gtok"))
    val keep3 = boundaryCut(c)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("gn"), sum(col("toks")).as("gtok"))
    keep1.unionByName(keep2).unionByName(keep3)
      .groupBy(col("grp"))
      .agg(sum(col("gn")).as("n_kept"), sum(col("gtok")).as("tok_kept"))
      .withColumnRenamed("grp", groupCol)
  }

  /** [[budgetSelect]]'s doc-level form: the kept rows themselves as
    * (groupCol, id, toks) — the composition point for selection →
    * packing pipelines. Same semantics, same cut frames; the whole-keep
    * legs join the corpus against the broadcast grids instead of
    * pre-aggregating (per-doc output forces the rescan). */
  def budgetSelectDocs(df: DataFrame, textCol: String, idCol: String,
                       groupCol: String, budgetNum: Long = 2L,
                       budgetDen: Long = 5L,
                       checkpointDir: Option[String] = None): DataFrame = {
    val c = cutFrames(df, textCol, idCol, groupCol, budgetNum, budgetDen,
      checkpointDir)
    val keep1 = c.scored.join(broadcast(c.keepQ), Seq("q"))
      .select(col("grp"), col("id"), col("toks"))
    val keep2 = c.bdocs.join(broadcast(c.keepB), Seq("bkt"))
      .select(col("grp"), col("id"), col("toks"))
    val keep3 = boundaryCut(c).select(col("grp"), col("id"), col("toks"))
    keep1.unionByName(keep2).unionByName(keep3)
      .withColumnRenamed("grp", groupCol)
  }

  private case class CutFrames(scored: DataFrame, gridG: DataFrame,
                               keepQ: DataFrame, bdocs: DataFrame,
                               bg: DataFrame, keepB: DataFrame,
                               bBound: DataFrame)

  /** The shared three-level cut: score the corpus, find the boundary
    * score group (L1) and boundary hash bucket (L2), and hand back the
    * tiny keep/boundary frames both output forms assemble from. */
  private def cutFrames(df: DataFrame, textCol: String, idCol: String,
                        groupCol: String, budgetNum: Long,
                        budgetDen: Long,
                        checkpointDir: Option[String] = None): CutFrames = {
    import org.apache.spark.sql.expressions.Window
    require(budgetNum >= 0 && budgetDen > 0 && budgetNum <= budgetDen,
      s"need a budget fraction in [0,1], got $budgetNum/$budgetDen")
    val q = floor(col("quality") * lit(100.0) + lit(0.5)) / lit(100.0)
    // the scored frame is consumed 2-3× downstream (the L1 grid, the
    // boundary-group rescan, and budgetSelectDocs' whole-keep leg); it is
    // ~40 B/doc of (grp, id, q, toks, h) — materialize it ONCE so the
    // expensive text pass (regexp tokenize + stopword filter + md5) never
    // re-runs (guide §8: decide on small rows; the corpus pays one scan).
    // localCheckpoint rather than persist: lineage is cut, the blocks are
    // released by the ContextCleaner when the frame goes out of scope, and
    // no unpersist hook has to ride the returned doc-level stream.
    val scored = Lineage.truncate(
      TextAnalysis.qualityScore(df, textCol)
        .select(col(groupCol).as("grp"), col(idCol).as("id"), q.as("q"),
                tokenCount(col(textCol)).as("toks"),
                md5(col(idCol).cast("string")).as("h")), checkpointDir)
    val gridG = scored.groupBy(col("grp"), col("q"))
      .agg(count(lit(1)).as("gn"), sum(col("toks")).as("gtok"))
    val budgetCol = floor(col("total") * lit(budgetNum.toDouble) /
                          lit(budgetDen.toDouble)).cast("long")
    val total = gridG.agg(sum(col("gtok")).as("total"))
      .select(budgetCol.as("budget"))
    // L1: score grid (≤ 101 rows; single-task window over the GRID only)
    val wq = Window.orderBy(col("q").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val grid = gridG.groupBy(col("q")).agg(sum(col("gtok")).as("gtok"))
      .crossJoin(broadcast(total))
      .withColumn("cum", sum(col("gtok")).over(wq))
      .withColumn("prev", col("cum") - col("gtok"))
    val keepQ = grid.filter(col("cum") <= col("budget")).select(col("q"))
    // 0 or 1 row: the score group straddling the budget + its remainder
    val qBound = grid.filter(col("cum") > col("budget") &&
                             col("prev") <= col("budget"))
      .select(col("q").as("qb"), (col("budget") - col("prev")).as("rem"))
    // L2: boundary group histogram over the 4096 md5-prefix buckets
    // (prefix order = hash order, so bucket cumulation preserves rank),
    // reduced per (grp, bkt) in ONE pass over the boundary group
    val bdocs = scored.join(broadcast(qBound), col("q") === col("qb"))
      .withColumn("bkt", substring(col("h"), 1, 3))
    val bg = bdocs.groupBy(col("grp"), col("bkt"), col("rem"))
      .agg(count(lit(1)).as("bn"), sum(col("toks")).as("btok"))
    val wb = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val hist = bg.groupBy(col("bkt"), col("rem"))
      .agg(sum(col("btok")).as("htok"))
      .withColumn("cum2", sum(col("htok")).over(wb))
      .withColumn("prev2", col("cum2") - col("htok"))
    val keepB = hist.filter(col("cum2") <= col("rem")).select(col("bkt"))
    val bBound = hist.filter(col("cum2") > col("rem") &&
                             col("prev2") <= col("rem"))
      .select(col("bkt").as("bb"), (col("rem") - col("prev2")).as("rem2"))
    CutFrames(scored, gridG, keepQ, bdocs, bg, keepB, bBound)
  }

  /** L3: the exact (hash, id)-ordered prefix cut inside the single
    * boundary bucket — a bounded partition (corpus/4096 of one score
    * group). Returns the kept boundary-bucket rows. */
  private def boundaryCut(c: CutFrames): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w3 = Window.partitionBy(col("bkt")).orderBy(col("h"), col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    c.bdocs.join(broadcast(c.bBound), col("bkt") === col("bb"))
      .withColumn("cum3", sum(col("toks")).over(w3))
      .filter(col("cum3") <= col("rem2"))
  }

  /** PK3 — deterministic balanced token sharding for training-shard
    * output: rank every doc by (toks DESC, md5(id), id) and deal the
    * ranks onto `nShards` in a snake (boustrophedon) pattern — block b
    * deals ranks b·N..b·N+N−1 left-to-right when b is even, right-to-
    * left when odd — so every shard takes one doc per size block and
    * the final token imbalance is bounded by the largest single
    * document, independent of corpus size (LPT-style balance without
    * LPT's sequential bin state).
    *
    * The global rank is computed WITHOUT a global single-task sort (the
    * d11 lesson): a (toks → count) grid — bounded by distinct doc
    * lengths, thousands of rows at any corpus size — gives every toks
    * value its global rank offset via one tiny unpartitioned window,
    * and docs then rank only WITHIN their toks group (partitioned
    * window on a bounded key). The corpus shuffles once, carrying
    * ~40 bytes/doc; text never moves — shard writing joins the
    * (id → shard) map back hash-partitioned on id.
    *
    * Returns one row per shard: (shard, n_docs, n_tokens). */
  def snakeShard(df: DataFrame, textCol: String, idCol: String,
                 nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards >= 1, s"need nShards >= 1, got $nShards")
    val docs = df.select(col(idCol).cast("long").as("id"),
                         tokenCount(col(textCol)).as("toks"),
                         md5(col(idCol).cast("string")).as("h"))
    val grid = docs.groupBy(col("toks")).agg(count(lit(1)).as("n"))
    // bounded input: |grid| = distinct token counts, not corpus rows
    val wg = Window.orderBy(col("toks").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = grid
      .withColumn("off", coalesce(sum(col("n")).over(wg), lit(0L)))
      .select(col("toks"), col("off"))
    val wt = Window.partitionBy(col("toks")).orderBy(col("h"), col("id"))
    val n = lit(nShards.toLong)
    val ranked = docs.join(broadcast(offs), Seq("toks"))
      .withColumn("r", row_number().over(wt).cast("long") + col("off") - 1L)
    val pos = pmod(col("r"), n)
    val block = ((col("r") - pos) / n).cast("long")
    val shard = when(pmod(block, lit(2L)) === 0L, pos)
      .otherwise(n - 1L - pos)
    ranked.withColumn("shard", shard.cast("long"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
  }

  /** First-fit-DECREASING packing per (group, shard) — the bin-packing
    * QUALITY upgrade over [[packGreedy]]'s next-fit-in-id-order: docs
    * sort by (toks DESC, id) and each goes into the FIRST open sequence
    * with room, a new one only when none fits. FFD is the classic
    * 11/9·OPT + 6/9 guarantee (Johnson 1973; Dósa 2007 for the tight
    * constant) where next-fit can burn ~2·OPT bins — on a padded
    * training batch that difference is pure wasted compute.
    *
    * Same 100-TB shape as pk1: token counts map-side (text never
    * shuffles, ~16 B/doc moves), ONE shard folds per task, state =
    * O(open bins). Over-budget docs open their own single-doc sequence
    * (the pk1 rule). `seq_id` is bin CREATION order, deterministic.
    * Oracle: the identical placement replayed in a recursive CTE whose
    * state is the open-bin fill/count LISTS (the HW list-state
    * discipline). */
  def packFfd(df: DataFrame, textCol: String, idCol: String,
              groupCol: String, budget: Long,
              shards: Int = 8): DataFrame =
    packFfdCounts(
      df.withColumn("__toks", tokenCount(col(textCol))),
      "__toks", idCol, groupCol, budget, shards)

  /** [[packFfd]] over pre-computed token counts. */
  def packFfdCounts(df: DataFrame, toksCol: String, idCol: String,
                    groupCol: String, budget: Long,
                    shards: Int = 8): DataFrame = {
    require(budget >= 1, s"need budget >= 1, got $budget")
    require(shards >= 1, s"need shards >= 1, got $shards")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string").as("grp"),
              pmod(col(idCol), lit(shards.toLong)).as("shard"),
              col(idCol).cast("long").as("id"),
              col(toksCol).cast("long").as("toks"))
      .as[(String, Long, Long, Long)]
      .groupByKey(t => (t._1, t._2))
      .flatMapGroups { (key: (String, Long), it: Iterator[(String, Long, Long, Long)]) =>
        val (grp, shard) = key
        val docs = it.map(t => (t._3, t._4)).toArray
          .sortBy { case (id, toks) => (-toks, id) }
        // first-fit via a max-remaining segment tree over bins: the
        // FIRST bin with room is found in O(log B), not O(B) — the
        // naive scan is O(n·B) per shard, quadratic as the shard grows,
        // and placement is IDENTICAL (leftmost feasible bin either way,
        // which is what the oracle's list_position replay checks)
        val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
        val cnts = scala.collection.mutable.ArrayBuffer.empty[Long]
        var cap = 1
        var mx = new Array[Long](2 * cap) // max remaining per subtree
        def place(i: Int, rem: Long): Unit = {
          var n = cap + i; mx(n) = rem; n >>= 1
          while (n >= 1) { mx(n) = math.max(mx(2 * n), mx(2 * n + 1)); n >>= 1 }
        }
        for ((_, toks) <- docs) {
          if (fills.nonEmpty && mx(1) >= toks) {
            var n = 1 // descend to the LEFTMOST leaf with remaining >= toks
            while (n < cap) n = if (mx(2 * n) >= toks) 2 * n else 2 * n + 1
            val i = n - cap
            fills(i) += toks; cnts(i) += 1
            place(i, budget - fills(i))
          } else {
            if (fills.length == cap) { // grow: rebuild the doubled tree
              cap *= 2
              mx = new Array[Long](2 * cap)
              for (j <- fills.indices) mx(cap + j) = budget - fills(j)
              for (n <- cap - 1 to 1 by -1) mx(n) = math.max(mx(2 * n), mx(2 * n + 1))
            }
            fills += toks; cnts += 1L
            place(fills.length - 1, budget - toks)
          }
        }
        fills.indices.iterator.map { i =>
          (grp, shard, (i + 1).toLong, cnts(i), fills(i))
        }
      }
      .toDF("grp", "shard", "seq_id", "n_docs", "n_tokens")
      .withColumnRenamed("grp", groupCol)
  }
}
