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

  /** Row shape shared by the streaming and batch near-dup paths. `ts`
    * keeps the WATERMARKED event-time column itself (projecting it to a
    * long would strip the watermark tag the stateful operator needs). */
  case class SigDoc(id: Long, ts: java.sql.Timestamp, sig: Long, block: Int) {
    def tsMs: Long = ts.getTime
  }

  /** A 60-bit SimHash whose token hash is the md5 prefix instead of
    * xxhash64 — IDENTICAL semantics to [[graft.functions.SimHashSig]]
    * (space-split multiset, ±1 per bit, sign), but replayable in any
    * engine with md5 (the DuckDB-oracle path: `st_neardup_w`,
    * `d4_simhash_w`). 60 bits = 15 hex digits, the widest md5 prefix
    * that fits a signed BIGINT in both engines.
    *
    * The token-hash array is bound ONCE through a 1-element `transform`
    * lambda (the `hs ->` below) so each token is md5'ed exactly once;
    * the 60 bit passes then re-scan only the Long array. (The first
    * version recomputed split+md5 inside the bit loop — 60× the hash
    * work; caught when `d4_simhash_w` landed at 20 s in the r15 bench.)
    * `shiftright(h, b)` instead of `h >> b` because Spark's SQL parser
    * rejects `>>` in any expression that also contains `array(` (the
    * nested-generic-type `>>` special case); identical semantics on
    * these positive 60-bit values. Still slower than the codegen
    * expression — use SimHashSig on hot paths and this where
    * cross-engine verifiability matters. */
  def md5SimHash(textCol: String): org.apache.spark.sql.Column = expr(
    s"""element_at(transform(array(
          transform(split($textCol, ' '),
            w -> CAST(conv(substr(md5(w), 1, 15), 16, 10) AS BIGINT))),
          hs -> aggregate(sequence(0, 59), CAST(0 AS BIGINT), (acc, b) ->
            acc + CASE WHEN aggregate(hs, CAST(0 AS BIGINT),
                (s, h) -> s + CASE WHEN (shiftright(h, CAST(b AS INT)) & 1) = 1
                  THEN 1 ELSE -1 END) > 0
              THEN shiftleft(CAST(1 AS BIGINT), b)
              ELSE CAST(0 AS BIGINT) END)), 1)""")

  private def sigDocs(df: DataFrame, textCol: String, idCol: String,
                      tsCol: String, blockIdx: Int,
                      sigExpr: Option[org.apache.spark.sql.Column] = None) = {
    import df.sparkSession.implicits._
    // rows with a null text, id, OR timestamp are DROPPED: a fingerprint
    // (or event-time position) cannot be computed for them (filter
    // upstream if they must be retained) — without this, the encoder's
    // non-nullable fields / SigDoc.tsMs would kill the whole query
    df.filter(col(textCol).isNotNull && col(idCol).isNotNull &&
              col(tsCol).isNotNull)
      .withColumn("__sig",
        sigExpr.getOrElse(graft.functions.SimHashSig(col(textCol))))
      .select(col(idCol).cast("long").as("id"),
              col(tsCol).as("ts"),
              col("__sig").as("sig"),
              shiftrightunsigned(col("__sig"), blockIdx * 16)
                .bitwiseAND(lit(0xFFFFL)).cast("int").as("block"))
      .as[SigDoc]
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Greedy first-arrival near-dup suppression within one SimHash block:
    * docs are visited in (ts, id) order; a doc is SUPPRESSED when a
    * previously-KEPT doc in the same 16-bit block is within `maxHamming`
    * bits — survivors only, so a chain a≈b≈c keeps a and drops both b
    * and c (the curation policy: one representative per near-dup chain,
    * same greedy semantics as the streaming path below).
    *
    * Recall, stated precisely: keying by ONE block catches the Hamming-
    * ≤3 pairs whose differing bits all fall OUTSIDE that block (≥ 1/4 of
    * pairs by pigeonhole, ~3/4 empirically for spread bits). This is the
    * deliberate trade for O(per-block) state; the full-recall pigeonhole
    * JOIN over all 4 blocks is [[compactSurvivors]], the batch
    * compaction pass this operator is complemented by on the ingest hot
    * path.
    *
    * Cost bound, stated like the recall trade: each 16-bit block group
    * materializes in ONE task and every doc scans that group's kept list
    * — O(group²) comparisons and O(group) memory, group ≈ n/65536 for
    * spread signatures. The greedy kept-list scan is inherently
    * sequential (each verdict depends on every earlier one), so a
    * sub-index could only shave the constant, not the bound; past the
    * size where a ~n/65536 group fits a task (≈ billions of docs
    * corpus-wide), route through [[compactSurvivors]]'s join form
    * instead, whose per-bucket fan-out is pair-bounded, not group². */
  def nearDupBlockBatch(df: DataFrame, textCol: String, idCol: String,
                        tsCol: String, maxHamming: Int = 3,
                        blockIdx: Int = 3,
                        sigExpr: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    import df.sparkSession.implicits._
    sigDocs(df, textCol, idCol, tsCol, blockIdx, sigExpr)
      .groupByKey(_.block)
      .flatMapGroups { (_, it) =>
        val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
        it.toSeq.sortBy(d => (d.tsMs, d.id)).iterator.filter { d =>
          val ok = !kept.exists(s => hamming(s, d.sig) <= maxHamming)
          if (ok) kept += d.sig
          ok
        }
      }
      .toDF()
      .select(col("id"), col("ts"), col("sig"))
  }

  /** Streaming twin of [[nearDupBlockBatch]]: REAL Hamming-distance
    * near-dup suppression over an unbounded stream. State per 16-bit
    * block key = the KEPT signatures within the watermark horizon (8
    * bytes each, evicted by event-time timeout), so memory is bounded by
    * the per-block survivor rate × the horizon — not the stream's
    * lifetime. Docs are matched against earlier SURVIVORS — greedy
    * first-arrival in PROCESSING order (rows within one micro-batch are
    * sorted by (ts, id), so replays are deterministic). When arrivals
    * are in event-time order this is identical to the batch twin; under
    * LATE data the same near-dup chains are still collapsed to one
    * representative each, but the surviving REPRESENTATIVE can differ
    * from the batch twin's (a late-but-earlier-stamped doc is suppressed
    * against the already-kept later one — streaming cannot retract an
    * emitted row). Run the batch twin as the compaction pass where
    * batch-exact survivor identity matters.
    *
    * A doc whose flipped bits land in the routing block escapes this
    * pass (see recall note on the batch twin) — the periodic batch
    * pigeonhole compaction catches it. */
  def nearDupBlock(df: DataFrame, textCol: String, idCol: String,
                   tsCol: String, delay: String, maxHamming: Int = 3,
                   blockIdx: Int = 3,
                   sigExpr: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    import df.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val delayIv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(delay))
    // month convention matches Spark's watermark delay (EventTimeWatermark
    // treats a month as 31 days) so the suppression horizon and the
    // watermark never disagree
    val horizonMs = delayIv.months * 31L * 86400000L +
      delayIv.days * 86400000L + delayIv.microseconds / 1000L
    sigDocs(df.withWatermark(tsCol, delay), textCol, idCol, tsCol, blockIdx,
      sigExpr)
      .groupByKey(_.block)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Int, rows: Iterator[SigDoc], state: GroupState[List[(Long, Long)]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            var kept = state.getOption.getOrElse(Nil).filter(_._2 >= wm - horizonMs)
            val out = rows.toSeq.sortBy(d => (d.tsMs, d.id)).filter { d =>
              val ok = !kept.exists(s => hamming(s._1, d.sig) <= maxHamming)
              if (ok) kept = (d.sig, d.tsMs) :: kept
              ok
            }
            state.update(kept)
            if (kept.nonEmpty)
              state.setTimeoutTimestamp(kept.map(_._2).max + horizonMs + 1)
            out.iterator
          }
      }
      .toDF()
      .select(col("id"), col("ts"), col("sig"))
  }

  /** The periodic batch PIGEONHOLE COMPACTION over the stream's emitted
    * survivors — the complement [[nearDupBlock]]'s scaladoc promises: a
    * doc whose flipped bits land in the single routing block escapes the
    * streaming pass; here the full 4-block pigeonhole join pairs
    * survivors on ANY equal 16-bit block, so exactly those cross-block
    * pairs are caught (streaming-caught ⊆ compaction-caught, because a
    * clean routing block is one of the four).
    *
    * Input: the streaming output schema (id, ts, sig). Pipeline: 4-block
    * bucket join (pair-bounded fan-out, never group²) → Hamming filter →
    * [[graft.scale.Dedup.components]] → keep the (ts, id)-EARLIEST member
    * per cluster — the same first-arrival policy as the streaming pass,
    * so re-running compaction is idempotent. On transitive chains whose
    * middle doc the stream already suppressed, the two ends stay separate
    * clusters here if they are farther than `maxHamming` apart — batch
    * `Dedup.simHashPairs` over the ORIGINAL corpus remains the
    * full-lineage form when chain-exact clustering matters.
    *
    * 100-TB shape: survivors are the already-thinned stream output; one
    * bucket-join shuffle + the components fixpoint — no driver state. */
  def compactSurvivors(survivors: DataFrame, maxHamming: Int = 3): DataFrame = {
    val blocked = survivors.select(col("id"), col("ts"), col("sig"),
        posexplode(expr("transform(sequence(0, 3), b -> (sig >> (b * 16)) & 65535)")))
      .toDF("id", "ts", "sig", "block", "key")
    val pairs = blocked.as("l").join(blocked.as("r"),
        col("l.block") === col("r.block") && col("l.key") === col("r.key") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
              expr("bit_count(l.sig ^ r.sig)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
    val comps = graft.scale.Dedup.components(pairs, "id_a", "id_b")
      .withColumnRenamed("id", "cid")
    val tagged = survivors.join(comps, col("id") === col("cid"), "left")
    val unclustered = tagged.filter(col("component").isNull)
      .select(col("id"), col("ts"), col("sig"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component")).orderBy(col("ts").asc, col("id").asc)
    val reps = tagged.filter(col("component").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("ts"), col("sig"))
    unclustered.unionByName(reps)
  }
}
