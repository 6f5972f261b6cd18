package graft.scale

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus curation operators beyond dedup: eval-set
  * decontamination and sequence packing. Both are deterministic
  * relational dataflows (✔dt — DuckDB-oracle-checkable), designed around
  * the asymmetry of a training pipeline: the corpus is ~100 TB, the eval
  * sets and per-shard state are tiny.
  *
  * The reference engine has no corpus surface at all (single pandas
  * frame, `auto_ts/utils/etl.py:17-61`); these extend the engine toward
  * its large-scale-pipeline north star. */
object Curation {

  /** Word n-grams of `textCol` as strings: (id, s). Shared shape with
    * `Dedup.shingles` but string-keyed — decontamination joins against a
    * SMALL broadcast side, so the 8-byte-hash shuffle optimization that
    * pays off in corpus-vs-corpus dedup buys nothing here. */
  private def grams(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
        split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= n)
      .select(col("id"), explode(expr(
        s"transform(sequence(1, size(w) - ${n - 1}), i -> " +
        (1 to n).map(j => s"element_at(w, i + ${j - 1})").mkString("concat_ws(' ', ", ", ", ")") + ")"
      )).as("s")).distinct()

  /** Eval-set decontamination: for every training doc, count the distinct
    * word n-grams it shares with ANY eval doc (docs with a nonzero count
    * are dropped or flagged before training — the standard guard against
    * benchmark leakage).
    *
    * Scale shape: the eval side is tiny (benchmarks are KBs–MBs), so its
    * distinct n-gram set is BROADCAST — the 100 TB train side is never
    * shuffled; the join is map-side against the broadcast hash table and
    * the only exchange is the final per-doc count aggregation, whose
    * cardinality is bounded by contaminated docs (rare), not the corpus. */
  def decontaminate(train: DataFrame, eval: DataFrame,
                    textCol: String, idCol: String, n: Int = 5): DataFrame = {
    val evalGrams = grams(eval, textCol, idCol, n)
      .select(col("s")).distinct()
    grams(train, textCol, idCol, n)
      .join(broadcast(evalGrams), "s")
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_hit_ngrams"))
  }

  /** Bloom-filter decontamination — the form [[decontaminate]] takes when
    * the eval side outgrows an exact broadcast set. The eval n-grams are
    * aggregated into a FIXED-SIZE Bloom filter (Spark's distributed
    * sketch aggregate — ~1.2 MB per million grams at fpp 1e-2, regardless
    * of gram length), and the train side becomes a pure map-side
    * membership filter: NO join at all, the 100-TB corpus is never
    * shuffled before the final per-doc count. False positives only ever
    * OVERCOUNT `n_hit_ngrams` (bounded by fpp · doc grams) — for the
    * standard drop-if-nonzero policy that drops a few extra docs and can
    * never leak eval data, so the error is on the safe side. Exact hits
    * are always a subset of Bloom hits (spec-pinned vs [[decontaminate]]).
    * Spark's BloomFilter hashes with a fixed seed, so the result is
    * deterministic; it is still ✖est (DuckDB cannot replay the sketch). */
  def decontaminateBloom(train: DataFrame, eval: DataFrame,
                         textCol: String, idCol: String, n: Int = 5,
                         expectedGrams: Long = 1000000L,
                         fpp: Double = 0.01): DataFrame = {
    val bf = grams(eval, textCol, idCol, n).stat.bloomFilter("s", expectedGrams, fpp)
    val hit = udf((s: String) => s != null && bf.mightContainString(s))
    grams(train, textCol, idCol, n)
      .filter(hit(col("s")))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_hit_ngrams"))
  }

  /** End-to-end curation pipeline fused into ONE declarative plan:
    * quality gate (min length) → exact dedup keeping the best-scored
    * copy per content hash → eval-set decontamination (drop any survivor
    * sharing ≥1 word n-gram with eval) — the standard pretraining
    * sequence. Composing it as a single DataFrame expression (rather
    * than materializing between stages) lets Catalyst push the quality
    * gate into the scan, reuse the dedup window's exchange for the
    * cluster-size count, and plan the decontam hit set as a broadcast —
    * the whole pipeline costs the dedup shuffle plus the tiny gram join.
    * Returns surviving docs with their duplicate-cluster size. */
  def curate(docs: DataFrame, eval: DataFrame, textCol: String,
             idCol: String, scoreCol: String, minChars: Int,
             ngram: Int = 5): DataFrame = {
    val gated = docs.filter(length(col(textCol)) >= minChars)
    // Contamination is decided on the GATED input, not on the dedup
    // survivors: exact duplicates share identical text, hence identical
    // grams, hence identical flags — same result, but the gram branch
    // reads a column-pruned (id, text) scan instead of re-running the
    // full dedup window a second time (measured 15× at 10× data before
    // this; the doubled full-text window shuffle was the cost).
    val hits = decontaminate(gated, eval, textCol, idCol, ngram)
      .select(col(idCol).as("__hit_id"))
    val byHash = Window.partitionBy(col("__h"))
    val deduped = gated
      .withColumn("__h", md5(col(textCol)))
      .withColumn("__rn", row_number().over(
        byHash.orderBy(col(scoreCol).desc, col(idCol).asc)))
      .withColumn("n_dups", count(lit(1)).over(byHash))
      .filter(col("__rn") === 1)
      .drop("__h", "__rn")
    // contaminated docs are rare by contract — broadcast the hit set so
    // the survivor side is never sorted/shuffled for the anti-join
    deduped.join(broadcast(hits), deduped(idCol) === col("__hit_id"), "left_anti")
  }

  /** Document chunking with overlap: split each document's token stream
    * into fixed-size windows advancing by `chunkTokens − overlapTokens`
    * (the standard retrieval / long-doc-training layout). Emits one row
    * per chunk: (id, chunk_idx, chunk, n_chunk_tokens). Pure map-side
    * work — a codegen'd transform + posexplode, no shuffle; a 100 TB
    * corpus chunks at full scan parallelism. A doc shorter than one
    * window yields exactly one chunk. */
  def chunkDocuments(df: DataFrame, textCol: String, idCol: String,
                     chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"need 0 <= overlap < chunk, got overlap=$overlapTokens chunk=$chunkTokens")
    val stride = chunkTokens - overlapTokens
    df.select(col(idCol), split(col(textCol), " ").as("w"))
      .filter(size(col("w")) > 0)
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, int(ceil(greatest(size(w) - $overlapTokens, 1) / ${stride}.0)) - 1), " +
        s"i -> slice(w, i * $stride + 1, $chunkTokens))")))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
              concat_ws(" ", col("col")).as("chunk"),
              size(col("col")).cast("long").as("n_chunk_tokens"))
  }

  /** C4-style LINE-level dedup (Raffel et al. 2020 §2.2 removed any
    * three-sentence span occurring more than once in C4; the common
    * production form dedups normalized lines corpus-wide): every
    * occurrence of a duplicated line is dropped EXCEPT its corpus-wide
    * first — first = minimum (doc id, line position), so later docs lose
    * boilerplate that an earlier doc already carries — and each doc is
    * reassembled from its surviving lines in original order. Emits
    * (id, clean_text, n_lines_kept, n_lines_total); a doc whose every
    * line was seen before comes back with an empty clean_text (filter on
    * n_lines_kept downstream if such docs should drop entirely).
    *
    * 100-TB shape: first-occurrence selection is a groupBy(line) with a
    * min(struct(id,pos)) — PARTIAL-AGGREGATED map-side, so a boilerplate
    * line repeated a billion times costs one combiner row per input
    * partition, never a single-task window partition (the skew that
    * kills the row_number formulation on real web text). One join back
    * on the line key reuses the same hash partitioning, then one
    * groupBy(id) rebuilds documents. */
  def lineDedup(df: DataFrame, textCol: String, idCol: String,
                lineSep: String = "\n"): DataFrame = {
    val sepLit = java.util.regex.Pattern.quote(lineSep)
    val lines = df
      .select(col(idCol).as("id"), posexplode(split(col(textCol), sepLit)))
      .select(col("id"), col("pos").cast("long").as("pos"), col("col").as("line"))
    val firsts = lines.groupBy(col("line"))
      .agg(min(struct(col("id"), col("pos"))).as("first"))
    val kept = lines.join(firsts, "line")
      .filter(col("id") === col("first.id") && col("pos") === col("first.pos"))
    val rebuilt = kept.groupBy(col("id"))
      .agg(count(lit(1)).as("n_lines_kept"),
           concat_ws(lineSep, expr(
             "transform(array_sort(collect_list(struct(pos, line))), x -> x.line)"))
             .as("clean_text"))
    df.select(col(idCol).as("id"),
        size(split(col(textCol), sepLit)).cast("long").as("n_lines_total"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"), coalesce(col("clean_text"), lit("")).as("clean_text"),
              coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
              col("n_lines_total"))
  }

  /** Sequence packing: concatenate each shard's docs in a deterministic
    * order and chunk the stream at a fixed token budget — the standard
    * "concat-then-split" LLM pretraining layout. Emits, per doc: its
    * token count, the bin (training sequence) its FIRST token lands in,
    * the offset inside that bin, and whether the doc straddles a bin
    * boundary (gets split across two training sequences).
    *
    * Scale shape: the running cumsum is a window per SHARD — real
    * pipelines pack within output shards independently, which keeps every
    * partition's window state local (no global ordering, no
    * single-partition bottleneck; shard count = write parallelism). The
    * token count here is whitespace tokenization (`TextAnalysis` owns the
    * BPE-ish variant); swap `tokens` for a real tokenizer column when the
    * corpus carries one. */
  def packSequences(df: DataFrame, textCol: String, idCol: String,
                    shardCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tokens: Column = size(split(col(textCol), " "))
    df.select(col(idCol), col(shardCol), tokens.as("n_tokens"))
      .withColumn("cum_end", sum(col("n_tokens")).over(w))
      .withColumn("cum_start", col("cum_end") - col("n_tokens"))
      .select(
        col(idCol), col(shardCol), col("n_tokens"),
        (col("cum_start") / budget).cast("long").as("bin_id"),
        (col("cum_start") % budget).as("bin_offset"),
        // straddles iff its last token's bin differs from its first's
        (((col("cum_end") - 1) / budget).cast("long") >
          (col("cum_start") / budget).cast("long")).as("split_across_bins"))
  }

  /** Fused pretraining-prep pipeline, stage two of the curation story
    * (stage one is [[curate]]: gate → dedup → decontam):
    * ExactSubstr-cut ([[Dedup.stripDuplicatedSpans]]) → minimum-length
    * gate on the CLEANED token count → Gopher repetition gate
    * ([[TextAnalysis.repetitionStats]] over the cleaned text) →
    * deterministic hash train/val/test split ([[Sampling.hashSplit]]).
    * One declarative plan end to end; returns one row per surviving
    * document: (sid, split, n_clean).
    *
    * Composition cost, not new cost: the span machinery's shuffles (gram
    * count + hit join + island window); the repetition gate is appended
    * IN PLACE by [[TextAnalysis.withRepetitionStats]] (map-side array
    * HOFs over the cleaned text — no id self-join, which would recompute
    * the whole span plan twice), and the split is a pure map-side md5
    * fence. */
  def pretrainPrep(df: DataFrame, textCol: String, idCol: String,
                   spanL: Int = 6, minTokens: Int = 20,
                   trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val stripped = Dedup.stripDuplicatedSpans(df, textCol, idCol, spanL)
      .withColumn("n_clean", col("n_tokens") - col("n_dup_tokens"))
      .filter(col("n_clean") >= minTokens)
      .select(col("sid"), col("n_clean"), col("clean_text"))
    val gated = TextAnalysis.withRepetitionStats(stripped, "clean_text")
      .filter(col("keep"))
    Sampling.hashSplit(gated, "sid", trainPct, valPct)
      .select(col("sid"), col("split"), col("n_clean"))
  }

  /** Semantic (embedding-space) eval-set decontamination — the
    * [[decontaminate]] complement for PARAPHRASED leakage that n-gram
    * overlap can't catch (an eval question rewritten in different words
    * shares no 5-grams but sits next to the original in embedding
    * space): flag every train row whose embedding reaches cosine ≥
    * `threshold` against ANY eval row.
    *
    * Shape: the eval side is collected, L2-normalized, and broadcast —
    * the SAME bounded-eval contract as [[decontaminate]]'s broadcast
    * n-gram set (an eval benchmark is thousands of rows, not a corpus);
    * the train side scores map-side in one pass over the broadcast
    * matrix — no shuffle, no join, the corpus is touched once. Appends
    * (max_eval_cos, contaminated); callers filter on the flag. */
  def semDecontaminate(train: DataFrame, eval: DataFrame, vecCol: String,
                       threshold: Double): DataFrame = {
    val spark = train.sparkSession
    val evalVecs: Array[Array[Double]] = eval
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
      .map { v =>
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n > 0) v.map(_ / n) else v
      }
    val bc = spark.sparkContext.broadcast(evalVecs)
    val maxCos = udf { (v: Seq[Double]) =>
      val arr = v.toArray
      var s = 0.0; var i = 0
      while (i < arr.length) { s += arr(i) * arr(i); i += 1 }
      val n = math.sqrt(s)
      var best = -1.0
      if (n > 0) {
        for (e <- bc.value) {
          var d = 0.0; var j = 0
          val lim = math.min(arr.length, e.length)
          while (j < lim) { d += arr(j) * e(j); j += 1 }
          if (d / n > best) best = d / n
        }
      }
      best
    }
    train
      .withColumn("max_eval_cos", maxCos(col(vecCol).cast("array<double>")))
      .withColumn("contaminated", col("max_eval_cos") >= threshold)
  }

  /** T5-style span corruption (Raffel et al. 2020, arXiv:1910.10683
    * §3.1.4): mask fixed-length token spans with numbered sentinels and
    * emit the (input, target) denoising pair — input keeps the
    * uncorrupted tokens with one `<Xj>` per masked span, target is the
    * sentinel-delimited concatenation of the masked spans. Spans start at
    * token position 1 + (id mod 5), repeat every `stride` tokens, and are
    * `spanLen` long; only FULL spans mask (a truncated tail span stays in
    * the input). Deterministic by
    * construction — the span layout is integer arithmetic on (id,
    * position), no RNG — so the rendered pair is oracle-replayable.
    *
    * Pure map-side array HOFs over the token array: zero shuffle, scales
    * as a scan. Docs shorter than the first full span pass through with
    * `corrupted = false` and an empty target. Returns (id, corrupted,
    * input, target). */
  def spanCorrupt(df: DataFrame, textCol: String, idCol: String,
                  spanLen: Int = 3, stride: Int = 10): DataFrame = {
    require(spanLen >= 1 && stride > spanLen,
      s"need 1 <= spanLen < stride, got spanLen=$spanLen stride=$stride")
    val prep = df.select(col(idCol).cast("long").as("id"),
      col(textCol).as("__text"),
      split(col(textCol), " ").as("tk"))
      .withColumn("n", size(col("tk")).cast("long"))
      .withColumn("start", lit(1L) + pmod(col("id"), lit(5L)))
      .withColumn("corrupted", col("start") + (spanLen - 1) <= col("n"))
    val L = spanLen; val S = stride
    val inputExpr =
      s"""array_join(filter(transform(sequence(1L, n), i ->
         |  CASE WHEN i >= start AND ((i - start) % $S) = 0 AND i + ${L - 1} <= n
         |       THEN concat('<X', CAST((i - start) div $S AS STRING), '>')
         |       WHEN i >= start AND ((i - start) % $S) <= ${L - 1}
         |            AND (i - ((i - start) % $S)) + ${L - 1} <= n
         |       THEN NULL
         |       ELSE element_at(tk, CAST(i AS INT)) END),
         |  x -> x IS NOT NULL), ' ')""".stripMargin
    val targetExpr =
      s"""array_join(flatten(transform(sequence(start, n - ${L - 1}L, $S), s ->
         |  concat(array(concat('<X', CAST((s - start) div $S AS STRING), '>')),
         |         slice(tk, CAST(s AS INT), $L)))), ' ')""".stripMargin
    prep.select(col("id"), col("corrupted"),
      when(col("corrupted"), expr(inputExpr)).otherwise(col("__text")).as("input"),
      when(col("corrupted"), expr(targetExpr)).otherwise(lit("")).as("target"))
  }

  /** Deterministic word dropout — the classic denoising augmentation
    * (word-level input dropout, Iyyer et al. 2015 §3; Bowman et al. 2016
    * decoder-input dropout): drop each token whose (id + position) lands
    * on the modulus, keeping documents below `minTokens` whole so short
    * inputs never collapse. The drop layout is integer arithmetic on
    * (doc id, 1-based token position) — no RNG — so the augmented text is
    * oracle-replayable and a fixed epoch's augmentation is reproducible
    * bit-for-bit (vary `phase` per epoch for fresh masks).
    *
    * Map-side filter over the token array, zero shuffle. Returns
    * (id, dropped, n_dropped, out_text). */
  def wordDropout(df: DataFrame, textCol: String, idCol: String,
                  modulus: Long = 10L, phase: Long = 0L,
                  minTokens: Int = 8): DataFrame = {
    require(modulus >= 2, s"need modulus >= 2, got $modulus")
    val prep = df.select(col(idCol).cast("long").as("id"),
        col(textCol).as("__text"), split(col(textCol), " ").as("tk"))
      .withColumn("n", size(col("tk")).cast("long"))
      .withColumn("dropped", col("n") >= minTokens)
    val keepExpr =
      s"""filter(transform(sequence(1L, n), i ->
         |  CASE WHEN (id + i + ${phase}L) % ${modulus}L = 0 THEN NULL
         |       ELSE element_at(tk, CAST(i AS INT)) END),
         |  x -> x IS NOT NULL)""".stripMargin
    prep.select(col("id"), col("dropped"),
      when(col("dropped"), col("n") - size(expr(keepExpr)).cast("long"))
        .otherwise(0L).as("n_dropped"),
      when(col("dropped"), expr(s"array_join($keepExpr, ' ')"))
        .otherwise(col("__text")).as("out_text"))
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022,
    * arXiv:2207.14255): rewrite a deterministic fraction of documents
    * into PSM order — prefix, suffix, middle with sentinel tokens — so an
    * autoregressive model learns infilling "for free". Cuts are the
    * middle third at integer token positions (p = ⌊n/3⌋, q = ⌊2n/3⌋);
    * the doc-id mod picks which docs transform (the sm1 determinism
    * discipline — a hash/RNG rate would not be oracle-replayable). Docs
    * under `minTokens` or off-rate pass through unchanged.
    *
    * Pure map-side array ops (split/slice/join) — zero shuffle, scales
    * as a scan. Returns (id, fim_applied, out_text). */
  def fimTransform(df: DataFrame, textCol: String, idCol: String,
                   modulus: Long = 2L, minTokens: Int = 6): DataFrame = {
    require(modulus >= 1, s"need modulus >= 1, got $modulus")
    val toks = split(col(textCol), " ")
    val n = size(toks)
    val p = (n / 3).cast("int")
    val q = (n * 2 / 3).cast("int")
    val psm = concat(
      lit("<PRE> "), array_join(slice(toks, lit(1), p), " "),
      lit(" <SUF> "), array_join(slice(toks, q + 1, n - q), " "),
      lit(" <MID> "), array_join(slice(toks, p + 1, q - p), " "))
    val applied = pmod(col(idCol).cast("long"), lit(modulus)) === 0L &&
      n >= minTokens
    df.select(col(idCol).cast("long").as("id"),
      applied.as("fim_applied"),
      when(applied, psm).otherwise(col(textCol)).as("out_text"))
  }

  // ---- snapshot diff ------------------------------------------------------

  /** Corpus snapshot diff: classify every doc id across two corpus
    * versions as `added` (in `next` only), `removed` (in `prev` only) or
    * `changed` (both, content hash differs) — the change-detection audit
    * an incrementally-ingested corpus runs between pipeline versions
    * (what moved since the last tokenization run / what must be
    * re-embedded), complementing [[graft.scale.Dedup.incrementalDedup]]
    * which answers novelty, not churn.
    *
    * Scale shape: both sides reduce to (id, md5) BEFORE the join — only
    * 16-byte hashes ride the exchange, the text columns never move —
    * and the single hash equi-join on id co-locates for free when both
    * snapshots are bucketed by id (`sources/Bucketing`). Unchanged rows
    * are dropped INSIDE the join's projection, so the output is bounded
    * by churn, not corpus size. */
  def snapshotDiff(prev: DataFrame, next: DataFrame,
                   textCol: String, idCol: String): DataFrame = {
    val a = prev.select(col(idCol).cast("long").as("id"),
      md5(col(textCol)).as("__ha"))
    val b = next.select(col(idCol).cast("long").as("id"),
      md5(col(textCol)).as("__hb"))
    a.join(b, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("__ha").isNull, lit("added"))
          .when(col("__hb").isNull, lit("removed"))
          .when(col("__ha") =!= col("__hb"), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select(col("id"), col("status"))
  }

  // ---- PII detection / redaction ----------------------------------------

  /** PII categories as cross-engine-safe regexes (ordered — redaction
    * applies them in this order, email before ipv4 so an address is
    * masked whole before its digit runs can half-match). Patterns use no
    * lookaround/backreferences, so the same string runs identically
    * under Java regex (Spark, codegen'd) and RE2 (DuckDB). The category
    * set is the one the public curation pipelines scrub (C4 — Raffel et
    * al. 2020 §2.2; BigScience ROOTS and Dolma both ship email/IP/phone
    * taggers); the reference engine has no text surface at all. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4"  -> "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
    "phone" -> "\\+[0-9]{7,15}\\b",
    "ssn"   -> "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b")

  /** Per-doc PII audit: one match-count column per [[PiiPatterns]]
    * category (`n_email`, `n_ipv4`, `n_phone`, `n_ssn`) plus
    * `pii_total`. Pure map-side scalar expressions (regexp_count is a
    * codegen'd native function, counts non-overlapping matches) — the
    * corpus never shuffles; at 100 TB this is a scan-rate pass exactly
    * like the Gopher quality battery, and the downstream drop/redact
    * decision is a filter on the emitted counts. */
  def piiScan(df: DataFrame, textCol: String): DataFrame = {
    val withCounts = PiiPatterns.foldLeft(df) { case (acc, (name, pat)) =>
      acc.withColumn(s"n_$name",
        regexp_count(col(textCol), lit(pat)).cast("long"))
    }
    withCounts.withColumn("pii_total",
      PiiPatterns.map { case (name, _) => col(s"n_$name") }.reduce(_ + _))
  }

  /** PII redaction: every category match replaced by its `<CATEGORY>`
    * sentinel token, categories applied in [[PiiPatterns]] order. The
    * sentinel survives tokenization (angle brackets never occur inside
    * the match classes), so downstream token counts stay meaningful.
    * Map-side, zero shuffle — redaction at 100 TB is a rewrite-on-scan,
    * typically fused with the quality gates in one pass. */
  def piiRedact(df: DataFrame, textCol: String,
                outCol: String = "redacted"): DataFrame =
    df.withColumn(outCol, PiiPatterns.foldLeft(col(textCol)) {
      case (c, (name, pat)) =>
        regexp_replace(c, pat, s"<${name.toUpperCase}>")
    })

  /** Blocklist hit statistics — the C4 "bad words" gate shape (Raffel
    * et al. 2020 drop any page with a term from the public blocklist):
    * per doc, token count, blocked-token count, and the hit ratio the
    * gate thresholds on. Matching is exact lowercase token equality
    * (the public matcher is token-based, not substring). The list is
    * tiny and rides into the plan as a literal array — no broadcast
    * exchange, no shuffle; `size(filter(tokens))` stays inside
    * whole-stage codegen, so at 100 TB this is another scan-rate
    * column. */
  def blocklistStats(df: DataFrame, textCol: String,
                     blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "need at least one blocked term")
    val blk = array(blocked.map(w => lit(w.toLowerCase)): _*)
    df.withColumn("toks", split(lower(col(textCol)), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_blocked",
        size(filter(col("toks"), t => array_contains(blk, t))).cast("long"))
      .withColumn("blocked_ratio",
        when(col("n_tokens") > 0,
          col("n_blocked").cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)))
      .drop("toks")
  }
}
