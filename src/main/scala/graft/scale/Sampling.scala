package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for corpus curation (north star: a
  * 100 TB pipeline downsamples/interleaves corpora before training).
  *
  * Two paths with different scale behavior:
  *  - [[modSample]] — a pure filter on the id; pushes to the scan, no
  *    shuffle, no state. The default at 100 TB.
  *  - [[stratifiedExact]] — exact per-group fractions via one windowed
  *    pass; costs a shuffle on the group key. Use when group quotas must
  *    be exact (e.g. balancing languages), not just proportional. */
object Sampling {

  /** Keep rows whose `pmod(idCol, modulus) < keep` — a deterministic
    * `keep/modulus` sample. Fully pushdown-able: no shuffle, no window;
    * survives any scale-up and composes with partition pruning. */
  def modSample(df: DataFrame, idCol: String, modulus: Int, keep: Int): DataFrame =
    df.filter(pmod(col(idCol), lit(modulus)) < lit(keep))

  /** Exact stratified sample: the first `ceil(frac·|group|)` rows of each
    * group in `orderCol` order. One shuffle on `groupCols` (both window
    * functions share a single WindowExec — same partitioning + ordering). */
  def stratifiedExact(df: DataFrame, groupCols: Seq[String], orderCol: String,
                      frac: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    val w = byGroup.orderBy(col(orderCol))
    df.withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(byGroup))
      .filter(col("rn") <= ceil(lit(frac) * col("cnt")))
      .drop("rn", "cnt")
  }

  /** Per-group cap: keep at most `k` rows per group, chosen by a
    * deterministic content-hash order (md5 of the id, ties by id) so the
    * kept subset is stable across runs and unbiased by ingestion order —
    * the standard per-domain cap in web-corpus curation ("no domain
    * contributes more than k documents"). One shuffle on the group key;
    * at 100 TB the group cardinality (domains) is far below the corpus
    * row count, and AQE handles the head-domain skew. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** Deterministic hash-based train/val/test split: the md5 hex of the id
    * is uniform over [0x00.., 0xff..], so LEXICOGRAPHIC thresholds on its
    * prefix carve reproducible, disjoint, ingestion-order-independent
    * fractions — the standard content-hash split of corpus pipelines.
    * Pure map-side expression: no shuffle, no state, survives any
    * scale-up, and the same row always lands in the same split.
    *
    * Fences are 4 hex chars, so fractions quantize to 1/65536 — integer
    * percents land within 0.001% of nominal and adjacent percents never
    * collapse to the same fence. */
  def hashSplit(df: DataFrame, idCol: String,
                trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"need train > 0, val >= 0, train+val < 100; got $trainPct/$valPct")
    def fence(pct: Int): String = f"${(65536L * pct) / 100}%04x"
    val h = md5(col(idCol).cast("string"))
    df.withColumn("split",
      when(h < lit(fence(trainPct)), "train")
        .when(h < lit(fence(trainPct + valPct)), "val")
        .otherwise("test"))
  }

  /** Temperature-smoothed source mixing (the XLM-R rebalancing rule,
    * Conneau et al. 2020 §3.1: sample sources with probability ∝ n_s^α,
    * α<1 upsampling the tail): keep each source at rate
    * (n_min/n_s)^(1−α), so expected kept counts are proportional to
    * n_s^α and the SMALLEST source is kept whole. Rates quantize to
    * permille and rows are chosen by the same deterministic id-mod rule
    * as [[modSample]] — reproducible, no RNG. Appends `n_src` and
    * `permille` so downstream audits see the applied rate.
    *
    * Plan shape at 100 TB: per-source counts are one tiny aggregate
    * (sources ≈ dozens), rates come back as a BROADCAST join — the
    * corpus itself never shuffles: scan → broadcast-join → filter, all
    * map-side. α=0.5 (the common choice) goes through IEEE
    * correctly-rounded sqrt, so the permille fences are reproducible
    * across engines; other α use pow. */
  def temperatureSample(df: DataFrame, sourceCol: String, idCol: String,
                        alpha: Double = 0.5): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"need alpha in [0,1], got $alpha")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_src"))
    val ratio = col("n_min").cast("double") / col("n_src").cast("double")
    val rate = if (alpha == 0.5) sqrt(ratio) else pow(ratio, 1.0 - alpha)
    val rates = counts
      .crossJoin(counts.agg(min(col("n_src")).as("n_min")))
      .select(col(sourceCol), col("n_src"),
              floor(rate * lit(1000) + lit(0.5)).cast("int").as("permille"))
    df.join(broadcast(rates), sourceCol)
      .filter(pmod(col(idCol), lit(1000)) < col("permille"))
  }

  /** Weighted corpus interleave: per-source modulus sampling driven by a
    * weight map (source -> keep-permille). The weight lookup is a CASE
    * expression, not a join — zero shuffle end-to-end. */
  def interleave(df: DataFrame, sourceCol: String, idCol: String,
                 permille: Map[String, Int]): DataFrame = {
    val keep: Column = permille.foldLeft(lit(0)) { case (acc, (src, p)) =>
      when(col(sourceCol) === src, lit(p)).otherwise(acc)
    }
    df.filter(pmod(col(idCol), lit(1000)) < keep)
  }

  /** Deterministic global shuffle — the reproducible training-order
    * primitive: every epoch of a pretraining run must visit documents in
    * a pseudo-random order that is (a) independent of ingest/file order,
    * (b) reproducible bit-for-bit from (corpus, seed), (c) different per
    * seed. The order key is md5(id:seed); `position` is the exact global
    * rank in that order.
    *
    * Scale shape — NO global window, NO single-task sort: the key's
    * leading `prefixLen` hex chars form 16^prefixLen contiguous,
    * DETERMINISTIC range buckets (md5 is uniform, so buckets are
    * balanced by construction — no sampled range boundaries, no skew).
    * Global rank = rank within bucket + Σ counts of preceding buckets:
    * one bucket-keyed window for the within rank, a 16^prefixLen-row
    * count aggregate broadcast back for the offsets. One data shuffle
    * total; at prefixLen=4 that is 65 536 buckets ≈ 1.6 GB/bucket on
    * 100 TB. */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long,
                           prefixLen: Int = 4): DataFrame = {
    require(prefixLen >= 1 && prefixLen <= 8, s"prefixLen in [1,8], got $prefixLen")
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat(col(idCol).cast("string"), lit(":" + seed)))
    val keyed = df.withColumn("shuffle_key", key)
      .withColumn("bucket", substring(col("shuffle_key"), 1, prefixLen))
    val offsets = keyed.groupBy(col("bucket")).count()
      .withColumn("offset",
        coalesce(sum(col("count")).over(
          Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("bucket"), col("offset"))
    keyed.join(broadcast(offsets), "bucket")
      .withColumn("position",
        row_number().over(
          Window.partitionBy(col("bucket"))
            .orderBy(col("shuffle_key"), col(idCol))).cast("long")
          + col("offset") - 1L)
      .drop("bucket", "offset")
  }

  /** Weighted sampling WITHOUT replacement, deterministic (Efraimidis &
    * Spirakis 2006, exponential-clocks form): each row draws an
    * md5-derived uniform u ∈ (0,1) and competes with key −ln(u)/w —
    * the k smallest keys are EXACTLY a weight-proportional sample
    * without replacement. Reproducible from (corpus, seed), no RNG.
    *
    * Shape: the key is map-side; the k winners come from a
    * TakeOrdered(k) — no global sort shuffle, driver holds k rows.
    * Non-positive weights are dropped (they can never win a
    * proportional draw; documented, not an error). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, seed: Long): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    // 13 hex chars = 52 uniform bits; +0.5 keeps u strictly inside (0,1)
    val u = (conv(substring(md5(concat(col(idCol).cast("string"),
        lit(":" + seed))), 1, 13), 16, 10).cast("long") + 0.5) /
      lit(4503599627370496.0) // 2^52
    df.filter(col(weightCol) > 0)
      .withColumn("es_key", -log(u) / col(weightCol).cast("double"))
      .orderBy(col("es_key"), col(idCol))
      .limit(k)
  }

  /** Priority sampling (Duffield, Lund & Thorup 2007, "Priority
    * sampling for estimation of arbitrary subset sums", JACM 54) — the
    * weighted-sample-WITH-ESTIMATOR form of [[weightedSample]]: each
    * row gets priority q = w/u (u uniform from the seeded md5, exact
    * binary fraction — ONE IEEE division, no transcendental, unlike
    * A-ES's −ln(u)/w key), the k highest-priority rows are kept, and
    * each kept row carries the estimator weight ŵ = max(w, τ) with τ
    * the (k+1)-th priority. Σŵ over the sample is an unbiased estimate
    * of Σw over ANY subset — the property that lets corpus statistics
    * (token budgets, source masses) be read off a bounded sample.
    *
    * Scale shape: TakeOrdered over (−q, id) — no global sort; the k+1
    * frame is driver-bounded. Determinism: u = (52 md5 bits + 0.5)/2^52
    * exactly as [[weightedSample]]; q and ŵ are single IEEE ops. */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, seed: Long): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val u = (conv(substring(md5(concat(col(idCol).cast("string"),
        lit(":" + seed))), 1, 13), 16, 10).cast("long") + 0.5) /
      lit(4503599627370496.0) // 2^52
    val top = df.filter(col(weightCol) > 0)
      .withColumn("q", col(weightCol).cast("double") / u)
      .orderBy(col("q").desc, col(idCol))
      .limit(k + 1)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("q").desc, col(idCol))
    val ranked = top.withColumn("rk", row_number().over(w).cast("long"))
    // τ = (k+1)-th priority; with ≤ k rows the whole population is kept
    // and the estimator degenerates to ŵ = w (τ = 0)
    val tau = ranked.agg(
      coalesce(max(when(col("rk") === k + 1, col("q"))), lit(0.0)).as("tau"))
    ranked.filter(col("rk") <= k)
      .crossJoin(broadcast(tau))
      .withColumn("w_est",
        greatest(col(weightCol).cast("double"), col("tau")))
      .select(col(idCol), col(weightCol), col("rk"), col("q"),
              col("tau"), col("w_est"))
  }

  // ---- DSIR: Data Selection via Importance Resampling ------------------

  /** Hashed unigram+bigram feature buckets: (fid, b), one row per token
    * occurrence, b ∈ [0, buckets). The bucket is the first 16 bits of
    * md5(feature) mod `buckets` — engine-portable (DuckDB replays it as
    * ('0x'||substr(md5(f),1,4))::BIGINT % buckets), deterministic, and
    * entirely map-side. */
  private def hashedFeats(df: DataFrame, textCol: String, idCol: String,
                          buckets: Int): DataFrame =
    df.select(col(idCol).as("fid"), split(col(textCol), " ").as("w"))
      .select(col("fid"), explode(concat(col("w"),
        when(size(col("w")) >= 2, expr(
          "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1), " +
          "(a, b) -> concat(a, ' ', b))"))
          .otherwise(array().cast("array<string>")))).as("f"))
      .select(col("fid"),
        (conv(substring(md5(col("f")), 1, 4), 16, 10).cast("long") % buckets).as("b"))

  /** DSIR log importance weights (Xie et al. 2023, arXiv:2302.03169
    * "Data Selection for Language Models via Importance Resampling"):
    * fit two hashed bag-of-ngrams models — p on the TARGET corpus (the
    * distribution you want more of) and q on the RAW corpus — and score
    * every raw document by log w = Σ_features (ln p_b − ln q_b), add-λ
    * smoothed over the fixed bucket space. High log-w docs look like the
    * target; resampling by this weight is the paper's selection rule.
    * Returns (id, logw, n_feats) for every raw document.
    *
    * 100-TB shape: both models are ONE partial aggregate each, bounded by
    * `buckets` rows regardless of corpus size; their log-ratio table
    * joins back as a BROADCAST, so the raw corpus is never shuffled for
    * scoring — the only corpus-keyed exchange is the per-doc score
    * aggregate, map-side combined down to one row per document. */
  def dsirLogWeights(raw: DataFrame, target: DataFrame, textCol: String,
                     idCol: String, buckets: Int = 1024,
                     smooth: Double = 0.5): DataFrame = {
    require(buckets > 0 && buckets <= 65536,
      s"buckets must fit the 16-bit hash prefix, got $buckets")
    val rawB = hashedFeats(raw, textCol, idCol, buckets)
    val tgtB = hashedFeats(target, textCol, idCol, buckets)
    val spine = raw.sparkSession.range(0, buckets).select(col("id").as("b"))
    // totals derive from the B-row bucket tables via a window over the
    // spine (≤ B rows, exact long sums) — NOT a recount of the exploded
    // corpora, so each corpus is tokenized exactly once per model
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val tc = tgtB.groupBy(col("b")).agg(count(lit(1)).as("tc"))
    val rc = rawB.groupBy(col("b")).agg(count(lit(1)).as("rc"))
    val lr = spine
      .join(broadcast(tc), Seq("b"), "left")
      .join(broadcast(rc), Seq("b"), "left")
      .withColumn("tn", sum(coalesce(col("tc"), lit(0L))).over(wAll))
      .withColumn("rn", sum(coalesce(col("rc"), lit(0L))).over(wAll))
      .select(col("b"),
        (log((coalesce(col("tc"), lit(0L)) + lit(smooth)) /
             (col("tn") + lit(smooth * buckets))) -
         log((coalesce(col("rc"), lit(0L)) + lit(smooth)) /
             (col("rn") + lit(smooth * buckets)))).as("lw"))
    rawB.join(broadcast(lr), Seq("b"))
      .groupBy(col("fid"))
      .agg(sum(col("lw")).as("logw"), count(lit(1)).as("n_feats"))
  }

  /** DSIR selection: the `k` raw documents with the highest importance
    * weight (ties broken by id — deterministic, no Gumbel noise; the
    * paper's Gumbel top-k is a randomized tie-spreader over the same
    * ordering). TakeOrdered on (logw desc, id asc): no global sort. */
  def dsirTopK(raw: DataFrame, target: DataFrame, textCol: String,
               idCol: String, k: Int, buckets: Int = 1024): DataFrame =
    dsirLogWeights(raw, target, textCol, idCol, buckets)
      .orderBy(col("logw").desc, col("fid").asc)
      .limit(k)

  /** Pretraining-mixture waterfill: allocate a total token `budget`
    * across sources in proportion to target `weights`, capping each
    * source at its availability and redistributing the surplus over the
    * uncapped sources — the standard mixture-planning step (The Pile /
    * LLaMA-style per-source weights meet a finite crawl). `rounds`
    * redistribution rounds are UNROLLED into the plan (a round only
    * does work when the previous one minted new caps; `rounds` =
    * #sources is exact, 3 suffices for real weight tables — semantics
    * are pinned as "`rounds`-round waterfill" and the oracle replays
    * the same unrolling).
    *
    * Scale shape: one partial-agg shuffle over the corpus for per-source
    * token counts; everything after runs on the S-row source table
    * (1-row scale agg cross-joined broadcast per round). The scale
    * factor is quantized to 1e-6 each round so allocations are
    * bit-identical cross-engine. Returns (source, n_avail, alloc_tokens,
    * capped, rate_permille). */
  // Token counts across ALL token-budget operators (waterfill, unimax,
  // anneal, packing, budget-select) share Packing.tokenCount — a mixture
  // planned on one tokenizer and packed on another silently mis-budgets
  // (r11 ADVICE/task #8).
  def waterfillMixture(df: DataFrame, sourceCol: String, textCol: String,
                       weights: Map[String, Double], budget: Long,
                       rounds: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val c = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(Packing.tokenCount(col(textCol))).as("n_avail"))
    val wdf = weights.toSeq.toDF("source", "wgt")
    var cur = c.join(broadcast(wdf), Seq("source"))
      .withColumn("alloc", lit(0L)).withColumn("capped", lit(false))
    for (_ <- 1 to rounds) {
      // nullif guard: once every source is capped the uncapped-weight sum
      // is 0 — scale goes NULL (ANSI division would throw) and the
      // when(capped) arms below keep all allocations unchanged
      val scale = cur.agg(
        (floor((lit(budget.toDouble) -
            sum(when(col("capped"), col("alloc")).otherwise(lit(0L)))) /
          nullif(sum(when(!col("capped"), col("wgt")).otherwise(lit(0.0))), lit(0.0)) *
          1e6 + 0.5) / 1e6).as("scale"))
      val fill = floor(col("wgt") * col("scale")).cast("long")
      cur = cur.crossJoin(broadcast(scale))
        .withColumn("alloc",
          when(col("capped"), col("alloc")).otherwise(least(col("n_avail"), fill)))
        .withColumn("capped", col("capped") || col("n_avail") <= fill)
        .drop("scale")
    }
    cur.select(col("source"), col("n_avail"),
      col("alloc").as("alloc_tokens"), col("capped"),
      floor(col("alloc").cast("double") / col("n_avail") * 1000 + 0.5)
        .cast("long").as("rate_permille"))
  }

  /** UniMax mixture (Chung et al. 2023, arXiv:2304.09151): distribute a
    * token budget UNIFORMLY across sources, capping each at `maxEpochs`
    * passes over its availability and redistributing surplus over the
    * uncapped sources — the language-sampling fix for weight-proportional
    * mixtures that over-repeat small sources. [[waterfillMixture]] is the
    * weighted sibling capped at 1 epoch; this one is uniform with a
    * rational epoch cap.
    *
    * Every round is EXACT integer arithmetic (uniform fills need no
    * float scale): cap = (n_avail·eNum) div eDen, fill = remaining div
    * n_uncapped. `rounds` redistribution rounds unroll into the plan;
    * the oracle replays the same unrolling. Scale shape: one partial-agg
    * corpus shuffle, then S-row algebra with 1-row broadcast aggregates
    * per round. Returns (source, n_avail, cap_tokens, alloc_tokens,
    * capped, epochs_micro). */
  def unimaxMixture(df: DataFrame, sourceCol: String, textCol: String,
                    budget: Long, epochsNum: Long = 4L, epochsDen: Long = 1L,
                    rounds: Int = 4): DataFrame = {
    require(budget >= 0 && epochsNum >= 1 && epochsDen >= 1 && rounds >= 1,
      s"need budget>=0, epochs>0, rounds>=1; got $budget, $epochsNum/$epochsDen, $rounds")
    var cur = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(Packing.tokenCount(col(textCol))).as("n_avail"))
      .withColumn("cap_tokens",
        expr(s"(n_avail * ${epochsNum}L) div ${epochsDen}L"))
      .withColumn("alloc", lit(0L)).withColumn("capped", lit(false))
    for (_ <- 1 to rounds) {
      // remaining budget and uncapped count: exact longs, 1-row broadcast
      val scale = cur.agg(
        (lit(budget) - sum(when(col("capped"), col("alloc")).otherwise(lit(0L))))
          .as("remaining"),
        sum(when(!col("capped"), 1L).otherwise(0L)).as("n_unc"))
      cur = cur.crossJoin(broadcast(scale))
        .withColumn("fill",
          when(col("n_unc") > 0L, expr("remaining div n_unc")).otherwise(lit(0L)))
        .withColumn("alloc",
          when(col("capped"), col("alloc"))
            .otherwise(least(col("cap_tokens"), col("fill"))))
        .withColumn("capped", col("capped") || col("cap_tokens") <= col("fill"))
        .drop("remaining", "n_unc", "fill")
    }
    cur.select(col("source"), col("n_avail"), col("cap_tokens"),
      col("alloc").as("alloc_tokens"), col("capped"),
      floor(col("alloc").cast("double") / col("n_avail").cast("double") * 1e6 + 0.5)
        .cast("long").as("epochs_micro"))
  }

  /** Per-source mid-rank percentile normalization of the quality score —
    * cross-source calibration before mixing (a 0.6 from a clean source
    * and a 0.6 from a boilerplate farm are not the same signal; each
    * source's scores map to their within-source percentile, making
    * thresholds comparable across sources — the per-domain-normalization
    * step of mixture curation).
    *
    * Scale shape: quality lives on the 1e-2 grid, so the per-source
    * score HISTOGRAM is bounded (≤101 rows/source); the cumulative-below
    * table computes on that reduced grid (tiny window), broadcasts back,
    * and every doc gets its mid-rank percentile map-side — never a
    * row_number over a data-sized source partition (20 sources of a
    * 100 TB corpus = 5 TB single-task partitions the naive window form
    * would create). Mid-rank = below + (eq+1)/2, emitted as
    * pct_micro = ⌊(2·below + eq)·10⁶ / (2·n)⌋ (the (below + eq/2)/n CDF) — pure integer div.
    * Returns (id, source, q100, pct_micro). */
  def qualityRankNorm(df: DataFrame, textCol: String, idCol: String,
                      sourceCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = TextAnalysis.qualityScore(df, textCol)
      .select(col(idCol).cast("long").as("id"),
        col(sourceCol).as("source"),
        floor(col("quality") * 100.0 + 0.5).cast("long").as("q100"))
    val grid = scored.groupBy(col("source"), col("q100"))
      .agg(count(lit(1)).as("eq"))
    val w = Window.partitionBy(col("source")).orderBy(col("q100"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = grid
      .withColumn("below", coalesce(sum(col("eq")).over(w), lit(0L)))
      .withColumn("n", sum(col("eq")).over(Window.partitionBy(col("source"))))
    scored.join(broadcast(cum), Seq("source", "q100"))
      .withColumn("pct_micro",
        expr("((2 * below + eq) * 1000000) div (2 * n)"))
      .select(col("id"), col("source"), col("q100"), col("pct_micro"))
  }

  /** The complete two-phase curriculum ORDER: [[mixSchedule]] over the
    * main-phase allocation, then the anneal-phase schedule appended with
    * its steps offset by the main phase's total — the full "decide the
    * mix, then emit the run order, phase by phase" path of an
    * anneal-style pretraining run ([[annealMixture]] decides the token
    * split; this emits the global step sequence). The offset is a 1-row
    * broadcast aggregate over the |sources|-row allocation table; both
    * phases keep the closed-form (sort-free) step rank. Returns
    * (source, phase, chunk_idx, n_chunks, step) — steps are a
    * permutation of 1..(mainChunks+annealChunks). */
  def curriculumSchedule(alloc: DataFrame, sourceCol: String,
                         mainCol: String, annealCol: String,
                         chunkTokens: Long = 4096L): DataFrame = {
    val main = mixSchedule(alloc, sourceCol, mainCol, chunkTokens)
      .withColumn("phase", lit("main"))
    val offset = alloc.groupBy()
      .agg(sum(when(col(mainCol) > 0L,
        ceil(col(mainCol).cast("double") / chunkTokens.toDouble).cast("long"))
        .otherwise(0L)).as("__off"))
    val ann = mixSchedule(alloc, sourceCol, annealCol, chunkTokens)
      .crossJoin(broadcast(offset))
      .withColumn("step", col("step") + coalesce(col("__off"), lit(0L)))
      .drop("__off")
      .withColumn("phase", lit("anneal"))
    main.unionByName(ann)
      .select(col("source"), col("phase"), col("chunk_idx"),
              col("n_chunks"), col("step"))
  }

  /** Dedup-aware train/val/test split — [[hashSplit]] keyed on the
    * NEAR-DUP COMPONENT instead of the row: every member of a near-dup
    * cluster lands in the same fold, closing the leakage channel a
    * row-keyed split leaves open when near-copies straddle the fence
    * (the contamination critique of C4-era splits; `sm12_group_split`
    * fences by a KNOWN group column — this one fences by the DISCOVERED
    * duplicate structure). Documents in no pair key on their own id
    * (singleton cluster), so the output is a total split of the corpus.
    *
    * Shape: the [[Dedup.components]] fixpoint runs over the PAIRS table
    * (tiny next to the corpus), the corpus left-joins the
    * |members|-row component map once on the id, and the md5 fences are
    * map-side — same split vocabulary and fences as [[hashSplit]]. */
  def clusterSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                   aCol: String, bCol: String,
                   trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val comp = Dedup.components(pairs, aCol, bCol)
      .withColumnRenamed("id", "__cid")
    val keyed = df
      .join(comp, df(idCol).cast("long") === comp("__cid"), "left")
      .withColumn("__skey", coalesce(col("component"), col(idCol).cast("long")))
      .drop("__cid", "component")
    hashSplit(keyed, "__skey", trainPct, valPct).drop("__skey")
  }

  /** Two-phase curriculum (anneal) mixture: split a total token budget
    * into a main phase over every source and an anneal phase restricted
    * to the top half of sources by mean quality — the
    * "midtraining/anneal" discipline of modern pretraining runs (e.g.
    * the staged data mixes described for MiniCPM, Zhu et al. 2024,
    * arXiv:2404.06395 §4: a final decay phase upweights the
    * highest-quality subset). Within each phase, allocation is
    * availability-proportional and capped at availability (single-round
    * cap — the iterated redistribution variant is [[waterfillMixture]];
    * composing the two is the caller's policy).
    *
    * Determinism: per-source availability and quality come from exact
    * integer aggregates (token counts as longs, the 2-decimal quality
    * grid summed as 1e2-grid longs); each allocation is ONE
    * floor(double·mult/div) of identical operands cross-engine; the
    * anneal membership rank orders by (exact mean-quality division,
    * source) — the sm9 order-statistic discipline, no interpolation.
    *
    * Scale shape: one partial-agg shuffle over the corpus; everything
    * after runs on the |sources|-row table (1-row totals broadcast
    * back). Returns (source, n_avail, main_tokens, anneal_tokens). */
  def annealMixture(df: DataFrame, sourceCol: String, textCol: String,
                    budgetNum: Long = 2L, budgetDen: Long = 5L,
                    annealPct: Int = 20): DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0 && budgetNum <= budgetDen,
      s"need a budget fraction in [0,1], got $budgetNum/$budgetDen")
    require(annealPct >= 0 && annealPct <= 100,
      s"need annealPct in [0,100], got $annealPct")
    val scored = TextAnalysis.qualityScore(df, textCol)
      .select(col(sourceCol).as("source"),
        Packing.tokenCount(col(textCol)).as("toks"),
        floor(col("quality") * 100.0 + 0.5).cast("long").as("q100"))
    val src = scored.groupBy(col("source"))
      .agg(sum(col("toks")).as("n_avail"), sum(col("q100")).as("sq"),
           count(lit(1)).as("nd"))
      .withColumn("mq", col("sq").cast("double") / col("nd").cast("double"))
    // anneal membership rank via the broadcast array fold (the mixSchedule
    // discipline) — same (mq desc, source) order a row_number would give,
    // with no unpartitioned window even on this |sources|-row table
    val srcArr = src.agg(
      collect_list(struct(col("mq").as("m"), col("source").as("s"))).as("all"))
    val ranked = src.crossJoin(broadcast(srcArr))
      .withColumn("rk", expr(
        """aggregate(all, 1L, (acc, x) -> acc +
          |  CASE WHEN x.m > mq OR (x.m = mq AND x.s < source)
          |       THEN 1L ELSE 0L END)""".stripMargin))
      .withColumn("ns", size(col("all")).cast("long"))
      .withColumn("inAnneal", col("rk") * 2L <= col("ns"))
      .drop("all")
    // the budget derives in-plan from the corpus total (no eager action;
    // the d11 lesson): budget = floor(tot·num/den), then an exact
    // integer split between the phases
    val totals = ranked.groupBy()
      .agg(sum(col("n_avail")).as("tot"),
           sum(when(col("inAnneal"), col("n_avail")).otherwise(0L)).as("totA"))
      .withColumn("budget",
        floor(col("tot").cast("double") * lit(budgetNum.toDouble) /
              lit(budgetDen.toDouble)).cast("long"))
      .withColumn("mainB",
        floor(col("budget").cast("double") *
              lit((100 - annealPct).toDouble / 100.0)).cast("long"))
      .withColumn("annealB", col("budget") - col("mainB"))
    ranked.crossJoin(broadcast(totals))
      .withColumn("main_tokens",
        least(col("n_avail"), floor(col("mainB").cast("double") *
          col("n_avail").cast("double") / col("tot").cast("double"))
          .cast("long")))
      .withColumn("anneal_tokens",
        when(!col("inAnneal") || col("totA") === 0L, lit(0L))
          .otherwise(least(col("n_avail"), floor(col("annealB").cast("double") *
            col("n_avail").cast("double") / col("totA").cast("double"))
            .cast("long"))))
      .select(col("source"), col("n_avail"), col("main_tokens"),
              col("anneal_tokens"))
  }

  /** Deterministic training-mix SCHEDULE: given a per-source token
    * allocation (the output of [[annealMixture]] / [[waterfillMixture]]),
    * cut each source into fixed-size chunks and assign every chunk a
    * global training step so that each source's chunks are evenly
    * interleaved across the run — the "don't front-load one source"
    * discipline of multi-corpus pretraining (chunk k of a source with n
    * chunks sits at fractional position k/n of the run).
    *
    * The naive form — row_number over a global ORDER BY (k/n, source) —
    * is a single-task sort over a DATA-SIZED table (one row per training
    * chunk; at 100 TB that is billions of rows). Instead the step is
    * computed in CLOSED FORM: step(s,k) = 1 + (k−1) +
    * Σ_{t≠s} |{j ≤ n_t : j/n_t < k/n_s}| + ties-before, and the inner
    * count is pure integer arithmetic, |{j : j·n_s < k·n_t}| =
    * floor((k·n_t − 1)/n_s), with the tie j·n_s = k·n_t (at most one j)
    * ordered by source name. The |sources|-row chunk-count table folds as
    * one broadcast ARRAY inside a single map-side aggregate expression
    * over the exploded chunk list — no join, no row expansion, no
    * shuffle, no window — and exactly equals the rank the global sort
    * would produce (spec- and property-pinned). Tie detection is exact
    * integer equality j·n_s = k·n_t; a sort over double fractions agrees
    * because distinct chunk fractions differ by ≥ 1/(n_s·n_t), far above
    * double ulp for any per-source chunk count below ~2²⁶.
    *
    * Returns (source, chunk_idx 1-based, n_chunks, step 1-based); steps
    * are a permutation of 1..Σn_chunks. */
  def mixSchedule(alloc: DataFrame, sourceCol: String, allocCol: String,
                  chunkTokens: Long = 4096L): DataFrame = {
    require(chunkTokens >= 1, s"need chunkTokens >= 1, got $chunkTokens")
    val nchunks = alloc
      .select(col(sourceCol).as("source"),
        ceil(col(allocCol).cast("double") / chunkTokens.toDouble)
          .cast("long").as("n_chunks"))
      .filter(col("n_chunks") > 0L)
    val chunks = nchunks
      .withColumn("chunk_idx", explode(sequence(lit(1L), col("n_chunks"))))
    // the |sources|-row counts table folds as ONE broadcast array inside a
    // single map-side aggregate expression — no ×(S−1) row expansion, no
    // re-shuffle of the chunk stream, no sort anywhere
    val countsArr = nchunks.agg(
      collect_list(struct(col("source").as("s"), col("n_chunks").as("n")))
        .as("cs"))
    chunks.crossJoin(broadcast(countsArr))
      .withColumn("cross_before", expr(
        """aggregate(cs, 0L, (acc, x) -> acc +
          |  CASE WHEN x.s = source THEN 0L
          |       ELSE (chunk_idx * x.n - 1) div n_chunks +
          |            (CASE WHEN (chunk_idx * x.n) % n_chunks = 0
          |                   AND (chunk_idx * x.n) div n_chunks <= x.n
          |                   AND x.s < source THEN 1L ELSE 0L END)
          |  END)""".stripMargin))
      .withColumn("step", col("chunk_idx") + col("cross_before"))
      .select(col("source"), col("chunk_idx"), col("n_chunks"), col("step"))
  }

  /** DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining",
    * arXiv:2305.10429, Algorithm 1): a mirror-descent / Hedge fold over
    * per-domain per-step excess losses — each step multiplies every
    * domain's weight by exp(η·excess), renormalizes, and mixes a little
    * uniform mass back in so no domain starves. The proxy "loss" here is
    * the deterministic bounded length signal n/(n+1000) (a real run plugs
    * in proxy-model losses; the OPERATOR is the update rule), batches are
    * the id-mod step slices, and excess is each domain's batch mean over
    * the all-domain batch mean, clipped at 0 (the paper's clip).
    *
    * Scale shape: ONE corpus aggregate produces the (step × domain)
    * loss table — map-side partial sums, ~steps·|domains| rows — and the
    * fold runs on the driver over that BOUNDED table (the topV-class
    * collect contract: steps and domains are configuration-sized, never
    * corpus-sized). Determinism: losses and excesses live on 1e-6 grids,
    * exp() output snaps to the 1e-9 grid before use, per-step masses are
    * summed as EXACT 1e-12 integers (order-free), and each step's
    * weights re-quantize to 1e-9 — so a DuckDB unrolled replay matches
    * op-for-op. Returns the full (step, source, weight) trajectory. */
  def doremiWeights(docs: DataFrame, sourceCol: String, idCol: String,
                    lenCol: String, steps: Int = 8): DataFrame = {
    require(steps >= 1, s"need steps >= 1, got $steps")
    val spark = docs.sparkSession
    val agg = docs.select(col(sourceCol).cast("string").as("source"),
        pmod(col(idCol), lit(steps.toLong)).as("step"),
        floor(col(lenCol).cast("double") / (col(lenCol) + lit(1000L)) * 1e6
          + 0.5).cast("long").as("loss6"))
      .groupBy(col("step"), col("source"))
      .agg(sum(col("loss6")).as("s6"), count(lit(1)).as("c"))
      .collect()                    // bounded: steps × |domains| rows
      .map(r => ((r.getLong(0), r.getString(1)),
                 (r.getLong(2), r.getLong(3)))).toMap
    val sources = agg.keys.map(_._2).toSeq.distinct.sorted
    val d = sources.length
    require(d >= 1, "no domains")
    // per-(step, domain) clipped excess on the 1e-6 grid; empty slices
    // contribute excess 0 (they teach the fold nothing)
    val ex = Array.tabulate(steps, d) { (t, i) =>
      val stepRows = sources.indices.flatMap(j => agg.get((t.toLong, sources(j))))
      val gs6 = stepRows.map(_._1).sum
      val gc = stepRows.map(_._2).sum
      agg.get((t.toLong, sources(i))) match {
        case Some((s6, c)) if gc > 0 =>
          val l = s6.toDouble / c / 1e6
          val g = gs6.toDouble / gc / 1e6
          math.floor(math.max(l - g, 0.0) * 1e6 + 0.5) / 1e6
        case _ => 0.0
      }
    }
    var w = Array.fill(d)(math.floor(1.0 / d * 1e9 + 0.5) / 1e9)
    val out = Seq.newBuilder[(Long, String, Double)]
    for (t <- 0 until steps) {
      val e9 = Array.tabulate(d)(i =>
        math.floor(math.exp(ex(t)(i)) * 1e9 + 0.5) / 1e9)
      val m12 = Array.tabulate(d)(i =>
        math.floor(w(i) * e9(i) * 1e12 + 0.5).toLong)
      val s12 = m12.sum
      w = Array.tabulate(d) { i =>
        val mixed = 0.984375 * (m12(i).toDouble / s12.toDouble) +
          0.015625 * (1.0 / d)
        math.floor(mixed * 1e9 + 0.5) / 1e9
      }
      for (i <- 0 until d) out += (((t + 1).toLong, sources(i), w(i)))
    }
    import spark.implicits._
    out.result().toDF("step", "source", "weight")
  }

  /** Data-constrained effective tokens (Muennighoff et al. 2023,
    * "Scaling Data-Constrained Language Models"): training on a source
    * for E epochs is worth less than E× fresh data — their fitted decay
    * gives, per source with U unique tokens,
    *   D'' = U + U·R_D·(1 − exp(−(E−1)/R_D))   for E > 1   (eq. 6 form)
    *   D'' = U·E                                for E ≤ 1  (fresh data)
    * with the paper's fitted R*_D ≈ 15.39. `eff_frac` = D''/(U·E) is
    * the value retained per token actually consumed — the number a
    * mixture planner multiplies into per-source budgets before handing
    * them to the unimax/waterfill allocators (which cap EPOCHS; this
    * prices what those epochs still buy).
    *
    * Shape: ONE token-count reduce to the |sources| table, scalar math
    * after. Determinism: U is an exact [[Packing.tokenCount]] BIGINT, E
    * and the exp land on the 1e-6/1e-9 grids. */
  /** Effective sample size of per-document importance weights (Kong
    * 1992's ESS = (Σw)²/Σw²) per source — the health check on ANY
    * weighted-sampling plan ([[dsirLogWeights]], quality-score
    * weighting, [[weightedSample]] inputs): ESS/n near 1 means weights
    * are flat (weighting is doing nothing), near 0 means a handful of
    * documents dominate (the sample will effectively repeat them).
    * Emits (source, n_docs, w_total, ess, ess_frac).
    *
    * Determinism: integer weights fold exactly ((Σw)² < 2^63 for
    * Σw < 3·10^9 per source — pass scaled-down weights beyond that);
    * ESS is one fixed-order division. ONE map-side-combined reduce. */
  def weightEss(df: DataFrame, sourceCol: String,
                weightCol: String): DataFrame =
    df.select(col(sourceCol).as("source"),
        col(weightCol).cast("long").as("w"))
      .filter(col("w") > 0)
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
           sum(col("w")).as("w_total"),
           sum(col("w") * col("w")).as("w2"))
      .withColumn("ess",
        graft.queries.Det.dround(
          col("w_total").cast("double") * col("w_total") / col("w2"), 6))
      .withColumn("ess_frac",
        graft.queries.Det.dround(col("ess") / col("n_docs"), 9))
      .drop("w2")

  def effectiveTokens(df: DataFrame, sourceCol: String, textCol: String,
                      epochs: Double, rd: Double = 15.39): DataFrame = {
    require(epochs > 0 && rd > 0, s"need epochs > 0, rd > 0; got ($epochs, $rd)")
    df.groupBy(col(sourceCol).as("source"))
      .agg(sum(Packing.tokenCount(col(textCol))).as("n_unique"))
      .withColumn("epochs", lit(epochs))
      .withColumn("eff_tokens",
        graft.queries.Det.dround(
          when(lit(epochs) <= 1.0, col("n_unique") * lit(epochs))
            .otherwise(col("n_unique")
              + col("n_unique") * lit(rd)
                * (lit(1.0) - exp(lit(-(epochs - 1.0) / rd)))), 6))
      .withColumn("eff_frac",
        graft.queries.Det.dround(
          col("eff_tokens") / (col("n_unique") * lit(epochs)), 9))
  }
}
