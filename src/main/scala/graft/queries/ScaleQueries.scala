package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.scale.{Dedup, Similarity, TextAnalysis, Multimodal, PerSeriesForecast}
import graft.streaming.EventWindows
import graft.queries.Det._

/** Oracle-checked queries for the scale/corpus operators (north star:
  * dedup, similarity search, text analysis, multimodal, streaming).
  * Approximate operators (LSH/SimHash) are rows-only; each has an exact
  * oracle-checked twin that bounds it in tests. */
object ScaleQueries {

  type Q = (SparkSession, String) => DataFrame

  // ---- dedup family ----------------------------------------------------

  /** Exact dedup over documents ∪ documents (duplicates injected so the
    * operator has real work; the raw table is dup-free). */
  private def d1Exact: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    Dedup.exact(docs.unionByName(docs), "text", "doc_id")
  }

  private val d1Sql =
    """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_dups
      |FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
      |GROUP BY md5(text)""".stripMargin

  private def d2Jaccard: Q = (s, d) =>
    Dedup.ngramJaccard(Tables.documents(s, d), "text", "doc_id", 3, 0.5)
      .select(col("id_a"), col("id_b"), dround(col("jaccard"), 6).as("jaccard"))

  // shared with d20_prefix_join (prefix filtering is lossless, so the
  // PPJoin-style plan is hash-checked against the SAME oracle)
  private[queries] val d2Sql =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(w) - 2),
       |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
       |       FROM toks WHERE len(w) >= 3),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
       |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |j AS (SELECT id_a, id_b,
       |        CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
       |      FROM inter JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id)
       |SELECT id_a, id_b, ${droundSql("jaccard", 6)} AS jaccard
       |FROM j WHERE jaccard >= 0.5""".stripMargin

  private def d3MinHashLsh: Q = (s, d) =>
    Dedup.minHashLsh(Tables.documents(s, d), "text", "doc_id", 3, 16, 8, 0.5)
      .select(col("id_a"), col("id_b"), dround(col("jaccard"), 6).as("jaccard"))

  /** D3 hash twin (r11 task #6b) — [[Dedup.minHashLshR1]]: bands = k
    * makes candidate = "any permutation min agrees", replayed in DuckDB
    * over the same md5 hash family and the same coefficient sequence;
    * the full candidate + verify pipeline is hash-checked. The
    * production d3 path's xxhash64 signature is separately pinned
    * against the SQL-primitive signature path in FunctionsSpec. */
  private def d3MinHashR1: Q = (s, d) =>
    Dedup.minHashLshR1(Tables.documents(s, d), "text", "doc_id", 3, 16, 0.5)
      .select(col("id_a"), col("id_b"), dround(col("jaccard"), 6).as("jaccard"))

  private val d3R1Sql = {
    val p = 2147483647L
    val coef = graft.scale.Dedup.hashCoefficients(16, p)
    val coVals = coef.zipWithIndex
      .map { case ((a, b), i) => s"($i, ${a}, ${b})" }.mkString(", ")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id,
       |         ('0x' || substr(md5(g), 1, 15))::BIGINT % $p AS x
       |       FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 2),
       |               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
       |             FROM toks WHERE len(w) >= 3)),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |co AS (SELECT * FROM (VALUES $coVals) t(i, a, b)),
       |sig AS (SELECT doc_id, co.i AS band, min((x * a + b) % $p) AS v
       |        FROM sh CROSS JOIN co GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
       |         FROM sig l JOIN sig r ON l.band = r.band AND l.v = r.v
       |                              AND l.doc_id < r.doc_id),
       |inter AS (SELECT c.id_a, c.id_b, count(*) AS ic
       |          FROM cand c JOIN sh a ON a.doc_id = c.id_a
       |                      JOIN sh b ON b.doc_id = c.id_b AND b.x = a.x
       |          GROUP BY 1, 2),
       |j AS (SELECT id_a, id_b,
       |        CAST(ic AS DOUBLE) / (sa.n + sb.n - ic) AS jaccard
       |      FROM inter JOIN sz sa ON id_a = sa.doc_id
       |                 JOIN sz sb ON id_b = sb.doc_id)
       |SELECT id_a, id_b, ${droundSql("jaccard", 6)} AS jaccard
       |FROM j WHERE jaccard >= 0.5""".stripMargin
  }

  private def d4SimHash: Q = (s, d) =>
    Dedup.simHashPairs(Tables.documents(s, d), "text", "doc_id", 3)

  /** ✔dt HASH TWIN of [[d4SimHash]] (r14 ask #6): the SAME 4-block
    * pigeonhole Hamming-≤3 pair join ([[Dedup.hammingPairs]] — exact for
    * maxHamming ≤ 3, never probabilistic), but fingerprinted with
    * [[graft.streaming.StreamDedup.md5SimHash]], the 60-bit
    * engine-replayable signature (the st_neardup_w pattern), so the
    * oracle rebuilds every signature bit-for-bit in DuckDB and replays
    * the block join + bit_count filter exactly. Runs on a 1-in-4 doc
    * subset with EDITED variants injected (every 5th subset doc, ids
    * fenced past max(doc_id)) so the pair set stays rich at every SF
    * without md5-tokenizing the whole corpus; d4_simhash (the xxhash64
    * production path) keeps its rows-only check. */
  private def d4SimHashW: Q = (s, d) => {
    val docs = Tables.documents(s, d).filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"), col("text"))
    val fenceRow = docs.agg(max(col("doc_id"))).head()
    val fence = (if (fenceRow.isNullAt(0)) 0L else fenceRow.getLong(0)) + 1L
    val variants = docs.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + fence).as("doc_id"),
              regexp_replace(col("text"), "^\\S+", "EDITED").as("text"))
    val all = docs.unionByName(variants)
      .withColumn("msig", graft.streaming.StreamDedup.md5SimHash("text"))
    Dedup.hammingPairs(all, "msig", "doc_id", 3)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
  }

  private val d4WSql =
    s"""WITH sub AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0),
       |f AS (SELECT max(doc_id) + 1 AS fence FROM sub),
       |allr AS (SELECT doc_id, text FROM sub
       |  UNION ALL
       |  SELECT doc_id + f.fence, regexp_replace(text, '^\\S+', 'EDITED')
       |  FROM sub, f WHERE doc_id % 20 = 0),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM allr),
       |h AS (SELECT doc_id,
       |    ('0x' || substr(md5(w), 1, 15))::BIGINT AS h FROM tok),
       |bits AS (SELECT doc_id, b.range AS b,
       |    CAST(sum(CASE WHEN ((h >> CAST(b.range AS INT)) & 1) = 1
       |             THEN 1 ELSE -1 END) AS BIGINT) AS c
       |  FROM h CROSS JOIN range(0, 60) b GROUP BY 1, 2),
       |sg AS (SELECT doc_id,
       |    CAST(sum(CASE WHEN c > 0 THEN (1::BIGINT << b) ELSE 0 END)
       |      AS BIGINT) AS sig
       |  FROM bits GROUP BY 1),
       |blk AS (SELECT doc_id, sig, b.range AS block,
       |    (sig >> CAST(b.range*16 AS INT)) & 65535 AS key
       |  FROM sg CROSS JOIN range(0, 4) b),
       |cand AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
       |    l.sig AS sa, r.sig AS sb
       |  FROM blk l JOIN blk r ON l.block = r.block AND l.key = r.key
       |    AND l.doc_id < r.doc_id)
       |SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(sa, sb)) <= 3""".stripMargin

  private def d5Cosine: Q = (s, d) =>
    Dedup.cosineNearDup(Tables.embeddings(s, d), "embedding", "vec_id", 0.4)
      .select(col("id_a"), col("id_b"), dround(col("cosine"), 6).as("cosine"))

  private val d5Sql =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |        list_dot_product(a.e, b.e) /
       |        (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS cosine
       |      FROM v a JOIN v b ON a.vec_id < b.vec_id)
       |SELECT id_a, id_b, ${droundSql("cosine", 6)} AS cosine
       |FROM p WHERE cosine >= 0.4""".stripMargin

  /** Near-dup clusters: components over the exact n-gram Jaccard pairs —
    * the full pair-generator → cluster pipeline, hash-checked against a
    * DuckDB recursive-CTE reachability closure. */
  private def d8Components: Q = (s, d) => {
    val pairs = Dedup.ngramJaccard(Tables.documents(s, d), "text", "doc_id", 3, 0.5)
    Dedup.components(pairs, "id_a", "id_b")
  }

  private val d8Sql =
    s"""WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(w) - 2),
       |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
       |       FROM toks WHERE len(w) >= 3),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
       |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |pairs AS (SELECT id_a, id_b
       |          FROM inter JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
       |          WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
       |e AS (SELECT id_a AS s, id_b AS t FROM pairs
       |      UNION SELECT id_b, id_a FROM pairs),
       |reach(id, r) AS (
       |  SELECT s, s FROM (SELECT DISTINCT s FROM e)
       |  UNION
       |  SELECT reach.id, e.t FROM reach JOIN e ON reach.r = e.s)
       |SELECT id, min(r) AS component FROM reach GROUP BY id""".stripMargin

  // ---- similarity search -------------------------------------------------

  private val annQueryIds = Seq(0L, 1L, 2L, 3L, 4L)

  private def s1TopK: Q = (s, d) =>
    Similarity.bruteForceTopK(Tables.embeddings(s, d), annQueryIds, 5, "embedding", "vec_id")

  private val s1Sql =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id IN (0, 1, 2, 3, 4)),
       |scored AS (
       |  SELECT q.qid, v.vec_id AS vid,
       |    floor(list_dot_product(v.e, q.qe) /
       |      (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(q.qe, q.qe))) * 1000000.0 + 0.5) / 1000000.0 AS cosine
       |  FROM v JOIN q ON v.vec_id <> q.qid),
       |ranked AS (
       |  SELECT qid, vid, cosine,
       |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS rank
       |  FROM scored)
       |SELECT qid, CAST(rank AS BIGINT) AS rank, vid, cosine
       |FROM ranked WHERE rank <= 5""".stripMargin

  private def s2AnnLsh: Q = (s, d) =>
    Similarity.lshTopK(Tables.embeddings(s, d), annQueryIds, 5, "embedding", "vec_id")

  /** S2 hash twin (r11 task #6a, the s4_ann_ivf_full pattern): with
    * nPlanes = 0 every vector lands in bucket 0, so the LSH pipeline
    * (bucketing, bucket-equality join, scoring, ranking) MUST return the
    * exact brute-force top-k — hash-checked against the s1 oracle. */
  private def s2AnnLshFull: Q = (s, d) =>
    Similarity.lshTopK(Tables.embeddings(s, d), annQueryIds, 5, "embedding",
      "vec_id", nPlanes = 0)

  private def s3AnnIvf: Q = (s, d) =>
    Similarity.ivfTopK(Tables.embeddings(s, d), annQueryIds, 5, "embedding", "vec_id",
      nCells = 8, nProbe = 3)

  /** IVF with nProbe = nCells: every cell is probed, so the index MUST
    * return the exact brute-force top-k — the whole IVF pipeline
    * (centroid build, cell assignment, probe routing, scoring, ranking)
    * is hash-checked against the same oracle as s1. */
  private def s4AnnIvfExhaustive: Q = (s, d) =>
    Similarity.ivfTopK(Tables.embeddings(s, d), annQueryIds, 5, "embedding", "vec_id",
      nCells = 8, nProbe = 8)

  /** A10 row-transpose form: top-k rows most Pearson-correlated to row 7
    * (the reference's `top_correlation_to_name`, rows-as-series). */
  private def a10RowCorr: Q = (s, d) =>
    Similarity.rowCorrTopK(Tables.embeddings(s, d), "vec_id", "embedding",
      targetId = 7L, k = 10)

  private val a10RowCorrSql =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |q AS (SELECT e AS qe FROM v WHERE vec_id = 7),
      |s AS (
      |  SELECT v.vec_id AS rid,
      |    CAST(len(v.e) AS DOUBLE) AS n,
      |    list_sum(v.e) AS sx,
      |    list_dot_product(v.e, v.e) AS sxx,
      |    list_dot_product(v.e, q.qe) AS sxy,
      |    list_sum(q.qe) AS sy,
      |    list_dot_product(q.qe, q.qe) AS syy
      |  FROM v CROSS JOIN q),
      |p AS (SELECT rid,
      |  CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0 THEN
      |    floor((n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)) * 1000000.0 + 0.5)/1000000.0
      |  END AS pearson
      |  FROM s)
      |SELECT rid, pearson FROM p ORDER BY pearson DESC NULLS LAST, rid LIMIT 10""".stripMargin

  // ---- text analysis -------------------------------------------------------

  private def x1TextStats: Q = (s, d) =>
    TextAnalysis.docStats(Tables.documents(s, d), "text")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           dround(avg(col("n_tokens")), 6).as("avg_tokens"),
           dround(avg(col("punct_ratio")), 6).as("avg_punct"),
           dround(avg(col("stopword_ratio")), 6).as("avg_stopword"),
           dround(avg(col("mean_token_len")), 6).as("avg_token_len"))

  private val x1Sql = {
    val stop = TextAnalysis.qualityStopwordsSql
    s"""WITH s AS (
       |  SELECT lang,
       |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
       |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stop))) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS stopword_ratio,
       |    CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS mean_token_len
       |  FROM documents)
       |SELECT lang, count(*) AS n_docs,
       | ${droundSql("avg(n_tokens)", 6)} AS avg_tokens,
       | ${droundSql("avg(punct_ratio)", 6)} AS avg_punct,
       | ${droundSql("avg(stopword_ratio)", 6)} AS avg_stopword,
       | ${droundSql("avg(mean_token_len)", 6)} AS avg_token_len
       |FROM s GROUP BY lang""".stripMargin
  }

  private def x2LangId: Q = (s, d) =>
    TextAnalysis.languageId(Tables.documents(s, d), "text")
      .select(col("doc_id"), col("pred_lang"))

  private val x2Sql = {
    val langs = TextAnalysis.stopwordLists.keys.toSeq.sorted
    val hits = langs.map { l =>
      val list = TextAnalysis.stopwordLists(l).map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split(lower(text), ' '), x -> x IN ($list))) AS hits_$l"
    }.mkString(",\n    ")
    val m = langs.map(l => s"hits_$l").mkString("greatest(", ", ", ")")
    val caseChain = langs.map(l => s"WHEN hits_$l = m THEN '$l'").mkString(" ")
    s"""WITH h AS (SELECT doc_id,
       |    $hits
       |  FROM documents),
       |g AS (SELECT doc_id, $m AS m, * FROM h)
       |SELECT doc_id, CASE $caseChain END AS pred_lang FROM g""".stripMargin
  }

  /** Quality-score distribution: the score is a deterministic expression
    * battery, so the whole operator is oracle-checkable. */
  private def x5Quality: Q = (s, d) =>
    TextAnalysis.qualityScore(Tables.documents(s, d), "text")
      .groupBy(dround(col("quality"), 2).as("quality_bin"))
      .agg(count(lit(1)).as("n"))

  private val x5Sql = {
    val stop = TextAnalysis.qualityStopwordsSql
    s"""WITH s AS (
       |  SELECT CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
       |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stop))) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS stopword_ratio
       |  FROM documents),
       |q AS (
       |  SELECT (CASE WHEN n_tokens >= 20 THEN 0.4 ELSE n_tokens / 50 END
       |        + CASE WHEN punct_ratio <= 0.1 THEN 0.3 ELSE 0.0 END
       |        + CASE WHEN stopword_ratio BETWEEN 0.05 AND 0.6 THEN 0.3 ELSE 0.0 END) AS quality
       |  FROM s)
       |SELECT ${droundSql("quality", 2)} AS quality_bin, count(*) AS n
       |FROM q GROUP BY 1""".stripMargin
  }

  /** Gopher-style repetition filters (Rae et al. 2021 Table A1 adapted
    * to token streams — see [[TextAnalysis.repetitionStats]]): to give
    * the filter real work, every 25th document is made degenerate by
    * replacing its text with its own first bigram repeated, so the
    * keep flag actually fires both ways. Entirely deterministic. The
    * rewrite only applies to docs with ≥2 tokens — guarded identically
    * in BOTH engines, because a 1-token doc would otherwise hit
    * engine-specific null handling (Spark's concat_ws skips the null
    * second token; DuckDB list NULLs need their own skip rule). */
  private def x10Repetition: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val degenerate = concat_ws(" ", (0 until 20).map(_ =>
      concat_ws(" ", split(col("text"), " ")(0), split(col("text"), " ")(1))): _*)
    val mixed = docs.withColumn("text",
      when(col("doc_id") % 25 === 0 && size(split(col("text"), " ")) >= 2,
        degenerate).otherwise(col("text")))
    TextAnalysis.repetitionStats(mixed, "text", "doc_id")
      .select(col("doc_id"), col("n_tokens"),
        dround(col("top_token_frac"), 6).as("top_token_frac"),
        dround(col("top_bigram_frac"), 6).as("top_bigram_frac"),
        dround(col("dup_trigram_frac"), 6).as("dup_trigram_frac"),
        col("keep").cast("long").as("keep"))
  }

  private val x10Sql =
    s"""WITH base AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 25 = 0 AND len(string_split(text, ' ')) >= 2 THEN
       |      array_to_string(flatten(list_transform(generate_series(1, 20),
       |        i -> [string_split(text, ' ')[1], string_split(text, ' ')[2]])), ' ')
       |    ELSE text END AS text
       |  FROM documents),
       |t AS (SELECT doc_id, string_split(text, ' ') AS w FROM base),
       |g AS (SELECT doc_id, w,
       |    list_transform(generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i+1]) AS bi,
       |    list_transform(generate_series(1, len(w) - 2), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS tri
       |  FROM t),
       |f AS (SELECT doc_id,
       |    CAST(len(w) AS BIGINT) AS n_tokens,
       |    CASE WHEN len(w) > 0 THEN
       |      CAST(list_aggregate(list_transform(list_distinct(w),
       |        u -> len(list_filter(w, x -> x = u))), 'max') AS DOUBLE) / len(w)
       |    ELSE 0.0 END AS top_token_frac,
       |    CASE WHEN len(bi) > 0 THEN
       |      CAST(list_aggregate(list_transform(list_distinct(bi),
       |        u -> len(list_filter(bi, x -> x = u))), 'max') AS DOUBLE) / len(bi)
       |    ELSE 0.0 END AS top_bigram_frac,
       |    CASE WHEN len(tri) > 0 THEN
       |      1.0 - CAST(len(list_distinct(tri)) AS DOUBLE) / len(tri)
       |    ELSE 0.0 END AS dup_trigram_frac
       |  FROM g)
       |SELECT doc_id, n_tokens,
       | ${droundSql("top_token_frac", 6)} AS top_token_frac,
       | ${droundSql("top_bigram_frac", 6)} AS top_bigram_frac,
       | ${droundSql("dup_trigram_frac", 6)} AS dup_trigram_frac,
       | CAST(top_bigram_frac <= 0.18 AND dup_trigram_frac <= 0.30 AS BIGINT) AS keep
       |FROM f""".stripMargin

  /** CCNet-style unigram-LM quality score (see
    * [[TextAnalysis.unigramLogProb]]): per-doc mean token log-prob under
    * the corpus distribution, add-½ smoothed, vocabulary PRUNED to the
    * top-20 tokens (the sf0.01 corpus has 31 distinct tokens, so the OOV
    * bucket is genuinely exercised and hash-checked). Deterministic — the
    * count table is exact integers, top-V tie-breaks (cnt desc, tok asc),
    * and each doc's token rows stay in their producing partition
    * (explode), so the per-doc float sum has a fixed order; dround(4)
    * absorbs the engines' summation-order ulp. */
  private def x11UnigramLm: Q = (s, d) =>
    TextAnalysis.unigramLogProb(Tables.documents(s, d), "text", "doc_id",
        topV = 20)
      .select(col("doc_id"), dround(col("mean_logp"), 4).as("mean_logp"),
              col("n_tokens"))

  private val x11Sql =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |c AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
       |top AS (SELECT tok, cnt FROM c ORDER BY cnt DESC, tok ASC LIMIT 20),
       |t AS (SELECT CAST((SELECT sum(cnt) FROM c) AS DOUBLE) AS n,
       |             CAST((SELECT count(*) FROM top) AS DOUBLE) AS v,
       |             CAST((SELECT sum(cnt) FROM c) AS DOUBLE)
       |               - CAST((SELECT sum(cnt) FROM top) AS DOUBLE) AS oov),
       |s AS (SELECT doc_id,
       |        ln((coalesce(top.cnt, t.oov) + 0.5) / (t.n + 0.5 * (t.v + 1))) AS logp
       |      FROM toks LEFT JOIN top USING (tok) CROSS JOIN t)
       |SELECT doc_id, ${droundSql("avg(logp)", 4)} AS mean_logp,
       | count(*) AS n_tokens
       |FROM s GROUP BY doc_id""".stripMargin

  private def x3Fingerprint: Q = (s, d) =>
    TextAnalysis.fingerprint(Tables.documents(s, d).filter(length(col("text")) >= 64), "text")
      .select(col("doc_id"), col("fingerprint"))

  private val x3Sql =
    """SELECT doc_id,
      | list_reduce(
      |   list_prepend(CAST(0 AS BIGINT),
      |     list_transform(generate_series(1, 64), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
      |   (acc, c) -> (acc * 31 + c) % 2147483647) AS fingerprint
      |FROM documents WHERE length(text) >= 64""".stripMargin

  // ---- per-series baseline forecasting (scale path) ----------------------

  /** Drift forecast for EVERY user series in one aggregate pass. */
  private def f1Drift: Q = (s, d) =>
    PerSeriesForecast.drift(Tables.events(s, d), "value", "ts",
        Seq("user_id"), 4, Seq("event_id"))
      .select(col("user_id"), col("h").cast("long").as("h"),
              dround(col("yhat"), 6).as("yhat"))

  private val f1Sql =
    s"""WITH r AS (
       |  SELECT user_id, value,
       |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
       |         count(*) OVER (PARTITION BY user_id) AS n
       |  FROM events),
       |f AS (
       |  SELECT user_id,
       |         max(CASE WHEN rn = 1 THEN value END) AS first_y,
       |         max(CASE WHEN rn = n THEN value END) AS last_y,
       |         max(n) AS n
       |  FROM r GROUP BY user_id),
       |h AS (SELECT unnest(generate_series(1, 4)) AS h)
       |SELECT user_id, CAST(h AS BIGINT) AS h,
       | ${droundSql("CASE WHEN n > 1 THEN last_y + h * (last_y - first_y) / (n - 1) ELSE last_y END", 6)} AS yhat
       |FROM f CROSS JOIN h""".stripMargin

  /** Per-series ARIMA(1,0,0): an independent CSS fit per user in one
    * flatMapGroups pass. ✔dt since r15 (the million-models flagship's
    * oracle — r14 ask #7): at (1,0,0) the CSS fit is fitPureAr's exact
    * QR, i.e. per-series OLS of y_t on [1, y_{t−1}] (the m1_ar1
    * algebra), and the recursive forecast closes to
    * c·(1−φʰ)/(1−φ) + φʰ·y_n — so the whole flatMapGroups fold replays
    * as windowed normal equations per series in SQL. Inputs are raw
    * parquet doubles (no pre-aggregation), bit-identical in both
    * engines; 1e-6 grid absorbs the QR-vs-normal-equation gap. */
  private def f3PerSeriesArima: Q = (s, d) =>
    graft.scale.PerSeriesArima.forecastPerSeries(
        Tables.events(s, d), "value", "ts", "user_id",
        graft.models.ArimaCss.Spec(1, 0, 0), 3)
      .select(col("user_id"), col("h"), dround(col("yhat"), 6).as("yhat"))

  /** fitOne's short-series gate is n ≥ 6 (n > maxLag + nParams + 2 =
    * 5), i.e. ≥ 5 lag pairs — the HAVING replays the same skip rule. */
  private val f3Sql =
    s"""WITH s AS (SELECT user_id, value AS y,
       |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, value) AS x
       |  FROM events),
       |r AS (SELECT user_id, y, x FROM s WHERE x IS NOT NULL),
       |a AS (SELECT user_id, CAST(count(*) AS DOUBLE) AS ne,
       |    sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx, sum(x*y) AS sxy
       |  FROM r GROUP BY user_id HAVING count(*) >= 5),
       |b AS (SELECT user_id, ne, sx, sy,
       |    (ne*sxy - sx*sy)/(ne*sxx - sx*sx) AS phi FROM a),
       |c AS (SELECT user_id, phi, (sy - phi*sx)/ne AS c0 FROM b),
       |l AS (SELECT user_id, value AS wl FROM (
       |    SELECT user_id, value, row_number() OVER (
       |      PARTITION BY user_id ORDER BY ts DESC, value DESC) AS rn
       |    FROM events) WHERE rn = 1),
       |f AS (SELECT c.user_id AS user_id, g.h AS h,
       |    c0*(1 - pow(phi, h))/(1 - phi) + pow(phi, h)*wl AS yhat
       |  FROM c JOIN l ON c.user_id = l.user_id,
       |       generate_series(1, 3) AS g(h))
       |SELECT user_id, CAST(h AS BIGINT) AS h,
       | ${droundSql("yhat", 6)} AS yhat
       |FROM f""".stripMargin

  /** Seasonal-naive forecast (period 24) for every user series. */
  private def f2SeasonalNaive: Q = (s, d) =>
    PerSeriesForecast.seasonalNaive(Tables.events(s, d), "value", "ts",
        Seq("user_id"), 6, 24, Seq("event_id"))
      .select(col("user_id"), col("h").cast("long").as("h"),
              dround(col("yhat"), 6).as("yhat"))

  private val f2Sql =
    s"""WITH r AS (
       |  SELECT user_id, value,
       |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rd
       |  FROM events),
       |h AS (SELECT h, 24 - ((h - 1) % 24) AS rd
       |      FROM (SELECT unnest(generate_series(1, 6)) AS h))
       |SELECT user_id, CAST(h.h AS BIGINT) AS h, ${droundSql("value", 6)} AS yhat
       |FROM r JOIN h ON r.rd = h.rd""".stripMargin

  // ---- multimodal (stub decode; real plumbing) -------------------------------

  private def mmDecode: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    Multimodal.decodeMeta(Multimodal.attachBinary(docs, "text"))
      .groupBy(col("meta.format").as("format"))
      .agg(count(lit(1)).as("n"),
           dround(avg(col("meta.width")), 6).as("avg_width"),
           dround(avg(col("meta.height")), 6).as("avg_height"))
  }

  private val mmSql =
    s"""WITH b AS (SELECT CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents)
       |SELECT CASE WHEN n % 3 = 0 THEN 'jpeg' WHEN n % 3 = 1 THEN 'png' ELSE 'webp' END AS format,
       | count(*) AS n,
       | ${droundSql("avg(32 + n % 64)", 6)} AS avg_width,
       | ${droundSql("avg(32 + (n * 7) % 64)", 6)} AS avg_height
       |FROM b GROUP BY 1""".stripMargin

  /** REAL image decode round-trip: deterministic PNGs (dims derived from
    * doc_id) encoded with `ImageIO.write`, then metadata read back through
    * the production [[Multimodal.decodeMeta]] header parse — both
    * directions exercise the actual JDK codec; the oracle recomputes the
    * dimensions arithmetically. */
  private def mm4ImgDecode: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val toPng = udf { (id: Long) =>
      Multimodal.encodePng((8 + id % 32).toInt, (8 + (id * 3) % 32).toInt, seed = id)
    }
    val withMedia = docs.select(col("doc_id")).withColumn("media", toPng(col("doc_id")))
    Multimodal.decodeMeta(withMedia)
      .select(col("doc_id"), col("meta.width").as("width"),
              col("meta.height").as("height"), col("meta.format").as("format"))
  }

  private val mm4Sql =
    """SELECT doc_id,
      | CAST(8 + doc_id % 32 AS INTEGER) AS width,
      | CAST(8 + (doc_id * 3) % 32 AS INTEGER) AS height,
      | 'png' AS format
      |FROM documents""".stripMargin

  /** REAL feature-extraction pixel statistics, codec-true against a
    * pixel-stream SIMULATION: Spark encodes deterministic LCG-filled PNGs
    * (`Multimodal.encodePng`), fully decodes them back through `ImageIO`
    * and sums the channels ([[Multimodal.imageStats]] — the integer sums
    * behind `extractFeatures`' mean-RGB features); DuckDB never touches a
    * codec — it REPLAYS the LCG (s·A+C mod 2⁶⁴ in HUGEINT, one step per
    * pixel, row-major) and sums the same channels. Hash equality proves
    * the real decode path reproduces the generated pixel stream bit-for-
    * bit through a full PNG encode→decode round trip. */
  private def mm5ImgStats: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val toPng = udf { (id: Long) =>
      Multimodal.encodePng((8 + id % 8).toInt, (8 + (id * 3) % 8).toInt, seed = id)
    }
    val stats = udf { (bytes: Array[Byte]) => Multimodal.imageStats(bytes).orNull }
    docs.select(col("doc_id")).withColumn("st", stats(toPng(col("doc_id"))))
      .select(col("doc_id"), col("st._1").as("width"), col("st._2").as("height"),
              col("st._3").as("sum_r"), col("st._4").as("sum_g"), col("st._5").as("sum_b"))
  }

  private val mm5Sql =
    """WITH RECURSIVE d AS (
      |  SELECT doc_id, CAST(8 + doc_id % 8 AS INTEGER) AS w,
      |         CAST(8 + (doc_id * 3) % 8 AS INTEGER) AS h
      |  FROM documents),
      |init AS (
      |  SELECT doc_id, w, h, CAST(w AS BIGINT) * h AS np,
      |    (CAST(doc_id AS HUGEINT) * 6364136223846793005 + 1442695040888963407)
      |      % 18446744073709551616 AS s0
      |  FROM d),
      |px(doc_id, i, s) AS (
      |  SELECT doc_id, CAST(1 AS BIGINT),
      |    (s0 * 6364136223846793005 + 1442695040888963407) % 18446744073709551616
      |  FROM init
      |  UNION ALL
      |  SELECT p.doc_id, p.i + 1,
      |    (p.s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616
      |  FROM px p JOIN init q ON p.doc_id = q.doc_id
      |  WHERE p.i < q.np),
      |pix AS (
      |  SELECT doc_id, (s // 1099511627776) % 16777216 AS p FROM px),
      |sums AS (
      |  SELECT doc_id,
      |    CAST(sum(p // 65536) AS BIGINT) AS sum_r,
      |    CAST(sum((p // 256) % 256) AS BIGINT) AS sum_g,
      |    CAST(sum(p % 256) AS BIGINT) AS sum_b
      |  FROM pix GROUP BY doc_id)
      |SELECT d.doc_id, d.w AS width, d.h AS height, sum_r, sum_g, sum_b
      |FROM d JOIN sums USING (doc_id)""".stripMargin

  /** REAL resize round trip: deterministic PNGs (variable dims from
    * doc_id) → full decode → nearest-neighbor rescale to 16×12 → PNG
    * re-encode → the OUTPUT bytes re-decoded by the real header parser.
    * Hash-green means every re-encoded payload is a valid PNG of exactly
    * the target dimensions — codec-true both directions (pixel EXACTNESS
    * is asserted in ScaleSpec, where known fixtures make expected pixels
    * computable; an encode-length hash would be codec-version trivia, not
    * semantics). */
  private def mm3Resize: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val toPng = udf { (id: Long) =>
      Multimodal.encodePng((8 + id % 32).toInt, (8 + (id * 3) % 32).toInt, seed = id)
    }
    val withMedia = docs.select(col("doc_id")).withColumn("media", toPng(col("doc_id")))
    val resized = Multimodal.resize(Multimodal.decodeMeta(withMedia), 16, 12)
    Multimodal.decodeMeta(resized.drop("meta"))
      .select(col("doc_id"), col("meta.width").as("width"),
              col("meta.height").as("height"), col("meta.format").as("format"),
              (col("meta.n_bytes") > 0).cast("long").as("nonempty"))
  }

  private val mm3Sql =
    """SELECT doc_id,
      | CAST(16 AS INTEGER) AS width, CAST(12 AS INTEGER) AS height,
      | 'png' AS format, CAST(1 AS BIGINT) AS nonempty
      |FROM documents""".stripMargin

  /** Frame-sampling plumbing: stride slicing + posexplode generator shape;
    * frame counts are length arithmetic, so oracle-checkable. */
  private def mm2Frames: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    Multimodal.sampleFrames(Multimodal.attachBinary(docs, "text"), 64, 4)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"), max(col("frame_idx")).cast("long").as("max_idx"))
  }

  private val mm2Sql =
    """SELECT doc_id,
      | least(octet_length(encode(text)) // 64, 3) + 1 AS n_frames,
      | least(octet_length(encode(text)) // 64, 3) AS max_idx
      |FROM documents""".stripMargin

  // ---- streaming-shaped aggregations -------------------------------------------

  private def stWindow: Q = (s, d) =>
    EventWindows.tumblingBatch(Tables.events(s, d), "1 hour")
      .select(tsStr(col("window_start")).as("window_start"), col("event_type"),
              col("n"), dround(col("total_value"), 4).as("total_value"))

  private val stWindowSql =
    s"""SELECT ${tsStrSql("time_bucket(INTERVAL 1 HOUR, ts)")} AS window_start,
       | event_type, count(*) AS n,
       | ${droundSql("sum(value)", 4)} AS total_value
       |FROM events GROUP BY time_bucket(INTERVAL 1 HOUR, ts), event_type""".stripMargin

  private def stSliding: Q = (s, d) =>
    EventWindows.slidingBatch(Tables.events(s, d), "1 hour", "30 minutes")
      .select(tsStr(col("window_start")).as("window_start"), col("event_type"),
              col("n"), dround(col("total_value"), 4).as("total_value"))

  /** Each event belongs to exactly windowLen/slide = 2 slide-aligned
    * windows: starts bucket30(ts) and bucket30(ts) − 30 min. */
  private val stSlidingSql =
    s"""WITH w AS (
       |  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - k * INTERVAL 30 MINUTE AS ws,
       |         event_type, value
       |  FROM events CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS k))
       |SELECT ${tsStrSql("ws")} AS window_start, event_type, count(*) AS n,
       | ${droundSql("sum(value)", 4)} AS total_value
       |FROM w GROUP BY ws, event_type""".stripMargin

  private def stSessionize: Q = (s, d) =>
    EventWindows.sessionize(Tables.events(s, d), 30)
      .select(col("user_id"), col("session_id").cast("long").as("session_id"),
              col("n_events"), dround(col("session_value"), 4).as("session_value"),
              tsStr(col("session_start")).as("session_start"),
              tsStr(col("session_end")).as("session_end"))

  private val stSessionizeSql =
    s"""WITH g AS (
       |  SELECT user_id, ts, event_id, value,
       |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1)
       |           OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
       |         OR lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events),
       |t AS (
       |  SELECT user_id, ts, value,
       |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |  FROM g)
       |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       | count(*) AS n_events, ${droundSql("sum(value)", 4)} AS session_value,
       | ${tsStrSql("min(ts)")} AS session_start, ${tsStrSql("max(ts)")} AS session_end
       |FROM t GROUP BY user_id, session_id""".stripMargin

  // =====================  registry  =====================

  val queries: Map[String, Q] = Map(
    "d1_exact_dedup"   -> d1Exact,
    "d2_ngram_jaccard" -> d2Jaccard,
    "d3_minhash_lsh"   -> d3MinHashLsh,
    "d3_minhash_r1"    -> d3MinHashR1,
    "d4_simhash"       -> d4SimHash,
    "d4_simhash_w"     -> d4SimHashW,
    "d5_cosine_neardup"-> d5Cosine,
    "a10_rowcorr"      -> a10RowCorr,
    "d8_components"    -> d8Components,
    "s1_ann_topk"      -> s1TopK,
    "s2_ann_lsh"       -> s2AnnLsh,
    "s2_ann_lsh_full"  -> s2AnnLshFull,
    "s3_ann_ivf"       -> s3AnnIvf,
    "s4_ann_ivf_full"  -> s4AnnIvfExhaustive,
    "f1_drift_forecast"-> f1Drift,
    "f2_seasonal_naive"-> f2SeasonalNaive,
    "f3_series_arima"  -> f3PerSeriesArima,
    "x1_text_stats"    -> x1TextStats,
    "x2_lang_id"       -> x2LangId,
    "x3_fingerprint"   -> x3Fingerprint,
    "x5_quality"       -> x5Quality,
    "x10_repetition"   -> x10Repetition,
    "x11_unigram_lm"   -> x11UnigramLm,
    "mm2_frames"       -> mm2Frames,
    "mm3_resize"       -> mm3Resize,
    "mm4_imgdecode"    -> mm4ImgDecode,
    "mm5_imgstats"     -> mm5ImgStats,
    "mm_decode"        -> mmDecode,
    "st_window"        -> stWindow,
    "st_sliding"       -> stSliding,
    "st_sessionize"    -> stSessionize
  )

  val oracle: Map[String, String] = Map(
    "f1_drift_forecast"-> f1Sql,
    "f2_seasonal_naive"-> f2Sql,
    "f3_series_arima"  -> f3Sql,
    "d4_simhash_w"     -> d4WSql,
    "d1_exact_dedup"   -> d1Sql,
    "d2_ngram_jaccard" -> d2Sql,
    "d3_minhash_r1"    -> d3R1Sql,
    "d5_cosine_neardup"-> d5Sql,
    "a10_rowcorr"      -> a10RowCorrSql,
    "d8_components"    -> d8Sql,
    "s1_ann_topk"      -> s1Sql,
    "s4_ann_ivf_full"  -> s1Sql,
    "s2_ann_lsh_full"  -> s1Sql,
    "x1_text_stats"    -> x1Sql,
    "x2_lang_id"       -> x2Sql,
    "x3_fingerprint"   -> x3Sql,
    "x5_quality"       -> x5Sql,
    "x10_repetition"   -> x10Sql,
    "x11_unigram_lm"   -> x11Sql,
    "mm2_frames"       -> mm2Sql,
    "mm3_resize"       -> mm3Sql,
    "mm4_imgdecode"    -> mm4Sql,
    "mm5_imgstats"     -> mm5Sql,
    "mm_decode"        -> mmSql,
    "st_window"        -> stWindowSql,
    "st_sliding"       -> stSlidingSql,
    "st_sessionize"    -> stSessionizeSql
    // d3/d4/s2: approximate (LSH/SimHash) — rows-only; bounded by their
    // exact oracle-checked twins in ScaleSpec.
  )
}
