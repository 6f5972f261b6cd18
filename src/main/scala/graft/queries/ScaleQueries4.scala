package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 additions — the mixture-planning / batch-construction /
  * retrieval-prep surface: semi-structured JSON handling (v1/v2),
  * sequence packing and its accounting (pk1–pk4, st_pack, st_budget),
  * TS tokenization (t24/t25, pipe6), curriculum mixtures and schedules
  * (sm16–sm20), corpus diagnostics (x22), objective-construction
  * transforms (x23 FIM, x24 span corruption, x25 word dropout), dedup
  * and retrieval mining (d18, s13–s15), the hashing-trick encoder (e9),
  * and the composed pipelines (pipe5–pipe8). Every ✔dt query pairs a
  * Spark plan with a DuckDB oracle below. */
object ScaleQueries4 {

  type Q = (SparkSession, String) => DataFrame

  // ---- V1: semi-structured JSON extraction ------------------------------

  /** V1 — typed extraction from a JSON payload column (`events.props`):
    * per event type, count/sum/min/max of `$.k` plus distinct high-k
    * users. `get_json_object` is codegen'd path extraction — no UDF, no
    * driver parsing; at 100 TB the JSON stays in the scan task and only
    * the extracted long shuffles to the 5-group aggregate. */
  private def v1JsonExtract: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"), col("user_id"),
              get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("k")).as("sum_k"),
           min(col("k")).as("min_k"),
           max(col("k")).as("max_k"),
           countDistinct(when(col("k") > 50, col("user_id"))).as("hi_users"))

  private val v1Sql =
    """SELECT event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
      |  CAST(count(DISTINCT CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
      |                           THEN user_id END) AS BIGINT) AS hi_users
      |FROM events GROUP BY event_type""".stripMargin

  // ---- V2: JSON key profile (schema discovery) ----------------------------

  /** V2 — schema discovery over the semi-structured column: per event
    * type, every JSON key's occurrence count and presence rate — the
    * "what fields does this feed actually carry" profile run before
    * wiring typed extraction (v1). `json_object_keys` is codegen'd; keys
    * explode map-side and only (type, key) pairs shuffle. */
  private def v2JsonKeys: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val totals = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n_events"))
    ev.select(col("event_type"),
        explode(json_object_keys(col("props"))).as("key"))
      .groupBy(col("event_type"), col("key"))
      .agg(count(lit(1)).as("n_present"))
      .join(broadcast(totals), Seq("event_type"))
      .withColumn("present_permille",
        floor(col("n_present").cast("double") / col("n_events") * 1000 + 0.5)
          .cast("long"))
  }

  private val v2Sql =
    """WITH k AS (
      |  SELECT event_type, unnest(json_keys(props)) AS key FROM events),
      |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
      |      FROM events GROUP BY 1)
      |SELECT k.event_type, k.key, CAST(count(*) AS BIGINT) AS n_present,
      |  t.n_events,
      |  CAST(floor(CAST(count(*) AS DOUBLE) / t.n_events * 1000 + 0.5) AS BIGINT)
      |    AS present_permille
      |FROM k JOIN t USING (event_type)
      |GROUP BY k.event_type, k.key, t.n_events""".stripMargin

  // ---- PK1: greedy sequence packing -------------------------------------

  /** PK1 — greedy fixed-budget sequence packing per (source, shard):
    * one row per packed training sequence with its doc count and token
    * fill. See [[graft.scale.Packing.packGreedy]] for the 100-TB shape
    * (text never shuffles; shard fan-out bounds the sequential fold). */
  private def pk1SeqPack: Q = (s, d) =>
    graft.scale.Packing.packGreedy(
      Tables.documents(s, d), "text", "doc_id", "source",
      budget = 512L, shards = 8)

  private val pk1Sql =
    s"""WITH RECURSIVE docs AS (
       |  SELECT source, doc_id % 8 AS shard, doc_id,
       |         CAST(len(regexp_extract_all(text, '${graft.scale.Packing.tokPattern}')) AS BIGINT) AS toks,
       |         row_number() OVER (PARTITION BY source, doc_id % 8 ORDER BY doc_id) AS rn
       |  FROM documents
       |),
       |pack AS (
       |  SELECT source, shard, rn, toks, CAST(1 AS BIGINT) AS seq_id, toks AS acc
       |  FROM docs WHERE rn = 1
       |  UNION ALL
       |  SELECT d.source, d.shard, d.rn, d.toks,
       |         CASE WHEN p.acc + d.toks > 512 THEN p.seq_id + 1 ELSE p.seq_id END,
       |         CASE WHEN p.acc + d.toks > 512 THEN d.toks ELSE p.acc + d.toks END
       |  FROM pack p JOIN docs d ON d.source = p.source AND d.shard = p.shard
       |                         AND d.rn = p.rn + 1
       |)
       |SELECT source, shard, seq_id, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(toks) AS BIGINT) AS n_tokens
       |FROM pack GROUP BY source, shard, seq_id""".stripMargin

  // ---- PK2: token-budget corpus selection --------------------------------

  /** PK2 — keep the highest-quality 40% of corpus tokens: docs ranked by
    * (quality DESC, md5(id), id), longest prefix within the token
    * budget. The Spark side is the sort-free three-level threshold
    * refinement ([[graft.scale.Packing.budgetSelect]]); the oracle is
    * the same SEMANTICS as one naive ranked window — hash equality
    * proves the refinement exact, not just close. */
  private def pk2BudgetSelect: Q = (s, d) =>
    graft.scale.Packing.budgetSelect(Tables.documents(s, d), "text",
                                     "doc_id", "source")

  private val pk2Sql = {
    val stop = graft.scale.TextAnalysis.qualityStopwordsSql
    s"""WITH s AS (
       |  SELECT source, doc_id,
       |    CAST(len(regexp_extract_all(text, '${graft.scale.Packing.tokPattern}')) AS BIGINT) AS toks,
       |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
       |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stop))) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS stopword_ratio
       |  FROM documents),
       |qd AS (
       |  SELECT source, doc_id, toks, md5(CAST(doc_id AS VARCHAR)) AS h,
       |    floor((CASE WHEN n_tokens >= 20 THEN 0.4 ELSE n_tokens / 50 END
       |         + CASE WHEN punct_ratio <= 0.1 THEN 0.3 ELSE 0.0 END
       |         + CASE WHEN stopword_ratio BETWEEN 0.05 AND 0.6 THEN 0.3 ELSE 0.0 END)
       |          * 100.0 + 0.5) / 100.0 AS q
       |  FROM s),
       |t AS (SELECT CAST(floor(CAST(sum(toks) AS DOUBLE) * 2.0 / 5.0) AS BIGINT) AS budget FROM qd),
       |r AS (
       |  SELECT source, toks, t.budget,
       |    sum(toks) OVER (ORDER BY q DESC, h, doc_id
       |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM qd, t)
       |SELECT source, count(*) AS n_kept, CAST(sum(toks) AS BIGINT) AS tok_kept
       |FROM r WHERE cum <= budget GROUP BY source""".stripMargin
  }

  /** ST — streaming packing's batch twin: the shared per-shard fold,
    * aggregated per sequence. Hash-checked against the SAME oracle as
    * pk1 — the assignment stream provably reconstructs the batch
    * packing (split-invariance of the streaming path is spec-pinned in
    * StreamingSpec). */
  private def stPack: Q = (s, d) =>
    graft.streaming.StreamPack.assignBatch(
        Tables.documents(s, d), "text", "doc_id", "source", budget = 512L,
        shards = 8)
      .toDF()
      .groupBy(col("grp").as("source"), col("shard"),
               col("seqId").as("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))

  // ---- T24: time-series → token ids (Chronos-style) ----------------------

  /** T24 — mean-scale + uniform-bin tokenization of every event series
    * (the Chronos vocabulary bridge: forecasting data as packer-ready
    * token ids). Exact integer scale sums ⇒ hash-checked per point. */
  private def t24TsTokens: Q = (s, d) =>
    graft.scale.TsTokens.meanScaleTokens(
        Tables.events(s, d), "value", "event_id", "user_id",
        bins = 64, clip = 15.0)
      .select(col("sid").as("user_id"), col("id").as("event_id"),
              col("token"))

  private val t24Sql =
    """WITH b AS (
      |  SELECT user_id, event_id,
      |    CAST(floor(CAST(value AS DOUBLE)*1e6 + 0.5) AS BIGINT) AS y6
      |  FROM events),
      |s AS (
      |  SELECT user_id, CAST(sum(abs(y6)) AS BIGINT) AS s6,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM b GROUP BY 1)
      |SELECT b.user_id, b.event_id,
      |  CAST(CASE WHEN s6 = 0 THEN 32
      |       ELSE least(63, greatest(0,
      |         CAST(floor((CAST(y6 AS DOUBLE)*CAST(n AS DOUBLE)/CAST(s6 AS DOUBLE)
      |                     + 15.0) / 30.0 * 64.0) AS BIGINT)))
      |  END AS BIGINT) AS token
      |FROM b JOIN s USING (user_id)""".stripMargin

  /** T25 — the decode leg: every point reconstructed from its token's
    * bin center with the encoder's exact-integer scale. Half-bin error
    * bound is spec-pinned; the arithmetic is hash-checked here. */
  private def t25Detokenize: Q = (s, d) =>
    graft.scale.TsTokens.reconstruct(
        Tables.events(s, d), "value", "event_id", "user_id",
        bins = 64, clip = 15.0)
      .select(col("sid").as("user_id"), col("id").as("event_id"),
              col("token"), Det.dround(col("y_hat"), 6).as("y_hat"))

  private val t25Sql =
    """WITH b AS (
      |  SELECT user_id, event_id,
      |    CAST(floor(CAST(value AS DOUBLE)*1e6 + 0.5) AS BIGINT) AS y6
      |  FROM events),
      |s AS (
      |  SELECT user_id, CAST(sum(abs(y6)) AS BIGINT) AS s6,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM b GROUP BY 1),
      |t AS (
      |  SELECT b.user_id, b.event_id, s6, n,
      |    CAST(CASE WHEN s6 = 0 THEN 32
      |         ELSE least(63, greatest(0,
      |           CAST(floor((CAST(y6 AS DOUBLE)*CAST(n AS DOUBLE)/CAST(s6 AS DOUBLE)
      |                       + 15.0) / 30.0 * 64.0) AS BIGINT)))
      |    END AS BIGINT) AS token
      |  FROM b JOIN s USING (user_id))
      |SELECT user_id, event_id, token,
      |  floor((CAST(s6 AS DOUBLE)/(CAST(n AS DOUBLE)*1e6)
      |         * ((CAST(token AS DOUBLE)+0.5)*(30.0/64.0) - 15.0))*1e6 + 0.5)/1e6
      |    AS y_hat
      |FROM t""".stripMargin

  /** PIPE6 — the TS→LLM bridge end-to-end: tokenize every event series
    * (t24), then cut each series' token stream into fixed 512-token
    * training windows in time order. Per-window stats hash-check the
    * composed chain. The window index is a per-series row_number — a
    * partitioned window on the series key, the t1/t2 discipline. */
  private def pipe6TsWindows: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val toks = graft.scale.TsTokens.meanScaleTokens(
      Tables.events(s, d), "value", "event_id", "user_id",
      bins = 64, clip = 15.0)
    val w = Window.partitionBy(col("sid")).orderBy(col("id"))
    toks
      .withColumn("win", ((row_number().over(w) - 1) / 512).cast("long"))
      .groupBy(col("sid").as("user_id"), col("win"))
      .agg(count(lit(1)).as("n_points"),
           countDistinct(col("token")).as("n_vocab"),
           sum(col("token")).as("sum_token"))
  }

  private val pipe6Sql =
    """WITH b AS (
      |  SELECT user_id, event_id,
      |    CAST(floor(CAST(value AS DOUBLE)*1e6 + 0.5) AS BIGINT) AS y6
      |  FROM events),
      |s AS (
      |  SELECT user_id, CAST(sum(abs(y6)) AS BIGINT) AS s6,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM b GROUP BY 1),
      |t AS (
      |  SELECT b.user_id, b.event_id,
      |    CAST(CASE WHEN s6 = 0 THEN 32
      |         ELSE least(63, greatest(0,
      |           CAST(floor((CAST(y6 AS DOUBLE)*CAST(n AS DOUBLE)/CAST(s6 AS DOUBLE)
      |                       + 15.0) / 30.0 * 64.0) AS BIGINT)))
      |    END AS BIGINT) AS token
      |  FROM b JOIN s USING (user_id)),
      |wi AS (
      |  SELECT user_id, token,
      |    CAST((row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1)
      |         // 512 AS BIGINT) AS win
      |  FROM t)
      |SELECT user_id, win,
      |       CAST(count(*) AS BIGINT) AS n_points,
      |       CAST(count(DISTINCT token) AS BIGINT) AS n_vocab,
      |       CAST(sum(token) AS BIGINT) AS sum_token
      |FROM wi GROUP BY 1, 2""".stripMargin

  // ---- SM16: two-phase curriculum (anneal) mixture -----------------------

  /** SM16 — split a 40%-of-corpus token budget into a main phase over
    * all sources and a 20% anneal phase over the top half by mean
    * quality (the midtraining-mix discipline). Exact integer aggregates
    * + single-division allocations ⇒ fully hash-checked. */
  private def sm16Anneal: Q = (s, d) =>
    graft.scale.Sampling.annealMixture(
      Tables.documents(s, d), "source", "text",
      budgetNum = 2L, budgetDen = 5L, annealPct = 20)

  private val sm16Sql = {
    val stop = graft.scale.TextAnalysis.qualityStopwordsSql
    s"""WITH sdoc AS (
       |  SELECT source,
       |    CAST(len(regexp_extract_all(text, '${graft.scale.Packing.tokPattern}')) AS BIGINT) AS toks,
       |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
       |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stop))) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS stopword_ratio
       |  FROM documents),
       |qd AS (
       |  SELECT source, toks,
       |    CAST(floor((CASE WHEN n_tokens >= 20 THEN 0.4 ELSE n_tokens / 50 END
       |         + CASE WHEN punct_ratio <= 0.1 THEN 0.3 ELSE 0.0 END
       |         + CASE WHEN stopword_ratio BETWEEN 0.05 AND 0.6 THEN 0.3 ELSE 0.0 END)
       |          * 100.0 + 0.5) AS BIGINT) AS q100
       |  FROM sdoc),
       |src AS (
       |  SELECT source, CAST(sum(toks) AS BIGINT) AS n_avail,
       |         CAST(sum(q100) AS BIGINT) AS sq,
       |         CAST(count(*) AS BIGINT) AS nd
       |  FROM qd GROUP BY 1),
       |rk AS (
       |  SELECT source, n_avail,
       |    row_number() OVER (ORDER BY CAST(sq AS DOUBLE)/CAST(nd AS DOUBLE) DESC,
       |                                source) AS rk,
       |    count(*) OVER () AS ns
       |  FROM src),
       |mem AS (SELECT source, n_avail, rk * 2 <= ns AS in_anneal FROM rk),
       |tot AS (
       |  SELECT CAST(sum(n_avail) AS BIGINT) AS tot,
       |    CAST(sum(CASE WHEN in_anneal THEN n_avail ELSE 0 END) AS BIGINT) AS totA
       |  FROM mem),
       |bud AS (
       |  SELECT tot, totA,
       |    CAST(floor(CAST(tot AS DOUBLE) * 2.0 / 5.0) AS BIGINT) AS budget
       |  FROM tot),
       |bud2 AS (
       |  SELECT tot, totA, budget,
       |    CAST(floor(CAST(budget AS DOUBLE) * 0.8) AS BIGINT) AS mainB,
       |    budget - CAST(floor(CAST(budget AS DOUBLE) * 0.8) AS BIGINT) AS annealB
       |  FROM bud)
       |SELECT m.source, m.n_avail,
       |  least(m.n_avail,
       |    CAST(floor(CAST(b.mainB AS DOUBLE) * CAST(m.n_avail AS DOUBLE)
       |               / CAST(b.tot AS DOUBLE)) AS BIGINT)) AS main_tokens,
       |  CAST(CASE WHEN NOT m.in_anneal OR b.totA = 0 THEN 0
       |       ELSE least(m.n_avail,
       |         CAST(floor(CAST(b.annealB AS DOUBLE) * CAST(m.n_avail AS DOUBLE)
       |                    / CAST(b.totA AS DOUBLE)) AS BIGINT))
       |  END AS BIGINT) AS anneal_tokens
       |FROM mem m, bud2 b""".stripMargin
  }

  // ---- PIPE7: select → FIM → pack (batch-construction tail) -------------------

  /** PIPE7 — the batch-construction tail of the pretraining pipeline in
    * one plan: keep the top-40% quality tokens (pk2's sort-free
    * selection), FIM-rewrite the even-id survivors (x23), pack the
    * rewritten stream into 512-token sequences (pk1), and report pk4's
    * per-source utilization. PSM adds exactly 3 whitespace tokens, so the
    * packer's counts derive in-plan without re-tokenizing; the oracle
    * replays the whole chain as ranked-prefix → CASE render → recursive
    * CTE → aggregate under ONE hash. */
  private def pipe7FimPack: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val kept = graft.scale.Packing.budgetSelectDocs(docs, "text", "doc_id", "source")
    // the survivor-id stream is 8 bytes/row — build the semi-join hash map
    // from it (SHUFFLE_HASH) instead of letting SMJ sort the full corpus
    // AND the id stream (the d11 verify-stage lesson)
    val kd = docs.join(kept.select(col("id").as("doc_id")).hint("shuffle_hash"),
      Seq("doc_id"), "left_semi")
    val fim = graft.scale.Curation.fimTransform(kd, "text", "doc_id",
      modulus = 2L, minTokens = 6)
    val counted = fim
      .join(docs.select(col("doc_id").as("id"), col("source")), Seq("id"))
      .withColumn("toks", size(split(col("out_text"), " ")).cast("long"))
    graft.scale.Packing.packGreedyCounts(counted, "toks", "id", "source",
        budget = 512L, shards = 8)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_seqs"),
           sum(col("n_docs")).as("n_docs"),
           sum(col("n_tokens")).as("tok_packed"),
           sum(when(col("n_tokens") <= 512L, lit(512L) - col("n_tokens"))
             .otherwise(0L)).as("pad_tokens"))
  }

  private val pipe7Sql = {
    val stop = graft.scale.TextAnalysis.qualityStopwordsSql
    s"""WITH RECURSIVE sdoc AS (
       |  SELECT source, doc_id, text,
       |    CAST(len(regexp_extract_all(text, '${graft.scale.Packing.tokPattern}')) AS BIGINT) AS toks,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nws,
       |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
       |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stop))) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS stopword_ratio
       |  FROM documents),
       |qd AS (
       |  SELECT source, doc_id, text, toks, nws, md5(CAST(doc_id AS VARCHAR)) AS h,
       |    floor((CASE WHEN n_tokens >= 20 THEN 0.4 ELSE n_tokens / 50 END
       |         + CASE WHEN punct_ratio <= 0.1 THEN 0.3 ELSE 0.0 END
       |         + CASE WHEN stopword_ratio BETWEEN 0.05 AND 0.6 THEN 0.3 ELSE 0.0 END)
       |          * 100.0 + 0.5) / 100.0 AS q
       |  FROM sdoc),
       |t AS (SELECT CAST(floor(CAST(sum(toks) AS DOUBLE) * 2.0 / 5.0) AS BIGINT) AS budget FROM qd),
       |r AS (
       |  SELECT source, doc_id, nws, t.budget,
       |    sum(toks) OVER (ORDER BY q DESC, h, doc_id
       |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM qd, t),
       |kept AS (
       |  SELECT source, doc_id,
       |    CASE WHEN doc_id % 2 = 0 AND nws >= 6 THEN nws + 3 ELSE nws END AS toks
       |  FROM r WHERE cum <= budget),
       |docs AS (
       |  SELECT source, doc_id % 8 AS shard, doc_id, toks,
       |         row_number() OVER (PARTITION BY source, doc_id % 8 ORDER BY doc_id) AS rn
       |  FROM kept),
       |pack AS (
       |  SELECT source, shard, rn, toks, CAST(1 AS BIGINT) AS seq_id, toks AS acc
       |  FROM docs WHERE rn = 1
       |  UNION ALL
       |  SELECT d.source, d.shard, d.rn, d.toks,
       |         CASE WHEN p.acc + d.toks > 512 THEN p.seq_id + 1 ELSE p.seq_id END,
       |         CASE WHEN p.acc + d.toks > 512 THEN d.toks ELSE p.acc + d.toks END
       |  FROM pack p JOIN docs d ON d.source = p.source AND d.shard = p.shard
       |                         AND d.rn = p.rn + 1
       |),
       |seqs AS (
       |  SELECT source, shard, seq_id, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(toks) AS BIGINT) AS n_tokens
       |  FROM pack GROUP BY 1, 2, 3)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_seqs,
       |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS tok_packed,
       |  CAST(sum(CASE WHEN n_tokens <= 512 THEN 512 - n_tokens ELSE 0 END) AS BIGINT) AS pad_tokens
       |FROM seqs GROUP BY source""".stripMargin
  }

  // ---- E9: hashing-trick encoder -----------------------------------------------

  /** E9 — stateless feature hashing of customer categoricals into 64
    * signed buckets: no vocabulary to fit or join, pure map-side md5
    * arithmetic. */
  private def e9FeatureHash: Q = (s, d) =>
    graft.core.Encoders.featureHash(
        Tables.customer(s, d), Seq("c_mktsegment", "c_nationkey"), buckets = 64)
      .select(col("c_custkey"), col("c_mktsegment_fh"), col("c_mktsegment_fsign"),
              col("c_nationkey_fh"), col("c_nationkey_fsign"))

  private val e9Sql = {
    def fh(c: String) =
      s"""CAST(('0x' || substr(md5('$c=' || CAST($c AS VARCHAR)), 1, 4))::BIGINT % 64 AS BIGINT) AS ${c}_fh,
         |  CAST((('0x' || substr(md5('$c=' || CAST($c AS VARCHAR)), 5, 1))::BIGINT % 2) * 2 - 1 AS BIGINT) AS ${c}_fsign""".stripMargin
    s"""SELECT c_custkey,
       |  ${fh("c_mktsegment")},
       |  ${fh("c_nationkey")}
       |FROM customer""".stripMargin
  }

  // ---- X23: fill-in-the-middle transformation ---------------------------------

  /** X23 — FIM/PSM rewrite of every even-id document at the middle-third
    * token cuts; odd ids and short docs pass through. Map-side only; the
    * rewritten text itself is hash-checked. */
  private def x23Fim: Q = (s, d) =>
    graft.scale.Curation.fimTransform(
      Tables.documents(s, d), "text", "doc_id", modulus = 2L, minTokens = 6)

  private val x23Sql =
    """WITH t AS (
      |  SELECT doc_id AS id, string_split(text, ' ') AS tk, text,
      |    len(string_split(text, ' ')) AS n
      |  FROM documents),
      |c AS (
      |  SELECT id, tk, text, n, n // 3 AS p, (n * 2) // 3 AS q,
      |    (id % 2 = 0) AND (n >= 6) AS fim_applied
      |  FROM t)
      |SELECT id, fim_applied,
      |  CASE WHEN fim_applied THEN
      |    '<PRE> ' || array_to_string(list_slice(tk, 1, p), ' ') ||
      |    ' <SUF> ' || array_to_string(list_slice(tk, q + 1, n), ' ') ||
      |    ' <MID> ' || array_to_string(list_slice(tk, p + 1, q), ' ')
      |  ELSE text END AS out_text
      |FROM c""".stripMargin

  // ---- X25: deterministic word dropout --------------------------------------------

  /** X25 — epoch-reproducible word dropout at 1/10 rate: token i of doc d
    * drops iff (d + i) % 10 = 0; docs under 8 tokens pass through whole.
    * The augmented text itself hash-checks. */
  private def x25WordDropout: Q = (s, d) =>
    graft.scale.Curation.wordDropout(
      Tables.documents(s, d), "text", "doc_id", modulus = 10L, phase = 0L)

  private val x25Sql =
    """WITH t AS (
      |  SELECT doc_id AS id, text, string_split(text, ' ') AS tk,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      |  FROM documents),
      |c AS (SELECT *, n >= 8 AS dropped FROM t),
      |k AS (
      |  SELECT id, dropped, n, text,
      |    list_filter(list_transform(generate_series(1, n), i ->
      |      CASE WHEN (id + i) % 10 = 0 THEN NULL
      |           ELSE tk[CAST(i AS INT)] END),
      |      x -> x IS NOT NULL) AS kept
      |  FROM c)
      |SELECT id, dropped,
      |  CAST(CASE WHEN dropped THEN n - len(kept) ELSE 0 END AS BIGINT) AS n_dropped,
      |  CASE WHEN dropped THEN array_to_string(kept, ' ') ELSE text END AS out_text
      |FROM k""".stripMargin

  // ---- X24: T5-style span corruption --------------------------------------------

  /** X24 — denoising-objective pair construction: 3-token spans every 10
    * tokens (start at 1 + id mod 5) masked with numbered sentinels; both
    * the corrupted input and the sentinel-delimited target are
    * hash-checked. Map-side only. */
  private def x24SpanCorrupt: Q = (s, d) =>
    graft.scale.Curation.spanCorrupt(
      Tables.documents(s, d), "text", "doc_id", spanLen = 3, stride = 10)

  private val x24Sql =
    """WITH t AS (
      |  SELECT doc_id AS id, text, string_split(text, ' ') AS tk,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
      |    1 + doc_id % 5 AS start
      |  FROM documents),
      |c AS (SELECT *, start + 2 <= n AS corrupted FROM t)
      |SELECT id, corrupted,
      |  CASE WHEN corrupted THEN
      |    array_to_string(list_filter(list_transform(generate_series(1, n), i ->
      |      CASE WHEN i >= start AND ((i - start) % 10) = 0 AND i + 2 <= n
      |           THEN '<X' || CAST((i - start) // 10 AS VARCHAR) || '>'
      |           WHEN i >= start AND ((i - start) % 10) <= 2
      |                AND (i - ((i - start) % 10)) + 2 <= n
      |           THEN NULL
      |           ELSE tk[CAST(i AS INT)] END),
      |      x -> x IS NOT NULL), ' ')
      |  ELSE text END AS input,
      |  CASE WHEN corrupted THEN
      |    array_to_string(flatten(list_transform(generate_series(start, n - 2, 10), s ->
      |      list_concat(['<X' || CAST((s - start) // 10 AS VARCHAR) || '>'],
      |                  list_slice(tk, CAST(s AS INT), CAST(s + 2 AS INT))))), ' ')
      |  ELSE '' END AS target
      |FROM c""".stripMargin

  // ---- ST_BUDGET: streaming token-budget gate ---------------------------------

  /** ST_BUDGET — the streaming budget gate's batch twin: per-source
    * strict-stop prefix at a 2000-token cap. kept ⟺ running cumsum ≤ cap,
    * so the whole stateful fold is hash-checked against one SQL window. */
  private def stBudget: Q = (s, d) =>
    graft.streaming.StreamBudget.assignBatch(
        Tables.documents(s, d), "text", "doc_id", "source", cap = 2000L)
      .toDF()
      .select(col("grp").as("source"), col("id").as("doc_id"),
              col("toks"), col("kept"), col("cumTokens").as("cum_tokens"))

  private val stBudgetSql =
    s"""WITH t AS (
       |  SELECT source, doc_id,
       |    CAST(len(regexp_extract_all(text, '${graft.scale.Packing.tokPattern}')) AS BIGINT) AS toks
       |  FROM documents)
       |SELECT source, doc_id, toks,
       |  sum(toks) OVER w <= 2000 AS kept,
       |  CAST(sum(toks) OVER w AS BIGINT) AS cum_tokens
       |FROM t
       |WINDOW w AS (PARTITION BY source ORDER BY doc_id
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  // ---- PK4: packing efficiency accounting ------------------------------------

  /** PK4 — padding-waste accounting over the pk1 packer: per source, the
    * sequence count, packed token mass, oversize sequences (single doc >
    * budget), and the fill rate vs the 512-token budget — the utilization
    * number a pretraining run reports per corpus slice. Waste only counts
    * sequences BELOW budget (an oversize sequence is truncation debt, not
    * padding). Same plan as pk1 plus one 20-row aggregate. */
  private def pk4PackStats: Q = (s, d) =>
    graft.scale.Packing.packGreedy(
        Tables.documents(s, d), "text", "doc_id", "source",
        budget = 512L, shards = 8)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_seqs"),
           sum(col("n_docs")).as("n_docs"),
           sum(col("n_tokens")).as("tok_packed"),
           sum(when(col("n_tokens") > 512L, 1L).otherwise(0L)).as("oversize_seqs"),
           sum(when(col("n_tokens") <= 512L, lit(512L) - col("n_tokens"))
             .otherwise(0L)).as("pad_tokens"))
      .withColumn("fill_micro",
        floor(col("tok_packed").cast("double") /
              (col("n_seqs").cast("double") * 512.0) * 1e6 + 0.5).cast("long"))

  private val pk4Sql =
    s"""WITH packed AS (${pk1Sql.replace("\n", "\n       |")})
       |SELECT source, CAST(count(*) AS BIGINT) AS n_seqs,
       |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS tok_packed,
       |  CAST(sum(CASE WHEN n_tokens > 512 THEN 1 ELSE 0 END) AS BIGINT) AS oversize_seqs,
       |  CAST(sum(CASE WHEN n_tokens <= 512 THEN 512 - n_tokens ELSE 0 END) AS BIGINT) AS pad_tokens,
       |  CAST(floor(CAST(sum(n_tokens) AS DOUBLE)
       |             / (CAST(count(*) AS DOUBLE) * 512.0) * 1e6 + 0.5) AS BIGINT) AS fill_micro
       |FROM packed GROUP BY source""".stripMargin

  // ---- S14: MMR diversified top-k (✖est: sequential greedy) -------------------

  /** S14 — diversity-aware retrieval: MMR re-rank of the top-50 candidate
    * pool per anchor, k=5, λ=0.7. Deterministic (1e-6-grid scores, vid
    * ties) but sequentially greedy, so rows-checked with the λ=1 ≡ top-k
    * identity and cluster-alternation properties spec-pinned. */
  private def s14Mmr: Q = (s, d) =>
    graft.scale.Similarity.mmrTopK(
      Tables.embeddings(s, d), Seq(0L, 1L, 2L, 3L, 4L), k = 5,
      lambda = 0.7, candN = 50, "embedding", "vec_id")

  // ---- S15: IVF-routed hard negatives (✖est: cell-routing recall) -------------

  /** S15 — the corpus-scale hard-negative path: candidates from the
    * anchor's 3 probed IVF cells, band [0.20, 0.35), k=10. Precision
    * exact (true cosines), recall is the IVF contract; the exact twin
    * s13 hash-checks the semantics and the spec pins
    * exhaustive-probe == twin. */
  private def s15HardNegIvf: Q = (s, d) =>
    graft.scale.Similarity.hardNegativesIvf(
      Tables.embeddings(s, d), Seq(0L, 1L, 2L, 3L, 4L), 10,
      lo = 0.20, hi = 0.35, "embedding", "vec_id", nCells = 8, nProbe = 3)

  // ---- SM18: UniMax uniform mixture with epoch cap ---------------------------

  /** SM18 — UniMax: a 60k-token budget spread uniformly over sources,
    * each capped at 1.5 epochs of its availability, surplus redistributed
    * over 4 rounds. Pure integer arithmetic end to end. */
  private def sm18Unimax: Q = (s, d) =>
    graft.scale.Sampling.unimaxMixture(
      Tables.documents(s, d), "source", "text",
      budget = 60000L, epochsNum = 3L, epochsDen = 2L, rounds = 4)

  private val sm18Sql = {
    def round(prev: String, i: Int): String =
      s"""s$i AS (SELECT CAST(60000 - sum(CASE WHEN capped THEN alloc ELSE 0 END) AS BIGINT) AS remaining,
         |  CAST(sum(CASE WHEN NOT capped THEN 1 ELSE 0 END) AS BIGINT) AS n_unc FROM $prev),
         |r$i AS (SELECT p.source, p.n_avail, p.cap_tokens,
         |  CASE WHEN p.capped THEN p.alloc
         |       ELSE least(p.cap_tokens,
         |         CASE WHEN s$i.n_unc > 0 THEN s$i.remaining // s$i.n_unc ELSE 0 END) END AS alloc,
         |  p.capped OR p.cap_tokens <=
         |    CASE WHEN s$i.n_unc > 0 THEN s$i.remaining // s$i.n_unc ELSE 0 END AS capped
         |  FROM $prev p CROSS JOIN s$i)""".stripMargin
    s"""WITH base AS (
       |  SELECT source, CAST(sum(len(regexp_extract_all(text, '${graft.scale.Packing.tokPattern}'))) AS BIGINT) AS n_avail,
       |    (CAST(sum(len(regexp_extract_all(text, '${graft.scale.Packing.tokPattern}'))) AS BIGINT) * 3) // 2 AS cap_tokens,
       |    CAST(0 AS BIGINT) AS alloc, false AS capped
       |  FROM documents GROUP BY 1),
       |${round("base", 1)},
       |${round("r1", 2)},
       |${round("r2", 3)},
       |${round("r3", 4)}
       |SELECT source, n_avail, cap_tokens, CAST(alloc AS BIGINT) AS alloc_tokens, capped,
       |  CAST(floor(CAST(alloc AS DOUBLE) / CAST(n_avail AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS epochs_micro
       |FROM r4""".stripMargin
  }

  // ---- S13: hard-negative mining -------------------------------------------

  /** S13 — per-anchor top-10 hard negatives: cosine in [0.20, 0.35), the
    * contrastive-training band below this corpus's near-duplicate line. Exact twin;
    * corpus-wide mining routes through the IVF cells. */
  private def s13HardNegatives: Q = (s, d) =>
    graft.scale.Similarity.hardNegatives(
      Tables.embeddings(s, d), Seq(0L, 1L, 2L, 3L, 4L), 10,
      lo = 0.20, hi = 0.35, "embedding", "vec_id")

  private val s13Sql =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id IN (0, 1, 2, 3, 4)),
      |scored AS (
      |  SELECT q.qid, v.vec_id AS vid,
      |    floor(list_dot_product(v.e, q.qe) /
      |      (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(q.qe, q.qe))) * 1000000.0 + 0.5) / 1000000.0 AS cosine
      |  FROM v JOIN q ON v.vec_id <> q.qid),
      |band AS (SELECT * FROM scored WHERE cosine >= 0.20 AND cosine < 0.35),
      |ranked AS (
      |  SELECT qid, vid, cosine,
      |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS rank
      |  FROM band)
      |SELECT qid, CAST(rank AS BIGINT) AS rank, vid, cosine
      |FROM ranked WHERE rank <= 10""".stripMargin

  // ---- A30: per-source dataset card ---------------------------------------------

  /** A30 — the governance summary a corpus release ships, one row per
    * source: volume (docs, whitespace tokens, chars), mean quality on the
    * 1e-2 grid, language spread (distinct langs + majority lang by
    * (count desc, lang) — exact argmax via max_by-free struct max),
    * exact-duplicate pressure (docs minus distinct texts). One pass over
    * the corpus plus a per-(source, lang) reduced table; every column is
    * integer/grid-exact. */
  private def a30DatasetCard: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val base = graft.scale.TextAnalysis.qualityScore(docs, "text")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(size(split(col("text"), " "))).cast("long").as("n_tokens"),
           sum(length(col("text"))).cast("long").as("n_chars"),
           sum(floor(col("quality") * 100.0 + 0.5).cast("long")).as("q100sum"),
           countDistinct(col("lang")).as("n_langs"),
           countDistinct(md5(col("text"))).as("n_distinct"))
      .withColumn("mean_q_micro",
        expr("(q100sum * 10000) div n_docs"))
      .withColumn("dup_docs", col("n_docs") - col("n_distinct"))
      .drop("q100sum", "n_distinct")
    // majority language: exact argmax by (count desc, lang asc) via a
    // struct max over the reduced (source, lang) table — no window
    val langTop = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("source"))
      .agg(max(struct(col("cnt"),
        // inverted bytes + a 256 sentinel: on a cnt tie the
        // lexicographically SMALLEST lang must win the max, including
        // when one code is a strict prefix of another ("en" vs "eng") —
        // without the sentinel Spark's array compare ranks the shorter
        // (prefix) array lower and the max would pick the larger lang
        expr("concat(transform(sequence(1, length(lang)), i -> 255 - ascii(substring(lang, i, 1))), array(256))").as("inv"),
        col("lang"))).as("m"))
      .select(col("source"), col("m.lang").as("top_lang"),
              col("m.cnt").as("top_lang_docs"))
    base.join(langTop, Seq("source"))
  }

  private val a30Sql = {
    val stop = graft.scale.TextAnalysis.qualityStopwordsSql
    s"""WITH sdoc AS (
       |  SELECT source, lang, text,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
       |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
       |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stop))) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS stopword_ratio
       |  FROM documents),
       |qd AS (
       |  SELECT source, lang, text, toks,
       |    CAST(floor((CASE WHEN n_tokens >= 20 THEN 0.4 ELSE n_tokens / 50 END
       |         + CASE WHEN punct_ratio <= 0.1 THEN 0.3 ELSE 0.0 END
       |         + CASE WHEN stopword_ratio BETWEEN 0.05 AND 0.6 THEN 0.3 ELSE 0.0 END)
       |          * 100.0 + 0.5) AS BIGINT) AS q100
       |  FROM sdoc),
       |base AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(toks) AS BIGINT) AS n_tokens,
       |    CAST(sum(length(text)) AS BIGINT) AS n_chars,
       |    CAST((sum(q100) * 10000) // count(*) AS BIGINT) AS mean_q_micro,
       |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       |    CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS dup_docs
       |  FROM qd GROUP BY 1),
       |lc AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS cnt
       |       FROM documents GROUP BY 1, 2),
       |lt AS (
       |  SELECT source, lang AS top_lang, cnt AS top_lang_docs,
       |    row_number() OVER (PARTITION BY source ORDER BY cnt DESC, lang) AS rk
       |  FROM lc)
       |SELECT b.source, b.n_docs, b.n_tokens, b.n_chars, b.mean_q_micro,
       |       b.n_langs, b.dup_docs, lt.top_lang, lt.top_lang_docs
       |FROM base b JOIN lt ON lt.source = b.source AND lt.rk = 1""".stripMargin
  }

  // ---- PIPE8: session → conversation document assembly --------------------------

  /** PIPE8 — event logs assembled into ordered conversation documents:
    * 30-minute gap sessions, event types concatenated in (ts, event_id)
    * order. The rendered text itself is hash-checked, so the in-group
    * time ordering is provably exact. */
  private def pipe8Conversations: Q = (s, d) =>
    graft.scale.EventAnalytics.conversations(
      Tables.events(s, d), "event_type", "ts", "event_id", "user_id")

  private val pipe8Sql =
    """WITH g AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |         OR lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |t AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM g)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  CAST(count(*) AS BIGINT) AS n_turns,
      |  string_agg(event_type, ' ' ORDER BY ts, event_id) AS convo
      |FROM t GROUP BY user_id, session_id""".stripMargin

  // ---- D18: incremental (batch-vs-corpus) exact dedup --------------------------

  /** D18 — ingest-time dedup: docs with id%10 ∈ {8,9} arrive as the new
    * batch, the rest are the standing corpus; a batch doc survives iff
    * its content hash is novel to the corpus and first within the batch.
    * Corpus side contributes only distinct hashes (anti-join). */
  private def d18Incremental: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    graft.scale.Dedup.incrementalDedup(
      docs.filter(pmod(col("doc_id"), lit(10L)) >= 8L),
      docs.filter(pmod(col("doc_id"), lit(10L)) < 8L),
      "text", "doc_id")
  }

  private val d18Sql =
    """WITH corpus AS (
      |  SELECT DISTINCT md5(text) AS text_hash FROM documents WHERE doc_id % 10 < 8),
      |batch AS (
      |  SELECT doc_id AS id, md5(text) AS text_hash FROM documents WHERE doc_id % 10 >= 8)
      |SELECT CAST(min(id) AS BIGINT) AS id, text_hash
      |FROM batch b
      |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.text_hash = b.text_hash)
      |GROUP BY text_hash""".stripMargin

  // ---- SM20: per-source quality rank normalization -----------------------------

  /** SM20 — cross-source quality calibration: every doc's quality mapped
    * to its within-source mid-rank percentile via the bounded score-grid
    * histogram (never a data-sized window). Integer-exact. */
  private def sm20RankNorm: Q = (s, d) =>
    graft.scale.Sampling.qualityRankNorm(
      Tables.documents(s, d), "text", "doc_id", "source")

  private val sm20Sql = {
    val stop = graft.scale.TextAnalysis.qualityStopwordsSql
    s"""WITH sdoc AS (
       |  SELECT source, doc_id AS id,
       |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
       |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stop))) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS stopword_ratio
       |  FROM documents),
       |qd AS (
       |  SELECT source, id,
       |    CAST(floor((CASE WHEN n_tokens >= 20 THEN 0.4 ELSE n_tokens / 50 END
       |         + CASE WHEN punct_ratio <= 0.1 THEN 0.3 ELSE 0.0 END
       |         + CASE WHEN stopword_ratio BETWEEN 0.05 AND 0.6 THEN 0.3 ELSE 0.0 END)
       |          * 100.0 + 0.5) AS BIGINT) AS q100
       |  FROM sdoc),
       |grid AS (SELECT source, q100, CAST(count(*) AS BIGINT) AS eq
       |         FROM qd GROUP BY 1, 2),
       |cum AS (
       |  SELECT source, q100, eq,
       |    CAST(coalesce(sum(eq) OVER (PARTITION BY source ORDER BY q100
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS below,
       |    CAST(sum(eq) OVER (PARTITION BY source) AS BIGINT) AS n
       |  FROM grid)
       |SELECT qd.id, qd.source, qd.q100,
       |  CAST(((2 * c.below + c.eq) * 1000000) // (2 * c.n) AS BIGINT) AS pct_micro
       |FROM qd JOIN cum c ON c.source = qd.source AND c.q100 = qd.q100""".stripMargin
  }

  // ---- SM19: full two-phase curriculum order ---------------------------------

  /** SM19 — the complete curriculum: sm16's mix decision expanded into the
    * global step order, main phase then anneal phase (steps offset by the
    * main total). The composed sm16 → sm17 → phase-union chain under one
    * hash. */
  private def sm19Curriculum: Q = (s, d) => {
    // alloc is |sources| rows (20) but its anneal-mixture plan scans and
    // tokenizes the corpus; curriculumSchedule consumes it once per phase
    // — materialize the tiny table so the corpus pays one pass
    val alloc = graft.scale.Sampling.annealMixture(
      Tables.documents(s, d), "source", "text",
      budgetNum = 2L, budgetDen = 5L, annealPct = 20)
      .localCheckpoint(true)
    graft.scale.Sampling.curriculumSchedule(
      alloc, "source", "main_tokens", "anneal_tokens", chunkTokens = 512L)
  }

  private val sm19Sql = {
    def phaseSched(allocCol: String, phase: String, offsetExpr: String) =
      s"""  SELECT source, '$phase' AS phase, chunk_idx, n_chunks,
         |    CAST(row_number() OVER (
         |      ORDER BY CAST(chunk_idx AS DOUBLE) / CAST(n_chunks AS DOUBLE),
         |               source, chunk_idx) + $offsetExpr AS BIGINT) AS step
         |  FROM (
         |    SELECT source, n_chunks,
         |      CAST(unnest(generate_series(1, n_chunks)) AS BIGINT) AS chunk_idx
         |    FROM (SELECT source,
         |            CAST(ceil(CAST($allocCol AS DOUBLE) / 512.0) AS BIGINT) AS n_chunks
         |          FROM alloc WHERE $allocCol > 0))""".stripMargin
    s"""WITH alloc AS (${sm16Sql}),
       |off AS (
       |  SELECT coalesce(sum(CAST(ceil(CAST(main_tokens AS DOUBLE) / 512.0) AS BIGINT)), 0) AS o
       |  FROM alloc WHERE main_tokens > 0)
       |${phaseSched("main_tokens", "main", "0")}
       |UNION ALL
       |${phaseSched("anneal_tokens", "anneal", "(SELECT o FROM off)")}""".stripMargin
  }

  // ---- X22: Zipf rank-frequency slope per source ---------------------------

  /** X22 — per-source Zipf fit over the top-200 vocabulary: OLS slope and
    * intercept of ln(freq) on ln(rank). Natural text sits near slope −1;
    * the per-source value is a corpus-mix health diagnostic. Exact-count
    * ranks, 1e-9-grid OLS terms, 1e-6 outputs. */
  private def x22Zipf: Q = (s, d) =>
    graft.scale.TextAnalysis.zipfSlope(
      Tables.documents(s, d), "text", "source", topV = 200)

  private val x22Sql =
    """WITH toks AS (
      |  SELECT source, w
      |  FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS w
      |        FROM documents)
      |  WHERE length(w) > 0),
      |cnts AS (
      |  SELECT source, w, CAST(count(*) AS BIGINT) AS cnt
      |  FROM toks GROUP BY 1, 2),
      |rk AS (
      |  SELECT source, cnt,
      |    row_number() OVER (PARTITION BY source ORDER BY cnt DESC, w) AS rk
      |  FROM cnts),
      |terms AS (
      |  SELECT source,
      |    CAST(floor(ln(CAST(rk AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS x9,
      |    CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS y9,
      |    CAST(floor(ln(CAST(rk AS DOUBLE)) * ln(CAST(rk AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS xx9,
      |    CAST(floor(ln(CAST(rk AS DOUBLE)) * ln(CAST(cnt AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS xy9
      |  FROM rk WHERE rk <= 200),
      |agg AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
      |    CAST(sum(x9) AS BIGINT) AS sx, CAST(sum(y9) AS BIGINT) AS sy,
      |    CAST(sum(xx9) AS BIGINT) AS sxx, CAST(sum(xy9) AS BIGINT) AS sxy
      |  FROM terms GROUP BY 1),
      |fit AS (
      |  SELECT source, n_terms,
      |    floor((CAST(n_terms AS DOUBLE) * CAST(sxy AS DOUBLE) / 1e9
      |           - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sy AS DOUBLE) / 1e9))
      |          / nullif(CAST(n_terms AS DOUBLE) * CAST(sxx AS DOUBLE) / 1e9
      |             - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sx AS DOUBLE) / 1e9), 0)
      |          * 1e6 + 0.5) / 1e6 AS slope,
      |    sy, sx
      |  FROM agg)
      |SELECT source, n_terms, slope,
      |  floor((CAST(sy AS DOUBLE) / 1e9 - slope * CAST(sx AS DOUBLE) / 1e9)
      |        / CAST(n_terms AS DOUBLE) * 1e6 + 0.5) / 1e6 AS intercept
      |FROM fit""".stripMargin

  // ---- SM17: deterministic training-mix schedule --------------------------

  /** SM17 — the anneal mixture's MAIN-phase allocation cut into 512-token
    * chunks and every chunk assigned its global training step by the
    * closed-form interleave rank (no global sort — see
    * [[graft.scale.Sampling.mixSchedule]]). Composes sm16 → sm17: the
    * full "decide the mix, then emit the run order" path under one hash. */
  private def sm17Schedule: Q = (s, d) => {
    val alloc = graft.scale.Sampling.annealMixture(
      Tables.documents(s, d), "source", "text",
      budgetNum = 2L, budgetDen = 5L, annealPct = 20)
    graft.scale.Sampling.mixSchedule(alloc, "source", "main_tokens",
      chunkTokens = 512L)
  }

  private val sm17Sql = {
    // the oracle computes the SAME rank the honest way — a global
    // row_number over (chunk_idx/n_chunks, source, chunk_idx); the two
    // formulations agreeing IS the correctness claim for the closed form
    val anneal = sm16Sql
    s"""WITH alloc AS ($anneal),
       |nc AS (
       |  SELECT source,
       |    CAST(ceil(CAST(main_tokens AS DOUBLE) / 512.0) AS BIGINT) AS n_chunks
       |  FROM alloc WHERE main_tokens > 0),
       |chunks AS (
       |  SELECT source, n_chunks,
       |    CAST(unnest(generate_series(1, n_chunks)) AS BIGINT) AS chunk_idx
       |  FROM nc)
       |SELECT source, chunk_idx, n_chunks,
       |  CAST(row_number() OVER (
       |    ORDER BY CAST(chunk_idx AS DOUBLE) / CAST(n_chunks AS DOUBLE),
       |             source, chunk_idx) AS BIGINT) AS step
       |FROM chunks""".stripMargin
  }

  // ---- PK3: balanced token sharding --------------------------------------

  /** PK3 — snake-deal the corpus into 8 training shards balanced by
    * token count (imbalance bounded by the largest doc). The oracle is
    * the naive global ranked window with the same snake arithmetic —
    * hash equality proves the grid-offset rank decomposition exact. */
  private def pk3ShardSnake: Q = (s, d) =>
    graft.scale.Packing.snakeShard(Tables.documents(s, d), "text",
                                   "doc_id", nShards = 8)

  private val pk3Sql =
    s"""WITH s AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(text, '${graft.scale.Packing.tokPattern}')) AS BIGINT) AS toks,
       |    md5(CAST(doc_id AS VARCHAR)) AS h
       |  FROM documents),
       |r AS (
       |  SELECT toks,
       |    row_number() OVER (ORDER BY toks DESC, h, doc_id) - 1 AS r
       |  FROM s),
       |a AS (
       |  SELECT toks, r % 8 AS pos,
       |    CAST((r - (r % 8)) / 8 AS BIGINT) % 2 AS par
       |  FROM r)
       |SELECT CAST(CASE WHEN par = 0 THEN pos ELSE 7 - pos END AS BIGINT) AS shard,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(toks) AS BIGINT) AS n_tokens
       |FROM a GROUP BY 1""".stripMargin

  // ---- S10/S11: product-quantization ANN ---------------------------------

  private val pqQueryIds = Seq(0L, 1L, 2L, 3L, 4L)

  /** S10 — PQ/ADC ANN with one distributed Lloyd refinement of the
    * per-subspace codebooks (the production form: 4 bytes/vector scan).
    * Trained quantizer ⇒ rows-only; recall vs exact L2 is spec-bound. */
  private def s10AnnPq: Q = (s, d) =>
    graft.scale.ProductQuant.pqTopK(Tables.embeddings(s, d), pqQueryIds, 5,
      "embedding", "vec_id", m = 4, ks = 16, lloydIters = 1)

  /** S11 — the hash-checkable PQ twin: `lloydIters = 0` keeps the
    * deterministic seed codebooks (lowest-16-id vectors, sliced), so
    * encode + ADC + ranking are pure data-derived arithmetic the oracle
    * reproduces exactly — the whole PQ pipeline minus k-means is
    * hash-checked, and s10 layers only Lloyd refinement on top. */
  private def s11PqAdc: Q = (s, d) =>
    graft.scale.ProductQuant.pqTopK(Tables.embeddings(s, d), pqQueryIds, 5,
      "embedding", "vec_id", m = 4, ks = 16, lloydIters = 0)

  /** S12 — IVF+PQ: coarse cells prune the corpus to each query's 3
    * nearest of 8, then only those cells' 4-byte codes are ADC-scored —
    * the composed big-corpus ANN layout. Two trained quantizers ⇒
    * rows-only; recall spec-bound alongside s10. */
  private def s12IvfPq: Q = (s, d) =>
    graft.scale.ProductQuant.ivfPqTopK(Tables.embeddings(s, d), pqQueryIds, 5,
      "embedding", "vec_id", nCells = 8, nProbe = 3, m = 4, ks = 16,
      lloydIters = 1)

  private val s11Sql =
    """WITH v AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |seeds AS (
      |  SELECT vec_id AS sid, e FROM v ORDER BY vec_id LIMIT 16),
      |cb AS (
      |  SELECT s.i AS sub,
      |         row_number() OVER (PARTITION BY s.i ORDER BY sid) - 1 AS code,
      |         e[s.i*16 + 1 : s.i*16 + 16] AS cw
      |  FROM seeds, (SELECT unnest(range(4)) AS i) s),
      |encd AS (
      |  SELECT v.vec_id, cb.sub, cb.code,
      |    CAST(floor(list_sum(list_transform(range(1, 17),
      |      j -> (v.e[cb.sub*16 + j] - cb.cw[j]) * (v.e[cb.sub*16 + j] - cb.cw[j])))
      |      * 1e9 + 0.5) AS BIGINT) AS dq
      |  FROM v, cb),
      |enc AS (
      |  SELECT vec_id, sub, code FROM (
      |    SELECT vec_id, sub, code,
      |           row_number() OVER (PARTITION BY vec_id, sub ORDER BY dq, code) AS rn
      |    FROM encd) WHERE rn = 1),
      |lut AS (
      |  SELECT vec_id AS qid, sub, code, dq FROM encd
      |  WHERE vec_id IN (0, 1, 2, 3, 4)),
      |adc AS (
      |  SELECT l.qid, e.vec_id AS vid, CAST(sum(l.dq) AS BIGINT) AS t
      |  FROM enc e JOIN lut l ON l.sub = e.sub AND l.code = e.code
      |  WHERE e.vec_id <> l.qid
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT qid, vid,
      |         CAST((t + 500) // 1000 AS DOUBLE) / 1e6 AS adist,
      |         row_number() OVER (PARTITION BY qid ORDER BY t, vid) AS rk
      |  FROM adc)
      |SELECT qid, CAST(rk AS BIGINT) AS rank, vid, adist
      |FROM ranked WHERE rk <= 5""".stripMargin

  // ---- PIPE5: selection → packing, end to end ----------------------------

  /** PIPE5 — the token-pipeline composition: budget-select the
    * highest-quality 40% of corpus tokens (pk2's exact ranked prefix),
    * then greedily pack the survivors into 512-token training sequences
    * (pk1's shard fold over PRE-COMPUTED counts — the text is tokenized
    * exactly once across the whole pipeline). Per-source sequence
    * counts/fill hash-check the full chain in one oracle. */
  private def pipe5Tokens: Q = (s, d) => {
    val kept = graft.scale.Packing.budgetSelectDocs(
      Tables.documents(s, d), "text", "doc_id", "source")
    graft.scale.Packing.packGreedyCounts(kept, "toks", "id", "source",
        budget = 512L, shards = 8)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_seqs"),
           sum(col("n_docs")).as("n_docs"),
           sum(col("n_tokens")).as("n_tokens"))
  }

  private val pipe5Sql = {
    val stop = graft.scale.TextAnalysis.qualityStopwordsSql
    s"""WITH RECURSIVE s AS (
       |  SELECT source, doc_id,
       |    CAST(len(regexp_extract_all(text, '${graft.scale.Packing.tokPattern}')) AS BIGINT) AS toks,
       |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
       |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stop))) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS stopword_ratio
       |  FROM documents),
       |qd AS (
       |  SELECT source, doc_id, toks, md5(CAST(doc_id AS VARCHAR)) AS h,
       |    floor((CASE WHEN n_tokens >= 20 THEN 0.4 ELSE n_tokens / 50 END
       |         + CASE WHEN punct_ratio <= 0.1 THEN 0.3 ELSE 0.0 END
       |         + CASE WHEN stopword_ratio BETWEEN 0.05 AND 0.6 THEN 0.3 ELSE 0.0 END)
       |          * 100.0 + 0.5) / 100.0 AS q
       |  FROM s),
       |t AS (SELECT CAST(floor(CAST(sum(toks) AS DOUBLE) * 2.0 / 5.0) AS BIGINT) AS budget FROM qd),
       |r AS (
       |  SELECT source, doc_id, toks, t.budget,
       |    sum(toks) OVER (ORDER BY q DESC, h, doc_id
       |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM qd, t),
       |kept AS (
       |  SELECT source, doc_id % 8 AS shard, doc_id, toks,
       |    row_number() OVER (PARTITION BY source, doc_id % 8 ORDER BY doc_id) AS rn
       |  FROM r WHERE cum <= budget),
       |pack AS (
       |  SELECT source, shard, rn, toks, CAST(1 AS BIGINT) AS seq_id, toks AS acc
       |  FROM kept WHERE rn = 1
       |  UNION ALL
       |  SELECT d.source, d.shard, d.rn, d.toks,
       |         CASE WHEN p.acc + d.toks > 512 THEN p.seq_id + 1 ELSE p.seq_id END,
       |         CASE WHEN p.acc + d.toks > 512 THEN d.toks ELSE p.acc + d.toks END
       |  FROM pack p JOIN kept d ON d.source = p.source AND d.shard = p.shard
       |                         AND d.rn = p.rn + 1),
       |seqs AS (
       |  SELECT source, shard, seq_id, count(*) AS sd, sum(toks) AS st
       |  FROM pack GROUP BY source, shard, seq_id)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_seqs,
       |       CAST(sum(sd) AS BIGINT) AS n_docs,
       |       CAST(sum(st) AS BIGINT) AS n_tokens
       |FROM seqs GROUP BY source""".stripMargin
  }

  // ---- PIPE9: trained-tokenizer packing (BPE -> counts -> pack) -----------

  /** PIPE9 — the GPT-2-style tokenizer-aware batch construction a
    * training pipeline actually runs (r11 task #4): learn a BPE merge
    * table on the corpus (x19), count each document's tokens under the
    * TRAINED tokenizer (map-side memoized fold — the text never
    * shuffles), then greedy-pack per (source, shard) at a 512-token
    * budget (pk1's fold over the BPE counts). The oracle replays
    * training + tokenization in SQL ([[BpeSql]]) and the pk1 recursive
    * CTE over those counts — the whole chain under one hash. */
  private def pipe9BpePack: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val merges = graft.scale.TextAnalysis.bpeLearn(docs, "text", 6)
    val counted = graft.scale.TextAnalysis.bpeDocTokenCount(
      docs, "text", merges, "n_tok")
    graft.scale.Packing.packGreedyCounts(
      counted, "n_tok", "doc_id", "source", budget = 512L, shards = 8)
  }

  private val pipe9Sql =
    s"""WITH RECURSIVE ${BpeSql.learnCtes(6)},
       |wlen AS (SELECT w, CAST(len(syms) AS BIGINT) AS wt FROM v6),
       |dcnt AS (
       |  SELECT doc_id, CAST(sum(wt) AS BIGINT) AS toks
       |  FROM (SELECT doc_id, w FROM (
       |          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
       |          FROM documents) x
       |        WHERE length(w) > 0) dw
       |  JOIN wlen USING (w) GROUP BY 1),
       |docs2 AS (
       |  SELECT d.source, d.doc_id % 8 AS shard, d.doc_id,
       |         coalesce(c.toks, 0) AS toks,
       |         row_number() OVER (PARTITION BY d.source, d.doc_id % 8
       |                            ORDER BY d.doc_id) AS rn
       |  FROM documents d LEFT JOIN dcnt c ON d.doc_id = c.doc_id),
       |pack AS (
       |  SELECT source, shard, rn, toks, CAST(1 AS BIGINT) AS seq_id, toks AS acc
       |  FROM docs2 WHERE rn = 1
       |  UNION ALL
       |  SELECT d.source, d.shard, d.rn, d.toks,
       |         CASE WHEN p.acc + d.toks > 512 THEN p.seq_id + 1 ELSE p.seq_id END,
       |         CASE WHEN p.acc + d.toks > 512 THEN d.toks ELSE p.acc + d.toks END
       |  FROM pack p JOIN docs2 d ON d.source = p.source AND d.shard = p.shard
       |                          AND d.rn = p.rn + 1)
       |SELECT source, shard, seq_id, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(toks) AS BIGINT) AS n_tokens
       |FROM pack GROUP BY source, shard, seq_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "v1_json_extract"   -> v1JsonExtract,
    "pipe9_bpe_pack"    -> pipe9BpePack,
    "pk1_seq_pack"      -> pk1SeqPack,
    "pk2_budget_select" -> pk2BudgetSelect,
    "pk3_shard_snake"   -> pk3ShardSnake,
    "s10_ann_pq"        -> s10AnnPq,
    "s11_pq_adc"        -> s11PqAdc,
    "s12_ivfpq"         -> s12IvfPq,
    "st_pack"           -> stPack,
    "t24_ts_tokens"     -> t24TsTokens,
    "t25_detokenize"    -> t25Detokenize,
    "sm16_anneal"       -> sm16Anneal,
    "sm17_schedule"     -> sm17Schedule,
    "x22_zipf"          -> x22Zipf,
    "s13_hard_negatives" -> s13HardNegatives,
    "sm18_unimax"       -> sm18Unimax,
    "pk4_pack_stats"    -> pk4PackStats,
    "st_budget"         -> stBudget,
    "x23_fim"           -> x23Fim,
    "x24_span_corrupt"  -> x24SpanCorrupt,
    "x25_word_dropout"  -> x25WordDropout,
    "sm19_curriculum"   -> sm19Curriculum,
    "s14_mmr"           -> s14Mmr,
    "e9_feature_hash"   -> e9FeatureHash,
    "s15_hard_neg_ivf"  -> s15HardNegIvf,
    "pipe7_fim_pack"    -> pipe7FimPack,
    "v2_json_keys"      -> v2JsonKeys,
    "sm20_rank_norm"    -> sm20RankNorm,
    "d18_incremental"   -> d18Incremental,
    "pipe8_conversations" -> pipe8Conversations,
    "a30_dataset_card"  -> a30DatasetCard,
    "pipe5_tokens"      -> pipe5Tokens,
    "pipe6_ts_windows"  -> pipe6TsWindows
  )

  val oracle: Map[String, String] = Map(
    "v1_json_extract"   -> v1Sql,
    "pipe9_bpe_pack"    -> pipe9Sql,
    "pk1_seq_pack"      -> pk1Sql,
    "pk2_budget_select" -> pk2Sql,
    "pk3_shard_snake"   -> pk3Sql,
    "s11_pq_adc"        -> s11Sql,
    "st_pack"           -> pk1Sql,
    "t24_ts_tokens"     -> t24Sql,
    "t25_detokenize"    -> t25Sql,
    "sm16_anneal"       -> sm16Sql,
    "sm17_schedule"     -> sm17Sql,
    "x22_zipf"          -> x22Sql,
    "s13_hard_negatives" -> s13Sql,
    "sm18_unimax"       -> sm18Sql,
    "pk4_pack_stats"    -> pk4Sql,
    "st_budget"         -> stBudgetSql,
    "x23_fim"           -> x23Sql,
    "x24_span_corrupt"  -> x24Sql,
    "x25_word_dropout"  -> x25Sql,
    "sm19_curriculum"   -> sm19Sql,
    "e9_feature_hash"   -> e9Sql,
    "pipe7_fim_pack"    -> pipe7Sql,
    "v2_json_keys"      -> v2Sql,
    "sm20_rank_norm"    -> sm20Sql,
    "d18_incremental"   -> d18Sql,
    "pipe8_conversations" -> pipe8Sql,
    "a30_dataset_card"  -> a30Sql,
    "pipe5_tokens"      -> pipe5Sql,
    "pipe6_ts_windows"  -> pipe6Sql
  )
}
