package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-12 session-2 additions — the state-space / distribution-free /
  * hierarchical forecasting surface plus the training-data operators the
  * first pass left open: local-level Kalman filtering (f16, exact
  * recursive-CTE oracle — the st_tsb pattern), split-conformal intervals
  * (f17, order-statistic quantile), hierarchical reconciliation (f18,
  * bottom-up + top-down over customer → nation → total). Every query
  * pairs a Spark plan with a DuckDB oracle below. */
object ScaleQueries6 {

  type Q = (SparkSession, String) => DataFrame

  // ---- F16: local-level Kalman filter ------------------------------------

  /** F16 — per-event Kalman filter over every user series: one-step
    * prediction, posterior level/variance, gain. The oracle replays the
    * EXACT (a, p) recursion as a recursive CTE — q = 1/4 and r = 1 are
    * binary fractions, inputs are cents, so every op is one IEEE-754
    * instruction on both engines and the hash check covers the whole
    * filter trajectory, not summary statistics. */
  private def f16Kalman: Q = (s, d) =>
    graft.scale.PerSeriesForecast.kalmanLocalLevel(
        Tables.events(s, d), "value", "ts", "user_id", "event_id",
        q = 0.25, r = 1.0)
      .select(col("user_id"), col("event_id"),
              Det.dround(col("yhat_prior"), 6).as("yhat_prior"),
              Det.dround(col("level"), 6).as("level"),
              Det.dround(col("p_var"), 6).as("p_var"),
              Det.dround(col("k_gain"), 6).as("k_gain"))

  private val f16Sql =
    s"""WITH RECURSIVE s AS (SELECT user_id, event_id,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
       |    floor(CAST(value AS DOUBLE)*100 + 0.5)/100 AS y2
       |  FROM events),
       |st(user_id, rn, a, p) AS (
       |  -- CAST the anchor literal: DuckDB would type the whole recursive
       |  -- p column DECIMAL(2,1) from a bare 1.0 and round every step
       |  SELECT user_id, rn, y2, CAST(1.0 AS DOUBLE) FROM s WHERE rn = 1
       |  UNION ALL
       |  SELECT st.user_id, s.rn,
       |    st.a + ((st.p + 0.25)/(st.p + 0.25 + 1.0))*(s.y2 - st.a),
       |    (1.0 - (st.p + 0.25)/(st.p + 0.25 + 1.0))*(st.p + 0.25)
       |  FROM st JOIN s ON s.user_id = st.user_id AND s.rn = st.rn + 1)
       |SELECT s.user_id, s.event_id,
       |  ${Det.droundSql("prior.a", 6)} AS yhat_prior,
       |  ${Det.droundSql("cur.a", 6)} AS level,
       |  ${Det.droundSql("cur.p", 6)} AS p_var,
       |  ${Det.droundSql("(prior.p + 0.25)/(prior.p + 0.25 + 1.0)", 6)} AS k_gain
       |FROM s
       |JOIN st cur ON cur.user_id = s.user_id AND cur.rn = s.rn
       |LEFT JOIN st prior ON prior.user_id = s.user_id AND prior.rn = s.rn - 1""".stripMargin

  // ---- F17: split-conformal forecast intervals ---------------------------

  /** F17 — split-conformal bands per user series at 80% target coverage:
    * calibration = last ⌊n/4⌋ points, base = drift through the TRAIN
    * endpoints, q̂ = the ⌈(c+1)·0.8⌉-th smallest absolute calibration
    * residual (an order statistic with (score, rn) tie-break — both
    * engines select the identical element). */
  private def f17Conformal: Q = (s, d) =>
    graft.scale.PerSeriesForecast.conformalForecast(
        Tables.events(s, d), "value", "ts", "user_id", 3,
        covNum = 8, covDen = 10, tieBreak = Some("event_id"))
      .select(col("user_id"), col("h"), col("n"), col("c"),
              Det.dround(col("qhat"), 6).as("qhat"),
              Det.dround(col("yhat"), 6).as("yhat"),
              Det.dround(col("lo"), 6).as("lo"),
              Det.dround(col("hi"), 6).as("hi"))

  private val f17Sql =
    s"""WITH s AS (SELECT user_id,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
       |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
       |    CAST(value AS DOUBLE) AS y
       |  FROM events),
       |g AS (SELECT user_id, rn, n, y FROM s WHERE n >= 16),
       |f AS (SELECT user_id, max(n) AS n, max(n // 4) AS c,
       |        max(n - n // 4) AS m,
       |        max(CASE WHEN rn = 1 THEN y END) AS y1,
       |        max(CASE WHEN rn = n - n // 4 THEN y END) AS ym
       |      FROM g GROUP BY 1),
       |fit AS (SELECT user_id, n, c, m, ym, (ym - y1)/(m - 1) AS slope FROM f),
       |cal AS (SELECT g.user_id, g.rn,
       |          floor(abs(g.y - (fit.ym + (g.rn - fit.m)*fit.slope))*1000000.0 + 0.5)/1000000.0 AS score
       |        FROM g JOIN fit USING (user_id) WHERE g.rn > fit.m),
       |rk AS (SELECT user_id, score,
       |         row_number() OVER (PARTITION BY user_id ORDER BY score, rn) AS rk
       |       FROM cal),
       |q AS (SELECT rk.user_id,
       |        max(CASE WHEN rk.rk = least(fit.c, (8*(fit.c+1) + 9) // 10)
       |            THEN rk.score END) AS qhat
       |      FROM rk JOIN fit USING (user_id) GROUP BY 1)
       |SELECT fit.user_id, h, fit.n, fit.c,
       |  ${Det.droundSql("qhat", 6)} AS qhat,
       |  ${Det.droundSql("fit.ym + (fit.n - fit.m + h)*fit.slope", 6)} AS yhat,
       |  ${Det.droundSql("(fit.ym + (fit.n - fit.m + h)*fit.slope) - qhat", 6)} AS lo,
       |  ${Det.droundSql("(fit.ym + (fit.n - fit.m + h)*fit.slope) + qhat", 6)} AS hi
       |FROM fit JOIN q USING (user_id)
       |CROSS JOIN generate_series(1, 3) AS gs(h)""".stripMargin

  // ---- F18: hierarchical forecast reconciliation --------------------------

  /** F18 — bottom-up + top-down reconciliation of naive daily-total
    * forecasts over customer → nation → total. Exact cents end to end;
    * the coherence gap column IS the point of the operator (base
    * forecasts at different levels anchor on different last days). */
  private def f18Reconcile: Q = (s, d) =>
    graft.scale.Reconcile.naiveDaily(
        Tables.orders(s, d), Tables.customer(s, d), Tables.nation(s, d))
      .select(col("n_name"),
              Det.dround(col("yhat_base"), 2).as("yhat_base"),
              Det.dround(col("yhat_bu"), 2).as("yhat_bu"),
              Det.dround(col("yhat_td"), 6).as("yhat_td"),
              Det.dround(col("gap_bu"), 2).as("gap_bu"))

  private val f18Sql =
    s"""WITH daily AS (
       |  SELECT c_nationkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS day,
       |    CAST(sum(CAST(floor(CAST(o_totalprice AS DOUBLE)*100 + 0.5) AS BIGINT)) AS BIGINT) AS c2
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  GROUP BY 1, 2, 3),
       |custfc AS (SELECT c_nationkey, o_custkey,
       |             arg_max(c2, day) AS fc, CAST(sum(c2) AS BIGINT) AS hist
       |           FROM daily GROUP BY 1, 2),
       |bu AS (SELECT c_nationkey, CAST(sum(fc) AS BIGINT) AS bu_cents,
       |         CAST(sum(hist) AS BIGINT) AS hist_cents
       |       FROM custfc GROUP BY 1),
       |natd AS (SELECT c_nationkey, day, CAST(sum(c2) AS BIGINT) AS c2
       |         FROM daily GROUP BY 1, 2),
       |natfc AS (SELECT c_nationkey, arg_max(c2, day) AS base_cents
       |          FROM natd GROUP BY 1),
       |topd AS (SELECT day, CAST(sum(c2) AS BIGINT) AS c2 FROM daily GROUP BY 1),
       |topfc AS (SELECT arg_max(c2, day) AS top_cents FROM topd),
       |toph AS (SELECT CAST(sum(c2) AS BIGINT) AS top_hist FROM daily)
       |SELECT n_name,
       |  ${Det.droundSql("base_cents/100.0", 2)} AS yhat_base,
       |  ${Det.droundSql("bu_cents/100.0", 2)} AS yhat_bu,
       |  ${Det.droundSql("floor(top_cents/100.0 * (CAST(hist_cents AS DOUBLE)/top_hist) * 1000000.0 + 0.5)/1000000.0", 6)} AS yhat_td,
       |  ${Det.droundSql("(bu_cents - base_cents)/100.0", 2)} AS gap_bu
       |FROM bu JOIN natfc USING (c_nationkey)
       |CROSS JOIN topfc CROSS JOIN toph
       |JOIN nation ON c_nationkey = n_nationkey""".stripMargin

  // ---- PK6: packed-sequence manifest --------------------------------------

  /** PK6 — the manifest a trainer actually consumes from packing: per
    * packed sequence, the ordered doc ids and each doc's start offset
    * (the position-id reset / attention-segment boundaries), alongside
    * the pk1 fill stats. Composes the SAME shared fold as pk1/st_pack
    * (per-doc assignments), then one window on the same partitioning for
    * the exclusive prefix offsets — the oracle replays pk1's recursive
    * CTE and reads the offsets off the running fill (acc − toks), so
    * hash equality proves the boundary geometry, not just the totals. */
  private def pk6Manifest: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val asg = graft.streaming.StreamPack.assignBatch(
        Tables.documents(s, d), "text", "doc_id", "source",
        budget = 512L, shards = 8).toDF()
    val wSeq = Window.partitionBy(col("grp"), col("shard"), col("seqId"))
      .orderBy(col("id"))
    asg.withColumn("start", coalesce(
        sum(col("toks")).over(wSeq.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .groupBy(col("grp").as("source"), col("shard"),
               col("seqId").as("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"),
           array_join(transform(
             sort_array(collect_list(struct(col("id"), col("start")))),
             x => x.getField("id").cast("string")), ",").as("doc_ids"),
           array_join(transform(
             sort_array(collect_list(struct(col("id"), col("start")))),
             x => x.getField("start").cast("string")), ",").as("starts"))
  }

  private val pk6Sql =
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
       |SELECT p.source, p.shard, p.seq_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(p.toks) AS BIGINT) AS n_tokens,
       |  string_agg(CAST(d.doc_id AS VARCHAR), ',' ORDER BY p.rn) AS doc_ids,
       |  string_agg(CAST(p.acc - p.toks AS VARCHAR), ',' ORDER BY p.rn) AS starts
       |FROM pack p JOIN docs d ON d.source = p.source AND d.shard = p.shard
       |                       AND d.rn = p.rn
       |GROUP BY 1, 2, 3""".stripMargin

  // ---- X27: SFT loss-mask construction -------------------------------------

  /** X27 — completion-only loss masking over sessionized event
    * conversations: the rendered role-templated doc plus the exact
    * character spans (`start:end;…`) a trainer's loss should keep —
    * assistant-turn content only. The mask geometry (every offset) is
    * hash-checked, not just counts. */
  private def x27LossMask: Q = (s, d) =>
    graft.scale.EventAnalytics.sftLossMask(
        Tables.events(s, d), "event_type", "ts", "event_id", "user_id",
        assistantTypes = Seq("purchase", "error"))
      .select(col("user_id"), col("session_id").cast("long").as("session_id"),
              col("n_turns"), col("doc"), col("train_spans"),
              col("n_train_chars"), col("n_total_chars"))

  private val x27Sql =
    """WITH g AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |         OR lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |t AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id,
      |    CASE WHEN event_type IN ('purchase', 'error')
      |         THEN 'assistant' ELSE 'user' END AS role
      |  FROM g),
      |seg AS (
      |  SELECT user_id, session_id, ts, event_id, event_type, role,
      |    '<' || role || '>' || event_type AS seg,
      |    CAST(length('<' || role || '>' || event_type) AS BIGINT) AS seg_len
      |  FROM t),
      |off AS (
      |  SELECT *, CAST(coalesce(sum(seg_len + 1) OVER (
      |      PARTITION BY user_id, session_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS strt
      |  FROM seg)
      |SELECT user_id, session_id,
      |  CAST(count(*) AS BIGINT) AS n_turns,
      |  string_agg(seg, chr(10) ORDER BY ts, event_id) AS doc,
      |  -- all-user sessions: Spark's array_join over an empty collect_list
      |  -- is '', DuckDB's string_agg over all-NULL is NULL — coalesce
      |  coalesce(string_agg(CASE WHEN role = 'assistant'
      |    THEN CAST(strt + length(role) + 2 AS VARCHAR) || ':' ||
      |         CAST(strt + seg_len AS VARCHAR) END, ';' ORDER BY ts, event_id), '')
      |    AS train_spans,
      |  CAST(sum(CASE WHEN role = 'assistant' THEN length(event_type) ELSE 0 END) AS BIGINT)
      |    AS n_train_chars,
      |  CAST(sum(seg_len) + count(*) - 1 AS BIGINT) AS n_total_chars
      |FROM off GROUP BY 1, 2""".stripMargin

  // ---- S16: margin-based bitext mining --------------------------------------

  /** S16 — margin-scored parallel-pair mining (the LASER/CCMatrix rule):
    * each anchor's best cross-label match by cosine normalized against
    * BOTH sides' k-NN neighborhood density. Forward and backward means
    * divide exact integer sums of 1e-6-grid cosines; the argmax ties
    * break by vid on both engines. */
  private def s16Bitext: Q = (s, d) =>
    graft.scale.Similarity.bitextMargin(
        Tables.embeddings(s, d), Seq(0L, 1L, 2L, 3L, 4L), 4,
        "embedding", "vec_id", "label")

  private val s16Sql =
    """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |q AS (SELECT vec_id AS qid, label AS qlbl, e AS qe FROM v
      |      WHERE vec_id IN (0, 1, 2, 3, 4)),
      |scored AS (
      |  SELECT q.qid, v.vec_id AS vid,
      |    floor(list_dot_product(v.e, q.qe) /
      |      (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(q.qe, q.qe)))
      |      * 1000000.0 + 0.5)/1000000.0 AS cos6
      |  FROM v JOIN q ON v.vec_id <> q.qid AND v.label <> q.qlbl),
      |fwd AS (SELECT qid,
      |    (CAST(sum(CAST(floor(cos6*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/count(*))/1000000.0 AS a_fwd
      |  FROM (SELECT qid, cos6,
      |          row_number() OVER (PARTITION BY qid ORDER BY cos6 DESC, vid) AS rk
      |        FROM scored)
      |  WHERE rk <= 4 GROUP BY 1),
      |bwd AS (SELECT vid,
      |    (CAST(sum(CAST(floor(cos6*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/count(*))/1000000.0 AS a_bwd
      |  FROM (SELECT vid, cos6,
      |          row_number() OVER (PARTITION BY vid ORDER BY cos6 DESC, qid) AS rk
      |        FROM scored)
      |  WHERE rk <= 4 GROUP BY 1),
      |m AS (SELECT s.qid, s.vid, s.cos6,
      |        floor(s.cos6 / ((f.a_fwd + b.a_bwd)/2.0) * 1000000.0 + 0.5)/1000000.0 AS margin6
      |      FROM scored s JOIN fwd f USING (qid) JOIN bwd b USING (vid)),
      |r AS (SELECT qid, vid, cos6, margin6,
      |        row_number() OVER (PARTITION BY qid ORDER BY margin6 DESC, vid) AS rk
      |      FROM m)
      |SELECT qid, vid, cos6, margin6 AS margin FROM r WHERE rk = 1""".stripMargin

  // ---- SM21: DoReMi domain reweighting --------------------------------------

  /** SM21 — the DoReMi mirror-descent mixture fold over (step × domain)
    * excess losses: the trajectory of domain weights after each of 8
    * Hedge updates. The fold itself runs over a bounded config-sized
    * table; the oracle UNROLLS the 8 steps as chained CTEs with exact
    * 1e-12-integer mass sums — hash equality proves the update rule. */
  private def sm21Doremi: Q = (s, d) =>
    graft.scale.Sampling.doremiWeights(
        Tables.documents(s, d), "source", "doc_id", "n_chars", steps = 8)

  private val sm21Sql = {
    val base =
      """WITH d AS (SELECT source, doc_id % 8 AS step,
        |    CAST(floor(CAST(n_chars AS DOUBLE)/(n_chars + 1000)*1000000.0 + 0.5) AS BIGINT) AS loss6
        |  FROM documents),
        |a AS (SELECT step, source, CAST(sum(loss6) AS BIGINT) AS s6,
        |        CAST(count(*) AS BIGINT) AS c
        |      FROM d GROUP BY 1, 2),
        |g AS (SELECT step, CAST(sum(s6) AS BIGINT) AS gs6,
        |        CAST(sum(c) AS BIGINT) AS gc FROM a GROUP BY 1),
        |srcs AS (SELECT source, row_number() OVER (ORDER BY source) AS i,
        |           CAST(count(*) OVER () AS BIGINT) AS nd
        |         FROM (SELECT DISTINCT source FROM documents)),
        |grid AS (SELECT s.source, s.i, s.nd, t.step
        |         FROM srcs s CROSS JOIN generate_series(0, 7) AS t(step)),
        |ex AS (SELECT grid.step, grid.i, grid.source, grid.nd,
        |         CASE WHEN a.c IS NULL OR g.gc IS NULL OR g.gc = 0 THEN 0.0
        |              ELSE floor(greatest(CAST(a.s6 AS DOUBLE)/a.c/1000000.0
        |                   - CAST(g.gs6 AS DOUBLE)/g.gc/1000000.0, 0.0)*1000000.0 + 0.5)/1000000.0
        |         END AS exv
        |       FROM grid LEFT JOIN a ON a.step = grid.step AND a.source = grid.source
        |                 LEFT JOIN g ON g.step = grid.step),
        |w0 AS (SELECT i, source, nd,
        |         floor(1.0/nd*1000000000.0 + 0.5)/1000000000.0 AS w
        |       FROM srcs)""".stripMargin
    val stepCtes = (0 until 8).map { t =>
      s"""w${t + 1} AS (
         |  SELECT z.i, z.source, z.nd,
         |    floor((0.984375*(CAST(z.m12 AS DOUBLE)/CAST(z.s12 AS DOUBLE))
         |      + 0.015625*(1.0/z.nd))*1000000000.0 + 0.5)/1000000000.0 AS w
         |  FROM (
         |    SELECT p.i, p.source, p.nd,
         |      CAST(floor(p.w * (floor(exp(ex.exv)*1000000000.0 + 0.5)/1000000000.0) * 1000000000000.0 + 0.5) AS BIGINT) AS m12,
         |      CAST(sum(CAST(floor(p.w * (floor(exp(ex.exv)*1000000000.0 + 0.5)/1000000000.0) * 1000000000000.0 + 0.5) AS BIGINT)) OVER () AS BIGINT) AS s12
         |    FROM w$t p JOIN ex ON ex.i = p.i AND ex.step = $t) z)""".stripMargin
    }.mkString(",\n")
    val unions = (1 to 8).map(t =>
      s"SELECT CAST($t AS BIGINT) AS step, source, w AS weight FROM w$t")
      .mkString("\nUNION ALL\n")
    s"$base,\n$stepCtes\n$unions"
  }

  // ---- A36: Poisson-bootstrap CI ---------------------------------------------

  /** A36 — 90% Poisson-bootstrap CI for each event type's mean value
    * (Chamandy et al. 2012 — THE uncertainty construction for data too
    * big to resample): 64 map-side Poisson(1) reweightings, exact
    * integer replicate sums, order-statistic percentile bounds. The
    * whole resampling geometry (every md5 draw, every replicate mean,
    * both order statistics) replays in DuckDB. */
  private def a36PoissonBoot: Q = (s, d) =>
    graft.stats.Bootstrap.poissonMeanCi(
        Tables.events(s, d), "value", "event_id", "event_type", b = 64)
      .select(col("event_type"), col("n"),
              Det.dround(col("mean"), 6).as("mean"), col("b_eff"),
              Det.dround(col("lo"), 6).as("lo"),
              Det.dround(col("hi"), 6).as("hi"))

  private val a36Sql = {
    val pois = graft.stats.Bootstrap.poissonSql("u")
    s"""WITH base AS (SELECT event_type AS grp, CAST(event_id AS VARCHAR) AS rid,
       |    CAST(floor(CAST(value AS DOUBLE)*1000000.0 + 0.5) AS BIGINT) AS x6
       |  FROM events),
       |reps AS (SELECT j FROM generate_series(0, 63) AS t(j)),
       |bound AS (SELECT grp, x6, j,
       |    (('0x' || substr(md5(rid || ':' || CAST(j // 4 AS VARCHAR)),
       |        CAST(1 + 8*(j % 4) AS INT), 8))::BIGINT + 0.5)/4294967296.0 AS u
       |  FROM base CROSS JOIN reps),
       |w AS (SELECT grp, j, x6, $pois AS w FROM bound),
       |rm AS (SELECT grp, j, CAST(sum(w) AS BIGINT) AS sw,
       |         CAST(sum(w * x6) AS BIGINT) AS swx6
       |       FROM w GROUP BY 1, 2 HAVING sum(w) > 0),
       |rk AS (SELECT grp, j, CAST(swx6 AS DOUBLE)/sw/1000000.0 AS rmean,
       |         row_number() OVER (PARTITION BY grp
       |           ORDER BY CAST(swx6 AS DOUBLE)/sw/1000000.0, j) AS rk,
       |         CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS beff
       |       FROM rm),
       |ci AS (SELECT grp, CAST(max(beff) AS BIGINT) AS b_eff,
       |         max(CASE WHEN rk = greatest(1, (5*beff + 99) // 100) THEN rmean END) AS lo,
       |         max(CASE WHEN rk = (95*beff + 99) // 100 THEN rmean END) AS hi
       |       FROM rk GROUP BY 1),
       |f AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(x6) AS DOUBLE)/count(*)/1000000.0 AS mean
       |      FROM base GROUP BY 1)
       |SELECT f.grp AS event_type, n, ${Det.droundSql("mean", 6)} AS mean,
       |  b_eff, ${Det.droundSql("lo", 6)} AS lo, ${Det.droundSql("hi", 6)} AS hi
       |FROM f JOIN ci USING (grp)""".stripMargin
  }

  // ---- F19: inverse-MAE forecast combination -----------------------------------

  /** F19 — Bates–Granger combination of the naive/drift/SES trio: each
    * member weighted ∝ 1/(holdout MAE + ε), refit on the full series.
    * Weights AND the combined forecast hash-check (exact integer error
    * sums → deterministic double weights). */
  private def f19Combo: Q = (s, d) =>
    graft.scale.PerSeriesForecast.comboForecast(
        Tables.events(s, d), "value", "ts", "user_id", h = 5, horizon = 3,
        alpha = 0.5, tieBreak = Some("event_id"))
      .select(col("user_id"), col("h"),
              Det.dround(col("yhat"), 6).as("yhat"),
              Det.dround(col("w_naive"), 6).as("w_naive"),
              Det.dround(col("w_drift"), 6).as("w_drift"),
              Det.dround(col("w_ses"), 6).as("w_ses"))

  private val f19Sql =
    s"""WITH s AS (SELECT user_id,
       |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn,
       |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
       |    CAST(floor(CAST(value AS DOUBLE)*1e9 + 0.5) AS BIGINT) AS y9
       |  FROM events),
       |i AS (SELECT user_id, rn, n, y9/1e9 AS yq, n - 5 AS ntr FROM s WHERE n - 5 >= 2),
       |tr AS (SELECT *, CASE WHEN rn = 1 THEN pow(0.5, ntr - 1)
       |                      ELSE 0.5*pow(0.5, ntr - rn) END AS w
       |       FROM i WHERE rn <= ntr),
       |f AS (SELECT user_id, max(ntr) AS ntr,
       |        max(CASE WHEN rn = ntr THEN yq END) AS last_y,
       |        max(CASE WHEN rn = 1 THEN yq END) AS first_y,
       |        CAST(sum(CAST(floor(yq*w*1e9 + 0.5) AS BIGINT)) AS BIGINT) AS ses9
       |      FROM tr GROUP BY 1),
       |te AS (SELECT user_id, rn, yq, ntr, CAST(rn - ntr AS DOUBLE) AS k
       |       FROM i WHERE rn > ntr),
       |e AS (SELECT te.user_id,
       |        CAST(sum(CAST(floor(abs(te.yq - f.last_y)*1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s_n,
       |        CAST(sum(CAST(floor(abs(te.yq - (f.last_y + te.k*(f.last_y - f.first_y)/(f.ntr - 1)))*1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s_d,
       |        CAST(sum(CAST(floor(abs(te.yq - f.ses9/1e9)*1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s_s
       |      FROM te JOIN f USING (user_id) GROUP BY 1),
       |fl AS (SELECT user_id, max(n) AS nf,
       |        max(CASE WHEN rn = n THEN yq END) AS last_yf,
       |        max(CASE WHEN rn = 1 THEN yq END) AS first_yf,
       |        CAST(sum(CAST(floor(yq * (CASE WHEN rn = 1 THEN pow(0.5, n - 1)
       |              ELSE 0.5*pow(0.5, n - rn) END) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS ses9f
       |      FROM i GROUP BY 1),
       |v AS (SELECT e.user_id,
       |        1.0/(CAST(s_n AS DOUBLE)/5/1e9 + 0.001) AS iv_n,
       |        1.0/(CAST(s_d AS DOUBLE)/5/1e9 + 0.001) AS iv_d,
       |        1.0/(CAST(s_s AS DOUBLE)/5/1e9 + 0.001) AS iv_s,
       |        fl.nf, fl.last_yf, fl.first_yf, fl.ses9f
       |      FROM e JOIN fl USING (user_id)),
       |v2 AS (SELECT *, iv_n + iv_d + iv_s AS ws FROM v)
       |SELECT user_id, h,
       |  ${Det.droundSql(
             "(iv_n/ws)*last_yf + (iv_d/ws)*(last_yf + h*(last_yf - first_yf)/(nf - 1)) + (iv_s/ws)*(ses9f/1e9)", 6)} AS yhat,
       |  ${Det.droundSql("iv_n/ws", 6)} AS w_naive,
       |  ${Det.droundSql("iv_d/ws", 6)} AS w_drift,
       |  ${Det.droundSql("iv_s/ws", 6)} AS w_ses
       |FROM v2 CROSS JOIN generate_series(1, 3) AS g(h)""".stripMargin

  // ---- E11: weight-of-evidence encoding -----------------------------------------

  /** E11 — WoE encoding of the market segment against the binary
    * "account in credit" target: the supervised encoder family's
    * log-odds member (e1 label / e7 target / e9 hash / e10 frequency). */
  private def e11Woe: Q = (s, d) =>
    graft.core.Encoders.woeEncode(
        Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"),
                  (col("c_acctbal") > 0).as("in_credit")),
        "c_mktsegment", "in_credit")
      .select(col("c_custkey"), col("c_mktsegment"),
              col("c_mktsegment_pos"), col("c_mktsegment_neg"),
              Det.dround(col("c_mktsegment_woe"), 6).as("c_mktsegment_woe"))

  private val e11Sql =
    s"""WITH c AS (SELECT c_mktsegment,
       |    CAST(sum(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pos,
       |    CAST(sum(CASE WHEN c_acctbal > 0 THEN 0 ELSE 1 END) AS BIGINT) AS neg
       |  FROM customer GROUP BY 1),
       |t AS (SELECT CAST(sum(pos) AS BIGINT) AS tpos,
       |        CAST(sum(neg) AS BIGINT) AS tneg,
       |        CAST(count(*) AS BIGINT) AS k FROM c)
       |SELECT c_custkey, customer.c_mktsegment,
       |  pos AS c_mktsegment_pos, neg AS c_mktsegment_neg,
       |  ${Det.droundSql(
            "ln(((pos + 0.5)/(tpos + 0.5*k)) / ((neg + 0.5)/(tneg + 0.5*k)))", 6)} AS c_mktsegment_woe
       |FROM customer JOIN c USING (c_mktsegment) CROSS JOIN t""".stripMargin

  // ---- PIPE11: dedup → temperature mix → pack -------------------------------------

  /** PIPE11 — the pretraining data chain in ONE declarative plan: exact
    * dedup (first copy per content hash) → temperature-rebalanced source
    * mixture (α = 0.5 on the DEDUPED counts) → greedy packing of the
    * survivors, reported per source with padding accounting. Each stage
    * is individually hash-checked (d1 / sm7 / pk1); this query checks
    * their COMPOSITION end to end as one CTE chain. */
  private def pipe11Pretrain: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val keep = graft.scale.Dedup.exact(docs, "text", "doc_id")
      .select(col("keep_id").as("doc_id"))
    val surv = docs.join(keep, Seq("doc_id"))
    val bal = graft.scale.Sampling.temperatureSample(surv, "source",
        "doc_id", alpha = 0.5)
    graft.scale.Packing.packGreedy(bal, "text", "doc_id", "source",
        budget = 512L, shards = 8)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_seqs"),
           sum(col("n_docs")).as("n_docs"),
           sum(col("n_tokens")).as("n_tokens"),
           sum(when(col("n_tokens") <= 512L, lit(512L) - col("n_tokens"))
             .otherwise(0L)).as("pad_tokens"))
  }

  private val pipe11Sql =
    s"""WITH RECURSIVE dd AS (SELECT md5(text) AS h, min(doc_id) AS keep_id
       |  FROM documents GROUP BY 1),
       |sv AS (SELECT d.* FROM documents d JOIN dd ON d.doc_id = dd.keep_id),
       |c AS (SELECT source, count(*) AS n_src FROM sv GROUP BY 1),
       |m AS (SELECT min(n_src) AS n_min FROM c),
       |r AS (SELECT source,
       |        CAST(floor(sqrt(CAST(n_min AS DOUBLE)/CAST(n_src AS DOUBLE))*1000 + 0.5) AS INT) AS permille
       |      FROM c, m),
       |bal AS (SELECT sv.doc_id, sv.source, sv.text
       |        FROM sv JOIN r USING (source) WHERE sv.doc_id % 1000 < r.permille),
       |docs AS (
       |  SELECT source, doc_id % 8 AS shard, doc_id,
       |         CAST(len(regexp_extract_all(text, '${graft.scale.Packing.tokPattern}')) AS BIGINT) AS toks,
       |         row_number() OVER (PARTITION BY source, doc_id % 8 ORDER BY doc_id) AS rn
       |  FROM bal),
       |pack AS (
       |  SELECT source, shard, rn, toks, CAST(1 AS BIGINT) AS seq_id, toks AS acc
       |  FROM docs WHERE rn = 1
       |  UNION ALL
       |  SELECT d.source, d.shard, d.rn, d.toks,
       |         CASE WHEN p.acc + d.toks > 512 THEN p.seq_id + 1 ELSE p.seq_id END,
       |         CASE WHEN p.acc + d.toks > 512 THEN d.toks ELSE p.acc + d.toks END
       |  FROM pack p JOIN docs d ON d.source = p.source AND d.shard = p.shard
       |                         AND d.rn = p.rn + 1),
       |bins AS (SELECT source, shard, seq_id, CAST(count(*) AS BIGINT) AS n_docs,
       |           CAST(sum(toks) AS BIGINT) AS n_tokens
       |         FROM pack GROUP BY 1, 2, 3)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_seqs,
       |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN n_tokens <= 512 THEN 512 - n_tokens ELSE 0 END) AS BIGINT) AS pad_tokens
       |FROM bins GROUP BY source""".stripMargin

  // ---- A37: CUPED variance reduction ------------------------------------------

  /** A37 — CUPED adjustment of each user's second-half-of-January value
    * sum by their first-half sum (Deng–Xu–Kohavi–Walker 2013): the
    * A/B-testing variance-reduction transform. θ closes over exact
    * integer moment sums; the per-user adjustment is map-side. */
  private def a37Cuped: Q = (s, d) =>
    graft.stats.Cuped.adjustMeanMetric(
        Tables.events(s, d), "value", "user_id",
        col("ts").cast("long") < 1705363200L)   // 2024-01-16 00:00 UTC
      .select(col("user_id"), Det.dround(col("x"), 2).as("x"),
              Det.dround(col("y"), 2).as("y"),
              Det.dround(col("theta"), 6).as("theta"),
              Det.dround(col("y_adj"), 6).as("y_adj"))

  private val a37Sql =
    s"""WITH c AS (SELECT user_id,
       |    CAST(floor(CAST(value AS DOUBLE)*100 + 0.5) AS BIGINT) AS c2,
       |    epoch(ts) < 1705363200 AS pre
       |  FROM events),
       |u AS (SELECT user_id,
       |        CAST(sum(CASE WHEN pre THEN c2 ELSE 0 END) AS BIGINT) AS x2,
       |        CAST(sum(CASE WHEN pre THEN 0 ELSE c2 END) AS BIGINT) AS y2
       |      FROM c GROUP BY 1),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(x2) AS BIGINT) AS sx, CAST(sum(y2) AS BIGINT) AS sy,
       |        CAST(sum(x2*y2) AS BIGINT) AS sxy,
       |        CAST(sum(x2*x2) AS BIGINT) AS sxx
       |      FROM u)
       |SELECT user_id, ${Det.droundSql("x2/100.0", 2)} AS x,
       |  ${Det.droundSql("y2/100.0", 2)} AS y,
       |  ${Det.droundSql(
            "(CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))/(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))", 6)} AS theta,
       |  ${Det.droundSql(
            "y2/100.0 - ((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))/(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))) * (x2/100.0 - (CAST(sx AS DOUBLE)/n)/100.0)", 6)} AS y_adj
       |FROM u CROSS JOIN m""".stripMargin

  // ---- PK7: length-bucketed batching ------------------------------------------

  /** PK7 — bucket_by_sequence_length accounting per source at the
    * {64, 128, 256, 512} boundaries, batch size 32: doc/batch counts,
    * padding bill, fill rate. The non-packing varlen batching recipe,
    * complementing pk1/pk5's concatenation packing. */
  private def pk7LengthBuckets: Q = (s, d) =>
    graft.scale.Packing.lengthBuckets(
        Tables.documents(s, d), "text", "doc_id", "source",
        bounds = Seq(64L, 128L, 256L, 512L), batchSize = 32)
      .select(col("source"), col("bucket"), col("n_docs"), col("n_tokens"),
              col("pad_tokens"), col("n_batches"), col("fill_permille"))

  private val pk7Sql =
    s"""WITH t AS (SELECT source,
       |    CAST(len(regexp_extract_all(text, '${graft.scale.Packing.tokPattern}')) AS BIGINT) AS toks
       |  FROM documents),
       |b AS (SELECT source, toks,
       |        CASE WHEN toks <= 64 THEN 64 WHEN toks <= 128 THEN 128
       |             WHEN toks <= 256 THEN 256 WHEN toks <= 512 THEN 512
       |             ELSE 0 END AS bucket
       |      FROM t),
       |g AS (SELECT source, CAST(bucket AS BIGINT) AS bucket,
       |        CAST(count(*) AS BIGINT) AS n_docs,
       |        CAST(sum(toks) AS BIGINT) AS n_tokens,
       |        CAST(sum(CASE WHEN bucket > 0 THEN bucket - toks ELSE 0 END) AS BIGINT) AS pad_tokens
       |      FROM b GROUP BY 1, 2)
       |SELECT source, bucket, n_docs, n_tokens, pad_tokens,
       |  CAST((n_docs + 31) // 32 AS BIGINT) AS n_batches,
       |  CASE WHEN bucket > 0 THEN
       |    CAST(floor(CAST(n_tokens AS DOUBLE)/(bucket*n_docs)*1000 + 0.5) AS BIGINT)
       |  END AS fill_permille
       |FROM g""".stripMargin

  // ---- D19: n-gram containment ---------------------------------------------

  /** D19 — one-sided containment pairs (Broder's resemblance companion):
    * |A∩B|/|A| catches a short doc wholly quoted inside a long one where
    * Jaccard stays tiny. Same single shingle aggregation and hash-equi
    * pair join as d2 (shared core). */
  private def d19Containment: Q = (s, d) =>
    graft.scale.Dedup.ngramContainment(
        Tables.documents(s, d), "text", "doc_id", n = 3, threshold = 0.8)
      .select(col("id_a"), col("id_b"),
              Det.dround(col("cont_a"), 6).as("cont_a"),
              Det.dround(col("cont_b"), 6).as("cont_b"))

  private val d19Sql =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(w) - 2),
       |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
       |       FROM toks WHERE len(w) >= 3),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
       |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |c AS (SELECT id_a, id_b,
       |        CAST(i AS DOUBLE) / sa.n AS cont_a,
       |        CAST(i AS DOUBLE) / sb.n AS cont_b
       |      FROM inter JOIN sz sa ON id_a = sa.doc_id
       |                 JOIN sz sb ON id_b = sb.doc_id)
       |SELECT id_a, id_b, ${Det.droundSql("cont_a", 6)} AS cont_a,
       |  ${Det.droundSql("cont_b", 6)} AS cont_b
       |FROM c WHERE greatest(cont_a, cont_b) >= 0.8""".stripMargin

  // ---- S14 twin: MMR at λ=1 ≡ exact top-k ------------------------------------

  /** S14b — the MMR hash twin: λ=1 zeroes the diversity term, so the
    * sequential greedy MUST reproduce the exact cosine top-k — the whole
    * greedy machinery (pool build, argmax loop, tie rule) runs and is
    * hash-checked against the s1-style ranked-window oracle. The
    * production λ=0.7 path (`s14_mmr`) keeps its ✖est contract. */
  private def s14MmrL1: Q = (s, d) =>
    graft.scale.Similarity.mmrTopK(
        Tables.embeddings(s, d), Seq(0L, 1L, 2L, 3L, 4L), k = 5,
        lambda = 1.0, candN = 50, "embedding", "vec_id")

  private val s14L1Sql =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id IN (0, 1, 2, 3, 4)),
      |scored AS (
      |  SELECT q.qid, v.vec_id AS vid,
      |    floor(list_dot_product(v.e, q.qe) /
      |      (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(q.qe, q.qe)))
      |      * 1000000.0 + 0.5)/1000000.0 AS cosine
      |  FROM v JOIN q ON v.vec_id <> q.qid),
      |r AS (SELECT qid, vid, cosine,
      |        row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS rk
      |      FROM scored)
      |SELECT qid, CAST(rk AS BIGINT) AS sel_rank, vid, cosine AS mmr6
      |FROM r WHERE rk <= 5""".stripMargin

  // ---- S17: IVF recall curve (✖est) --------------------------------------------

  /** S17 — recall@5 vs nProbe over the 8-cell IVF index: the ANN
    * operating-point sweep. ✖est (Lloyd geometry); monotone + endpoint
    * spec-pinned. */
  private def s17IvfRecall: Q = (s, d) =>
    graft.scale.Similarity.ivfRecallCurve(
        Tables.embeddings(s, d), Seq(0L, 1L, 2L, 3L, 4L), 5,
        "embedding", "vec_id", nCells = 8)

  // ---- A38: delta-method ratio CI ----------------------------------------------

  /** A38 — revenue-per-event with the delta-method CI per user cohort
    * (Deng–Knoblich–Lu 2018): the ratio-metric se a naive per-row
    * variance gets WRONG because rows within a user correlate. Exact
    * per-user sum moments, double combination, one sqrt. */
  private def a38RatioCi: Q = (s, d) =>
    graft.stats.Cuped.ratioDeltaCi(
        Tables.events(s, d)
          .withColumn("rev", when(col("event_type") === "purchase",
            col("value")).otherwise(lit(0.0)))
          .withColumn("one", lit(1L))
          .withColumn("cohort", pmod(col("user_id"), lit(4L))),
        "rev", "one", "user_id", "cohort")
      .select(col("cohort"), col("n"), Det.dround(col("r"), 6).as("r"),
              Det.dround(col("se"), 6).as("se"),
              Det.dround(col("lo"), 6).as("lo"),
              Det.dround(col("hi"), 6).as("hi"))

  private val a38Sql =
    s"""WITH c AS (SELECT user_id % 4 AS cohort, user_id,
       |    CAST(floor((CASE WHEN event_type = 'purchase'
       |        THEN CAST(value AS DOUBLE) ELSE 0.0 END)*100 + 0.5) AS BIGINT) AS y2,
       |    CAST(1 AS BIGINT) AS x1
       |  FROM events),
       |u AS (SELECT cohort, user_id, CAST(sum(y2) AS BIGINT) AS ys,
       |        CAST(sum(x1) AS BIGINT) AS xs
       |      FROM c GROUP BY 1, 2),
       |m AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(ys) AS BIGINT) AS sy, CAST(sum(xs) AS BIGINT) AS sx,
       |        CAST(sum(ys*ys) AS BIGINT) AS syy,
       |        CAST(sum(xs*xs) AS BIGINT) AS sxx,
       |        CAST(sum(ys*xs) AS BIGINT) AS sxy
       |      FROM u GROUP BY 1),
       |v AS (SELECT cohort, n,
       |        (CAST(sy AS DOUBLE)/100.0)/CAST(sx AS DOUBLE) AS r,
       |        (CAST(n AS DOUBLE)*(CAST(syy AS DOUBLE)/10000.0)
       |          - (CAST(sy AS DOUBLE)/100.0)*(CAST(sy AS DOUBLE)/100.0))
       |          /(CAST(n AS DOUBLE)*CAST(n AS DOUBLE)) AS vyy,
       |        (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
       |          - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
       |          /(CAST(n AS DOUBLE)*CAST(n AS DOUBLE)) AS vxx,
       |        (CAST(n AS DOUBLE)*(CAST(sxy AS DOUBLE)/100.0)
       |          - (CAST(sy AS DOUBLE)/100.0)*CAST(sx AS DOUBLE))
       |          /(CAST(n AS DOUBLE)*CAST(n AS DOUBLE)) AS vxy,
       |        CAST(sx AS DOUBLE)/CAST(n AS DOUBLE) AS mx
       |      FROM m),
       |f AS (SELECT cohort, n, r,
       |        sqrt(greatest(0.0, (vyy - 2.0*r*vxy + r*r*vxx)
       |          /(CAST(n AS DOUBLE)*mx*mx))) AS se
       |      FROM v)
       |SELECT cohort, n, ${Det.droundSql("r", 6)} AS r,
       |  ${Det.droundSql("se", 6)} AS se,
       |  ${Det.droundSql("r - 1.96*se", 6)} AS lo,
       |  ${Det.droundSql("r + 1.96*se", 6)} AS hi
       |FROM f""".stripMargin

  // ---- PIPE12: conversations → loss masks → packing ------------------------------

  /** PIPE12 — the SFT batch-construction chain: sessionize events into
    * conversations, render role-templated docs with loss masks (x27),
    * tokenize ONCE, greedy-pack into 512-token training sequences. The
    * pipe11 of instruction tuning — one declarative plan end to end. */
  private def pipe12Sft: Q = (s, d) => {
    val masked = graft.scale.EventAnalytics.sftLossMask(
        Tables.events(s, d), "event_type", "ts", "event_id", "user_id",
        assistantTypes = Seq("purchase", "error"))
      .withColumn("id", col("user_id") * 100000L + col("session_id"))
      .withColumn("toks", graft.scale.Packing.tokenCount(col("doc")))
      .withColumn("grp", lit("all"))
    graft.scale.Packing.packGreedyCounts(masked, "toks", "id", "grp",
        budget = 512L, shards = 8)
      .select(col("shard"), col("seq_id"), col("n_docs"), col("n_tokens"))
  }

  private val pipe12Sql =
    s"""WITH RECURSIVE g AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1)
       |           OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
       |         OR lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events),
       |t AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id,
       |    CASE WHEN event_type IN ('purchase', 'error')
       |         THEN 'assistant' ELSE 'user' END AS role
       |  FROM g),
       |dref AS (
       |  SELECT user_id*100000 + session_id AS id,
       |    string_agg('<' || role || '>' || event_type, chr(10)
       |      ORDER BY ts, event_id) AS doc
       |  FROM t GROUP BY user_id, session_id),
       |docs AS (
       |  SELECT id % 8 AS shard, id,
       |    CAST(len(regexp_extract_all(doc, '${graft.scale.Packing.tokPattern}')) AS BIGINT) AS toks,
       |    row_number() OVER (PARTITION BY id % 8 ORDER BY id) AS rn
       |  FROM dref),
       |pack AS (
       |  SELECT shard, rn, toks, CAST(1 AS BIGINT) AS seq_id, toks AS acc
       |  FROM docs WHERE rn = 1
       |  UNION ALL
       |  SELECT d.shard, d.rn, d.toks,
       |         CASE WHEN p.acc + d.toks > 512 THEN p.seq_id + 1 ELSE p.seq_id END,
       |         CASE WHEN p.acc + d.toks > 512 THEN d.toks ELSE p.acc + d.toks END
       |  FROM pack p JOIN docs d ON d.shard = p.shard AND d.rn = p.rn + 1)
       |SELECT shard, seq_id, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(toks) AS BIGINT) AS n_tokens
       |FROM pack GROUP BY 1, 2""".stripMargin

  // ---- D20: prefix-filtered similarity join ------------------------------------

  /** D20 — PPJoin-style prefix filtering over the d2 semantics: only
    * each doc's |A| − ⌈t|A|⌉ + 1 RAREST shingles probe the index, so
    * boilerplate tokens never generate O(df²) candidates. Prefix
    * filtering is lossless — the oracle IS d2's (output row-for-row
    * equal), so the hash check proves the optimization exact. */
  private def d20PrefixJoin: Q = (s, d) =>
    graft.scale.Dedup.ngramJaccardPrefix(
        Tables.documents(s, d), "text", "doc_id", n = 3, threshold = 0.5)
      .select(col("id_a"), col("id_b"),
              Det.dround(col("jaccard"), 6).as("jaccard"))

  // ---- X28: tokenizer fertility audit --------------------------------------------

  /** X28 — per-source BPE fertility (mean pieces per word under the
    * x19-learned merges) + char-fallback share: the tokenizer-coverage
    * pre-flight every vocabulary change ships with. The oracle replays
    * the full 6-round learn fold (BpeSql) and reads pieces off v6. */
  private def x28Fertility: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val merges = graft.scale.TextAnalysis.bpeLearn(docs, "text", 6)
    graft.scale.TextAnalysis.bpeFertility(docs, "text", "source", merges)
      .select(col("source"), col("n_words"), col("n_pieces"),
              col("n_fallback"), col("fertility"), col("fallback_permille"))
  }

  private val x28Sql =
    s"""WITH ${BpeSql.learnCtes(6)},
       |sw AS (SELECT source, w, CAST(count(*) AS BIGINT) AS cnt
       |       FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS w
       |             FROM documents) z
       |       WHERE length(w) > 0 GROUP BY 1, 2),
       |p AS (SELECT w, CAST(len(syms) AS BIGINT) AS pieces FROM v6)
       |SELECT source, CAST(sum(cnt) AS BIGINT) AS n_words,
       |  CAST(sum(cnt*pieces) AS BIGINT) AS n_pieces,
       |  CAST(sum(CASE WHEN pieces = length(w) THEN cnt ELSE 0 END) AS BIGINT) AS n_fallback,
       |  floor(CAST(sum(cnt*pieces) AS DOUBLE)/sum(cnt)*1000000.0 + 0.5)/1000000.0 AS fertility,
       |  CAST(floor(CAST(sum(CASE WHEN pieces = length(w) THEN cnt ELSE 0 END) AS DOUBLE)/sum(cnt)*1000 + 0.5) AS BIGINT) AS fallback_permille
       |FROM sw JOIN p USING (w) GROUP BY 1""".stripMargin

  // ---- F20: Syntetos–Boylan approximation ----------------------------------------

  /** F20 — SBA bias-corrected Croston over the purchase series: the
    * method the t20_sbc classifier recommends for intermittent/lumpy
    * demand. f8's closed-weight plan plus one exact-binary multiply. */
  private def f20Sba: Q = (s, d) =>
    graft.scale.PerSeriesForecast.crostonSbaForecast(
        Tables.events(s, d).withColumn("demand",
          when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0))),
        "demand", "ts", Seq("user_id"), 2, 0.5, Seq("event_id"))
      .select(col("user_id"), col("h"), Det.dround(col("yhat"), 6).as("yhat"),
              col("n_demands"))

  private val f20Sql =
    s"""WITH s AS (SELECT user_id,
       |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS t,
       |    CASE WHEN event_type = 'purchase' THEN CAST(value AS DOUBLE) ELSE 0.0 END AS y
       |  FROM events),
       |nz AS (SELECT user_id, t, y,
       |    row_number() OVER (PARTITION BY user_id ORDER BY t) AS i,
       |    count(*) OVER (PARTITION BY user_id) AS nnz,
       |    CAST(t - coalesce(lag(t) OVER (PARTITION BY user_id ORDER BY t), 0) AS DOUBLE) AS q
       |  FROM s WHERE y <> 0.0),
       |w AS (SELECT user_id, nnz,
       |    CASE WHEN i = 1 THEN pow(0.5, nnz - 1)
       |         ELSE 0.5 * pow(0.5, nnz - i) END AS wgt, y, q
       |  FROM nz),
       |a AS (SELECT user_id,
       |    CAST(sum(CAST(floor(y * wgt * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS z9,
       |    CAST(sum(CAST(floor(q * wgt * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS q9,
       |    CAST(max(nnz) AS BIGINT) AS n_demands
       |  FROM w GROUP BY 1)
       |SELECT user_id, h,
       |  ${Det.droundSql("((z9/1e9)/(q9/1e9))*0.75", 6)} AS yhat, n_demands
       |FROM a, generate_series(1, 2) AS g(h)""".stripMargin

  // ---- registry -----------------------------------------------------------

  def queries: Map[String, Q] = Map(
    "f16_kalman"    -> f16Kalman,
    "f17_conformal" -> f17Conformal,
    "f18_reconcile" -> f18Reconcile,
    "pk6_manifest"  -> pk6Manifest,
    "x27_loss_mask" -> x27LossMask,
    "s16_bitext"    -> s16Bitext,
    "sm21_doremi"   -> sm21Doremi,
    "a36_poisson_boot" -> a36PoissonBoot,
    "f19_combo"     -> f19Combo,
    "e11_woe_encode" -> e11Woe,
    "pipe11_pretrain" -> pipe11Pretrain,
    "a37_cuped"     -> a37Cuped,
    "pk7_length_buckets" -> pk7LengthBuckets,
    "d19_containment" -> d19Containment,
    "s14_mmr_l1"    -> s14MmrL1,
    "s17_ivf_recall" -> s17IvfRecall,
    "a38_ratio_ci"  -> a38RatioCi,
    "pipe12_sft"    -> pipe12Sft,
    "d20_prefix_join" -> d20PrefixJoin,
    "x28_fertility" -> x28Fertility,
    "f20_sba"       -> f20Sba)

  def oracle: Map[String, String] = Map(
    "f16_kalman"    -> f16Sql,
    "f17_conformal" -> f17Sql,
    "f18_reconcile" -> f18Sql,
    "pk6_manifest"  -> pk6Sql,
    "x27_loss_mask" -> x27Sql,
    "s16_bitext"    -> s16Sql,
    "sm21_doremi"   -> sm21Sql,
    "a36_poisson_boot" -> a36Sql,
    "f19_combo"     -> f19Sql,
    "e11_woe_encode" -> e11Sql,
    "pipe11_pretrain" -> pipe11Sql,
    "a37_cuped"     -> a37Sql,
    "pk7_length_buckets" -> pk7Sql,
    "d19_containment" -> d19Sql,
    "s14_mmr_l1"    -> s14L1Sql,
    "a38_ratio_ci"  -> a38Sql,
    "pipe12_sft"    -> pipe12Sql,
    "d20_prefix_join" -> ScaleQueries.d2Sql,
    "x28_fertility" -> x28Sql,
    "f20_sba"       -> f20Sql)
}
