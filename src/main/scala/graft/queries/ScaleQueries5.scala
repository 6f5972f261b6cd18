package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-12 additions — the stationarity / nonparametric-trend /
  * intermittent-demand / document-rule-filter / packing-quality
  * surface: the KPSS complement to ADF (m13); the trend-audit battery
  * (Mann–Kendall a32, Pettitt a33, Theil–Sen a34, seasonal MK a35 —
  * each oracle replays the O(n²) pair DEFINITION against the Spark
  * side's O(n log n) decomposition); TSB intermittent demand (f14);
  * the damped-trend Holt pair (f13) and multiplicative Holt–Winters
  * pair (f15); Gopher's rule battery (x26); first-fit-decreasing
  * packing (pk5, list-state recursive-CTE oracle) and the rule-gated
  * packing pipeline (pipe10). Every ✔dt query pairs a Spark plan with
  * a DuckDB oracle below; f13_damped / f15_hw_mult are the ✖est
  * general recursions with their frozen-parameter closed-form hash
  * twins. */
object ScaleQueries5 {

  type Q = (SparkSession, String) => DataFrame

  // ---- X26: Gopher rule battery ----------------------------------------

  /** X26 — Gopher's document-quality rules (Rae et al. 2021, Table A1)
    * over the corpus: per document the word-count / word-length /
    * symbol / bullet / ellipsis / alphabetic / stop-word statistics and
    * the fused keep verdict. Pure map-side scalar expressions — the
    * corpus never shuffles; at 100 TB this is a scan-speed filter. */
  private def x26Gopher: Q = (s, d) =>
    graft.scale.QualityFilters.gopherRules(Tables.documents(s, d), "text",
        minStopwords = 1L)
      .select(col("doc_id"), col("n_words"), col("mean_word_len"),
              col("symbol_ratio"), col("bullet_ratio"), col("ellipsis_ratio"),
              col("alpha_word_ratio"), col("n_stopwords"), col("keep"))

  private val x26Sql = {
    val stops = graft.scale.QualityFilters.gopherStopwordsSql
    s"""WITH d AS (SELECT doc_id, text,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS w,
       |    string_split(text, chr(10)) AS lines
       |  FROM documents),
       |s AS (SELECT doc_id,
       |    CAST(len(w) AS BIGINT) AS n_words,
       |    CAST(len(lines) AS BIGINT) AS n_lines,
       |    CAST(coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS BIGINT) AS chars_sum,
       |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
       |      + CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT)
       |      + CAST(length(text) - length(replace(text, '…', '')) AS BIGINT) AS n_symbols,
       |    CAST(len(list_filter(lines, x -> x LIKE '- %' OR x LIKE '* %' OR x LIKE '• %')) AS BIGINT) AS n_bullet,
       |    CAST(len(list_filter(lines, x -> x LIKE '%...' OR x LIKE '%…')) AS BIGINT) AS n_ell,
       |    CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS n_alpha,
       |    CAST(len(list_filter([$stops], t -> list_contains(w, t))) AS BIGINT) AS n_stopwords
       |  FROM d),
       |r AS (SELECT doc_id, n_words, n_stopwords,
       |    CASE WHEN n_words > 0 THEN ${Det.droundSql("CAST(chars_sum AS DOUBLE) / n_words", 6)} END AS mean_word_len,
       |    CASE WHEN n_words > 0 THEN ${Det.droundSql("CAST(n_symbols AS DOUBLE) / n_words", 6)} END AS symbol_ratio,
       |    CASE WHEN n_lines > 0 THEN ${Det.droundSql("CAST(n_bullet AS DOUBLE) / n_lines", 6)} END AS bullet_ratio,
       |    CASE WHEN n_lines > 0 THEN ${Det.droundSql("CAST(n_ell AS DOUBLE) / n_lines", 6)} END AS ellipsis_ratio,
       |    CASE WHEN n_words > 0 THEN ${Det.droundSql("CAST(n_alpha AS DOUBLE) / n_words", 6)} END AS alpha_word_ratio
       |  FROM s)
       |SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_ratio,
       |  ellipsis_ratio, alpha_word_ratio, n_stopwords,
       |  coalesce(n_words BETWEEN 50 AND 100000
       |    AND mean_word_len BETWEEN 3.0 AND 10.0
       |    AND symbol_ratio < 0.1 AND bullet_ratio < 0.9
       |    AND ellipsis_ratio < 0.3 AND alpha_word_ratio > 0.8
       |    AND n_stopwords >= 1, false) AS keep
       |FROM r""".stripMargin
  }

  // ---- M13: KPSS stationarity test -------------------------------------

  /** M13 — KPSS per user series at fixed Bartlett lag 4: the
    * stationarity-NULL complement to `m10_adf`, fully hash-checkable
    * because the statistic is closed-form (cumsum quadratic + lag
    * covariances — no optimizer). The 1e-9/1e-6 integer grids make both
    * engines' sums exact; see StatTests.kpss. */
  private def m13Kpss: Q = (s, d) =>
    graft.stats.StatTests.kpssPerSeries(
        Tables.events(s, d), "value", "ts", "user_id", 4, Some("event_id"))
      .select(col("user_id"), col("n"), Det.dround(col("eta"), 6).as("eta"),
              col("reject_10pct"), col("reject_5pct"), col("reject_1pct"))

  private val m13Sql =
    s"""WITH s AS (SELECT user_id,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
       |    count(*) OVER (PARTITION BY user_id) AS nn,
       |    CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS c
       |  FROM events),
       |m AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS sumc,
       |        CAST(max(nn) AS BIGINT) AS n FROM s GROUP BY 1),
       |e AS (SELECT s.user_id, rn, n,
       |    CAST(floor((c/100.0 - (sumc/100.0)/n) * 1e9 + 0.5) AS BIGINT) AS e9
       |  FROM s JOIN m USING (user_id) WHERE n > 6),
       |cum AS (SELECT user_id, rn, n, e9,
       |    CAST(sum(e9) OVER (PARTITION BY user_id ORDER BY rn) AS BIGINT) AS s9
       |  FROM e),
       |a AS (SELECT user_id,
       |    CAST(sum(CAST(floor((s9/1e9/n)*(s9/1e9/n)*1e6 + 0.5) AS BIGINT)) AS BIGINT) AS a6
       |  FROM cum GROUP BY 1),
       |l AS (SELECT user_id, n, e9/1e9 AS ed,
       |    lag(e9, 1) OVER w / 1e9 AS ed1, lag(e9, 2) OVER w / 1e9 AS ed2,
       |    lag(e9, 3) OVER w / 1e9 AS ed3, lag(e9, 4) OVER w / 1e9 AS ed4
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY rn)),
       |g AS (SELECT user_id, max(n) AS n,
       |    CAST(sum(CAST(floor(ed*ed*1e6 + 0.5) AS BIGINT)) AS BIGINT) AS g0,
       |    CAST(sum(CASE WHEN ed1 IS NULL THEN 0 ELSE CAST(floor(ed*ed1*1e6 + 0.5) AS BIGINT) END) AS BIGINT) AS g1,
       |    CAST(sum(CASE WHEN ed2 IS NULL THEN 0 ELSE CAST(floor(ed*ed2*1e6 + 0.5) AS BIGINT) END) AS BIGINT) AS g2,
       |    CAST(sum(CASE WHEN ed3 IS NULL THEN 0 ELSE CAST(floor(ed*ed3*1e6 + 0.5) AS BIGINT) END) AS BIGINT) AS g3,
       |    CAST(sum(CASE WHEN ed4 IS NULL THEN 0 ELSE CAST(floor(ed*ed4*1e6 + 0.5) AS BIGINT) END) AS BIGINT) AS g4
       |  FROM l GROUP BY 1),
       |f AS (SELECT g.user_id, g.n, a6/1e6 AS qsum,
       |    (g0/1e6)/g.n + 2*(1 - 1.0/5)*((g1/1e6)/g.n) + 2*(1 - 2.0/5)*((g2/1e6)/g.n)
       |      + 2*(1 - 3.0/5)*((g3/1e6)/g.n) + 2*(1 - 4.0/5)*((g4/1e6)/g.n) AS lrv
       |  FROM g JOIN a USING (user_id))
       |SELECT user_id, n, ${Det.droundSql("qsum/lrv", 6)} AS eta,
       |  qsum/lrv > 0.347 AS reject_10pct,
       |  qsum/lrv > 0.463 AS reject_5pct,
       |  qsum/lrv > 0.739 AS reject_1pct
       |FROM f WHERE lrv > 0""".stripMargin

  // ---- A32: Mann–Kendall trend test ------------------------------------

  /** A32 — Mann–Kendall per user series: tie-corrected nonparametric
    * trend decision. Spark computes S in O(n log n) via the counting
    * merge sort (StatTests.mannKendall); the oracle replays the
    * DEFINITION — the exact O(n²) sign-pair join — so the hash equality
    * proves the inversion decomposition, not just the arithmetic. */
  private def a32MannKendall: Q = (s, d) =>
    graft.stats.StatTests.mannKendallPerSeries(
        Tables.events(s, d), "value", "ts", "user_id", Some("event_id"))
      .select(col("user_id"), col("n"), col("s"),
              Det.dround(col("var_s"), 6).as("var_s"),
              Det.dround(col("z"), 6).as("z"), col("trend"))

  private val a32Sql =
    s"""WITH s AS (SELECT user_id,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
       |    CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS c
       |  FROM events),
       |p AS (SELECT a.user_id,
       |    CAST(sum(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS sg
       |  FROM s a JOIN s b ON a.user_id = b.user_id AND b.rn > a.rn GROUP BY 1),
       |n AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY 1),
       |t AS (SELECT user_id,
       |        CAST(coalesce(sum(tc*(tc-1)*(2*tc+5)), 0) AS BIGINT) AS tv
       |      FROM (SELECT user_id, CAST(count(*) AS BIGINT) AS tc
       |            FROM s GROUP BY user_id, c) GROUP BY 1),
       |v AS (SELECT n.user_id, n.n, coalesce(p.sg, 0) AS sv,
       |        (n.n*(n.n-1)*(2*n.n+5) - t.tv)/18.0 AS var_s
       |      FROM n LEFT JOIN p USING (user_id) JOIN t USING (user_id)),
       |z AS (SELECT user_id, n, sv, var_s,
       |        CASE WHEN var_s > 0 THEN
       |          CASE WHEN sv > 0 THEN (sv - 1)/sqrt(var_s)
       |               WHEN sv < 0 THEN (sv + 1)/sqrt(var_s)
       |               ELSE 0.0 END END AS zs
       |      FROM v)
       |SELECT user_id, n, sv AS s, ${Det.droundSql("var_s", 6)} AS var_s,
       |  ${Det.droundSql("zs", 6)} AS z,
       |  CASE WHEN zs IS NULL THEN NULL
       |       WHEN zs > 1.96 THEN 'increasing'
       |       WHEN zs < -1.96 THEN 'decreasing'
       |       ELSE 'no_trend' END AS trend
       |FROM z""".stripMargin

  // ---- F13: damped-trend Holt ------------------------------------------

  /** F13 — damped-trend Holt (ETS(A,Ad,N), Gardner & McKenzie 1985) per
    * user: the conservative long-horizon default. General (α, β, φ)
    * recursion — ✖est like f9_holt; the β=0 twin below is the
    * hash-checked anchor and the spec pins φ=1 ≡ plain Holt. */
  private def f13Damped: Q = (s, d) =>
    graft.scale.PerSeriesForecast.holtForecast(
        Tables.events(s, d), "value", "ts", "user_id", 3, 0.5, 0.25,
        Some("event_id"), phi = 0.8)
      .select(col("user_id"), col("h"), Det.dround(col("yhat"), 4).as("yhat"))

  /** F13b — the β=0 damped cross-implementation twin: with the trend
    * frozen at b₁ (decayed by φ each step), the level recursion unrolls
    * to SES weights plus a φ-geometric drip,
    *   l_n = Σ_rn y·w_ses(rn) + Σ_{rn≥2} (1−α)·b₁·φ^{rn−1}·(1−α)^{n−rn},
    *   ŷ(n+h) = l_n + b₁·φ^{n−1}·Σ_{i=1..h} φ^i
    * — a DuckDB closed form vs the Scala RECURSION, checking the damped
    * fold itself (the f9_holt0 pattern extended with damping). */
  private def f13Damped0: Q = (s, d) =>
    graft.scale.PerSeriesForecast.holtForecast(
        Tables.events(s, d), "value", "ts", "user_id", 3, 0.5, 0.0,
        Some("event_id"), phi = 0.8)
      .select(col("user_id"), col("h"), Det.dround(col("yhat"), 4).as("yhat"))

  private val f13Damped0Sql =
    s"""WITH s AS (SELECT user_id,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
       |    count(*) OVER (PARTITION BY user_id) AS n,
       |    CAST(value AS DOUBLE) AS y
       |  FROM events),
       |ab AS (SELECT user_id, max(CASE WHEN rn = 1 THEN y END) AS y1,
       |         max(CASE WHEN rn = 2 THEN y END) AS y2 FROM s GROUP BY 1),
       |w AS (SELECT s.user_id, n,
       |        y * (CASE WHEN rn = 1 THEN pow(0.5, n - 1)
       |             ELSE 0.5 * pow(0.5, n - rn) END)
       |        + (CASE WHEN rn >= 2
       |           THEN 0.5 * (y2 - y1) * pow(0.8, rn - 1) * pow(0.5, n - rn)
       |           ELSE 0 END) AS term
       |      FROM s JOIN ab USING (user_id) WHERE n >= 2),
       |m AS (SELECT user_id, sum(term) AS lvl, CAST(max(n) AS BIGINT) AS n
       |      FROM w GROUP BY 1),
       |j AS (SELECT m.user_id, lvl, n, (y2 - y1) AS b1 FROM m JOIN ab USING (user_id)),
       |un AS (SELECT user_id, h,
       |         lvl + b1 * pow(0.8, n - 1) *
       |           (CASE h WHEN 1 THEN pow(0.8, 1)
       |                   WHEN 2 THEN pow(0.8, 1) + pow(0.8, 2)
       |                   ELSE pow(0.8, 1) + pow(0.8, 2) + pow(0.8, 3) END) AS yhat
       |       FROM j, generate_series(1, 3) AS g(h)
       |       UNION ALL
       |       SELECT user_id, h, y AS yhat
       |       FROM s, generate_series(1, 3) AS g(h) WHERE n = 1)
       |SELECT user_id, h, ${Det.droundSql("yhat", 4)} AS yhat FROM un""".stripMargin

  // ---- F14: TSB intermittent demand ------------------------------------

  /** F14 — TSB per user over the intermittent purchase series. α = β =
    * 0.5 in the REGISTERED query so every closed weight is a power of
    * 0.5 — exact in IEEE on both engines, the same guarantee the f8
    * Croston oracle rides (pow(0.8, k) could differ by an ulp between
    * libm implementations and flip a 1e-9 floor cell; pow(0.5, k)
    * cannot). Other smoothing rates are spec-pinned against a local
    * fold. */
  private def f14Tsb: Q = (s, d) =>
    graft.scale.PerSeriesForecast.tsbForecast(
        Tables.events(s, d).withColumn("demand",
          when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0))),
        "demand", "ts", Seq("user_id"), 2, 0.5, 0.5, Seq("event_id"))
      .select(col("user_id"), col("h"), Det.dround(col("yhat"), 6).as("yhat"),
              Det.dround(col("p_demand"), 6).as("p_demand"), col("n_demands"))

  private val f14Sql =
    s"""WITH s AS (SELECT user_id,
       |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS t,
       |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
       |    CASE WHEN event_type = 'purchase' THEN CAST(value AS DOUBLE) ELSE 0.0 END AS y
       |  FROM events),
       |nz AS (SELECT user_id, t, n, y,
       |    row_number() OVER (PARTITION BY user_id ORDER BY t) AS i,
       |    count(*) OVER (PARTITION BY user_id) AS nnz
       |  FROM s WHERE y <> 0.0),
       |w AS (SELECT user_id, nnz,
       |    CASE WHEN t = 1 THEN pow(0.5, n - 1) ELSE 0.5 * pow(0.5, n - t) END AS wp,
       |    CASE WHEN i = 1 THEN pow(0.5, nnz - 1) ELSE 0.5 * pow(0.5, nnz - i) END AS wz,
       |    y
       |  FROM nz),
       |a AS (SELECT user_id,
       |    CAST(sum(CAST(floor(wp * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS p9,
       |    CAST(sum(CAST(floor(y * wz * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS z9,
       |    CAST(max(nnz) AS BIGINT) AS n_demands
       |  FROM w GROUP BY 1)
       |SELECT user_id, h, ${Det.droundSql("(p9/1e9)*(z9/1e9)", 6)} AS yhat,
       |  ${Det.droundSql("p9/1e9", 6)} AS p_demand, n_demands
       |FROM a, generate_series(1, 2) AS g(h)""".stripMargin

  // ---- A33: Pettitt changepoint test -----------------------------------

  /** A33 — Pettitt single-changepoint locator per user: K, the split
    * location τ, and the approximate p. Spark computes U_t in
    * O(n log n) via the V_t decomposition (StatTests.pettitt); the
    * oracle replays the sign-pair DEFINITION — hash equality proves
    * the decomposition, the a32 pattern. */
  private def a33Pettitt: Q = (s, d) =>
    graft.stats.StatTests.pettittPerSeries(
        Tables.events(s, d), "value", "ts", "user_id", Some("event_id"))
      .select(col("user_id"), col("n"), col("k_stat"), col("tau"),
              Det.dround(col("p_approx"), 6).as("p_approx"), col("changepoint"))

  private val a33Sql =
    s"""WITH s AS (SELECT user_id,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
       |    CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS c
       |  FROM events),
       |nn AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY 1),
       |v AS (SELECT a.user_id, a.rn,
       |    CAST(sum(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS vt
       |  FROM s a JOIN s b ON a.user_id = b.user_id AND b.rn <> a.rn
       |  GROUP BY 1, 2),
       |u AS (SELECT v.user_id, rn, n,
       |    CAST(sum(vt) OVER (PARTITION BY v.user_id ORDER BY rn) AS BIGINT) AS ut
       |  FROM v JOIN nn USING (user_id)),
       |k AS (SELECT user_id, CAST(max(abs(ut)) AS BIGINT) AS k_stat
       |      FROM u WHERE rn < n GROUP BY 1),
       |tau AS (SELECT u.user_id, CAST(min(rn) AS BIGINT) AS tau
       |        FROM u JOIN k USING (user_id)
       |        WHERE rn < n AND abs(ut) = k_stat GROUP BY 1),
       |f AS (SELECT nn.user_id, n, k_stat, tau,
       |        least(1.0, 2.0 * exp(-6.0 * k_stat * k_stat /
       |          (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n))) AS p
       |      FROM nn JOIN k USING (user_id) JOIN tau USING (user_id))
       |SELECT user_id, n, k_stat, tau, ${Det.droundSql("p", 6)} AS p_approx,
       |  p < 0.05 AS changepoint
       |FROM f""".stripMargin

  // ---- A34: Theil–Sen slope --------------------------------------------

  /** A34 — Theil–Sen robust slope + intercept per user. Medians are
    * ORDER STATISTICS (lower median, ties broken by pair position) so
    * both engines select the identical element — never an interpolated
    * percentile. */
  private def a34TheilSen: Q = (s, d) =>
    graft.stats.StatTests.theilSenPerSeries(
        Tables.events(s, d), "value", "ts", "user_id", Some("event_id"))
      .select(col("user_id"), col("n"), col("n_pairs"),
              Det.dround(col("slope"), 6).as("slope"),
              Det.dround(col("intercept"), 6).as("intercept"))

  private val a34Sql =
    s"""WITH s AS (SELECT user_id,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
       |    CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS c
       |  FROM events),
       |nn AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY 1),
       |p AS (SELECT a.user_id, (b.c - a.c) / 100.0 / (b.rn - a.rn) AS sl,
       |        a.rn AS i, b.rn AS j
       |      FROM s a JOIN s b ON a.user_id = b.user_id AND b.rn > a.rn),
       |r AS (SELECT user_id, sl,
       |        row_number() OVER (PARTITION BY user_id ORDER BY sl, i, j) AS rk,
       |        count(*) OVER (PARTITION BY user_id) AS np
       |      FROM p),
       |med AS (SELECT user_id, sl AS slope, CAST(np AS BIGINT) AS n_pairs
       |        FROM r WHERE rk = (np + 1) // 2),
       |res AS (SELECT s.user_id, rn, slope, n_pairs,
       |          c / 100.0 - slope * rn AS resid
       |        FROM s JOIN med USING (user_id)),
       |r2 AS (SELECT user_id, resid, slope, n_pairs,
       |         row_number() OVER (PARTITION BY user_id ORDER BY resid, rn) AS rk,
       |         count(*) OVER (PARTITION BY user_id) AS nr
       |       FROM res)
       |SELECT r2.user_id, nn.n, n_pairs, ${Det.droundSql("slope", 6)} AS slope,
       |  ${Det.droundSql("resid", 6)} AS intercept
       |FROM r2 JOIN nn USING (user_id) WHERE rk = (nr + 1) // 2""".stripMargin

  // ---- A35: seasonal Mann–Kendall --------------------------------------

  /** A35 — Hirsch–Slack seasonal Mann–Kendall per user with day-of-week
    * seasons (the corpus spans one month, so the weekly cycle is the
    * operative season): S and the variance numerator sum over seasons
    * as exact integers, no cross-season pair ever compared. Season from
    * portable epoch arithmetic — Spark and DuckDB dayofweek() disagree
    * on numbering, `(epoch_days + 4) % 7` does not. */
  private def a35SeasonalMk: Q = (s, d) =>
    graft.stats.StatTests.seasonalMannKendallPerSeries(
        Tables.events(s, d).withColumn("season",
          expr("(cast(ts as long) div 86400 + 4) % 7")),
        "value", "ts", "season", "user_id", Some("event_id"))
      .select(col("user_id"), col("n"), col("n_seasons"), col("s"),
              Det.dround(col("var_s"), 6).as("var_s"),
              Det.dround(col("z"), 6).as("z"), col("trend"))

  private val a35Sql =
    s"""WITH s AS (SELECT user_id,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
       |    (CAST(floor(epoch(ts)/86400.0) AS BIGINT) + 4) % 7 AS season,
       |    CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS c
       |  FROM events),
       |p AS (SELECT a.user_id,
       |    CAST(sum(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS sg
       |  FROM s a JOIN s b ON a.user_id = b.user_id AND a.season = b.season
       |    AND b.rn > a.rn
       |  GROUP BY 1),
       |g AS (SELECT user_id, season, CAST(count(*) AS BIGINT) AS ng
       |      FROM s GROUP BY 1, 2),
       |vb AS (SELECT user_id, CAST(sum(ng*(ng-1)*(2*ng+5)) AS BIGINT) AS base
       |       FROM g GROUP BY 1),
       |tg AS (SELECT user_id, CAST(count(*) AS BIGINT) AS tc
       |       FROM s GROUP BY user_id, season, c),
       |tv AS (SELECT user_id, CAST(sum(tc*(tc-1)*(2*tc+5)) AS BIGINT) AS tvv
       |       FROM tg GROUP BY 1),
       |nn AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
       |         CAST(count(DISTINCT season) AS BIGINT) AS n_seasons
       |       FROM s GROUP BY 1),
       |v AS (SELECT nn.user_id, n, n_seasons, coalesce(p.sg, 0) AS sv,
       |        (vb.base - tv.tvv)/18.0 AS var_s
       |      FROM nn LEFT JOIN p USING (user_id) JOIN vb USING (user_id)
       |        JOIN tv USING (user_id)),
       |z AS (SELECT user_id, n, n_seasons, sv, var_s,
       |        CASE WHEN var_s > 0 THEN
       |          CASE WHEN sv > 0 THEN (sv - 1)/sqrt(var_s)
       |               WHEN sv < 0 THEN (sv + 1)/sqrt(var_s)
       |               ELSE 0.0 END END AS zs
       |      FROM v)
       |SELECT user_id, n, n_seasons, sv AS s, ${Det.droundSql("var_s", 6)} AS var_s,
       |  ${Det.droundSql("zs", 6)} AS z,
       |  CASE WHEN zs IS NULL THEN NULL
       |       WHEN zs > 1.96 THEN 'increasing'
       |       WHEN zs < -1.96 THEN 'decreasing'
       |       ELSE 'no_trend' END AS trend
       |FROM z""".stripMargin

  // ---- F15: Holt–Winters multiplicative seasonal -----------------------

  /** F15 — Holt–Winters MULTIPLICATIVE (ETS(A,A,M)) per user at period
    * 7: the seasonal effect scales with the level. ✖est like f11_hw
    * (coupled 3-state recursion); the β=γ=0 twin below is the
    * hash-checked anchor, and the spec pins the general path against an
    * independent fold + exact reconstruction of a pure multiplicative
    * cycle. */
  private def f15HwMult: Q = (s, d) =>
    graft.scale.PerSeriesForecast.holtWintersMultForecast(
        Tables.events(s, d), "value", "ts", "user_id", 3, 7,
        0.5, 0.25, 0.25, Some("event_id"))
      .select(col("user_id"), col("h"), Det.dround(col("yhat"), 4).as("yhat"))

  /** F15b — the β=γ=0 reduction: trend frozen at b₀, seasonal RATIOS
    * frozen at the first-cycle profile, so the level recursion is the
    * SAME linear form as the additive f11_hw0 twin with x_t = y_t /
    * s_phase — the closed form transfers verbatim with division for
    * subtraction and the forecast multiplied by the frozen ratio. */
  private def f15Hwm0: Q = (s, d) =>
    graft.scale.PerSeriesForecast.holtWintersMultForecast(
        Tables.events(s, d), "value", "ts", "user_id", 3, 7,
        0.5, 0.0, 0.0, Some("event_id"))
      .select(col("user_id"), col("h"), Det.dround(col("yhat"), 4).as("yhat"))

  private val f15Hwm0Sql =
    s"""WITH s AS (SELECT user_id,
       |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS BIGINT) AS t,
       |    count(*) OVER (PARTITION BY user_id) AS n,
       |    CAST(floor(CAST(value AS DOUBLE)*1e9 + 0.5) AS BIGINT) AS y9
       |  FROM events),
       |pos AS (SELECT user_id FROM s GROUP BY 1
       |        HAVING min(y9) > 0 AND max(n) >= 14),
       |g AS (SELECT s.* FROM s JOIN pos USING (user_id)),
       |lm AS (SELECT user_id, CAST(sum(y9) AS DOUBLE)/7/1e9 AS lmv
       |       FROM g WHERE t < 7 GROUP BY 1),
       |bb AS (SELECT a.user_id, CAST(sum(b.y9 - a.y9) AS DOUBLE)/49/1e9 AS b0v
       |       FROM g a JOIN g b ON b.user_id = a.user_id AND b.t = a.t + 7
       |       WHERE a.t < 7 GROUP BY 1),
       |sea AS (SELECT g.user_id, t AS phase, (y9/1e9)/lmv AS sv
       |        FROM g JOIN lm USING (user_id) WHERE t < 7),
       |z AS (SELECT g.user_id, g.t, g.n,
       |        (g.y9/1e9)/sea.sv - bb.b0v*(g.t - 6) AS zeta
       |      FROM g
       |      JOIN sea ON sea.user_id = g.user_id AND sea.phase = g.t % 7
       |      JOIN bb ON bb.user_id = g.user_id
       |      WHERE g.t >= 7),
       |w AS (SELECT user_id, CAST(max(n) AS BIGINT) AS n,
       |        sum(zeta * 0.5 * pow(0.5, n - 1 - t)) AS acc
       |      FROM z GROUP BY user_id),
       |lvl AS (SELECT w.user_id, w.n,
       |          pow(0.5, w.n - 7)*lm.lmv + w.acc + bb.b0v*(w.n - 7) AS ln,
       |          bb.b0v AS b0v
       |        FROM w JOIN lm USING (user_id) JOIN bb USING (user_id))
       |SELECT lvl.user_id, h,
       |  ${Det.droundSql("(ln + h*b0v)*sea.sv", 4)} AS yhat
       |FROM lvl CROSS JOIN generate_series(1, 3) AS g2(h)
       |JOIN sea ON sea.user_id = lvl.user_id AND sea.phase = (lvl.n - 1 + h) % 7""".stripMargin

  // ---- PK5: first-fit-decreasing packing -------------------------------

  /** PK5 — FFD sequence packing per (source, shard) at the pk1 budget:
    * the bin-packing quality upgrade (11/9·OPT vs next-fit's ~2·OPT).
    * The oracle replays the EXACT placement in a recursive CTE whose
    * state is the open-bin fill/count lists — hash equality proves the
    * first-fit index scan, not just the totals. */
  private def pk5FfdPack: Q = (s, d) =>
    graft.scale.Packing.packFfd(
      Tables.documents(s, d), "text", "doc_id", "source",
      budget = 512L, shards = 8)

  private val pk5Sql =
    s"""WITH RECURSIVE docs AS (
       |  SELECT source, shard, doc_id, toks,
       |         row_number() OVER (PARTITION BY source, shard
       |                            ORDER BY toks DESC, doc_id) AS rn
       |  FROM (SELECT source, doc_id % 8 AS shard, doc_id,
       |          CAST(len(regexp_extract_all(text, '${graft.scale.Packing.tokPattern}')) AS BIGINT) AS toks
       |        FROM documents)),
       |nsh AS (SELECT source, shard, CAST(max(rn) AS BIGINT) AS nd
       |        FROM docs GROUP BY 1, 2),
       |pack AS (
       |  SELECT source, shard, nd, CAST(0 AS BIGINT) AS rn,
       |         CAST([] AS BIGINT[]) AS fills, CAST([] AS BIGINT[]) AS cnts
       |  FROM nsh
       |  UNION ALL
       |  SELECT source, shard, nd, rn,
       |    CASE WHEN coalesce(idx, 0) < 1 THEN list_append(fills, toks)
       |         ELSE list_concat(list_concat(
       |                fills[1:CAST(idx AS INT) - 1],
       |                [fills[CAST(idx AS INT)] + toks]),
       |              fills[CAST(idx AS INT) + 1:]) END,
       |    CASE WHEN coalesce(idx, 0) < 1 THEN list_append(cnts, CAST(1 AS BIGINT))
       |         ELSE list_concat(list_concat(
       |                cnts[1:CAST(idx AS INT) - 1],
       |                [cnts[CAST(idx AS INT)] + 1]),
       |              cnts[CAST(idx AS INT) + 1:]) END
       |  FROM (
       |    SELECT p.source, p.shard, p.nd, p.rn + 1 AS rn, d.toks,
       |           p.fills, p.cnts,
       |           list_position(list_transform(p.fills, f -> f + d.toks <= 512), true) AS idx
       |    FROM pack p JOIN docs d ON d.source = p.source AND d.shard = p.shard
       |                           AND d.rn = p.rn + 1
       |    WHERE p.rn < p.nd)),
       |fin AS (SELECT source, shard, fills, cnts FROM pack WHERE rn = nd)
       |SELECT source, shard,
       |  unnest(generate_series(1, CAST(len(fills) AS BIGINT))) AS seq_id,
       |  unnest(cnts) AS n_docs,
       |  unnest(fills) AS n_tokens
       |FROM fin""".stripMargin

  // ---- PIPE10: quality gate → FFD packing -------------------------------

  /** PIPE10 — the rule-gated batch-construction pipeline: Gopher rules
    * (x26) gate the corpus, survivors tokenize ONCE and pack FFD (pk5)
    * at the pk1 budget, with pk4-style per-source padding accounting.
    * One plan: the filter is a map-side scan predicate fused under the
    * token count, so rejected docs never tokenize and text never
    * shuffles — the shape a pre-training data engine actually runs. */
  private def pipe10GopherPack: Q = (s, d) => {
    val kept = graft.scale.QualityFilters.gopherRules(
        Tables.documents(s, d), "text", minStopwords = 1L)
      .filter(col("keep"))
      .withColumn("toks", graft.scale.Packing.tokenCount(col("text")))
    graft.scale.Packing.packFfdCounts(kept, "toks", "doc_id", "source",
        budget = 512L, shards = 8)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_seqs"),
           sum(col("n_docs")).as("n_docs"),
           sum(col("n_tokens")).as("n_tokens"),
           sum(when(col("n_tokens") <= 512L, lit(512L) - col("n_tokens"))
             .otherwise(0L)).as("pad_tokens"))
  }

  private val pipe10Sql = {
    val stops = graft.scale.QualityFilters.gopherStopwordsSql
    s"""WITH RECURSIVE d0 AS (SELECT doc_id, source, text,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS w,
       |    string_split(text, chr(10)) AS lines
       |  FROM documents),
       |s0 AS (SELECT doc_id, source, text,
       |    CAST(len(w) AS BIGINT) AS n_words,
       |    CAST(len(lines) AS BIGINT) AS n_lines,
       |    CAST(coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS BIGINT) AS chars_sum,
       |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
       |      + CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT)
       |      + CAST(length(text) - length(replace(text, '…', '')) AS BIGINT) AS n_symbols,
       |    CAST(len(list_filter(lines, x -> x LIKE '- %' OR x LIKE '* %' OR x LIKE '• %')) AS BIGINT) AS n_bullet,
       |    CAST(len(list_filter(lines, x -> x LIKE '%...' OR x LIKE '%…')) AS BIGINT) AS n_ell,
       |    CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS n_alpha,
       |    CAST(len(list_filter([$stops], t -> list_contains(w, t))) AS BIGINT) AS n_stopwords
       |  FROM d0),
       |kept AS (SELECT doc_id, source, text FROM s0
       |  WHERE coalesce(n_words BETWEEN 50 AND 100000
       |    AND (CASE WHEN n_words > 0 THEN ${Det.droundSql("CAST(chars_sum AS DOUBLE) / n_words", 6)} END) BETWEEN 3.0 AND 10.0
       |    AND (CASE WHEN n_words > 0 THEN ${Det.droundSql("CAST(n_symbols AS DOUBLE) / n_words", 6)} END) < 0.1
       |    AND (CASE WHEN n_lines > 0 THEN ${Det.droundSql("CAST(n_bullet AS DOUBLE) / n_lines", 6)} END) < 0.9
       |    AND (CASE WHEN n_lines > 0 THEN ${Det.droundSql("CAST(n_ell AS DOUBLE) / n_lines", 6)} END) < 0.3
       |    AND (CASE WHEN n_words > 0 THEN ${Det.droundSql("CAST(n_alpha AS DOUBLE) / n_words", 6)} END) > 0.8
       |    AND n_stopwords >= 1, false)),
       |docs AS (
       |  SELECT source, shard, doc_id, toks,
       |         row_number() OVER (PARTITION BY source, shard
       |                            ORDER BY toks DESC, doc_id) AS rn
       |  FROM (SELECT source, doc_id % 8 AS shard, doc_id,
       |          CAST(len(regexp_extract_all(text, '${graft.scale.Packing.tokPattern}')) AS BIGINT) AS toks
       |        FROM kept)),
       |nsh AS (SELECT source, shard, CAST(max(rn) AS BIGINT) AS nd
       |        FROM docs GROUP BY 1, 2),
       |pack AS (
       |  SELECT source, shard, nd, CAST(0 AS BIGINT) AS rn,
       |         CAST([] AS BIGINT[]) AS fills, CAST([] AS BIGINT[]) AS cnts
       |  FROM nsh
       |  UNION ALL
       |  SELECT source, shard, nd, rn,
       |    CASE WHEN coalesce(idx, 0) < 1 THEN list_append(fills, toks)
       |         ELSE list_concat(list_concat(
       |                fills[1:CAST(idx AS INT) - 1],
       |                [fills[CAST(idx AS INT)] + toks]),
       |              fills[CAST(idx AS INT) + 1:]) END,
       |    CASE WHEN coalesce(idx, 0) < 1 THEN list_append(cnts, CAST(1 AS BIGINT))
       |         ELSE list_concat(list_concat(
       |                cnts[1:CAST(idx AS INT) - 1],
       |                [cnts[CAST(idx AS INT)] + 1]),
       |              cnts[CAST(idx AS INT) + 1:]) END
       |  FROM (
       |    SELECT p.source, p.shard, p.nd, p.rn + 1 AS rn, d.toks,
       |           p.fills, p.cnts,
       |           list_position(list_transform(p.fills, f -> f + d.toks <= 512), true) AS idx
       |    FROM pack p JOIN docs d ON d.source = p.source AND d.shard = p.shard
       |                           AND d.rn = p.rn + 1
       |    WHERE p.rn < p.nd)),
       |bins AS (SELECT source, shard,
       |    unnest(cnts) AS n_docs, unnest(fills) AS n_tokens
       |  FROM pack WHERE rn = nd)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_seqs,
       |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN n_tokens <= 512 THEN 512 - n_tokens ELSE 0 END) AS BIGINT) AS pad_tokens
       |FROM bins GROUP BY source""".stripMargin
  }

  // ---- E10: frequency encoding -----------------------------------------

  /** E10 — frequency (count) encoding of a categorical column: exact
    * corpus counts + frequency share per category, the zero-leakage
    * member of the encoder family (e1 label / e7 target / e9 hash).
    * One groupBy on the reduced category table, broadcast back — the
    * corpus never moves. */
  private def e10FreqEncode: Q = (s, d) =>
    graft.core.Encoders.frequencyEncode(
        Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment")),
        "c_mktsegment")
      .select(col("c_custkey"), col("c_mktsegment"),
              col("c_mktsegment_count"),
              Det.dround(col("c_mktsegment_freq"), 6).as("c_mktsegment_freq"))

  private val e10Sql =
    s"""WITH c AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS cnt
       |           FROM customer GROUP BY 1),
       |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c)
       |SELECT c_custkey, customer.c_mktsegment,
       |  cnt AS c_mktsegment_count,
       |  ${Det.droundSql("CAST(cnt AS DOUBLE)/total", 6)} AS c_mktsegment_freq
       |FROM customer JOIN c USING (c_mktsegment) CROSS JOIN t""".stripMargin

  // ---- ST_TSB: streaming intermittent-demand forecast ------------------

  /** ST — online TSB per user: each event emitted with the one-step
    * forecast made before it was absorbed (probability decays through
    * demand-free stretches — the obsolescence signal). Batch twin of
    * `streaming/StreamTsb.forecast`; the oracle replays the SAME
    * recursion as a recursive CTE (cents inputs + α=β=0.5 halves make
    * both engines' op chains bit-identical); streaming == batch parity
    * is spec-pinned under random micro-batch splits. */
  private def stTsb: Q = (s, d) =>
    graft.streaming.StreamTsb.tsbExpandingBatch(
        Tables.events(s, d).withColumn("demand",
          when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0))),
        "demand", "ts", "user_id", "event_id")
      .select(col("user_id"), col("event_id"),
              Det.dround(col("yhat"), 6).as("yhat"),
              Det.dround(col("p_demand"), 6).as("p_demand"))

  private val stTsbSql =
    s"""WITH RECURSIVE s AS (SELECT user_id, event_id,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
       |    CASE WHEN event_type = 'purchase'
       |         THEN floor(CAST(value AS DOUBLE)*100 + 0.5)/100 ELSE 0.0 END AS y2
       |  FROM events),
       |st(user_id, rn, p, z, seen) AS (
       |  SELECT user_id, rn,
       |    CAST(CASE WHEN y2 <> 0 THEN 1.0 ELSE 0.0 END AS DOUBLE),
       |    CAST(CASE WHEN y2 <> 0 THEN y2 ELSE 0.0 END AS DOUBLE),
       |    y2 <> 0
       |  FROM s WHERE rn = 1
       |  UNION ALL
       |  SELECT st.user_id, s.rn,
       |    st.p + 0.5*((CASE WHEN s.y2 <> 0 THEN 1.0 ELSE 0.0 END) - st.p),
       |    CASE WHEN s.y2 <> 0 THEN
       |      CASE WHEN st.seen THEN st.z + 0.5*(s.y2 - st.z) ELSE s.y2 END
       |    ELSE st.z END,
       |    st.seen OR s.y2 <> 0
       |  FROM st JOIN s ON s.user_id = st.user_id AND s.rn = st.rn + 1)
       |SELECT s.user_id, s.event_id,
       |  ${Det.droundSql("CASE WHEN prior.seen THEN prior.p * prior.z END", 6)} AS yhat,
       |  ${Det.droundSql("prior.p", 6)} AS p_demand
       |FROM s LEFT JOIN st prior
       |  ON prior.user_id = s.user_id AND prior.rn = s.rn - 1""".stripMargin

  // ---- registry --------------------------------------------------------

  def queries: Map[String, Q] = Map(
    "x26_gopher_rules" -> x26Gopher,
    "m13_kpss"         -> m13Kpss,
    "a32_mann_kendall" -> a32MannKendall,
    "f13_damped"       -> f13Damped,
    "f13_damped0"      -> f13Damped0,
    "f14_tsb"          -> f14Tsb,
    "a33_pettitt"      -> a33Pettitt,
    "a34_theil_sen"    -> a34TheilSen,
    "a35_seasonal_mk"  -> a35SeasonalMk,
    "f15_hw_mult"      -> f15HwMult,
    "f15_hwm0"         -> f15Hwm0,
    "pk5_ffd_pack"     -> pk5FfdPack,
    "pipe10_gopher_pack" -> pipe10GopherPack,
    "e10_freq_encode"  -> e10FreqEncode,
    "st_tsb"           -> stTsb)

  def oracle: Map[String, String] = Map(
    "x26_gopher_rules" -> x26Sql,
    "m13_kpss"         -> m13Sql,
    "a32_mann_kendall" -> a32Sql,
    "f13_damped0"      -> f13Damped0Sql,
    "f14_tsb"          -> f14Sql,
    "a33_pettitt"      -> a33Sql,
    "a34_theil_sen"    -> a34Sql,
    "a35_seasonal_mk"  -> a35Sql,
    "f15_hwm0"         -> f15Hwm0Sql,
    "pk5_ffd_pack"     -> pk5Sql,
    "pipe10_gopher_pack" -> pipe10Sql,
    "e10_freq_encode"  -> e10Sql,
    "st_tsb"           -> stTsbSql)
}
