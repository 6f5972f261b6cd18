package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Det._

/** Round-14 additions: tail-weighted two-sample testing (Anderson–
  * Darling), Kendall's tau-b over bounded joint grids, and a triangle
  * census / transitivity readout over the near-dup pair graph. All
  * oracle-checked. */
object ScaleQueries9 {

  type Q = (SparkSession, String) => DataFrame

  // ---- A54: two-sample Anderson–Darling -----------------------------------

  /** A54 — Anderson–Darling distance between purchase and view value
    * distributions: completes the two-sample trio (a16 KS supremum,
    * a51 CvM whole-CDF, this one tail-weighted) on the same split. */
  private def a54Ad: Q = (s, d) =>
    graft.stats.DriftAudit.adStatistic(
        Tables.events(s, d).filter(col("event_type").isin("purchase", "view")),
        "value", "event_type")
      .select(col("n_a"), col("n_b"), dround(col("a2"), 6).as("a2"))

  private val a54Sql =
    s"""WITH e AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS x
       |  FROM events WHERE event_type IN ('purchase', 'view')),
       |t AS (SELECT
       |    CAST(sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS na,
       |    CAST(sum(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS nb
       |  FROM e),
       |bv AS (SELECT x,
       |    CAST(sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS ca,
       |    CAST(sum(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS cb
       |  FROM e GROUP BY 1),
       |cum AS (SELECT x, ca, cb,
       |    CAST(sum(ca) OVER (ORDER BY x) AS BIGINT) AS ra,
       |    CAST(sum(cb) OVER (ORDER BY x) AS BIGINT) AS rb
       |  FROM bv),
       |tm AS (SELECT ca, cb, ra + rb AS bj, na + nb AS nn,
       |    CAST((na + nb)*ra - na*(ra + rb) AS DOUBLE) AS d9, na, nb
       |  FROM cum CROSS JOIN t
       |  WHERE ra + rb < na + nb),
       |agg AS (SELECT max(na) AS n_a, max(nb) AS n_b,
       |    CAST(sum(CAST(floor(CAST(ca + cb AS DOUBLE)*d9*d9
       |      /(CAST(bj AS DOUBLE)*CAST(nn - bj AS DOUBLE))*1.0E9 + 0.5)
       |      AS BIGINT)) AS BIGINT) AS s9
       |  FROM tm)
       |SELECT n_a, n_b,
       |  ${droundSql("(1.0/n_a + 1.0/n_b)*(s9/1.0E9)" +
         "/CAST(n_a + n_b AS DOUBLE)", 6)} AS a2
       |FROM agg""".stripMargin

  // ---- A55: Kendall tau-b --------------------------------------------------

  /** A55 — Kendall's tau-b between per-user view activity and spend
    * MAGNITUDE (floor(log2(cents+1)) — the binning that bounds the
    * joint grid at any corpus size, per kendallTau's contract): the
    * probability-scaled monotone-association twin of a53's Spearman.
    * The bin is computed FP-FREE as the bit length `length(bin(v))-1`
    * (both engines print exact binary strings): Spark's log2 is
    * log(x)/log(2), so on exact powers of two floor(log2(v)) can land
    * one bucket below DuckDB's correctly-rounded log2 (ADVICE r14). */
  private def a55Kendall: Q = (s, d) =>
    graft.stats.RankTests.kendallTau(
        Tables.events(s, d).groupBy(col("user_id"))
          .agg(count(when(col("event_type") === "view", 1)).cast("long")
                 .as("x"),
               coalesce(sum(when(col("event_type") === "purchase",
                 floor(col("value") * 100 + 0.5).cast("long"))), lit(0L))
                 .as("yc"))
          .withColumn("y", (length(bin(col("yc") + 1L)) - 1).cast("long")),
        "x", "y")
      .select(col("n"), col("n_combos"), col("concordant"),
        col("discordant"), dround(col("tau_b"), 6).as("tau_b"))

  private val a55Sql =
    s"""WITH u AS (SELECT user_id,
       |    CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT)
       |      AS x,
       |    CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
       |      THEN CAST(floor(value*100 + 0.5) AS BIGINT) END), 0) AS BIGINT)
       |      AS yc
       |  FROM events GROUP BY 1),
       |g AS (SELECT x, CAST(length(bin(yc + 1)) - 1 AS BIGINT)
       |        AS y FROM u),
       |jd AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c FROM g GROUP BY 1, 2),
       |cd AS (SELECT
       |    CAST(coalesce(sum(CASE WHEN q.y > p.y THEN p.c*q.c END), 0)
       |      AS BIGINT) AS concordant,
       |    CAST(coalesce(sum(CASE WHEN q.y < p.y THEN p.c*q.c END), 0)
       |      AS BIGINT) AS discordant
       |  FROM jd p JOIN jd q ON q.x > p.x),
       |nx AS (SELECT CAST(coalesce(sum(t*(t-1)//2), 0) AS BIGINT) AS n1
       |  FROM (SELECT CAST(sum(c) AS BIGINT) AS t FROM jd GROUP BY x)),
       |ny AS (SELECT CAST(coalesce(sum(t*(t-1)//2), 0) AS BIGINT) AS n2
       |  FROM (SELECT CAST(sum(c) AS BIGINT) AS t FROM jd GROUP BY y)),
       |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n,
       |    CAST(count(*) AS BIGINT) AS n_combos,
       |    CAST(CAST(sum(c) AS BIGINT)*(CAST(sum(c) AS BIGINT) - 1)//2
       |      AS BIGINT) AS n0 FROM jd)
       |SELECT n, n_combos, concordant, discordant,
       |  CASE WHEN n0 > n1 AND n0 > n2 THEN
       |    ${droundSql("CAST(concordant - discordant AS DOUBLE)" +
         "/sqrt(CAST(n0 - n1 AS DOUBLE)*CAST(n0 - n2 AS DOUBLE))", 6)}
       |  END AS tau_b
       |FROM cd, nx, ny, nn""".stripMargin

  // ---- G5: triangle census over the near-dup graph -------------------------

  /** G5 — transitivity of near-duplication: triangle census + global
    * clustering coefficient over the d2 3-gram-Jaccard ≥ 0.5 pair graph.
    * High gcc = near-dup clusters are cliques (one representative is
    * safe); low gcc = chains (greedy dedup may split real clusters) —
    * the structural audit beside d8's component count. */
  private def g5Triangles: Q = (s, d) => {
    val pairs = graft.scale.Dedup.ngramJaccard(Tables.documents(s, d),
        "text", "doc_id", 3, 0.5)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    graft.scale.Graph.triangleStats(pairs, "a", "b", maxDeg = 30)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"), dround(col("gcc"), 6).as("gcc"))
  }

  private val g5Sql =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(w) - 2),
       |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
       |       FROM toks WHERE len(w) >= 3),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
       |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |e0 AS (SELECT id_a AS a, id_b AS b
       |      FROM inter JOIN sz sa ON id_a = sa.doc_id
       |                 JOIN sz sb ON id_b = sb.doc_id
       |      WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
       |dg0 AS (SELECT id, count(*) AS dd
       |  FROM (SELECT a AS id FROM e0 UNION ALL SELECT b FROM e0) GROUP BY 1),
       |kp AS (SELECT id FROM dg0 WHERE dd <= 30),
       |e AS (SELECT a, b FROM e0
       |      WHERE a IN (SELECT id FROM kp) AND b IN (SELECT id FROM kp)),
       |dc AS (SELECT id, CAST(count(*) AS BIGINT) AS dd
       |  FROM (SELECT a AS id FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
       |sz2 AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       |    CAST(coalesce(sum(dd*(dd-1)//2), 0) AS BIGINT) AS n_wedges FROM dc),
       |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
       |tr AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
       |  FROM e p JOIN e q ON p.b = q.a
       |    JOIN e r ON r.a = p.a AND r.b = q.b)
       |SELECT n_nodes, n_edges, n_wedges, n_triangles,
       |  CASE WHEN n_wedges > 0 THEN
       |    ${droundSql("3.0*n_triangles/CAST(n_wedges AS DOUBLE)", 6)}
       |  END AS gcc
       |FROM sz2, ne, tr""".stripMargin

  // ---- J10: interval-overlap join ------------------------------------------

  /** J10 — co-activity pairs: 30-min user sessions (a 1-in-5 user
    * subset) overlap-joined against themselves — which users were
    * active simultaneously, how often, and for how long. The
    * interval×interval join the as-of (j5) / point-in-range (j7)
    * family lacked; Spark side runs the duplicate-free bucket
    * decomposition ([[graft.core.JoinOps.overlapJoin]], 1-hour
    * buckets), the oracle the direct non-equi join. Overlap seconds
    * fold on the 1e-6 grid. */
  private def j10Overlap: Q = (s, d) => {
    val sess = graft.streaming.EventWindows.sessionize(
        Tables.events(s, d).filter(col("user_id") % 5 === 0))
      .select(col("user_id"),
        col("session_start").cast("double").as("lo"),
        col("session_end").cast("double").as("hi"))
    val l = sess.select(col("user_id").as("user_a"),
      col("lo").as("lo_a"), col("hi").as("hi_a"))
    val r = sess.select(col("user_id").as("user_b"),
      col("lo").as("lo_b"), col("hi").as("hi_b"))
    graft.core.JoinOps.overlapJoin(l, "lo_a", "hi_a", r, "lo_b", "hi_b",
        bucketWidth = 3600.0)
      .filter(col("user_a") < col("user_b"))
      .groupBy(col("user_a"), col("user_b"))
      .agg(count(lit(1)).cast("long").as("n_overlaps"),
           sum(floor((least(col("hi_a"), col("hi_b"))
             - greatest(col("lo_a"), col("lo_b"))) * 1e6 + 0.5).cast("long"))
             .as("ov6"))
      .select(col("user_a"), col("user_b"), col("n_overlaps"),
        dround(col("ov6") / 1e6, 6).as("overlap_s"))
  }

  private val j10Sql =
    s"""WITH g AS (
       |  SELECT user_id, ts, event_id,
       |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1)
       |           OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
       |         OR lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events WHERE user_id % 5 = 0),
       |t AS (SELECT user_id, ts,
       |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |  FROM g),
       |sess AS (SELECT user_id, epoch(min(ts)) AS lo, epoch(max(ts)) AS hi
       |  FROM t GROUP BY user_id, session_id),
       |pr AS (SELECT a.user_id AS user_a, b.user_id AS user_b,
       |    least(a.hi, b.hi) - greatest(a.lo, b.lo) AS ov
       |  FROM sess a JOIN sess b
       |    ON a.user_id < b.user_id AND a.lo <= b.hi AND b.lo <= a.hi)
       |SELECT user_a, user_b, CAST(count(*) AS BIGINT) AS n_overlaps,
       |  ${droundSql("CAST(sum(CAST(floor(ov*1e6 + 0.5) AS BIGINT)) AS BIGINT)/1e6", 6)}
       |    AS overlap_s
       |FROM pr GROUP BY 1, 2""".stripMargin

  // ---- registry -----------------------------------------------------------

  def queries: Map[String, Q] = Map(
    "a54_ad"       -> a54Ad,
    "a55_kendall"  -> a55Kendall,
    "g5_triangles" -> g5Triangles,
    "j10_overlap"  -> j10Overlap)

  def oracle: Map[String, String] = Map(
    "a54_ad"       -> a54Sql,
    "a55_kendall"  -> a55Sql,
    "g5_triangles" -> g5Sql,
    "j10_overlap"  -> j10Sql)
}
