package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Det._

/** Round-15 additions: the PII / safety curation stages the public
  * training-data pipelines run that the engine lacked — per-doc PII
  * match counts, whole-text redaction, and the C4-style blocklist gate.
  * All map-side scan-rate operators ([[graft.scale.Curation]]), all
  * oracle-checked.
  *
  * The synthetic corpus contains no PII, so x40/x41 INJECT deterministic
  * PII spans (id-derived emails / IPs / phone numbers / SSN-shaped ids
  * appended to a doc_id-keyed subset) identically in both engines — the
  * match counts and redacted text are then non-trivial at every SF, and
  * any cross-engine drift in regex semantics fails the hash loudly. */
object ScaleQueries10 {

  type Q = (SparkSession, String) => DataFrame

  // ---- x40 / x41: PII scan + redaction ------------------------------------

  /** Deterministic PII injection: doc_id % 3 → an email, % 5 → an IPv4 +
    * an international phone number, % 7 → an SSN-shaped id. Overlapping
    * moduli give multi-category docs; ~54% of docs stay clean. */
  private def withPii(df: DataFrame): DataFrame = {
    val id = col("doc_id")
    val email = when(id % 3 === 0,
      concat(lit(" contact user"), id.cast("string"), lit("@mail"),
        (id % 7).cast("string"), lit(".example.com"))).otherwise(lit(""))
    val ipPhone = when(id % 5 === 0,
      concat(lit(" ip "), (id % 90 + 10).cast("string"), lit("."),
        (id % 256).cast("string"), lit(".0."), (id % 100).cast("string"),
        lit(" call +1415555"),
        lpad((id % 10000).cast("string"), 4, "0"))).otherwise(lit(""))
    val ssn = when(id % 7 === 0,
      concat(lit(" ref 123-45-"),
        lpad((id % 10000).cast("string"), 4, "0"))).otherwise(lit(""))
    df.withColumn("ptext", concat(col("text"), email, ipPhone, ssn))
  }

  private val piiInjectSql =
    """p AS (SELECT doc_id, text ||
      |  CASE WHEN doc_id % 3 = 0 THEN ' contact user' ||
      |    CAST(doc_id AS VARCHAR) || '@mail' ||
      |    CAST(doc_id % 7 AS VARCHAR) || '.example.com' ELSE '' END ||
      |  CASE WHEN doc_id % 5 = 0 THEN ' ip ' ||
      |    CAST(doc_id % 90 + 10 AS VARCHAR) || '.' ||
      |    CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
      |    CAST(doc_id % 100 AS VARCHAR) || ' call +1415555' ||
      |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
      |  CASE WHEN doc_id % 7 = 0 THEN ' ref 123-45-' ||
      |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS ptext
      |FROM documents)""".stripMargin

  /** X40 — per-doc PII audit ([[graft.scale.Curation.piiScan]]): match
    * counts per category + total over the injected corpus. The oracle
    * rebuilds the injection and counts with RE2's regexp_extract_all —
    * the same pattern strings, so the hash pins Java-regex ≡ RE2
    * semantics on every doc. */
  private def x40PiiScan: Q = (s, d) =>
    graft.scale.Curation.piiScan(withPii(Tables.documents(s, d)), "ptext")
      .select(col("doc_id"), col("n_email"), col("n_ipv4"),
        col("n_phone"), col("n_ssn"), col("pii_total"))

  private val x40Sql =
    s"""WITH $piiInjectSql
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(ptext,
       |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
       |    AS n_email,
       |  CAST(len(regexp_extract_all(ptext,
       |    '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b'))
       |    AS BIGINT) AS n_ipv4,
       |  CAST(len(regexp_extract_all(ptext, '\\+[0-9]{7,15}\\b')) AS BIGINT)
       |    AS n_phone,
       |  CAST(len(regexp_extract_all(ptext,
       |    '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b')) AS BIGINT) AS n_ssn,
       |  CAST(len(regexp_extract_all(ptext,
       |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
       |    + len(regexp_extract_all(ptext,
       |      '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b'))
       |    + len(regexp_extract_all(ptext, '\\+[0-9]{7,15}\\b'))
       |    + len(regexp_extract_all(ptext,
       |      '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b')) AS BIGINT) AS pii_total
       |FROM p""".stripMargin

  /** X41 — whole-text redaction ([[graft.scale.Curation.piiRedact]]):
    * md5 of the redacted text on the injected subset — any divergence
    * anywhere in the rewritten string (match extents, sentinel order,
    * untouched spans) flips the hash. The oracle replays the same
    * four regexp_replace passes with RE2's 'g' flag. */
  private def x41PiiRedact: Q = (s, d) =>
    graft.scale.Curation.piiRedact(
        withPii(Tables.documents(s, d)), "ptext")
      .filter(col("doc_id") % 3 === 0 || col("doc_id") % 5 === 0 ||
        col("doc_id") % 7 === 0)
      .select(col("doc_id"), md5(col("redacted")).as("red_md5"))

  private val x41Sql =
    s"""WITH $piiInjectSql
       |SELECT doc_id,
       |  md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |    ptext,
       |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
       |    '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b',
       |    '<IPV4>', 'g'),
       |    '\\+[0-9]{7,15}\\b', '<PHONE>', 'g'),
       |    '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b', '<SSN>', 'g')) AS red_md5
       |FROM p
       |WHERE doc_id % 3 = 0 OR doc_id % 5 = 0 OR doc_id % 7 = 0""".stripMargin

  // ---- x42: blocklist gate -------------------------------------------------

  /** X42 — the C4 "bad words" gate shape
    * ([[graft.scale.Curation.blocklistStats]]) with a placeholder
    * blocklist drawn from the synthetic vocabulary (the machinery under
    * test is the token matcher + ratio, not the list): per doc, token
    * count, blocked hits, hit ratio. */
  private def x42Blocklist: Q = (s, d) =>
    graft.scale.Curation.blocklistStats(
        Tables.documents(s, d), "text", Seq("slow", "merge", "batch"))
      .select(col("doc_id"), col("n_tokens"), col("n_blocked"),
        dround(col("blocked_ratio"), 6).as("blocked_ratio"))

  private val x42Sql =
    s"""WITH t AS (SELECT doc_id,
       |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
       |    CAST(len(list_filter(string_split(lower(text), ' '),
       |      w -> list_contains(['slow', 'merge', 'batch'], w))) AS BIGINT)
       |      AS n_blocked
       |  FROM documents)
       |SELECT doc_id, n_tokens, n_blocked,
       |  CASE WHEN n_tokens > 0 THEN
       |    ${droundSql("CAST(n_blocked AS DOUBLE)/n_tokens", 6)}
       |  ELSE 0.0 END AS blocked_ratio
       |FROM t""".stripMargin

  // ---- a56: join-key skew pre-flight --------------------------------------

  /** A56 — join-key skew audit ([[graft.scale.SkewAudit.keySkewProfile]])
    * of `events.user_id`: the one-row "do I need saltedJoin / AQE skew
    * handling here" report — hottest-key share, top-10 concentration,
    * and the exact count Gini, whose Σ r·c rank fold rides on
    * [[graft.scale.Ranks.globalRank]] (no single-partition window). The
    * oracle computes the same exact-integer algebra with a plain rank
    * window — toy-scale DuckDB replays what the bucket decomposition
    * computes at warehouse scale. */
  private def a56KeySkew: Q = (s, d) =>
    graft.scale.SkewAudit.keySkewProfile(
        Tables.events(s, d), col("user_id"), topK = 10)
      .select(col("n_keys"), col("n_rows"), col("max_count"),
        dround(col("max_share"), 6).as("max_share"),
        dround(col("topk_share"), 6).as("topk_share"),
        dround(col("gini"), 6).as("gini"))

  private val a56Sql =
    s"""WITH c AS (SELECT user_id AS k, CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1),
       |r AS (SELECT k, c,
       |    CAST(row_number() OVER (ORDER BY c, k) AS BIGINT) AS r FROM c),
       |a AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
       |    CAST(sum(c) AS BIGINT) AS n_rows,
       |    CAST(max(c) AS BIGINT) AS max_count,
       |    sum(r*c) AS src FROM r),
       |t AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS topk_rows
       |  FROM (SELECT c FROM c ORDER BY c DESC, k LIMIT 10))
       |SELECT n_keys, n_rows, max_count,
       |  ${droundSql("CAST(max_count AS DOUBLE)/n_rows", 6)} AS max_share,
       |  ${droundSql("CAST(topk_rows AS DOUBLE)/n_rows", 6)} AS topk_share,
       |  CASE WHEN n_rows > 0 THEN
       |    ${droundSql("CAST(2*src - (n_keys + 1)*n_rows AS DOUBLE)" +
         "/(CAST(n_keys AS DOUBLE)*CAST(n_rows AS DOUBLE))", 6)}
       |  END AS gini
       |FROM a, t""".stripMargin

  // ---- d21: corpus snapshot diff -------------------------------------------

  /** D21 — snapshot diff ([[graft.scale.Curation.snapshotDiff]]) between
    * two deterministic views of the documents table: prev drops
    * doc_id % 13 = 5 (these become `added`), next drops doc_id % 11 = 3
    * (`removed`) and rewrites text for doc_id % 7 = 2 (`changed`);
    * everything else is unchanged and never emitted. Both engines build
    * the same two snapshots, so the (id, status) churn set is exact. */
  private def d21SnapshotDiff: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val prev = docs.filter(col("doc_id") % 13 =!= 5)
      .select(col("doc_id"), col("text"))
    val next = docs.filter(col("doc_id") % 11 =!= 3)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 2, concat(lit("EDITED "), col("text")))
          .otherwise(col("text")).as("text"))
    graft.scale.Curation.snapshotDiff(prev, next, "text", "doc_id")
  }

  private val d21Sql =
    """WITH prev AS (SELECT doc_id AS id, md5(text) AS ha FROM documents
      |  WHERE doc_id % 13 <> 5),
      |nxt AS (SELECT doc_id AS id,
      |    md5(CASE WHEN doc_id % 7 = 2 THEN 'EDITED ' || text
      |        ELSE text END) AS hb
      |  FROM documents WHERE doc_id % 11 <> 3),
      |j AS (SELECT coalesce(prev.id, nxt.id) AS id,
      |    CASE WHEN ha IS NULL THEN 'added'
      |         WHEN hb IS NULL THEN 'removed'
      |         WHEN ha <> hb THEN 'changed'
      |         ELSE 'unchanged' END AS status
      |  FROM prev FULL OUTER JOIN nxt ON prev.id = nxt.id)
      |SELECT id, status FROM j WHERE status <> 'unchanged'""".stripMargin

  // ---- registry -----------------------------------------------------------

  def queries: Map[String, Q] = Map(
    "x40_pii_scan"   -> x40PiiScan,
    "x41_pii_redact" -> x41PiiRedact,
    "x42_blocklist"  -> x42Blocklist,
    "a56_key_skew"   -> a56KeySkew,
    "d21_snapshot_diff" -> d21SnapshotDiff)

  def oracle: Map[String, String] = Map(
    "x40_pii_scan"   -> x40Sql,
    "x41_pii_redact" -> x41Sql,
    "x42_blocklist"  -> x42Sql,
    "a56_key_skew"   -> a56Sql,
    "d21_snapshot_diff" -> d21Sql)
}
