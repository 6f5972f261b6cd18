package graft.queries

/** DuckDB replay of the BPE train/apply fold
  * ([[graft.scale.TextAnalysis.bpeLearn]] /
  * [[graft.scale.TextAnalysis.bpeTokenCounts]], Sennrich et al. 2016) —
  * the oracle side of x19/x20/pipe9.
  *
  * Through round 11 these rows were ✖est ("the ordered-merge fold is
  * not SQL-expressible"); it IS expressible: `list_reduce` over the
  * symbol list with a chr(1)-joined STRING accumulator replays the
  * exact left-to-right non-overlapping fusion —
  *   acc = ''                  → x            (prepended init sentinel)
  *   last symbol = l ∧ x = r   → acc || x     (fuse: append r, no sep)
  *   otherwise                 → acc || sep || x
  * "last symbol = l" is `acc = l OR ends_with(acc, sep || l)` — exact
  * because symbols never contain chr(1). Each learned round is one
  * statically-unrolled (pair-count → top-1 → fold) stage; the winner
  * row CROSS JOINs into the fold so the lambda sees l/r/ok as plain
  * columns (DuckDB lambdas cannot contain subqueries). The `ok` flag
  * chains the early-stop rule (best count < minCount stops training
  * permanently); a fallback row keeps every b_k CTE at exactly one row
  * so a dry round degrades the fold to identity instead of emptying
  * the pipeline. */
object BpeSql {

  /** CTE prefix learning `merges` rounds (minCount = 2) over the corpus
    * word-count table: defines words, v0..v`merges` (per-word symbol
    * lists) and b1..b`merges` (per-round winners with the ok chain). */
  def learnCtes(merges: Int): String = {
    require(merges >= 1, s"need merges >= 1, got $merges")
    def best(prev: String, prevBest: Option[String], out: String): String = {
      val prevOk = prevBest.map(b => s"(SELECT ok FROM $b)").getOrElse("true")
      s"""${out}p AS (
         |  SELECT s.pair, CAST(sum(s.cnt) AS BIGINT) AS n FROM (
         |    SELECT unnest(list_transform(generate_series(1, len(syms) - 1),
         |             i -> syms[CAST(i AS INT)] || chr(1) || syms[CAST(i AS INT) + 1])) AS pair, cnt
         |    FROM $prev WHERE len(syms) >= 2) s
         |  GROUP BY 1 ORDER BY n DESC, pair ASC LIMIT 1),
         |$out AS (
         |  SELECT coalesce(b.l, '') AS l, coalesce(b.r, '') AS r,
         |         coalesce(b.n, 0) AS n, coalesce(b.ok, false) AS ok
         |  FROM (SELECT 1 AS one) LEFT JOIN (
         |    SELECT string_split(pair, chr(1))[1] AS l,
         |           string_split(pair, chr(1))[2] AS r, n,
         |           $prevOk AND n >= 2 AS ok
         |    FROM ${out}p) b ON true)""".stripMargin
    }
    def fold(prev: String, bestC: String, out: String): String =
      s"""$out AS (
         |  SELECT w, cnt,
         |    string_split(
         |      list_reduce(list_prepend('', syms),
         |        (acc, x) -> CASE
         |          WHEN acc = '' THEN x
         |          WHEN ok AND x = r AND (acc = l OR ends_with(acc, chr(1) || l))
         |          THEN acc || x
         |          ELSE acc || chr(1) || x END),
         |      chr(1)) AS syms
         |  FROM $prev CROSS JOIN $bestC)""".stripMargin
    val head =
      s"""words AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
         |  WHERE length(w) > 0 GROUP BY 1),
         |v0 AS (
         |  SELECT w, cnt, list_transform(generate_series(1, length(w)),
         |    i -> substr(w, CAST(i AS INT), 1)) AS syms
         |  FROM words)""".stripMargin
    val rounds = (1 to merges).map { k =>
      val prevBest = if (k == 1) None else Some(s"b${k - 1}")
      best(s"v${k - 1}", prevBest, s"b$k") + ",\n" + fold(s"v${k - 1}", s"b$k", s"v$k")
    }
    (head +: rounds).mkString(",\n")
  }

  /** x19 oracle — the learned merge table (step, left, right, n). */
  def mergesSql(merges: Int): String = {
    val legs = (1 to merges).map { k =>
      val stepExpr = if (k == 1) "CAST(1 AS INT) AS step, l AS \"left\", r AS \"right\", n"
                     else s"$k, l, r, n"
      s"SELECT $stepExpr FROM b$k WHERE ok"
    }.mkString("\n  UNION ALL ")
    s"""WITH ${learnCtes(merges)}
       |SELECT * FROM (
       |  $legs) ORDER BY step""".stripMargin
  }

  /** x20 oracle — corpus token counts after the learned merges,
    * deterministic top-k. */
  def tokenCountsSql(merges: Int, k: Int): String =
    s"""WITH ${learnCtes(merges)}
       |SELECT token, CAST(sum(cnt) AS BIGINT) AS n
       |FROM (SELECT unnest(syms) AS token, cnt FROM v$merges)
       |GROUP BY 1 ORDER BY n DESC, token ASC LIMIT $k""".stripMargin
}
