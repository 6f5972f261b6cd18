package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static type lint over every registered oracle SQL string: a bare
  * integral `sum(...)` that is DIRECTLY aliased as an output column is
  * the DuckDB `sum(INTEGER)` → HUGEINT → float64 trap — Spark emits
  * BIGINT for the same column, and the driver's hash is type-sensitive,
  * so the row goes red even when every value matches (r11's
  * `sm9_ppl_tiers`, diagnosed by a live run in VERDICT r11 §What's
  * wrong). The fix is always `CAST(sum(...) AS BIGINT)`.
  *
  * The lint targets the high-precision class: `sum` over an integer
  * literal or a CASE whose every THEN/ELSE operand is an integer
  * literal, not already CAST-wrapped, whose result is aliased straight
  * to an output name (a sum feeding arithmetic becomes DOUBLE on both
  * engines and is safe). `count(*)` returns BIGINT in DuckDB and is not
  * a trap. The dynamic twin — `tools/verify_local.py`'s `[TYPE]` gate —
  * compares actual parquet vs DuckDB dtypes per column and catches the
  * classes no static rule can see. */
class OracleTypeAuditSpec extends AnyFunSuite {

  /** Offsets of every `sum(`'s body plus the index after its matching
    * close paren. */
  private def sumSites(sql: String): Seq[(Int, Int)] = {
    val lower = sql.toLowerCase
    val out = Seq.newBuilder[(Int, Int)]
    var i = lower.indexOf("sum")
    while (i >= 0) {
      // must be a standalone word followed by an open paren
      val okStart = i == 0 || !Character.isLetterOrDigit(lower(i - 1)) && lower(i - 1) != '_'
      var j = i + 3
      while (j < sql.length && Character.isWhitespace(sql(j))) j += 1
      if (okStart && j < sql.length && sql(j) == '(') {
        var depth = 1; var k = j + 1
        while (k < sql.length && depth > 0) {
          if (sql(k) == '(') depth += 1
          else if (sql(k) == ')') depth -= 1
          k += 1
        }
        out += ((j + 1, k)) // body = sql[j+1, k-1); k = index after ')'
      }
      i = lower.indexOf("sum", i + 3)
    }
    out.result()
  }

  private val intLit = """-?\d+""".r
  private val thenElse = """(?is)(?:then|else)\s+(\S+)""".r

  /** Is the summed expression certainly integral? Integer literal, or a
    * CASE whose every THEN/ELSE operand is an integer literal. */
  private def integralBody(body0: String): Boolean = {
    val body = body0.trim
    if (intLit.pattern.matcher(body).matches) true
    else if (body.toLowerCase.startsWith("case")) {
      val ops = thenElse.findAllMatchIn(body).map(_.group(1)).toSeq
      ops.nonEmpty && ops.forall(o => intLit.pattern.matcher(o.stripSuffix(")")).matches)
    } else false
  }

  private def findings(name: String, sql: String): Seq[String] =
    sumSites(sql).flatMap { case (bodyStart, after) =>
      val body = sql.substring(bodyStart, after - 1)
      val prefix = sql.substring(0, bodyStart).replaceAll("\\s+", " ")
      val castWrapped = prefix.toUpperCase.endsWith("CAST( SUM(") ||
        prefix.toUpperCase.endsWith("CAST(SUM(")
      val tail = sql.substring(math.min(after, sql.length))
      val directlyAliased = """(?is)^\s+as\s+\w+\s*(?:,|$|\n|from\b)""".r
        .findPrefixOf(tail + "\n").isDefined
      if (!castWrapped && directlyAliased && integralBody(body))
        Some(s"$name: bare integral sum aliased at output — " +
          s"""sum(${body.trim.take(60)}…) — wrap in CAST(... AS BIGINT)""")
      else None
    }

  test("no oracle outputs a bare integral sum (DuckDB HUGEINT->float64 trap)") {
    val all = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .flatMap { case (n, sql) => findings(n, sql) }
    assert(all.isEmpty, all.mkString("\n"))
  }
}
