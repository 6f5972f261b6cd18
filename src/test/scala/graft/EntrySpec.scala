package graft

/** The driver contract surface: entry() returns rows on sf0.001, every
  * registered oracle key has a query, and query names are unique across
  * the per-family registries. */
class EntrySpec extends SparkTestBase {

  test("entry() flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without a query: $missing")
  }

  test("query names are unique across family registries") {
    val all = Seq(
      graft.queries.CoreQueries.queries, graft.queries.CoreQueries2.queries,
      graft.queries.InferQueries.queries, graft.queries.StatQueries.queries,
      graft.queries.ModelQueries.queries, graft.queries.ScaleQueries.queries)
    val names = all.flatMap(_.keys)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names (later registries would shadow): $dups")
  }
}
