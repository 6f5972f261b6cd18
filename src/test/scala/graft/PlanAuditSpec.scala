package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.scale.Dedup

/** Plan-shape guards for the scale properties the operators promise:
  * counts of physical shuffle exchanges must not silently grow. Counted
  * with AQE OFF — an AQE-wrapped plan is a leaf to collect(), which made
  * these budgets vacuous before round 4. (Reused exchanges don't
  * double-count — ReusedExchangeExec is not a ShuffleExchangeLike.) */
class PlanAuditSpec extends SparkTestBase {

  private def shuffles(df: => DataFrame): Int = withAqeOff {
    df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeLike => e
    }.size
  }

  private lazy val docs = Tables.documents(spark, SF)

  test("SimHash fingerprints are map-side: zero shuffles") {
    assert(shuffles(Dedup.simHash(docs, "text", "doc_id")) == 0)
  }

  test("MinHash signatures are map-side: zero shuffles") {
    val sig = docs.select(col("doc_id"),
      graft.functions.MinHashSig(col("text"), 3, 16).as("sig"))
    assert(shuffles(sig) == 0)
  }

  test("exact dedup is at most one content-hash shuffle") {
    // == 0 here: a single-partition sf0.001 scan already satisfies the
    // clustered distribution, so EnsureRequirements elides the exchange;
    // at real partition counts it is exactly 1
    assert(shuffles(Dedup.exact(docs, "text", "doc_id")) <= 1)
  }

  test("j1_star shuffles at most once (fact table never shuffled, dims broadcast)") {
    assert(shuffles(SparkEntry.queries("j1_star")(spark, SF)) <= 1)
  }

  test("ngramJaccard stays within its contracted shuffle budget") {
    // set aggregation (1) + pairing join sides (<=2, one may be reused)
    // + pair aggregate (1)
    val d2 = Dedup.ngramJaccard(docs, "text", "doc_id", 3, 0.5)
    assert(shuffles(d2) <= 4, s"d2 shuffle count grew: ${shuffles(d2)}")
  }
}
