package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** The custom codegen'd vector expressions, via both API surfaces: the
  * DataFrame Column wrappers and the SQL functions registered through
  * `GraftExtensions` (SparkSessionExtensions). */
class FunctionsSpec extends SparkTestBase {

  test("dot_product and l2_norm are callable from SQL") {
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
      "l2_norm(array(3.0d, 4.0d)) AS n").head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
  }

  test("SQL functions agree with the Column API on real embeddings") {
    val e = Tables.embeddings(spark, SF).limit(50)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val api = e.select(col("vec_id"),
        VectorOps.dot(col("v"), col("v")).as("d"), VectorOps.l2norm(col("v")).as("n"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2)))).toMap
    e.createOrReplaceTempView("emb_fn_spec")
    val sql = spark.sql(
        "SELECT vec_id, dot_product(v, v) AS d, l2_norm(v) AS n FROM emb_fn_spec")
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2)))).toMap
    assert(api == sql)
    // and the norm is consistent with the dot product
    api.foreach { case (_, (d, n)) => assert(math.abs(math.sqrt(d) - n) < 1e-12) }
  }

  test("MinHashSig expression is bit-identical to the aggregation pipeline") {
    import graft.scale.Dedup
    val docs = Tables.documents(spark, SF).limit(200)
    val viaAgg = Dedup.minHashSignatures(
        Dedup.shingleHashes(docs, "text", "doc_id", 3), 16)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toMap
    val viaExpr = docs.select(col("doc_id"),
        graft.functions.MinHashSig(col("text"), 3, 16).as("sig"))
      .filter(col("sig").isNotNull)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toMap
    assert(viaExpr.nonEmpty)
    assert(viaExpr == viaAgg)
  }

  test("SimHashSig expression is bit-identical to the aggregation pipeline") {
    import graft.scale.Dedup
    val docs = Tables.documents(spark, SF).limit(200)
    val viaAgg = Dedup.simHashViaAgg(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaExpr = Dedup.simHash(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaExpr.nonEmpty)
    assert(viaExpr == viaAgg)
  }

  test("signature expressions match the pipelines on pathological whitespace") {
    import graft.scale.Dedup
    val spark2 = spark
    import spark2.implicits._
    // consecutive, leading, and trailing spaces produce empty tokens in
    // split(text, ' '); both paths must treat them identically
    val docs = Seq(
      (1L, "a  b c d e"), (2L, " leading space here ok"),
      (3L, "trailing space here ok "), (4L, "x y z x y z x  y"),
      (5L, "     "), (6L, "one two three four five six")
    ).toDF("doc_id", "text")
    val mhAgg = Dedup.minHashSignatures(Dedup.shingleHashes(docs, "text", "doc_id", 3), 16)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toMap
    val mhExpr = docs.select(col("doc_id"), graft.functions.MinHashSig(col("text"), 3, 16).as("sig"))
      .filter(col("sig").isNotNull)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toMap
    assert(mhExpr == mhAgg)
    val shAgg = Dedup.simHashViaAgg(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val shExpr = Dedup.simHash(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(shExpr == shAgg)
  }

  test("null and empty arrays are handled") {
    val r = spark.sql(
      "SELECT dot_product(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d1, " +
      "dot_product(array(), CAST(array() AS ARRAY<DOUBLE>)) AS d2, " +
      "l2_norm(CAST(array() AS ARRAY<DOUBLE>)) AS n").head()
    assert(r.isNullAt(0))
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == 0.0)
  }
}
