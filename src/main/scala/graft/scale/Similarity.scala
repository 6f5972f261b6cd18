package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (north star). Two paths:
  * brute-force exact top-k (the baseline — one broadcast of the bounded
  * query set against a full scan, no index), and a random-hyperplane LSH
  * bucketed variant (the scale path — candidates only within matching
  * buckets, trading recall for a >10x candidate reduction). */
object Similarity {

  /** Exact cosine top-k for each query id. Query side is small →
    * broadcast; the corpus scan stays partitioned (no shuffle of the big
    * side). Ranking is deterministic: (rounded cosine desc, vid). */
  def bruteForceTopK(corpus: DataFrame, queryIds: Seq[Long], k: Int,
                     vecCol: String, idCol: String): DataFrame = {
    val v = corpus.select(col(idCol).cast("long").as("vid"),
                          col(vecCol).cast("array<double>").as("v"))
      .withColumn("norm", graft.functions.VectorOps.l2norm(col("v")))
    val q = v.filter(col("vid").isin(queryIds: _*))
      .select(col("vid").as("qid"), col("v").as("qv"), col("norm").as("qnorm"))
    val scored = v.join(broadcast(q), col("vid") =!= col("qid"))
      .withColumn("dot", graft.functions.VectorOps.dot(col("v"), col("qv")))
      .withColumn("cosine", floor(col("dot") / (col("norm") * col("qnorm")) * 1e6 + 0.5) / 1e6)
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("vid"), col("cosine"))
  }

  /** Deterministic pseudo-random hyperplanes (xorshift), `nPlanes` x dim. */
  private[scale] def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    var s = 0x853C49E6748FEA9BL
    def next(): Double = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; (s >>> 11).toDouble / (1L << 53) - 0.5 }
    Array.fill(nPlanes)(Array.fill(dim)(next()))
  }

  /** Embedding dimensionality, read from the first non-null vector (one
    * tiny job — the schema carries no array length). */
  def inferDim(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol)).as("d")).filter(col("d") > 0).head().getInt(0)

  /** Random-hyperplane LSH bucket id per vector: sign bit per plane.
    * `dim` ≤ 0 ⇒ inferred from the data; the dot product clamps to
    * min(vector length, plane length) so ragged vectors can't index past
    * the plane array. */
  def lshBuckets(df: DataFrame, vecCol: String, idCol: String,
                 nPlanes: Int = 8, dim: Int = -1): DataFrame = {
    val d0 = if (dim > 0) dim else inferDim(df, vecCol)
    val planes = hyperplanes(nPlanes, d0)
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(planes)
    val dotSign = udf { (v: Seq[Double]) =>
      val ps = bc.value
      var bucket = 0L
      var i = 0
      while (i < ps.length) {
        val lim = math.min(v.length, ps(i).length)
        var d = 0.0; var j = 0
        while (j < lim) { d += ps(i)(j) * v(j); j += 1 }
        if (d > 0) bucket |= (1L << i)
        i += 1
      }
      bucket
    }
    df.select(col(idCol).cast("long").as("vid"),
              col(vecCol).cast("array<double>").as("v"))
      .withColumn("bucket", dotSign(col("v")))
  }

  /** ANN top-k: exact ranking restricted to the query's LSH bucket
    * (single-probe). Approximate — documented recall tradeoff; increase
    * nPlanes→smaller buckets, decrease→higher recall. `dim` ≤ 0 ⇒ inferred. */
  def lshTopK(corpus: DataFrame, queryIds: Seq[Long], k: Int,
              vecCol: String, idCol: String, nPlanes: Int = 6,
              dim: Int = -1): DataFrame = {
    val b = lshBuckets(corpus, vecCol, idCol, nPlanes, dim).cache()
    val withNorm = b.withColumn("norm", graft.functions.VectorOps.l2norm(col("v")))
    val q = withNorm.filter(col("vid").isin(queryIds: _*))
      .select(col("vid").as("qid"), col("v").as("qv"),
              col("norm").as("qnorm"), col("bucket").as("qbucket"))
    val scored = withNorm.join(broadcast(q),
        col("bucket") === col("qbucket") && col("vid") =!= col("qid"))
      .withColumn("dot", graft.functions.VectorOps.dot(col("v"), col("qv")))
      .withColumn("cosine", floor(col("dot") / (col("norm") * col("qnorm")) * 1e6 + 0.5) / 1e6)
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("vid"), col("cosine"))
  }
}
