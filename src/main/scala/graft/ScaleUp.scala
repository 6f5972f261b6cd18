package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-soak data generator: writes a `factor`× replica of a TESTDATA
  * star-schema directory, preserving per-replica semantics so operator
  * cost scales the way it would on a genuinely larger corpus.
  *
  * Design (what "10× the data" must mean for each table family):
  *   - Fact/dimension keys are offset per replica by (max(key)+1), with
  *     the SAME offset applied to both sides of every FK edge, so join
  *     fan-outs stay exactly what they were — 10× rows, 10× join output,
  *     never 100×. `region`/`nation` stay fixed (TPC-H semantics: only
  *     fact-side tables scale with SF).
  *   - `documents.text` in replica k>0 is rewritten by a per-replica
  *     TOKEN BIJECTION (every token suffixed with `~k`): a renaming is
  *     similarity-preserving WITHIN a replica (near-dup docs stay
  *     near-dups at exactly their original Jaccard, exact dups stay
  *     exact) while across replicas the shingle vocabularies are
  *     DISJOINT — zero shared shingles, so the pairing join never even
  *     generates a cross-replica candidate. Cluster sizes are therefore
  *     scale-invariant and candidate/pair volumes grow ~10×, not 100× —
  *     the growth profile of a real 10× crawl, where new content arrives
  *     with its own duplication structure rather than duplicating the
  *     old corpus. Token counts per doc are unchanged, so text-stats
  *     selectivities hold too.
  *   - `embeddings.embedding` in replica k>0 gets a deterministic
  *     per-replica sign-flip pattern (component i multiplied by ±1 from
  *     xxhash64(k, i)). A uniform sign flip is an orthogonal transform:
  *     norms and all WITHIN-replica cosines are preserved bit-for-bit in
  *     structure, while cross-replica cosines scramble to ≈0 — ANN
  *     neighborhoods stay the same shape, there are just 10× as many.
  *   - `events` offsets user_id as well as event_id: 10× users with the
  *     original per-user event density, so sessionization state and
  *     per-key window sizes stay constant (the scale-up is horizontal,
  *     which is how event streams actually grow).
  *   - Replica 0 is byte-identical to the source, so every id-anchored
  *     query (fixed ANN query ids, a10's target row) still finds its row
  *     and the sf0.1 workload is a strict subset of the sf1 workload.
  *
  * Usage: runMain graft.ScaleUp <srcDir> <dstDir> [factor=10]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <srcDir> <dstDir> [factor]")
    val src = args(0); val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scaleup")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, dst, factor)
    spark.stop()
  }

  /** One scan per table: cross-join with the replica ids (broadcast — it
    * is `factor` rows) and rewrite keys/payloads per replica. */
  def run(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    val reps = broadcast(spark.range(factor).select(col("id").cast("long").as("rep")))

    def keyMax(name: String, c: String): Long =
      Tables.t(spark, src, name).agg(max(col(c))).head().getLong(0)
    val okOff = keyMax("orders", "o_orderkey") + 1
    val ckOff = keyMax("customer", "c_custkey") + 1
    val pkOff = keyMax("part", "p_partkey") + 1
    val skOff = keyMax("supplier", "s_suppkey") + 1
    val evOff = keyMax("events", "event_id") + 1
    val uvOff = keyMax("events", "user_id") + 1
    val dkOff = keyMax("documents", "doc_id") + 1
    val vkOff = keyMax("embeddings", "vec_id") + 1

    def shift(c: String, off: Long): (String, Column) =
      c -> (col(c) + col("rep") * off)

    def write(name: String, parts: Int)(cols: (String, Column)*): Unit = {
      val base = Tables.t(spark, src, name)
      val out = cols.foldLeft(base.crossJoin(reps)) { case (df, (c, e)) =>
        df.withColumn(c, e)
      }.drop("rep")
      out.repartition(parts)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name x$factor done")
    }

    // fixed dimensions: verbatim copy
    Seq("region", "nation").foreach { n =>
      Tables.t(spark, src, n).coalesce(1)
        .write.mode("overwrite").parquet(s"$dst/$n.parquet")
      println(s"[scaleup] $n copied")
    }

    write("customer", 4)(shift("c_custkey", ckOff))
    write("supplier", 1)(shift("s_suppkey", skOff))
    write("part", 2)(shift("p_partkey", pkOff))
    write("orders", 8)(shift("o_orderkey", okOff), shift("o_custkey", ckOff))
    write("lineitem", 32)(shift("l_orderkey", okOff), shift("l_partkey", pkOff),
                          shift("l_suppkey", skOff))
    write("events", 8)(shift("event_id", evOff), shift("user_id", uvOff))

    // documents: per-replica token bijection (k>0 only — see scaladoc)
    val renamed = array_join(
      transform(split(col("text"), " "),
        t => concat(t, lit("~"), col("rep"))), " ")
    val newText = when(col("rep") === 0, col("text")).otherwise(renamed)
    write("documents", 8)(
      "text" -> newText,
      "n_chars" -> length(newText), // keep the n_chars == len(text) invariant
      shift("doc_id", dkOff))

    // embeddings: per-replica deterministic sign flips (orthogonal — see
    // scaladoc); replica 0 untouched
    val flipped = transform(col("embedding"),
      (x, i) => when(col("rep") === 0, x)
        .otherwise(x * when(pmod(xxhash64(col("rep"), i), lit(2)) === 0, lit(1.0f))
                        .otherwise(lit(-1.0f))))
    write("embeddings", 4)(
      "embedding" -> flipped,
      shift("vec_id", vkOff))
  }
}
