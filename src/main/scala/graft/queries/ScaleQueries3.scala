package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.scale.{Curation, Sampling}

/** Corpus-curation operators round 10: temperature source mixing, Bloom
  * decontamination, and the fused end-to-end curation pipeline. */
object ScaleQueries3 {

  type Q = (SparkSession, String) => DataFrame

  /** SM7 — temperature-smoothed source mixing at α=0.5: per-source kept
    * counts plus the applied permille rate (XLM-R rebalancing; the
    * smallest source keeps everything, bigger sources keep
    * sqrt(n_min/n_s)). Deterministic mod rule → hash-checkable. */
  private def sm7Temperature: Q = (s, d) =>
    Sampling.temperatureSample(Tables.documents(s, d), "source", "doc_id", 0.5)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
           max(col("permille")).cast("long").as("permille"),
           max(col("n_src")).as("n_src"))

  private val sm7Sql =
    """WITH c AS (SELECT source, count(*) AS n_src FROM documents GROUP BY source),
      |m AS (SELECT min(n_src) AS n_min FROM c),
      |r AS (SELECT source, n_src,
      |        CAST(floor(sqrt(CAST(n_min AS DOUBLE)/CAST(n_src AS DOUBLE))*1000 + 0.5) AS INT) AS permille
      |      FROM c, m)
      |SELECT d.source, count(*) AS n_kept,
      |  CAST(max(r.permille) AS BIGINT) AS permille, max(r.n_src) AS n_src
      |FROM documents d JOIN r USING (source)
      |WHERE d.doc_id % 1000 < r.permille
      |GROUP BY d.source""".stripMargin

  /** D10 — Bloom-filter decontamination, same train/eval split as
    * d7_decontam (✖est: the sketch is deterministic but not replayable
    * in SQL; the superset-of-exact property is spec-pinned). */
  private def d10DecontamBloom: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    Curation.decontaminateBloom(
      docs.filter(col("source") =!= "src0"),
      docs.filter(col("source") === "src0"),
      "text", "doc_id", n = 4)
  }

  /** PIPE1 — the fused curation pipeline: length gate → exact dedup
    * keeping the longest copy → drop eval-contaminated survivors.
    * One plan; hash-checked end to end as a CTE chain. */
  private def pipe1Curation: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    Curation.curate(
      docs.filter(col("source") =!= "src0"),
      docs.filter(col("source") === "src0"),
      "text", "doc_id", scoreCol = "n_chars", minChars = 100, ngram = 4)
      .select(col("doc_id"), col("source"), col("n_dups"))
  }

  private val pipe1Sql = {
    val parts = (0 until 4).map(j => s"w[i+$j]").mkString(" || ' ' || ")
    s"""WITH gated AS (
       |  SELECT doc_id, source, text, n_chars FROM documents
       |  WHERE source <> 'src0' AND len(text) >= 100),
       |dd AS (
       |  SELECT doc_id, source, text,
       |    row_number() OVER (PARTITION BY md5(text) ORDER BY n_chars DESC, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY md5(text)) AS n_dups
       |  FROM gated),
       |kept AS (SELECT doc_id, source, text, n_dups FROM dd WHERE rn = 1),
       |trg AS (SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1,len(w)-3),
       |          i -> $parts)) AS s
       |        FROM (SELECT doc_id, string_split(text,' ') AS w FROM kept) WHERE len(w)>=4),
       |evg AS (SELECT DISTINCT unnest(list_transform(generate_series(1,len(w)-3),
       |          i -> $parts)) AS s
       |        FROM (SELECT string_split(text,' ') AS w FROM documents WHERE source='src0')
       |        WHERE len(w)>=4),
       |hits AS (SELECT DISTINCT doc_id FROM trg JOIN evg USING (s))
       |SELECT doc_id, source, n_dups FROM kept
       |WHERE doc_id NOT IN (SELECT doc_id FROM hits)""".stripMargin
  }

  /** X13 — learned linear quality classifier (fastText-class, CCNet's
    * classifier half): fit on a deterministic length-tier label (the
    * documents' lang/source labels are synthetic noise with a shared
    * vocabulary — no learnable signal), report the confusion summary
    * (✖est: LBFGS coefficient bits are not SQL-replayable; accuracy
    * bounds are spec-pinned on a vocabulary-distinct fixture). */
  private def x13QualityLr: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .withColumn("tier", when(col("n_chars") >= 120, "long").otherwise("short"))
    val m = graft.scale.QualityClassifier.fit(docs, "text", "tier",
      vocabSize = 200, maxIter = 50)
    graft.scale.QualityClassifier.score(docs, m, "text", "doc_id")
      .join(docs.select(col("doc_id"), col("tier")), "doc_id")
      .groupBy(col("tier"), col("pred_label"))
      .agg(count(lit(1)).as("n"))
  }

  /** D11 — embedding cosine near-dup via banded hyperplane LSH +
    * exact-cosine verify: the scale path d5's row cap routes to (✖est:
    * the xorshift plane matrix is not SQL-replayable; the
    * subset-of-exact precision property and a recall floor are
    * spec-pinned against d5's brute-force twin). */
  private def d11CosineLsh: Q = (s, d) =>
    graft.scale.Dedup.cosineNearDupLsh(Tables.embeddings(s, d),
        "embedding", "vec_id", 0.4)
      .select(col("id_a"), col("id_b"), Det.dround(col("cosine"), 6).as("cosine"))

  /** D12 — SemDeDup: k-means cluster-then-prune semantic dedup over the
    * embeddings table; per-cell kept/dropped counts (✖est: Lloyd
    * centroids aren't SQL-replayable; the drop rule's exactness — every
    * dropped id has a lower-id cluster-mate at ≥ threshold, and no kept
    * pair within a cell reaches it — is spec-pinned against the
    * brute-force twin). */
  private def d12SemDedup: Q = (s, d) =>
    graft.scale.Dedup.semDedup(Tables.embeddings(s, d),
        "embedding", "vec_id", 0.4, nCells = 8, lloydIters = 1)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
           sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))

  val queries: Map[String, Q] = Map(
    "sm7_temperature"    -> sm7Temperature,
    "d10_decontam_bloom" -> d10DecontamBloom,
    "pipe1_curation"     -> pipe1Curation,
    "x13_quality_lr"     -> x13QualityLr,
    "d11_cosine_lsh"     -> d11CosineLsh,
    "d12_semdedup"       -> d12SemDedup
  )

  val oracle: Map[String, String] = Map(
    "sm7_temperature" -> sm7Sql,
    "pipe1_curation"  -> pipe1Sql
  )
}
