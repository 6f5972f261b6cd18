package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for corpus curation (north star: a
  * 100 TB pipeline downsamples/interleaves corpora before training).
  *
  * Two paths with different scale behavior:
  *  - [[modSample]] — a pure filter on the id; pushes to the scan, no
  *    shuffle, no state. The default at 100 TB.
  *  - [[stratifiedExact]] — exact per-group fractions via one windowed
  *    pass; costs a shuffle on the group key. Use when group quotas must
  *    be exact (e.g. balancing languages), not just proportional. */
object Sampling {

  /** Keep rows whose `pmod(idCol, modulus) < keep` — a deterministic
    * `keep/modulus` sample. Fully pushdown-able: no shuffle, no window;
    * survives any scale-up and composes with partition pruning. */
  def modSample(df: DataFrame, idCol: String, modulus: Int, keep: Int): DataFrame =
    df.filter(pmod(col(idCol), lit(modulus)) < lit(keep))

  /** Exact stratified sample: the first `ceil(frac·|group|)` rows of each
    * group in `orderCol` order. One shuffle on `groupCols` (both window
    * functions share a single WindowExec — same partitioning + ordering). */
  def stratifiedExact(df: DataFrame, groupCols: Seq[String], orderCol: String,
                      frac: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    val w = byGroup.orderBy(col(orderCol))
    df.withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(byGroup))
      .filter(col("rn") <= ceil(lit(frac) * col("cnt")))
      .drop("rn", "cnt")
  }

  /** Per-group cap: keep at most `k` rows per group, chosen by a
    * deterministic content-hash order (md5 of the id, ties by id) so the
    * kept subset is stable across runs and unbiased by ingestion order —
    * the standard per-domain cap in web-corpus curation ("no domain
    * contributes more than k documents"). One shuffle on the group key;
    * at 100 TB the group cardinality (domains) is far below the corpus
    * row count, and AQE handles the head-domain skew. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** Deterministic hash-based train/val/test split: the md5 hex of the id
    * is uniform over [0x00.., 0xff..], so LEXICOGRAPHIC thresholds on its
    * prefix carve reproducible, disjoint, ingestion-order-independent
    * fractions — the standard content-hash split of corpus pipelines.
    * Pure map-side expression: no shuffle, no state, survives any
    * scale-up, and the same row always lands in the same split.
    *
    * Fences are 4 hex chars, so fractions quantize to 1/65536 — integer
    * percents land within 0.001% of nominal and adjacent percents never
    * collapse to the same fence. */
  def hashSplit(df: DataFrame, idCol: String,
                trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"need train > 0, val >= 0, train+val < 100; got $trainPct/$valPct")
    def fence(pct: Int): String = f"${(65536L * pct) / 100}%04x"
    val h = md5(col(idCol).cast("string"))
    df.withColumn("split",
      when(h < lit(fence(trainPct)), "train")
        .when(h < lit(fence(trainPct + valPct)), "val")
        .otherwise("test"))
  }

  /** Temperature-smoothed source mixing (the XLM-R rebalancing rule,
    * Conneau et al. 2020 §3.1: sample sources with probability ∝ n_s^α,
    * α<1 upsampling the tail): keep each source at rate
    * (n_min/n_s)^(1−α), so expected kept counts are proportional to
    * n_s^α and the SMALLEST source is kept whole. Rates quantize to
    * permille and rows are chosen by the same deterministic id-mod rule
    * as [[modSample]] — reproducible, no RNG. Appends `n_src` and
    * `permille` so downstream audits see the applied rate.
    *
    * Plan shape at 100 TB: per-source counts are one tiny aggregate
    * (sources ≈ dozens), rates come back as a BROADCAST join — the
    * corpus itself never shuffles: scan → broadcast-join → filter, all
    * map-side. α=0.5 (the common choice) goes through IEEE
    * correctly-rounded sqrt, so the permille fences are reproducible
    * across engines; other α use pow. */
  def temperatureSample(df: DataFrame, sourceCol: String, idCol: String,
                        alpha: Double = 0.5): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"need alpha in [0,1], got $alpha")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_src"))
    val ratio = col("n_min").cast("double") / col("n_src").cast("double")
    val rate = if (alpha == 0.5) sqrt(ratio) else pow(ratio, 1.0 - alpha)
    val rates = counts
      .crossJoin(counts.agg(min(col("n_src")).as("n_min")))
      .select(col(sourceCol), col("n_src"),
              floor(rate * lit(1000) + lit(0.5)).cast("int").as("permille"))
    df.join(broadcast(rates), sourceCol)
      .filter(pmod(col(idCol), lit(1000)) < col("permille"))
  }

  /** Weighted corpus interleave: per-source modulus sampling driven by a
    * weight map (source -> keep-permille). The weight lookup is a CASE
    * expression, not a join — zero shuffle end-to-end. */
  def interleave(df: DataFrame, sourceCol: String, idCol: String,
                 permille: Map[String, Int]): DataFrame = {
    val keep: Column = permille.foldLeft(lit(0)) { case (acc, (src, p)) =>
      when(col(sourceCol) === src, lit(p)).otherwise(acc)
    }
    df.filter(pmod(col(idCol), lit(1000)) < keep)
  }
}
