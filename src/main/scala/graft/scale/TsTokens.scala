package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series → token-id encoding for LLM-style sequence training
  * (the Chronos discipline — Ansari et al. 2024, "Chronos: Learning
  * the Language of Time Series", arXiv:2403.07815 §3.1: mean-scale
  * each series by its mean absolute value, then uniformly quantize
  * the scaled values into a fixed token vocabulary over [-clip,
  * clip]). This is the bridge between the forecasting surface and the
  * pretraining pipeline: the output column is a vocabulary id a
  * sequence packer ([[Packing]]) can consume directly.
  *
  * Determinism discipline: the per-series scale comes from EXACT
  * integer sums (values quantize to the 1e-6 grid as longs before
  * aggregation), and the scaled ratio is ONE double division of
  * identical integer operands on any engine — so the token id is
  * engine-reproducible and the operator hash-checks end-to-end. A
  * flat series (all-zero scale) has no defined ratio; its points take
  * the center token, the reference behavior of mean-scaling.
  *
  * 100-TB shape: one bounded per-series aggregate (|series| rows)
  * joined back — AQE broadcasts it when small, hash-joins co-
  * partitioned on the series key otherwise; the event stream itself
  * is scanned map-side, never windowed. */
object TsTokens {

  /** (series, id, y, token): token ∈ [0, bins), center = bins/2. */
  def meanScaleTokens(df: DataFrame, valueCol: String, idCol: String,
                      seriesCol: String, bins: Int = 64,
                      clip: Double = 15.0): DataFrame = {
    require(bins >= 2, s"need bins >= 2, got $bins")
    require(clip > 0, s"need clip > 0, got $clip")
    val base = df.select(col(seriesCol).cast("long").as("sid"),
      col(idCol).cast("long").as("id"),
      col(valueCol).cast("double").as("y"),
      floor(col(valueCol).cast("double") * 1e6 + 0.5).cast("long").as("y6"))
    val sc = base.groupBy(col("sid"))
      .agg(sum(abs(col("y6"))).as("s6"), count(lit(1)).as("n"))
    val r = col("y6").cast("double") * col("n").cast("double") /
      col("s6").cast("double")
    val bin = floor((r + lit(clip)) / lit(2 * clip) * lit(bins.toDouble))
    val token = when(col("s6") === 0L, lit(bins / 2).cast("long"))
      .otherwise(least(lit(bins - 1L), greatest(lit(0L), bin.cast("long"))))
    base.join(sc, Seq("sid"))
      .select(col("sid"), col("id"), col("y"), token.as("token"))
  }

  /** Decode leg: reconstruct each point from its token's bin center —
    * ŷ = scale · ((token + ½) · 2·clip/bins − clip), scale = the same
    * exact-integer mean |y| the encoder used. The round trip bounds
    * reconstruction error at scale·clip/bins for unclipped points (the
    * quantization half-bin), which the spec pins. Returns (series, id,
    * y, token, y_hat). */
  def reconstruct(df: DataFrame, valueCol: String, idCol: String,
                  seriesCol: String, bins: Int = 64,
                  clip: Double = 15.0): DataFrame = {
    val toks = meanScaleTokens(df, valueCol, idCol, seriesCol, bins, clip)
    val base = df.select(col(seriesCol).cast("long").as("sid"),
      floor(col(valueCol).cast("double") * 1e6 + 0.5).cast("long").as("y6"))
    val sc = base.groupBy(col("sid"))
      .agg(sum(abs(col("y6"))).as("s6"), count(lit(1)).as("n"))
    val scale = col("s6").cast("double") /
      (col("n").cast("double") * lit(1e6))
    val yHat = scale * ((col("token").cast("double") + lit(0.5)) *
      lit(2 * clip / bins) - lit(clip))
    toks.join(sc, Seq("sid"))
      .select(col("sid"), col("id"), col("y"), col("token"),
              yHat.as("y_hat"))
  }
}
