package graft.cv

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T12 — expanding-window time-series cross-validation
  * (`sklearn.TimeSeriesSplit(n_splits, test_size=h)` as used at
  * `models/build_ml.py:204-213`, `utils/val.py:15-53`).
  *
  * Fold k (k = 1..nSplits) trains on rows [1, n - (nSplits-k+1)*h] and
  * tests on the next h rows — folds are expanding and test windows are
  * disjoint, ending at the last row.
  *
  * Implementation: one `row_number` window (per series) + integer
  * arithmetic; fold membership is a codegen'd expression, no driver loop
  * over data. */
object ExpandingWindowSplit {

  case class Fold(k: Int, trainEnd: Long, testStart: Long, testEnd: Long)

  /** Fold boundaries for a series of n rows. */
  def folds(n: Long, nSplits: Int, h: Int): Seq[Fold] =
    (1 to nSplits).map { k =>
      val testEnd = n - (nSplits - k).toLong * h
      Fold(k, testEnd - h, testEnd - h + 1, testEnd)
    }.filter(f => f.trainEnd >= 1)

  /** Adds `rn` (1-based time order) and, per fold, returns (train, test)
    * DataFrames. Single-series version (reference semantics). */
  def split(df: DataFrame, tsCol: String, nSplits: Int, h: Int,
            tieBreak: Seq[String] = Nil): Seq[(DataFrame, DataFrame)] = {
    val w = Window.partitionBy().orderBy((tsCol +: tieBreak).map(col): _*)
    val withRn = df.withColumn("rn", row_number().over(w))
    val n = withRn.count()
    folds(n, nSplits, h).map { f =>
      (withRn.filter(col("rn") <= f.trainEnd).drop("rn"),
       withRn.filter(col("rn") > f.trainEnd && col("rn") <= f.testEnd).drop("rn"))
    }
  }

  /** Scale path: fold-id assignment as a single column over many series at
    * once — `fold_k_role` ∈ {train, test, unused} for fold k given the
    * per-series row count. One shuffle (the window), no per-fold scan. */
  def assignFolds(df: DataFrame, tsCol: String, seriesCols: Seq[String],
                  nSplits: Int, h: Int, tieBreak: Seq[String] = Nil): DataFrame = {
    val part = if (seriesCols.isEmpty) Window.partitionBy()
               else Window.partitionBy(seriesCols.map(col): _*)
    val w  = part.orderBy((tsCol +: tieBreak).map(col): _*)
    val wc = part
    val withRn = df
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wc))
    // fold k test window: (n - (nSplits-k+1)*h, n - (nSplits-k)*h]
    val k = lit(nSplits) - floor((col("n") - col("rn")) / lit(h))
    withRn.withColumn("fold",
      when(k >= 1 && k <= nSplits, k.cast("int")).otherwise(lit(0)))
  }

  /** The reference clamp: h ≥ 5 and nSplits·h ≤ n
    * (`build_arima_base.py:111-117`, `build_ml.py:182-188`). */
  def clampHorizon(n: Long, nSplits: Int, h: Int): Int = {
    val h1 = math.max(h, 5)
    if (nSplits.toLong * h1 > n) math.max(1, (n / math.max(nSplits, 1)).toInt) else h1
  }
}
