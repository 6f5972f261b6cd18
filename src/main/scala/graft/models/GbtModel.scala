package graft.models

import java.time.{Instant, ZoneOffset}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.ml.regression.{GBTRegressionModel, GBTRegressor}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{TimeSeriesOps => TS}

/** M6/M8 — the ML path (`models/build_ml.py:88-414`): supervised reshape
  * (target lags + calendar features + exog) feeding a gradient-boosted
  * tree regressor, with expanding-window CV and the reference's RECURSIVE
  * one-step forecast loop (T14, `build_ml.py:595-670`).
  *
  * Spark-native choices: MLlib `GBTRegressor` (distributed training — the
  * reference's dask-xgboost path collapses into this, SURVEY §2.10 M8);
  * feature building is window/codegen work; the recursive loop runs on
  * the driver against the LOCAL `GBTRegressionModel.predict(Vector)` —
  * h is small, no per-step Spark job. */
class GbtModel(lags: Int = 2, maxIter: Int = 50, maxDepth: Int = 2,
               stepSize: Double = 0.1) extends ModelBuild {
  val name = "ML"

  private var model: GBTRegressionModel = _
  private var schema: TsSchema = _
  private var tailY: Array[Double] = _      // last `lags` observations
  private var lastExog: Array[Double] = _
  private var lastTsMs: Long = _
  private var intervalMs: Long = _
  private var residSigma: Double = _

  /** calendar features used both in Spark (training) and locally
    * (recursive forecast): month, quarter, dayofweek(0=Mon), dayofmonth. */
  private def calendarCols(tsCol: String) = Seq(
    month(col(tsCol)).cast("double").as("f_month"),
    quarter(col(tsCol)).cast("double").as("f_quarter"),
    weekday(col(tsCol)).cast("double").as("f_dow"),
    dayofmonth(col(tsCol)).cast("double").as("f_dom"))

  private def calendarLocal(tsMs: Long): Array[Double] = {
    val dt = Instant.ofEpochMilli(tsMs).atZone(ZoneOffset.UTC)
    Array(dt.getMonthValue.toDouble, ((dt.getMonthValue - 1) / 3 + 1).toDouble,
          dt.getDayOfWeek.getValue.toDouble - 1.0, dt.getDayOfMonth.toDouble)
  }

  private def featureNames: Seq[String] =
    (1 to lags).map(i => s"${schema.target}_lag$i") ++
      Seq("f_month", "f_quarter", "f_dow", "f_dom") ++ schema.exog

  /** Supervised frame: lags over the ordered window + calendar + exog. */
  private def supervised(df: DataFrame): DataFrame = {
    val lagged = TS.addLags(df, Seq(schema.target), lags, schema.tsCol)
    lagged.select((Seq(col(schema.tsCol), col(schema.target).cast("double")) ++
      (1 to lags).map(i => col(s"${schema.target}_lag$i").cast("double")) ++
      calendarCols(schema.tsCol) ++
      schema.exog.map(c => col(c).cast("double").as(c))): _*)
      .na.drop()
  }

  private def assemble(df: DataFrame): DataFrame =
    new VectorAssembler().setInputCols(featureNames.toArray)
      .setOutputCol("features").transform(df)

  private def newGbt = new GBTRegressor()
    .setLabelCol(schema.target).setFeaturesCol("features")
    .setMaxIter(maxIter).setMaxDepth(maxDepth).setStepSize(stepSize).setSeed(42)

  /** BOUNDED-SERIES CONTRACT (same warning as
    * `TimeSeriesOps.seriesWindow`): the unpartitioned `Window.partitionBy()`
    * below funnels the whole frame through ONE task — correct only because
    * fit() is the single-series path, bounded by series length (SURVEY §4).
    * For many series at scale use `scale.PerSeriesForecast` /
    * `scale.PerSeriesArima`, which run one bounded task per series. */
  def fit(df: DataFrame, tsSchema: TsSchema, cv: Int, h: Int): CvScores = {
    schema = tsSchema
    val sup = assemble(supervised(df)).cache()
    val w = Window.partitionBy().orderBy(col(schema.tsCol))
    val withRn = sup.withColumn("rn", row_number().over(w)).cache()
    val n = withRn.count()
    val scores = LocalSeries.foldBounds(n.toInt, cv, h).map { case (trainEnd, testEnd) =>
      val m = newGbt.fit(withRn.filter(col("rn") <= trainEnd))
      val test = withRn.filter(col("rn") > trainEnd && col("rn") <= testEnd)
      val pred = m.transform(test)
        .select(col(schema.target), col("prediction")).collect()
      LocalSeries.score(pred.map(_.getDouble(0)), pred.map(_.getDouble(1)))
    }
    model = newGbt.fit(withRn)
    // residual σ for the CI columns (reference emits NaN CIs for ML,
    // `build_ml.py:674-683`; we do better with the in-sample residual std)
    val res = model.transform(withRn)
      .select(pow(col(schema.target) - col("prediction"), 2)).agg(avg("*")).head().getDouble(0)
    residSigma = math.sqrt(res)

    val localTail = LocalSeries.collect(df, schema)
    tailY = localTail.y.takeRight(lags)
    lastExog = if (schema.exog.nonEmpty) localTail.exog.last else Array.empty
    lastTsMs = localTail.ts.last
    intervalMs = if (localTail.n >= 2) localTail.ts(1) - localTail.ts(0) else 86400000L
    withRn.unpersist(); sup.unpersist()
    CvScores(scores.map(_._1), scores.map(_._2))
  }

  /** T14 — recursive one-step loop: predict, feed the prediction back in
    * as the newest lag, repeat. `future`, when given, supplies KNOWN
    * future exogenous values (reference `predict(testdata)` semantics,
    * `build_ml.py:595-670`): rows ordered by the ts column with the
    * schema's exog columns; step i uses row i's exog (falling back to the
    * last training exog past the frame's end). */
  def predict(spark: SparkSession, h: Int, future: Option[DataFrame] = None): DataFrame = {
    val futureExog: Array[Array[Double]] = future match {
      case Some(f) if schema.exog.nonEmpty => FutureExog.collect(f, schema.tsCol, schema.exog)
      case _ => Array.empty
    }
    val buf = scala.collection.mutable.ArrayBuffer(tailY.toIndexedSeq: _*)
    val out = new Array[Double](h)
    for (i <- 0 until h) {
      val ts = ForecastFrame.nextTs(lastTsMs, intervalMs, i + 1)
      val lagVals = (1 to lags).map(l => buf(buf.length - l)).toArray
      val exog = if (i < futureExog.length) futureExog(i) else lastExog
      val feats = lagVals ++ calendarLocal(ts) ++ exog
      val p = model.predict(Vectors.dense(feats))
      out(i) = p
      buf += p
    }
    ForecastFrame.build(spark, lastTsMs, intervalMs, out, residSigma)
  }
}

/** ModelBuild adapter for the searched GBT: fit() runs the randomized
  * hyperparameter search (the reference's RandomizedSearchCV inside its
  * ML path, `ml_models.py:293-335`) and delegates prediction to the
  * winner. The reported CV scores are the WINNER's fold scores from the
  * shared search folds. */
class SearchedGbtModel(nIter: Int = 15, seed: Long = 42) extends ModelBuild {
  val name = "ML"
  private var inner: GbtModel = _

  def fit(df: DataFrame, schema: TsSchema, cv: Int, h: Int): CvScores = {
    val r = GbtModel.fitSearched(df, schema, math.max(cv, 1), h, nIter, seed)
    inner = r.model
    CvScores(r.foldRmse, r.foldNormRmse)
  }

  def predict(spark: SparkSession, h: Int, future: Option[DataFrame] = None): DataFrame =
    inner.predict(spark, h, future)
}

object GbtModel {

  case class GbtParams(maxDepth: Int, maxIter: Int, stepSize: Double)

  /** Search outcome: the refit winner, its params, and its expanding-
    * window fold scores (rmse, normalized rmse) from the search pass. */
  case class SearchResult(model: GbtModel, params: GbtParams,
                          foldRmse: Seq[Double], foldNormRmse: Seq[Double]) {
    def meanRmse: Double = foldRmse.sum / math.max(foldRmse.length, 1)
  }

  /** M7 — randomized hyperparameter search (the reference's
    * `RandomizedSearchCV(n_iter=15, cv=3)` over the GBT family,
    * `ml_models.py:293-335`): `nIter` (maxDepth, maxIter, stepSize)
    * triples sampled from the same grid families, each scored by
    * expanding-window CV — the time-respecting analogue of the
    * reference's KFold over supervised rows — lowest mean fold RMSE
    * wins, then the winner is refit on the full frame.
    *
    * The supervised/assembled frame is built and cached ONCE and shared
    * by every (candidate × fold) fit — the search cost is pure
    * `GBTRegressor.fit` calls, each itself a distributed job, so on a
    * cluster the search parallelizes exactly like the ARIMA grid:
    * driver-orchestrated jobs over a shared cached input. */
  def fitSearched(df: DataFrame, tsSchema: TsSchema, cv: Int, h: Int,
                  nIter: Int = 15, seed: Long = 42): SearchResult = {
    val probe = new GbtModel()
    probe.schema = tsSchema
    val sup = probe.assemble(probe.supervised(df)).cache()
    val w = Window.partitionBy().orderBy(col(tsSchema.tsCol))
    // one partition: this is the bounded single-series contract (SURVEY
    // §4) — at ~series length rows, every GBT iteration's jobs are pure
    // scheduling overhead unless the input is a single cached partition
    val withRn = sup.withColumn("rn", row_number().over(w)).coalesce(1).cache()
    val n = withRn.count().toInt
    val folds = LocalSeries.foldBounds(n, cv, h)
    // RandomizedSearchCV analogue: sample with a fixed seed, dedupe.
    // The incumbent default config is always candidate zero, so the
    // searched result is never worse than the fixed-parameter model
    // under the shared folds.
    val rnd = new scala.util.Random(seed)
    val depths = Array(2, 3, 4, 5)
    val iters  = Array(20, 40, 60, 80)
    val steps  = Array(0.05, 0.1, 0.15, 0.2)
    val cands = (GbtParams(2, 50, 0.1) +: Seq.fill(nIter)(GbtParams(
      depths(rnd.nextInt(depths.length)),
      iters(rnd.nextInt(iters.length)),
      steps(rnd.nextInt(steps.length))))).distinct
    // every (candidate × fold) fit is independent — run them as
    // concurrent driver-submitted Spark jobs (the scheduler interleaves
    // them across executors), exactly how the ARIMA grid parallelizes
    val pairs = for { p <- cands; f <- folds } yield (p, f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, math.max(pairs.size, 1)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    // a failing (candidate x fold) fit is the candidate's problem, not the
    // search's: like RandomizedSearchCV's error_score=nan default, the pair
    // is dropped and the candidate excluded unless it scored EVERY fold
    // (partial coverage would bias its mean down)
    val futures = pairs.map { case (p, (trainEnd, testEnd)) =>
      scala.concurrent.Future {
        scala.util.Try {
          val reg = new GBTRegressor()
            .setLabelCol(tsSchema.target).setFeaturesCol("features")
            .setMaxIter(p.maxIter).setMaxDepth(p.maxDepth)
            .setStepSize(p.stepSize).setSeed(42)
          val m = reg.fit(withRn.filter(col("rn") <= trainEnd))
          val pred = m.transform(withRn.filter(col("rn") > trainEnd && col("rn") <= testEnd))
            .select(col(tsSchema.target), col("prediction")).collect()
          p -> LocalSeries.score(pred.map(_.getDouble(0)), pred.map(_.getDouble(1)))
        }.toOption
      }
    }
    val pairScores =
      try scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures), scala.concurrent.duration.Duration.Inf)
        .flatten
      finally pool.shutdown()
    val scored = pairScores.groupBy(_._1).toSeq
      .filter(_._2.size == folds.size) // full fold coverage only
      .map { case (p, xs) =>
        (p, xs.map(_._2._1), xs.map(_._2._2)) // per-fold (rmse, norm) lists
      }
    require(scored.nonEmpty, "every search candidate failed to fit")
    withRn.unpersist(); sup.unpersist()
    val (bestP, bestRmse, bestNorm) = scored.minBy { case (p, rs, _) =>
      (rs.sum / rs.length, p.maxDepth, p.maxIter, p.stepSize) // deterministic tie-break
    }
    val best = new GbtModel(2, bestP.maxIter, bestP.maxDepth, bestP.stepSize)
    // cv=0 => zero folds: the winner's CV score is already in hand, so
    // the refit only trains the final model (+ residual sigma/tail state)
    best.fit(df, tsSchema, 0, h)
    SearchResult(best, bestP, bestRmse, bestNorm)
  }
}
