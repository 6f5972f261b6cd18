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
  * `logY` is the reference's `log_y` knob (`ml_models.py:117,136-138,
  * 186-187`): the LABEL is log-transformed before the fit (zero targets
  * remapped to 1e-15 first, exactly the reference's guard) and every
  * prediction is exp'd back, so skewed positive targets train on a
  * symmetric scale while lags, scores, and forecasts all stay in
  * original units. Rows whose target is negative produce a null log
  * label and are dropped from the supervised frame (np.log would emit
  * NaN there — dropping is the honest Spark form).
  *
  * Spark-native choices: MLlib `GBTRegressor` (distributed training — the
  * reference's dask-xgboost path collapses into this, SURVEY §2.10 M8);
  * feature building is window/codegen work; the recursive loop runs on
  * the driver against the LOCAL `GBTRegressionModel.predict(Vector)` —
  * h is small, no per-step Spark job. */
class GbtModel(lags: Int = 2, maxIter: Int = 50, maxDepth: Int = 2,
               stepSize: Double = 0.1, logY: Boolean = false,
               nlpVocabSize: Int = 50, z: Double = 1.96) extends ModelBuild {
  val name = "ML"

  private var model: GBTRegressionModel = _
  private var schema: TsSchema = _
  private var tailY: Array[Double] = _      // last `lags` observations
  private var lastExog: Array[Double] = _
  private var lastTsMs: Long = _
  private var intervalMs: Long = _
  private var residSigma: Double = _
  // NLP exog columns (ColumnClassifier mean-length rule) become
  // bag-of-words vectors under a frozen deterministic vocabulary instead
  // of being cast to null and dropped — `ml_models.py:22,470`
  private var nlpCols: Seq[String] = Nil
  private var nlpVocabs: Map[String, Array[String]] = Map.empty
  private var lastBow: Map[String, Array[Double]] = Map.empty
  private def numExog: Seq[String] = {
    val nlp = nlpCols.toSet
    schema.exog.filterNot(nlp)
  }

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
      Seq("f_month", "f_quarter", "f_dow", "f_dom") ++ numExog

  /** Supervised frame: lags over the ordered window + calendar + exog,
    * plus the fit label `y_fit` — the raw target, or its log under
    * `logY` (zeros → 1e-15 first; negatives go null and are dropped). */
  private def supervised(df: DataFrame): DataFrame = {
    val lagged = TS.addLags(df, Seq(schema.target), lags, schema.tsCol)
    val y = col(schema.target).cast("double")
    val label = if (logY) log(when(y === 0.0, lit(1e-15)).otherwise(y)) else y
    lagged.select((Seq(col(schema.tsCol), y.as(schema.target), label.as("y_fit")) ++
      (1 to lags).map(i => col(s"${schema.target}_lag$i").cast("double")) ++
      calendarCols(schema.tsCol) ++
      numExog.map(c => col(c).cast("double").as(c)) ++
      nlpCols.map(col)): _*)
      .na.drop()
  }

  /** exp-back-transform for anything the model predicts (identity unless
    * `logY`) — reference `np.exp(model.predict(...))`, `ml_models.py:187`. */
  private def back(p: Double): Double = if (logY) math.exp(p) else p

  private def assemble(df: DataFrame): DataFrame = {
    val withVecs = nlpCols.foldLeft(df) { (d, c) =>
      NlpFeatures.withBow(d, c, nlpVocabs(c), s"${c}_bow")
    }
    new VectorAssembler()
      .setInputCols((featureNames ++ nlpCols.map(c => s"${c}_bow")).toArray)
      .setOutputCol("features").transform(withVecs)
  }

  private def newGbt = new GBTRegressor()
    .setLabelCol("y_fit").setFeaturesCol("features")
    .setMaxIter(maxIter).setMaxDepth(maxDepth).setStepSize(stepSize).setSeed(42)

  /** BOUNDED-SERIES CONTRACT (same warning as
    * `TimeSeriesOps.seriesWindow`): the unpartitioned `Window.partitionBy()`
    * below funnels the whole frame through ONE task — correct only because
    * fit() is the single-series path, bounded by series length (SURVEY §4).
    * For many series at scale use `scale.PerSeriesForecast` /
    * `scale.PerSeriesArima`, which run one bounded task per series. */
  def fit(df: DataFrame, tsSchema: TsSchema, cv: Int, h: Int): CvScores = {
    schema = tsSchema
    nlpCols = NlpFeatures.detect(df, schema.exog)
    nlpVocabs = nlpCols.map(c =>
      c -> NlpFeatures.vocabulary(df, c, nlpVocabSize)).toMap
    val sup = assemble(supervised(df)).cache()
    val w = Window.partitionBy().orderBy(col(schema.tsCol))
    val withRn = sup.withColumn("rn", row_number().over(w)).cache()
    val n = withRn.count()
    val scores = LocalSeries.foldBounds(n.toInt, cv, h).map { case (trainEnd, testEnd) =>
      val m = newGbt.fit(withRn.filter(col("rn") <= trainEnd))
      val test = withRn.filter(col("rn") > trainEnd && col("rn") <= testEnd)
      // scored in ORIGINAL units (predictions exp'd back under logY) so
      // fold RMSEs stay comparable across families and log settings
      val pred = m.transform(test)
        .select(col(schema.target), col("prediction")).collect()
      LocalSeries.score(pred.map(_.getDouble(0)), pred.map(r => back(r.getDouble(1))))
    }
    model = newGbt.fit(withRn)
    // residual σ for the CI columns (reference emits NaN CIs for ML,
    // `build_ml.py:674-683`; we do better with the in-sample residual std)
    val predCol = if (logY) exp(col("prediction")) else col("prediction")
    val res = model.transform(withRn)
      .select(pow(col(schema.target) - predCol, 2)).agg(avg("*")).head().getDouble(0)
    residSigma = math.sqrt(res)

    val localTail = LocalSeries.collect(df, schema.copy(exog = numExog))
    tailY = localTail.y.takeRight(lags)
    lastExog = if (numExog.nonEmpty) localTail.exog.last else Array.empty
    // future text is unknown — the recursive loop reuses the LAST observed
    // document's bag-of-words (the exact analogue of lastExog)
    lastBow = if (nlpCols.isEmpty) Map.empty else {
      val lastRow = df.orderBy(col(schema.tsCol).desc).limit(1)
        .select(nlpCols.map(col): _*).head()
      nlpCols.zipWithIndex.map { case (c, i) =>
        c -> NlpFeatures.bowLocal(Option(lastRow.getString(i)).getOrElse(""),
                                  nlpVocabs(c))
      }.toMap
    }
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
      case Some(f) if numExog.nonEmpty => FutureExog.collect(f, schema.tsCol, numExog)
      case _ => Array.empty
    }
    val bowTail: Array[Double] = nlpCols.toArray.flatMap(lastBow(_))
    val buf = scala.collection.mutable.ArrayBuffer(tailY.toIndexedSeq: _*)
    val out = new Array[Double](h)
    for (i <- 0 until h) {
      val ts = ForecastFrame.nextTs(lastTsMs, intervalMs, i + 1)
      val lagVals = (1 to lags).map(l => buf(buf.length - l)).toArray
      val exog = if (i < futureExog.length) futureExog(i) else lastExog
      val feats = lagVals ++ calendarLocal(ts) ++ exog ++ bowTail
      val p = back(model.predict(Vectors.dense(feats)))
      out(i) = p
      buf += p
    }
    ForecastFrame.build(spark, lastTsMs, intervalMs, out, residSigma, z)
  }

  /** Top-k feature importances of the fitted ensemble — the reference
    * prints the top-10 after the full-data fit (`ml_models.py:160-177`,
    * `feature_importances_` / `get_score(importance_type='gain')`).
    * MLlib's normalized split-gain importances, labeled with the REAL
    * feature names (lags, calendar, exog, and each bag-of-words term as
    * `<col>_bow_<term>`), ordered desc with a name tie-break. */
  def featureImportances(spark: SparkSession, k: Int = 10): DataFrame = {
    import spark.implicits._
    val names = featureNames ++
      nlpCols.flatMap(c => nlpVocabs(c).map(t => s"${c}_bow_$t"))
    val imp = model.featureImportances.toArray
    require(imp.length == names.length,
      s"importance vector ${imp.length} != feature names ${names.length}")
    names.zip(imp).sortBy { case (nm, v) => (-v, nm) }.take(k)
      .toSeq.toDF("feature", "importance")
  }

  /** MLlib writer for the tree ensemble + params-JSON for the bounded
    * local state (lag tail, calendar anchor, NLP vocabularies). */
  def save(dir: String): Unit = {
    import org.json4s.JsonDSL._
    model.write.overwrite().save(s"$dir/gbt")
    Persist.writeJson(dir,
      ("type" -> "ml") ~ ("lags" -> lags) ~ ("maxIter" -> maxIter) ~
      ("maxDepth" -> maxDepth) ~ ("stepSize" -> stepSize) ~ ("logY" -> logY) ~
      ("nlpVocabSize" -> nlpVocabSize) ~ ("z" -> z) ~
      ("schema" -> Persist.schemaJson(schema)) ~
      ("tailY" -> tailY.toList) ~ ("lastExog" -> lastExog.toList) ~
      ("lastTsMs" -> lastTsMs) ~ ("intervalMs" -> intervalMs) ~
      ("residSigma" -> residSigma) ~ ("nlpCols" -> nlpCols.toList) ~
      ("nlpVocabs" -> nlpVocabs.map { case (k, v) => k -> v.toList }) ~
      ("lastBow" -> lastBow.map { case (k, v) => k -> v.toList }))
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

  /** Persists the WINNER — reloads as a plain GbtModel. */
  def save(dir: String): Unit = inner.save(dir)
}

object GbtModel {
  import Persist.formats

  def load(dir: String): GbtModel = {
    val j = Persist.readJson(dir)
    val m = new GbtModel((j \ "lags").extract[Int], (j \ "maxIter").extract[Int],
      (j \ "maxDepth").extract[Int], (j \ "stepSize").extract[Double],
      (j \ "logY").extract[Boolean], (j \ "nlpVocabSize").extract[Int],
      (j \ "z").extract[Double])
    m.model = GBTRegressionModel.load(s"$dir/gbt")
    m.schema = Persist.schemaFrom(j \ "schema")
    m.tailY = (j \ "tailY").extract[Array[Double]]
    m.lastExog = (j \ "lastExog").extract[Array[Double]]
    m.lastTsMs = (j \ "lastTsMs").extract[Long]
    m.intervalMs = (j \ "intervalMs").extract[Long]
    m.residSigma = (j \ "residSigma").extract[Double]
    m.nlpCols = (j \ "nlpCols").extract[Seq[String]]
    m.nlpVocabs = (j \ "nlpVocabs").extract[Map[String, Array[String]]]
    m.lastBow = (j \ "lastBow").extract[Map[String, Array[Double]]]
    m
  }

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
    probe.nlpCols = NlpFeatures.detect(df, tsSchema.exog)
    probe.nlpVocabs = probe.nlpCols.map(c =>
      c -> NlpFeatures.vocabulary(df, c, 50)).toMap
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
          // probe has logY=false, so y_fit here is the raw target
          val reg = new GBTRegressor()
            .setLabelCol("y_fit").setFeaturesCol("features")
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
