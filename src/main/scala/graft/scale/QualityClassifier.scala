package graft.scale

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.models.NlpFeatures

/** Learned linear quality/domain classifier — the fastText-class
  * component of a CCNet-style curation stack (CCNet pairs a unigram LM
  * perplexity score, here `TextAnalysis.unigramLogProb`, with a linear
  * classifier over bag-of-words features; fastText's supervised model
  * (Joulin et al. 2017) IS a linear classifier over averaged BoW). The
  * Spark-native twin is MLlib multinomial LogisticRegression over the
  * frozen deterministic vocabulary from [[graft.models.NlpFeatures]] —
  * distributed LBFGS fit, map-side scoring.
  *
  * 100-TB shape: the vocabulary is one TakeOrdered(V)-bounded aggregate;
  * the label index is one distinct over the LABEL column (cardinality =
  * classes, a bounded collect by contract); the fit is MLlib's
  * treeAggregate gradient loop (no driver data); scoring broadcasts the
  * (V × classes) coefficient matrix and never shuffles. */
object QualityClassifier {

  case class QcModel(vocab: Array[String], labels: Array[String],
                     lr: LogisticRegressionModel)

  /** Fit on a labeled corpus: `labelCol` is any small-cardinality string
    * label (quality tier, source domain, language). Deterministic
    * vocabulary and label ordering, so the feature/label geometry is
    * reproducible across runs. */
  def fit(df: DataFrame, textCol: String, labelCol: String,
          vocabSize: Int = 1000, maxIter: Int = 50,
          regParam: Double = 1e-3): QcModel = {
    val vocab = NlpFeatures.vocabulary(df, textCol, vocabSize)
    val labels = df.select(col(labelCol).cast("string").as("l"))
      .na.drop().distinct().collect().map(_.getString(0)).sorted
    require(labels.length >= 2, s"need >=2 label classes, got ${labels.length}")
    val idx = labels.zipWithIndex.toMap
    val toIdx = udf((s: String) => idx(s).toDouble)
    val feat = NlpFeatures.withBow(df, textCol, vocab, "__bow")
      .withColumn("__label", toIdx(col(labelCol).cast("string")))
    val lr = new LogisticRegression()
      .setFeaturesCol("__bow").setLabelCol("__label")
      .setFamily("multinomial")
      .setMaxIter(maxIter).setRegParam(regParam)
    QcModel(vocab, labels, lr.fit(feat))
  }

  /** Score a corpus: adds the predicted label and its probability.
    * Map-side only — the frozen vocabulary and coefficient matrix ride
    * in the broadcast model. */
  def score(df: DataFrame, m: QcModel, textCol: String,
            idCol: String): DataFrame = {
    val labels = m.labels
    val toLabel = udf((i: Double) => labels(i.toInt))
    val pmax = udf((v: org.apache.spark.ml.linalg.Vector) => v.toArray.max)
    m.lr.transform(NlpFeatures.withBow(df, textCol, m.vocab, "__bow"))
      .select(col(idCol), toLabel(col("prediction")).as("pred_label"),
              pmax(col("probability")).as("p_max"))
  }
}
