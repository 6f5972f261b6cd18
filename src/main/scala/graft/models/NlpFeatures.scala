package graft.models

import org.apache.spark.ml.feature.CountVectorizerModel
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bag-of-words features for NLP-classified predictor columns — the
  * Spark-native form of the reference ML path's `CountVectorizer` over
  * detected NLP variables (`ml_models.py:22,470`: `data_transform`
  * instantiates a `CountVectorizer` alongside the cat/num encoders so a
  * long-text column becomes term-count features before XGBoost).
  *
  * Tokenization mirrors sklearn's default analyzer: lowercase, then every
  * run of ≥2 word characters is a token (`token_pattern=r"\w\w+"`). The
  * vocabulary is NOT MLlib's frequency-ordered `CountVectorizer.fit`
  * (ties there depend on partition order) — it is computed by an explicit
  * aggregate with a (count desc, token asc) tie-break, then frozen into a
  * [[CountVectorizerModel]], so the column order of the feature vector is
  * deterministic and engine-portable (hash-checked by `e6_bow`).
  *
  * 100-TB shape: the vocabulary is one token-count aggregation reduced by
  * `TakeOrdered(size)` (driver memory bounded by `size`, same contract as
  * `TextAnalysis.unigramLogProb`); transform is map-side — the frozen
  * vocabulary broadcasts with the model. */
object NlpFeatures {

  /** sklearn-default token pattern, shared with the DuckDB oracle. */
  val TokenPattern = "[a-z0-9_]{2,}"

  def tokens(c: Column): Column =
    regexp_extract_all(lower(c), lit(TokenPattern), lit(0))

  /** Deterministic top-`size` vocabulary over a text column. */
  def vocabulary(df: DataFrame, textCol: String, size: Int): Array[String] =
    df.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(size).collect().map(_.getString(0))

  /** Adds `outCol`: the term-count vector of `textCol` under the frozen
    * vocabulary (real `ml.feature.CountVectorizerModel` transform). */
  def withBow(df: DataFrame, textCol: String, vocab: Array[String],
              outCol: String): DataFrame = {
    val tokCol = s"__${outCol}_toks"
    val out = new CountVectorizerModel(vocab)
      .setInputCol(tokCol).setOutputCol(outCol)
      .transform(df.withColumn(tokCol, tokens(col(textCol))))
    out.drop(tokCol)
  }

  /** Driver-side twin of the transform for ONE document (the recursive
    * forecast loop scores single rows locally — future text is unknown,
    * so callers feed the last observed document through this). */
  def bowLocal(text: String, vocab: Array[String]): Array[Double] = {
    val counts = TokenPattern.r.findAllIn(text.toLowerCase).toSeq
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toDouble }
    vocab.map(t => counts.getOrElse(t, 0.0))
  }

  /** The NLP-classified subset of `exog` (string columns whose profile
    * crosses the reference's mean-length ≥ 30 rule —
    * `ColumnClassifier.Nlp`, `build_ml.py:989-992`). */
  def detect(df: DataFrame, exog: Seq[String]): Seq[String] = {
    import graft.infer.ColumnClassifier
    val stringExog = exog.filter(c =>
      df.schema(c).dataType == org.apache.spark.sql.types.StringType)
    if (stringExog.isEmpty) Nil
    else {
      val profiles = ColumnClassifier.profile(df.select(stringExog.map(col): _*))
      profiles.filter(p => ColumnClassifier.classify(p) == ColumnClassifier.Nlp)
        .map(_.name)
    }
  }
}
