package graft.infer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Semantic column classification (`classify_columns`,
  * `models/build_ml.py:936-1125`) — buckets every column into one of the
  * reference's 10 classes using the same cardinality/null/length
  * heuristics, computed in ONE multi-aggregate pass over the table
  * (the reference does many pandas passes; here Catalyst collapses all
  * per-column aggregates into a single scan + partial agg, so the cost at
  * 100 TB is one read). */
object ColumnClassifier {

  /** Reference thresholds (`build_ml.py:952-953, 959-960, 989-992`). */
  val CatLimit           = 35   // distinct ≤ 35 ⇒ categorical
  val FloatCatLimit      = 15   // float distinct ≤ 15 ⇒ categorical
  val NullDropFrac       = 0.90 // null fraction ≥ 0.9 ⇒ delete
  val NlpMeanLength      = 30.0 // mean string length ≥ 30 ⇒ NLP
  val IdYearRange        = (1900, 2050) // all-unique ints in range ⇒ date candidates (`build_ml.py:1029-1037`)

  sealed trait ColClass { def name: String }
  case object Continuous     extends ColClass { val name = "continuous" }
  case object IntVar         extends ColClass { val name = "int" }
  case object CatVar         extends ColClass { val name = "categorical" }
  case object StringBool     extends ColClass { val name = "string_bool" }
  case object NumBool        extends ColClass { val name = "num_bool" }
  case object DiscreteString extends ColClass { val name = "discrete_string" }
  case object Nlp            extends ColClass { val name = "nlp" }
  case object DateVar        extends ColClass { val name = "date" }
  case object IdVar          extends ColClass { val name = "id" }
  case object Delete         extends ColClass { val name = "delete" }

  case class ColProfile(name: String, dataType: DataType, nRows: Long,
                        nDistinct: Long, nullFrac: Double, meanLen: Double)

  /** One aggregate pass: per column — distinct count, null fraction, and
    * (for strings) mean length. */
  def profile(df: DataFrame): Seq[ColProfile] = {
    val fields = df.schema.fields.toSeq
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        countDistinct(c).as(s"${f.name}__nd"),
        (count(when(c.isNull, 1)) / count(lit(1))).cast(DoubleType).as(s"${f.name}__nf"),
        (f.dataType match {
          case StringType => coalesce(avg(length(c)), lit(0.0))
          case _          => lit(0.0)
        }).as(s"${f.name}__len")
      )
    } :+ count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("__n")
    fields.map { f =>
      ColProfile(f.name, f.dataType, n,
        row.getAs[Long](s"${f.name}__nd"),
        row.getAs[Double](s"${f.name}__nf"),
        row.getAs[Double](s"${f.name}__len"))
    }
  }

  /** The reference's rule table (`build_ml.py:936-1125`), applied to a
    * profile. Rules (in precedence order):
    *  1. nullFrac ≥ 0.9 or ≤1 distinct          → delete
    *  2. timestamp/date dtype                    → date
    *  3. boolean dtype or 2-distinct numeric     → num_bool
    *  4. 2-distinct string                       → string_bool
    *  5. string: mean length ≥ 30                → nlp
    *     string: distinct ≤ 35                   → categorical
    *     string: otherwise                       → discrete_string
    *  6. integral: all-unique                    → id
    *     integral: distinct ≤ 35                 → categorical (factor)
    *     integral: otherwise                     → int
    *  7. float: distinct ≤ 15                    → categorical
    *     float: otherwise                        → continuous
    */
  def classify(p: ColProfile): ColClass = p match {
    case _ if p.nullFrac >= NullDropFrac || p.nDistinct <= 1 => Delete
    case _ if p.dataType == TimestampType || p.dataType == DateType => DateVar
    case _ if p.dataType == BooleanType => NumBool
    case _ if p.nDistinct == 2 && p.dataType.isInstanceOf[NumericType] => NumBool
    case _ if p.nDistinct == 2 && p.dataType == StringType => StringBool
    case _ if p.dataType == StringType =>
      if (p.meanLen >= NlpMeanLength) Nlp
      else if (p.nDistinct <= CatLimit) CatVar
      else DiscreteString
    case _ if Seq(ByteType, ShortType, IntegerType, LongType).contains(p.dataType) =>
      if (p.nDistinct == p.nRows) IdVar
      else if (p.nDistinct <= CatLimit) CatVar
      else IntVar
    case _ =>
      if (p.nDistinct <= FloatCatLimit) CatVar else Continuous
  }

  /** Full classification as a small DataFrame (column, class, stats) —
    * the engine's `classify_columns` equivalent, ✔dt-checkable. */
  def classifyTable(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    profile(df).map { p =>
      // same IEEE rounding formula as graft.queries.Det.dround
      (p.name, classify(p).name, p.nDistinct,
       math.floor(p.nullFrac * 1e6 + 0.5) / 1e6)
    }.toDF("column", "class", "n_distinct", "null_frac")
  }
}
