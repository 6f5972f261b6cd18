package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.core.CleanOps
import graft.infer.{ColumnClassifier, ProblemType}
import graft.queries.Det._

/** Oracle-checked queries for the inference layer (SURVEY §1.2, §2.2 P3/P8,
  * §2.9 E5). The oracle SQL is GENERATED from the same column metadata the
  * Spark side uses, so the rule tables cannot drift apart. */
object InferQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Column kinds for oracle generation (duck-typed from FIXTURES.md). */
  private sealed trait Kind
  private case object KInt extends Kind
  private case object KFloat extends Kind
  private case object KString extends Kind
  private case object KTs extends Kind

  private val customerCols: Seq[(String, Kind)] = Seq(
    "c_custkey" -> KInt, "c_name" -> KString, "c_nationkey" -> KInt,
    "c_acctbal" -> KFloat, "c_mktsegment" -> KString)

  private val lineitemNumCols: Seq[(String, Kind)] = Seq(
    "l_orderkey" -> KInt, "l_partkey" -> KInt, "l_suppkey" -> KInt,
    "l_linenumber" -> KInt, "l_quantity" -> KFloat,
    "l_extendedprice" -> KFloat, "l_discount" -> KFloat, "l_tax" -> KFloat)

  // ---- classify_columns decision table -------------------------------

  private def classifyCustomer: Q = (s, d) =>
    ColumnClassifier.classifyTable(Tables.customer(s, d))
      .withColumnRenamed("column", "col_name")

  /** SQL twin of [[ColumnClassifier.classify]] for one column. */
  private def classifySqlFor(c: String, kind: Kind, table: String): String = {
    val nd = s"count(DISTINCT $c)"
    val nf = s"(CAST(count(*) FILTER (WHERE $c IS NULL) AS DOUBLE)/count(*))"
    val rules = kind match {
      case KTs => s"WHEN TRUE THEN 'date'"
      case KString =>
        s"""WHEN $nd = 2 THEN 'string_bool'
           |WHEN avg(CAST(length($c) AS DOUBLE)) >= ${ColumnClassifier.NlpMeanLength} THEN 'nlp'
           |WHEN $nd <= ${ColumnClassifier.CatLimit} THEN 'categorical'
           |WHEN TRUE THEN 'discrete_string'""".stripMargin
      case KInt =>
        s"""WHEN $nd = 2 THEN 'num_bool'
           |WHEN $nd = count(*) THEN 'id'
           |WHEN $nd <= ${ColumnClassifier.CatLimit} THEN 'categorical'
           |WHEN TRUE THEN 'int'""".stripMargin
      case KFloat =>
        s"""WHEN $nd = 2 THEN 'num_bool'
           |WHEN $nd <= ${ColumnClassifier.FloatCatLimit} THEN 'categorical'
           |WHEN TRUE THEN 'continuous'""".stripMargin
    }
    s"""SELECT '$c' AS col_name,
       | CASE WHEN $nf >= ${ColumnClassifier.NullDropFrac} OR $nd <= 1 THEN 'delete'
       | $rules END AS class,
       | CAST($nd AS BIGINT) AS n_distinct,
       | ${droundSql(nf, 6)} AS null_frac
       |FROM $table""".stripMargin
  }

  private val classifyCustomerSql: String =
    customerCols.map { case (c, k) => classifySqlFor(c, k, "customer") }
      .mkString("\nUNION ALL\n")

  // ---- P8 downcast decision table --------------------------------------

  private def downcastLineitem: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    val li = Tables.lineitem(s, d).select(lineitemNumCols.map(c => col(c._1)): _*)
    val decision = CleanOps.downcastDecision(li)
    // re-derive min/max (small second agg; decision map has only types)
    val aggs = lineitemNumCols.flatMap { case (c, _) =>
      Seq(min(col(c).cast("double")).as(s"${c}__min"),
          max(col(c).cast("double")).as(s"${c}__max")) }
    val row = li.agg(aggs.head, aggs.tail: _*).head()
    lineitemNumCols.map { case (c, _) =>
      (c, row.getAs[Double](s"${c}__min"), row.getAs[Double](s"${c}__max"),
       decision(c).simpleString)
    }.toDF("col_name", "min_value", "max_value", "chosen")
  }

  private def downcastSqlFor(c: String, kind: Kind): String = {
    val lo = s"min(CAST($c AS DOUBLE))"
    val hi = s"max(CAST($c AS DOUBLE))"
    val chosen = kind match {
      case KInt =>
        s"""CASE WHEN $lo >= -128 AND $hi <= 127 THEN 'tinyint'
           |WHEN $lo >= -32768 AND $hi <= 32767 THEN 'smallint'
           |WHEN $lo >= -2147483648 AND $hi <= 2147483647 THEN 'int'
           |ELSE 'bigint' END""".stripMargin
      case _ => s"CASE WHEN TRUE THEN 'float' END" // doubles fit float range in this schema
    }
    s"SELECT '$c' AS col_name, $lo AS min_value, $hi AS max_value, $chosen AS chosen FROM lineitem"
  }

  private val downcastLineitemSql: String =
    lineitemNumCols.map { case (c, k) => downcastSqlFor(c, k) }
      .mkString("\nUNION ALL\n")

  // ---- P3 low-information drop decision ----------------------------------

  /** Verifies dropLowInfoColumns semantics: synthesize a constant and an
    * all-null column, return the surviving column list. */
  private def p3LowInfo: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    val df = Tables.customer(s, d)
      .withColumn("const_col", lit(1))
      .withColumn("null_col", lit(null).cast("double"))
    val kept = CleanOps.dropLowInfoColumns(df).columns
    kept.sorted.toSeq.toDF("kept_col")
  }

  private val p3LowInfoSql: String =
    customerCols.map(_._1).sorted
      .map(c => s"SELECT '$c' AS kept_col")
      .mkString("\nUNION ALL\n")

  // ---- E5 problem type -----------------------------------------------------

  private def e5ProblemType: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.DurationInt
    import scala.concurrent.ExecutionContext.Implicits.global
    // three independent countDistinct jobs on three tables — submit them
    // concurrently (one SparkSession schedules many jobs at once); the
    // wall-clock is the slowest table's scan, not the sum
    val futs = Seq(
      ("label_int",   Future(ProblemType.analyze(Tables.embeddings(s, d), "label"))),
      ("value_float", Future(ProblemType.analyze(Tables.events(s, d), "value"))),
      ("status_str",  Future(ProblemType.analyze(Tables.orders(s, d), "o_orderstatus")))
    )
    futs.map { case (n, f) => (n, Await.result(f, 300.seconds)) }
      .toDF("target", "problem_type")
  }

  private val e5Sql: String =
    s"""SELECT 'label_int' AS target,
       | CASE WHEN count(DISTINCT label) <= 2 THEN 'Binary_Classification'
       |      WHEN count(DISTINCT label) <= ${ProblemType.IntMultiClassLimit} THEN 'Multi_Classification'
       |      ELSE 'Regression' END AS problem_type FROM embeddings
       |UNION ALL
       |SELECT 'value_float' AS target,
       | CASE WHEN count(DISTINCT value) <= 2 THEN 'Binary_Classification'
       |      WHEN count(DISTINCT value) <= ${ProblemType.FloatMultiClassLimit} THEN 'Multi_Classification'
       |      ELSE 'Regression' END AS problem_type FROM events
       |UNION ALL
       |SELECT 'status_str' AS target,
       | CASE WHEN count(DISTINCT o_orderstatus) <= 2 THEN 'Binary_Classification'
       |      ELSE 'Multi_Classification' END AS problem_type FROM orders""".stripMargin

  // =====================  registry  =====================

  val queries: Map[String, Q] = Map(
    "i1_classify"  -> classifyCustomer,
    "p8_downcast"  -> downcastLineitem,
    "p3_lowinfo"   -> p3LowInfo,
    "e5_problem_type" -> e5ProblemType
  )

  val oracle: Map[String, String] = Map(
    "i1_classify"  -> classifyCustomerSql,
    "p8_downcast"  -> downcastLineitemSql,
    "p3_lowinfo"   -> p3LowInfoSql,
    "e5_problem_type" -> e5Sql
  )
}
