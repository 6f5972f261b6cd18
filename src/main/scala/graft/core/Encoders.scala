package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Encoder / scaler operators (SURVEY §2.9 E1–E4). */
object Encoders {

  /** E1 — label-encoding dictionary: dense integer codes over the sorted
    * distinct values (sklearn `LabelEncoder` semantics, which
    * `My_LabelEncoder` extends — `utils/my_encoders.py:11-105`); null maps
    * to -1 like the reference's NaN rule (`my_encoders.py:62-66`).
    *
    * Returns the (value, code) dictionary. The ranking window runs on the
    * DISTINCT set — bounded by the column's cardinality, not the table
    * (the reference builds the same dict driver-side; a dictionary that
    * doesn't fit one task is not a categorical column). */
  def labelDictionary(df: DataFrame, colName: String): DataFrame = {
    val distinct = df.select(col(colName)).na.drop().distinct()
    val w = Window.orderBy(col(colName))
    distinct.withColumn("code", (row_number().over(w) - 1).cast("int"))
  }

  /** E1 — apply label encoding: broadcast-join the dictionary; unseen
    * values (at transform time) get code = maxCode + rank among the
    * unseen values — the reference's grow-on-unseen rule
    * (`my_encoders.py:74-78`) made deterministic; nulls get -1. The
    * unseen-dictionary build is one distinct + anti-join (bounded by the
    * column's cardinality, like the dictionary itself). */
  def labelEncode(df: DataFrame, colName: String, dict: DataFrame,
                  outCol: String): DataFrame = {
    val d = dict.withColumnRenamed(dict.columns.head, colName)
      .withColumnRenamed("code", "__dict_code")
    val maxCode = d.agg(max(col("__dict_code"))).head() match {
      case r if r.isNullAt(0) => -1
      case r => r.getInt(0)
    }
    val unseen = df.select(col(colName)).na.drop().distinct()
      .join(d.select(col(colName)), Seq(colName), "left_anti")
      .withColumn("__dict_code",
        (row_number().over(Window.orderBy(col(colName))) + maxCode).cast("int"))
    val full = d.select(col(colName), col("__dict_code")).unionByName(unseen)
    df.join(broadcast(full), Seq(colName), "left")
      .withColumn(outCol,
        when(col(colName).isNull, lit(-1)).otherwise(col("__dict_code")))
      .drop("__dict_code")
  }

  /** E4 — the reference's three scaler choices
    * (`ml_models.py:82-91,488-492`) as per-series window columns:
    * standard ((x−μ)/σ), min-max ((x−min)/(max−min)), max-abs (x/max|x|).
    * One partitioned window, no collect — scales across series. */
  def scaled(df: DataFrame, valueCol: String,
             seriesCols: Seq[String] = Nil): DataFrame = {
    val w = if (seriesCols.isEmpty) Window.partitionBy()
            else Window.partitionBy(seriesCols.map(col): _*)
    val v = col(valueCol)
    df.withColumn(s"${valueCol}_std",
        (v - avg(v).over(w)) / stddev_samp(v).over(w))
      .withColumn(s"${valueCol}_minmax",
        (v - min(v).over(w)) / (max(v).over(w) - min(v).over(w)))
      .withColumn(s"${valueCol}_maxabs", v / max(abs(v)).over(w))
  }
}
