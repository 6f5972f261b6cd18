package graft.infer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** E5 — problem-type analysis (`analyze_problem_type`,
  * `models/ml_models.py:570-616`): Regression vs Binary vs Multi-class
  * from the target's dtype and cardinality. Thresholds mirror the
  * reference: ≤2 distinct ⇒ binary; int ≤30 / float ≤15 distinct ⇒
  * multi-class; else regression. */
object ProblemType {
  val IntMultiClassLimit   = 30
  val FloatMultiClassLimit = 15

  def analyze(df: DataFrame, target: String): String = {
    val dt = df.schema(target).dataType
    val nd = df.select(countDistinct(col(target))).head().getLong(0)
    decide(dt, nd)
  }

  def decide(dt: DataType, nDistinct: Long): String = {
    val isInt   = Seq(ByteType, ShortType, IntegerType, LongType).contains(dt)
    val isFloat = dt == DoubleType || dt == FloatType
    if (nDistinct <= 2) "Binary_Classification"
    else if (isInt)   { if (nDistinct <= IntMultiClassLimit) "Multi_Classification" else "Regression" }
    else if (isFloat) { if (nDistinct <= FloatMultiClassLimit) "Multi_Classification" else "Regression" }
    else "Multi_Classification" // non-numeric >2 distinct (`ml_models.py:606-610`)
  }
}
