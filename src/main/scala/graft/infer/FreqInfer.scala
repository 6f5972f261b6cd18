package graft.infer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** T8/T9 — frequency inference + seasonal-period imputation.
  *
  * The reference infers the series interval from the delta of the first two
  * timestamps (`auto_ts/__init__.py:399-453`) and maps the alias to a
  * seasonal period m (`auto_ts/__init__.py:489-510`, README.md:119-131).
  * We keep the same bucket boundaries but compute the delta with an
  * aggregate over ALL consecutive deltas (median is far more robust on
  * irregular data and costs one window + one percentile_approx — the
  * 2-row probe is also provided for strict parity). */
object FreqInfer {

  /** Frequency aliases, mirroring the reference's vocabulary. */
  sealed trait Freq { def alias: String; def seasonalPeriod: Int; def sparkInterval: String }
  case object Minutely  extends Freq { val alias = "MIN"; val seasonalPeriod = 60; val sparkInterval = "1 minute" }
  case object Hourly    extends Freq { val alias = "H";   val seasonalPeriod = 24; val sparkInterval = "1 hour" }
  case object Daily     extends Freq { val alias = "D";   val seasonalPeriod = 30; val sparkInterval = "1 day" }
  case object Weekly    extends Freq { val alias = "W";   val seasonalPeriod = 52; val sparkInterval = "1 week" }
  case object Monthly   extends Freq { val alias = "M";   val seasonalPeriod = 12; val sparkInterval = "1 month" }
  case object Quarterly extends Freq { val alias = "Q";   val seasonalPeriod = 4;  val sparkInterval = "3 month" }
  case object SemiAnnual extends Freq { val alias = "S";  val seasonalPeriod = 2;  val sparkInterval = "6 month" }
  case object Annual    extends Freq { val alias = "Y";   val seasonalPeriod = 1;  val sparkInterval = "1 year" }

  /** Bucket a delta (in seconds) into a frequency alias. Boundaries mirror
    * `auto_ts/__init__.py:412-445`: <1h minutely, <1d hourly, <7d daily,
    * 7–27d weekly, 28–88d monthly, 89–177d quarterly, 178–359d semiannual,
    * ≥360d annual. */
  def bucket(deltaSeconds: Double): Freq = {
    val d = deltaSeconds / 86400.0
    if (deltaSeconds < 3600) Minutely
    else if (deltaSeconds < 86400) Hourly
    else if (d < 7) Daily
    else if (d < 28) Weekly
    else if (d < 89) Monthly
    else if (d < 178) Quarterly
    else if (d < 360) SemiAnnual
    else Annual
  }

  /** Strict reference parity: delta of the first two ordered timestamps
    * (`auto_ts/__init__.py:402`). */
  def inferFromFirstTwo(df: DataFrame, tsCol: String): Freq = {
    val two = df.select(col(tsCol).cast("double"))
      .orderBy(col(tsCol)).limit(2).collect()
    require(two.length == 2, s"need >=2 rows to infer frequency")
    bucket(two(1).getDouble(0) - two(0).getDouble(0))
  }

  /** Robust variant: median of all consecutive deltas (one aggregate job,
    * scales to many series with groupBy(seriesId)). */
  def inferMedianDelta(df: DataFrame, tsCol: String): Freq = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy().orderBy(col(tsCol))
    val deltas = df.select(
      (col(tsCol).cast("double") - lag(col(tsCol).cast("double"), 1).over(w)).as("d"))
      .na.drop()
    val med = deltas.agg(percentile_approx(col("d"), lit(0.5), lit(10000)).as("m"))
      .head().getDouble(0)
    bucket(med)
  }
}
