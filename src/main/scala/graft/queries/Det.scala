package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers shared by every oracle-checked query.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * oracle SQL on the same tables. Floating-point aggregates computed in a
  * different order differ in the last ulps, and Spark's `round` (BigDecimal
  * HALF_UP) does not bit-match DuckDB's libm round. So both sides round
  * through the SAME IEEE formula — floor(x·10^d + 0.5)/10^d — which is
  * bit-deterministic given inputs that agree to well above 10^-d, and both
  * sides stringify timestamps instead of relying on physical encodings. */
object Det {

  /** Deterministic round to d decimals (use the same formula in SQL). */
  def dround(c: Column, d: Int): Column = {
    val p = math.pow(10, d)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** SQL text twin of [[dround]]. */
  def droundSql(e: String, d: Int): String = {
    val p = math.pow(10, d).toLong
    s"floor(($e)*$p.0 + 0.5)/$p.0"
  }

  /** Exact money-sum: deterministic per-row round to 2 decimals (so both
    * engines feed identical values into the cast — a raw double→decimal
    * cast disagrees between rounding modes at .005 boundaries), then
    * accumulate in decimal(18,2) (order-independent), then one
    * deterministic conversion back to double. */
  def moneySum(c: Column): Column =
    sum(dround(c, 2).cast("decimal(18,2)")).cast("double")

  /** SQL twin of [[moneySum]]. */
  def moneySumSql(e: String): String =
    s"CAST(sum(CAST(${droundSql(e, 2)} AS DECIMAL(18,2))) AS DOUBLE)"

  /** Timestamp → canonical string (`yyyy-MM-dd HH:mm:ss`), sidestepping
    * µs-vs-ns physical encodings. SQL twin: strftime(ts, '%Y-%m-%d %H:%M:%S'). */
  def tsStr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  val tsStrSqlFmt = "%Y-%m-%d %H:%M:%S"
  def tsStrSql(e: String): String = s"strftime($e, '$tsStrSqlFmt')"
}
