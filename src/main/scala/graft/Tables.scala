package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DecimalType, LongType, TimestampNTZType}

/** Test-table loader for the driver-generated star schema (TESTDATA.md).
  *
  * Every loader routes through [[normalizeSchema]]: the generator's
  * PHYSICAL encodings have drifted across rounds (r9 regenerated
  * events.ts as TIMESTAMP(NANOS), breaking 10 queries), so all tables
  * are normalized to one canonical LOGICAL schema at load, and
  * CoreOpsSpec's canonical-schema test fails the suite — not the
  * correctness run — if a future regeneration drifts further. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // nanos physical type is only readable as long under the legacy conf
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeSchema(spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Columns whose logical type is TIMESTAMP; a raw LongType here means
    * the generator emitted TIMESTAMP(NANOS) (readable only as nanos-long
    * under the legacy conf). */
  private val TemporalCols = Set("ts", "o_orderdate", "l_shipdate")

  /** Normalize one physical-encoding drift class per match arm:
    * nanos-long / NTZ / DATE temporals → TimestampType (session tz is
    * pinned UTC, so wall-clock casts preserve instants), DECIMAL money
    * columns → the canonical double. Plain projections only — safe for
    * streaming DataFrames too. */
  def normalizeSchema(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case TimestampNTZType =>
          acc.withColumn(f.name, col(f.name).cast("timestamp"))
        case LongType if TemporalCols(f.name) =>
          acc.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000")))
        case DateType if TemporalCols(f.name) =>
          acc.withColumn(f.name, col(f.name).cast("timestamp"))
        case _: DecimalType =>
          acc.withColumn(f.name, col(f.name).cast("double"))
        case _ => acc
      }
    }

  /** Back-compat alias used by the streaming readers (which read the
    * parquet directory directly and must apply the same projection). */
  def normalizeEventTs(df: DataFrame): DataFrame = normalizeSchema(df)

  /** Canonical logical schema per table, asserted by CoreOpsSpec. */
  val canonicalSchemas: Map[String, Map[String, String]] = Map(
    "region"   -> Map("r_regionkey" -> "int", "r_name" -> "string"),
    "nation"   -> Map("n_nationkey" -> "int", "n_name" -> "string",
                      "n_regionkey" -> "int"),
    "customer" -> Map("c_custkey" -> "bigint", "c_name" -> "string",
                      "c_nationkey" -> "int", "c_acctbal" -> "double",
                      "c_mktsegment" -> "string"),
    "supplier" -> Map("s_suppkey" -> "bigint", "s_name" -> "string",
                      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part"     -> Map("p_partkey" -> "bigint", "p_name" -> "string",
                      "p_brand" -> "string", "p_type" -> "string",
                      "p_size" -> "int", "p_retailprice" -> "double"),
    "orders"   -> Map("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
                      "o_orderstatus" -> "string", "o_totalprice" -> "double",
                      "o_orderdate" -> "timestamp", "o_orderpriority" -> "string"),
    "lineitem" -> Map("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
                      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
                      "l_quantity" -> "double", "l_extendedprice" -> "double",
                      "l_discount" -> "double", "l_tax" -> "double",
                      "l_returnflag" -> "string", "l_linestatus" -> "string",
                      "l_shipdate" -> "timestamp"),
    "events"   -> Map("event_id" -> "bigint", "ts" -> "timestamp",
                      "user_id" -> "bigint", "event_type" -> "string",
                      "value" -> "double", "props" -> "string"),
    "documents" -> Map("doc_id" -> "bigint", "text" -> "string",
                       "lang" -> "string", "source" -> "string",
                       "n_chars" -> "bigint"),
    "embeddings" -> Map("vec_id" -> "bigint", "embedding" -> "array<float>",
                        "label" -> "int"))

  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame     = t(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
