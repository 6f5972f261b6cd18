package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed cardinality sketches with DETERMINISTIC hash families —
  * the approx-distinct layer a 100-TB profiler runs where exact
  * `count(distinct)` would shuffle every key. Unlike engine-native
  * approx_count_distinct (whose HLL++ registers are
  * implementation-defined), this HLL is built from md5, so the ENTIRE
  * register state and estimate replay exactly in an oracle — the sketch
  * itself is hash-checkable, not just error-bounded. */
object Sketches {

  /** HyperLogLog (Flajolet, Fusy, Gandouet & Meunier 2007) over md5:
    * bucket = first p/4 hex chars (2^p registers), ρ = leading-zero
    * count + 1 of the next 52 bits (via `bin()` length — identical
    * minimal-width semantics on both engines), register = max ρ.
    * Estimate: E = α_m·m²/Z with Z = Σ 2^(−M_j); small-range linear
    * counting H = m·ln(m/V) applies when V > 0 and E ≤ 2.5m (the
    * original paper's regime switch).
    *
    * Determinism: each 2^(−M)·2^53 term is an exact BIGINT (M ≤ 53), so
    * Z folds exactly; α_m is a driver literal; the one ln is
    * grid-rounded on both engines. Scale shape: one map-side-combined
    * (bucket, max ρ) reduce — 2^p registers of state total, the classic
    * mergeable-sketch layout (partial maxes combine associatively).
    *
    * Emits one row: (n_exact, m, v_empty, e_raw, estimate). n_exact is
    * the audit column (the error the spec bounds); production callers
    * drop it. */
  /** The paper's bias constant α_m — public so oracle generators inject
    * the IDENTICAL literal. */
  def alphaFor(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  def hllDistinct(df: DataFrame, idCol: String, p: Int = 8): DataFrame = {
    require(p % 4 == 0 && p >= 4 && p <= 16, s"need p in {4,8,12,16}, got $p")
    val m = 1 << p
    val hexChars = p / 4
    val alpha = alphaFor(m)
    val two53 = 9007199254740992.0 // 2^53
    val h = md5(col(idCol).cast("string"))
    val regs = df
      .withColumn("bucket",
        conv(substring(h, 1, hexChars), 16, 10).cast("long"))
      .withColumn("w",
        conv(substring(h, hexChars + 1, 13), 16, 10).cast("long"))
      .withColumn("rho",
        when(col("w") === 0L, lit(53L))
          .otherwise(lit(53L) - length(bin(col("w")))))
      .groupBy(col("bucket")).agg(max(col("rho")).as("mr"))
    val exact = df.agg(countDistinct(col(idCol)).cast("long").as("n_exact"))
    regs.agg(
        count(lit(1)).cast("long").as("v_used"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - mr AS INT))")).as("z_used"))
      .crossJoin(exact)
      .withColumn("m", lit(m.toLong))
      .withColumn("v_empty", col("m") - col("v_used"))
      // absent registers carry M = 0 -> 2^53 each
      .withColumn("z_num",
        col("z_used") + col("v_empty") * lit(two53.toLong))
      .withColumn("e_raw",
        lit(alpha) * m * m / (col("z_num") / lit(two53)))
      .withColumn("estimate",
        when(col("v_empty") > 0 && col("e_raw") <= lit(2.5 * m),
          floor(log(col("m").cast("double") / col("v_empty")) * lit(1e6)
            + lit(0.5)) / 1e6 * m)
          .otherwise(col("e_raw")))
      .select(col("n_exact"), col("m"), col("v_empty"),
              col("e_raw"), col("estimate"))
  }

  /** Count-Min hash rows (a, b) — public so oracle generators inject
    * the IDENTICAL literals. h_r(k) = ((a_r·(k mod P) + b_r) mod P)
    * mod width, P = 2^31 − 1; every product stays < 2^62. */
  val cmsRows: Seq[(Long, Long)] =
    Seq((1103515245L, 12345L), (214013L, 2531011L), (69069L, 1234567L))
  val cmsP: Long = 2147483647L

  /** The depth-3 × `width` Count-Min counter table over `keyCol`: one
    * map-side-combined reduce to 3·width cells — the mergeable sketch
    * state itself, shared by [[cmsTopKAudit]] and the streaming twin
    * ([[graft.streaming.StreamCms]]), whose final state is
    * hash-identical to this table. */
  def cmsSketch(df: DataFrame, keyCol: String, width: Int): DataFrame = {
    val keyed = df.select(pmod(col(keyCol).cast("long"), lit(cmsP)).as("km"))
    val rowsLit = cmsRows.zipWithIndex.map { case ((a, b), r) =>
      struct(lit(r).as("r"), lit(a).as("a"), lit(b).as("b"))
    }
    keyed
      .withColumn("h", explode(array(rowsLit: _*)))
      .groupBy(col("h.r").as("r"),
        ((col("h.a") * col("km") + col("h.b")) % cmsP % width).as("bucket"))
      .agg(count(lit(1)).cast("long").as("c"))
  }

  /** Count-Min sketch frequency audit (Cormode & Muthukrishnan 2005,
    * "An improved data stream summary: the count-min sketch"): build a
    * depth-3 × `width` counter sketch over `keyCol` with the
    * DETERMINISTIC [[cmsRows]] hash family, then report, for the top-k
    * keys by EXACT count, the sketch's estimate
    * est(k) = min_r counter[r][h_r(k)] next to the truth — the
    * one-sided-error readout (est >= exact always; the gap is the
    * collision noise the ε–δ bound prices).
    *
    * Scale shape: the sketch is ONE map-side-combined reduce to
    * 3·width counters (each row contributes 3 (row, bucket) increments
    * — mergeable partials, the mm of sketch layouts); the exact top-k
    * is a second reduce + TakeOrdered. The sketch state is tiny enough
    * to broadcast into the lookup join. Everything is integer
    * arithmetic — the whole audit replays exactly in any engine. */
  def cmsTopKAudit(df: DataFrame, keyCol: String, k: Int = 20,
                   width: Int = 64): DataFrame = {
    require(k >= 1 && width >= 2, s"need k >= 1, width >= 2; got ($k, $width)")
    val keyed = df.select(pmod(col(keyCol).cast("long"), lit(cmsP)).as("km"))
    val rowsLit = cmsRows.zipWithIndex.map { case ((a, b), r) =>
      struct(lit(r).as("r"), lit(a).as("a"), lit(b).as("b"))
    }
    val sketch = cmsSketch(df, keyCol, width)
    val top = keyed.groupBy(col("km"))
      .agg(count(lit(1)).cast("long").as("exact"))
      .orderBy(col("exact").desc, col("km")).limit(k)
    top
      .withColumn("h", explode(array(rowsLit: _*)))
      .withColumn("r", col("h.r"))
      .withColumn("bucket", (col("h.a") * col("km") + col("h.b")) % cmsP % width)
      .join(broadcast(sketch), Seq("r", "bucket"))
      .groupBy(col("km").as("key"), col("exact"))
      .agg(min(col("c")).as("est"))
      .withColumn("overcount", col("est") - col("exact"))
  }
}
