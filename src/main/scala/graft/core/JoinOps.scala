package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-family operators beyond plain equi-joins (SURVEY §2.4). The
  * reference aligns frames positionally on the pandas index
  * (`utils/metrics.py:86`, `models/build_ml.py:612`); here alignment is
  * explicit on (key, time). The as-of join is the scale generalization of
  * the reference's prepend-buffer alignment (T13, `build_ml.py:605-613`):
  * "the latest observation at or before t". */
object JoinOps {

  /** Backward as-of join: for every left row, attach the right row with
    * the greatest `rightTs` ≤ left's `leftTs` within the same key group
    * (non-strict — an exact timestamp match joins).
    *
    * Implementation: tag sides, union, one `last(_, ignoreNulls)` window
    * per carried column — a SINGLE shuffle on `keyCols`, no per-row
    * probing, no broadcast of either side; scales to any partition count
    * and any right-side size. At equal timestamps right rows sort before
    * left rows (side tag is the tie-break), which is what makes the join
    * non-strict.
    *
    * Contract: right must be unique per (keyCols, rightTs) — pre-aggregate
    * otherwise (duplicate right timestamps would make the carried values
    * order-dependent). Carried columns appear as `prefix + name`, left
    * columns pass through unchanged. */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftTs: String, rightTs: String,
               keyCols: Seq[String], rightVals: Seq[String],
               prefix: String = "asof_"): DataFrame = {
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val r = right.select(
      keyCols.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        rightVals.map(v => col(v).as(s"$prefix$v")): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.foldLeft(u) { (d, v) =>
      d.withColumn(s"$prefix$v", last(col(s"$prefix$v"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__ts", "__side")
  }

  /** NEAREST as-of join: for every left row, attach the right row whose
    * `rightTs` is closest in ABSOLUTE time within the key group — ties
    * (equidistant before/after) break to the EARLIER right row, and an
    * exact timestamp match wins outright. The bidirectional sibling of
    * [[asofJoin]] for reconciliation-style alignment (match a
    * measurement to the closest reference reading, not the last one).
    *
    * Implementation: same single-shuffle union+window form — the
    * backward candidate via `last(_, ignoreNulls)` over the ascending
    * (ts, side) frame, the forward candidate via `first(_, ignoreNulls)`
    * over the following frame — then one integer µs comparison picks a
    * side. At equal timestamps the right row sorts before the left, so
    * it lands in the BACKWARD frame with Δ = 0 and wins every
    * comparison. One exchange on `keyCols`, two window specs sharing
    * it, no broadcast of either side. Same uniqueness contract as
    * asofJoin: right unique per (keyCols, rightTs). Carried columns
    * appear as `prefix + name` plus `${prefix}ts` (the matched right
    * timestamp); left rows with no right row in the group carry nulls. */
  def asofNearestJoin(left: DataFrame, right: DataFrame,
                      leftTs: String, rightTs: String,
                      keyCols: Seq[String], rightVals: Seq[String],
                      prefix: String = "near_"): DataFrame = {
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val r = right.select(
      keyCols.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
            col(rightTs).as("__rts")) ++
        rightVals.map(v => col(v).as(s"__rv_$v")): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    val ord = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val cands = (rightVals.map(v => (s"__rv_$v", s"__b_$v", s"__f_$v")) :+
      (("__rts", "__bts", "__fts")))
      .foldLeft(u) { case (d, (src, b, f)) =>
        d.withColumn(b, last(col(src), ignoreNulls = true).over(wb))
          .withColumn(f, first(col(src), ignoreNulls = true).over(wf))
      }
    val db = unix_micros(col("__ts")) - unix_micros(col("__bts"))
    val df_ = unix_micros(col("__fts")) - unix_micros(col("__ts"))
    val useBack = col("__fts").isNull || (col("__bts").isNotNull && db <= df_)
    val picked = rightVals.foldLeft(
        cands.withColumn(s"${prefix}ts",
          when(useBack, col("__bts")).otherwise(col("__fts")))) { (d, v) =>
      d.withColumn(s"$prefix$v",
        when(useBack, col(s"__b_$v")).otherwise(col(s"__f_$v")))
    }
    val drop = Seq("__ts", "__side", "__rts", "__bts", "__fts") ++
      rightVals.flatMap(v => Seq(s"__rv_$v", s"__b_$v", s"__f_$v"))
    picked.filter(col("__side") === 1).drop(drop: _*)
  }

  /** Salted equi-join for skewed keys: the left (big, skewed) side gets a
    * deterministic salt in [0, saltFactor) derived from `saltSourceCols`
    * (columns that vary WITHIN a hot key — a row id, a timestamp); the
    * right side is replicated saltFactor× so every (key, salt) bucket
    * still finds its match. A key holding 30% of all rows then spreads
    * over saltFactor reducers instead of one straggler task. Use when AQE
    * skew-join can't help (e.g. the skewed side feeds an aggregation
    * pinned to the same key). Inner-join semantics are unchanged; right
    * rows are duplicated only inside the join, never in the output. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int, saltSourceCols: Seq[String]): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(xxhash64(saltSourceCols.map(col): _*), lit(saltFactor)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** Bucketized point-in-interval (range) join — the relational
    * primitive Spark lacks at scale: `points.p BETWEEN intervals.lo AND
    * intervals.hi` plans natively as a BroadcastNestedLoopJoin (dies
    * when the intervals side outgrows one broadcast) or a sort-merge on
    * an inequality (a full cross within each key). The scale form
    * decomposes the value axis into fixed-width buckets: every interval
    * explodes into the buckets it overlaps, every point maps to exactly
    * ONE bucket, and the join becomes a plain hash equi-join on
    * (keys…, bucket) — shuffled, partition-parallel, AQE/skew-eligible
    * — followed by the exact range predicate to discard bucket-level
    * false positives. (The same trick range-join-optimized engines —
    * e.g. Databricks' range-join hints — apply internally.)
    *
    * Cost model the caller controls: the intervals side multiplies by
    * ≈ width/bucketWidth + 1 rows per interval; the points side NEVER
    * multiplies. Pick bucketWidth near the typical interval width.
    * Contract: inner join; intervals with lo > hi are dropped; non-key
    * column names must be disjoint across the two sides (same as any
    * Spark equi-join). `inclusiveHi=false` gives the half-open
    * lo ≤ p < hi form. */
  def rangeJoin(points: DataFrame, pointCol: String,
                intervals: DataFrame, loCol: String, hiCol: String,
                bucketWidth: Double, keys: Seq[String] = Nil,
                inclusiveHi: Boolean = true): DataFrame = {
    require(bucketWidth > 0, s"need bucketWidth > 0, got $bucketWidth")
    val iv = intervals.filter(col(loCol) <= col(hiCol))
      .withColumn("__bucket", explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val pt = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val hiPred =
      if (inclusiveHi) col(pointCol) <= col(hiCol)
      else col(pointCol) < col(hiCol)
    pt.join(iv, keys :+ "__bucket")
      .filter(col(pointCol) >= col(loCol) && hiPred)
      .drop("__bucket")
  }
  /** Interval-OVERLAP join (the interval join of stream processors and
    * temporal databases): pairs of rows whose closed intervals intersect,
    *   L.lo <= R.hi  AND  R.lo <= L.hi,
    * decomposed into an EQUI join exactly like [[rangeJoin]]: every
    * interval explodes into the fixed-width time buckets it covers, the
    * join runs on (keys, bucket), and the exact predicate filters inside
    * the bucket. A pair intersecting several shared buckets must be
    * emitted ONCE — rather than a distinct over the pair stream, each
    * pair is credited only in the bucket containing the overlap's START,
    * max(L.lo, R.lo) (every intersecting pair has exactly one such
    * bucket) — the standard duplicate-free decomposition.
    *
    * 100-TB shape: shuffle keyed on (keys, bucket); per-bucket fan-out is
    * bounded by interval DENSITY (concurrent intervals per bucket), never
    * all-pairs. Pick bucketWidth near the typical interval length: too
    * small explodes the build rows (len/width buckets per interval), too
    * large packs unrelated intervals into one bucket. Column names must
    * be disjoint across the two sides (rename upstream). */
  def overlapJoin(left: DataFrame, lLoCol: String, lHiCol: String,
                  right: DataFrame, rLoCol: String, rHiCol: String,
                  bucketWidth: Double, keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"need bucketWidth > 0, got $bucketWidth")
    def bucketed(df: DataFrame, lo: String, hi: String) =
      df.filter(col(lo) <= col(hi))
        .withColumn("__bucket", explode(sequence(
          floor(col(lo).cast("double") / bucketWidth).cast("long"),
          floor(col(hi).cast("double") / bucketWidth).cast("long"))))
    bucketed(left, lLoCol, lHiCol)
      .join(bucketed(right, rLoCol, rHiCol), keys :+ "__bucket")
      .filter(col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol))
      .filter(floor(greatest(col(lLoCol), col(rLoCol)).cast("double")
        / bucketWidth).cast("long") === col("__bucket"))
      .drop("__bucket")
  }
}
