package graft

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.core.{TimeSeriesOps => TS, JoinOps}
import graft.cv.ExpandingWindowSplit

/** Property tests promised in SURVEY §5: randomized (seeded) series
  * exercised through the operator algebra — lag∘lead identity,
  * diff∘cumsum identity, calendar ranges, fold disjointness/expansion,
  * and as-of join vs a naive reference implementation. */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def randomSeries(seed: Int, n: Int, nSeries: Int = 3) = {
    val rnd = new Random(seed)
    val rows = for (s <- 0 until nSeries; i <- 0 until n)
      yield (s.toLong, i.toLong, rnd.nextDouble() * 100 - 50)
    rows.toDF("sid", "t", "y").withColumn("ts", timestamp_seconds($"t" * 3600))
  }

  test("property: lead(lag(y)) == y away from boundaries, all seeds") {
    for (seed <- 1 to 5) {
      val df = randomSeries(seed, 40)
      val lagged = TS.addLags(df, Seq("y"), 1, "ts", Seq("sid"), Seq("t"))
      val back = TS.addLeads(lagged, Seq("y_lag1"), 1, "ts", Seq("sid"), Seq("t"))
      val bad = back.filter($"y_lag1_lead1".isNotNull && abs($"y_lag1_lead1" - $"y") > 1e-12).count()
      assert(bad == 0, s"seed $seed: lag/lead not inverse")
    }
  }

  test("property: cumsumRestorePerSeries(diff(y)) == y, all seeds") {
    for (seed <- 1 to 5) {
      val df = randomSeries(seed, 30)
      val diffed = TS.diff(df, "y", 1, "ts", Seq("sid"), Seq("t"))
      val restored = TS.cumsumRestorePerSeries(diffed, "y_diff", "y", "ts", Seq("sid"), Seq("t"))
      val bad = restored.filter(abs($"restored" - $"y") > 1e-9).count()
      assert(bad == 0, s"seed $seed: diff/restore not inverse")
    }
  }

  test("property: calendar features stay in range on random timestamps") {
    val rnd = new Random(7)
    val ts = (0 until 500).map(_ => math.abs(rnd.nextLong()) % 4102444800L)
    val df = ts.toDF("t").withColumn("ts", timestamp_seconds($"t"))
    val f = TS.calendarFeatures(df, "ts")
    val viol = f.filter(
      $"hour" < 0 || $"hour" > 23 || $"minute" < 0 || $"minute" > 59 ||
      $"dayofweek" < 0 || $"dayofweek" > 6 || !$"weekend".isin(0, 1) ||
      $"quarter" < 1 || $"quarter" > 4 || $"month" < 1 || $"month" > 12 ||
      $"dayofyear" < 1 || $"dayofyear" > 366 || $"dayofmonth" < 1 || $"dayofmonth" > 31 ||
      $"weekofyear" < 1 || $"weekofyear" > 53).count()
    assert(viol == 0)
  }

  test("property: CV folds expand, test windows are disjoint and sized h") {
    for ((n, k, h) <- Seq((100L, 3, 10), (57L, 4, 7), (30L, 2, 5))) {
      val folds = ExpandingWindowSplit.folds(n, k, h)
      assert(folds.map(_.k) == folds.map(_.k).sorted)
      folds.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.trainEnd < b.trainEnd, "train windows must expand")
          assert(a.testEnd < b.testStart || a.testEnd + 1 == b.testStart,
            "test windows must not overlap")
        case _ =>
      }
      folds.foreach { f =>
        assert(f.testEnd - f.testStart + 1 == h)
        assert(f.testStart == f.trainEnd + 1, "test follows train immediately")
      }
      assert(folds.last.testEnd == n, "last fold ends at the last row")
    }
  }

  test("property: MinHashSig == aggregation pipeline on random token sequences") {
    import graft.scale.Dedup
    for (seed <- 1 to 4) {
      val rnd = new Random(seed)
      val vocab = Vector("aa", "bb", "cc", "dd", "e", "", "longword", "x1")
      val docs = (0 until 60).map { i =>
        val nTok = rnd.nextInt(12) // includes docs shorter than n
        (i.toLong, (0 until nTok).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val viaAgg = Dedup.minHashSignatures(
          Dedup.shingleHashes(docs, "text", "doc_id", 3), 16)
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toMap
      val viaExpr = docs.select($"doc_id",
          graft.functions.MinHashSig(col("text"), 3, 16).as("sig"))
        .filter($"sig".isNotNull)
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toMap
      assert(viaExpr == viaAgg, s"seed $seed: expression != pipeline")
    }
  }

  test("property: asofJoin matches a naive per-row reference") {
    val rnd = new Random(11)
    val left = (0 until 120).map(_ => (rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong))
    val right = (0 until 40).map(_ => (rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong))
      .distinct.map { case (k, t) => (k, t, t * 10 + k) }
    val lDf = left.toDF("k", "t").withColumn("ts", timestamp_seconds($"t"))
    val rDf = right.toDF("k", "t2", "v").withColumn("rts", timestamp_seconds($"t2")).drop("t2")
    val got = JoinOps.asofJoin(lDf, rDf, "ts", "rts", Seq("k"), Seq("v"))
      .select($"k", $"t", $"asof_v").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    for ((k, t) <- left.distinct) {
      val want = right.filter(r => r._1 == k && r._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
      assert(got((k, t)) == want, s"asof mismatch at key=$k t=$t")
    }
  }

  test("property: mixSchedule closed-form rank == global-sort rank on random allocations") {
    import spark.implicits._
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val nSrc = 2 + rnd.nextInt(6)
      val alloc = (0 until nSrc).map { i =>
        (f"s$i%02d", (1 + rnd.nextInt(40)) * 100L)   // 1..40 chunks at 100
      }.toDF("source", "alloc")
      val chunk = 100L
      val out = graft.scale.Sampling.mixSchedule(alloc, "source", "alloc", chunk)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val total = out.groupBy(_._1).map(_._2.head._3).sum
      assert(out.map(_._4).sorted.toSeq == (1L to total).toSeq,
        s"seed $seed: steps not a permutation of 1..$total")
      val twin = out.sortBy { case (s, k, n, _) => (k.toDouble / n, s, k) }
        .zipWithIndex.map { case ((s, k, _, _), i) => (s, k) -> (i + 1L) }.toMap
      out.foreach { case (s, k, _, step) =>
        assert(twin((s, k)) == step,
          s"seed $seed: closed form != sort at ($s,$k): $step vs ${twin((s, k))}") }
    }
  }
}
