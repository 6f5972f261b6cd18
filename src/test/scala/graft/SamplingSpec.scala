package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.scale.Sampling
import graft.stats.Quantiles

/** Sampling + quantile-profiling contracts: plan shape (the 100 TB
  * promise) and value correctness. */
class SamplingSpec extends SparkTestBase {

  private def shuffles(df: => DataFrame): Int = withAqeOff {
    df.queryExecution.executedPlan.collect { case e: ShuffleExchangeLike => e }.size
  }

  private lazy val docs = Tables.documents(spark, SF)

  test("modSample is a pure filter: zero shuffles, keeps exactly id%m<k") {
    val s = Sampling.modSample(docs, "doc_id", 10, 3)
    assert(shuffles(s) == 0)
    val bad = s.filter(pmod(col("doc_id"), lit(10)) >= 3).count()
    assert(bad == 0)
    val expected = docs.filter(pmod(col("doc_id"), lit(10)) < 3).count()
    assert(s.count() == expected)
  }

  test("interleave is zero-shuffle and honors per-source keep rates") {
    val s = Sampling.interleave(docs, "source", "doc_id",
      Map("src0" -> 1000, "src1" -> 0))
    assert(shuffles(s) == 0)
    val kept = s.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = docs.filter(col("source") === "src0").count()
    assert(kept.get("src0").contains(all), "src0 at 1000 permille keeps everything")
    assert(!kept.contains("src1"), "src1 at 0 permille keeps nothing")
    assert(kept.size == 1, "unlisted sources default to 0 permille")
  }

  test("stratifiedExact takes ceil(frac*n) per group over ONE shuffle") {
    val frac = 0.2
    val s = Sampling.stratifiedExact(docs, Seq("lang"), "doc_id", frac)
    // row_number and count can't fuse into one WindowExec (different
    // frames) but they MUST share one exchange + sort
    assert(shuffles(s) == 1)
    withAqeOff {
      val winExecs = s.queryExecution.executedPlan.collect { case w: WindowExec => w }
      assert(winExecs.size == 2, s"expected the two window frames, got ${winExecs.size}")
    }
    val got = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> math.ceil(frac * r.getLong(1)).toLong).toMap
    assert(got == want)
  }

  test("per-series trendForecast fits all series over ONE shuffle") {
    val events = Tables.events(spark, SF)
    val f = graft.scale.PerSeriesForecast.trendForecast(
      events, "value", "ts", Seq("user_id"), 3, Seq("event_id"))
    // window (row index) and aggregate share the user_id exchange; the
    // horizons side is a broadcast
    assert(shuffles(f) == 1, s"expected 1 shuffle, got ${shuffles(f)}")
    // h=1 prediction equals the local OLS extension for a spot series
    val uid = events.select(min("user_id")).head().get(0)
    val series = events.filter(col("user_id") === uid)
      .orderBy("ts", "event_id").select(col("value").cast("double"))
      .collect().map(_.getDouble(0))
    val n = series.length.toDouble
    val t = series.indices.map(_.toDouble)
    val (st, stt, sy, sty) = (t.sum, t.map(x => x * x).sum, series.sum,
      t.zip(series).map { case (a, b) => a * b }.sum)
    val slope = (n * sty - st * sy) / (n * stt - st * st)
    val icept = (sy - slope * st) / n
    val got = f.filter(col("user_id") === uid && col("h") === 1)
      .select("yhat").head().getDouble(0)
    assert(math.abs(got - (icept + slope * n)) < 1e-6)
  }

  test("approx quantiles track exact quantiles within sketch tolerance") {
    val probs = Seq(0.25, 0.5, 0.75)
    def toMap(df: DataFrame) = df.collect()
      .map(r => r.getString(0) -> probs.map(p => r.getAs[Any](s"q${(p * 100).round}") match {
        case d: Double => d
        case l: Long => l.toDouble
        case i: Int => i.toDouble
      })).toMap
    val exact = toMap(Quantiles.exact(docs, "n_chars", Seq("lang"), probs).select(
      col("lang"), col("q25"), col("q50"), col("q75")))
    val approx = toMap(Quantiles.approx(docs, "n_chars", Seq("lang"), probs).select(
      col("lang"), col("q25"), col("q50"), col("q75")))
    for ((lang, ex) <- exact; (e, a) <- ex.zip(approx(lang)))
      // t-digest at accuracy 10000 on a few hundred values per group is
      // rank-exact up to interpolation: allow the neighboring-value gap
      assert(math.abs(e - a) <= math.max(20.0, 0.1 * e),
        s"$lang: approx $a vs exact $e")
  }

  test("DSIR ranks target-vocabulary docs above off-target docs") {
    import spark.implicits._
    // target speaks vocabulary A; raw has two A-docs, two B-docs, one mixed
    val target = Seq(
      (100L, "alpha beta gamma delta alpha beta gamma delta"),
      (101L, "beta gamma delta epsilon beta gamma delta epsilon"),
      (102L, "alpha gamma epsilon delta alpha beta")
    ).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta gamma delta epsilon alpha beta gamma"),
      (2L, "gamma delta alpha epsilon beta gamma delta alpha"),
      (3L, "zork quux blarg frobnitz zork quux blarg frobnitz"),
      (4L, "quux frobnitz blarg zork frobnitz quux blarg zork"),
      (5L, "alpha beta zork quux gamma delta blarg frobnitz")
    ).toDF("doc_id", "text")
    val w = Sampling.dsirLogWeights(raw, target, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.size == 5)
    for (a <- Seq(1L, 2L); b <- Seq(3L, 4L))
      assert(w(a) > w(b), s"on-target doc $a (${w(a)}) must outscore off-target $b (${w(b)})")
    assert(w(5L) > w(3L) && w(5L) < w(1L), "mixed doc sits between")
    val top = Sampling.dsirTopK(raw, target, "text", "doc_id", 2)
      .select("fid").collect().map(_.getLong(0)).toSet
    assert(top == Set(1L, 2L))
  }

  test("DSIR scoring never shuffles the raw corpus text: broadcast ratio join") {
    val docs2 = docs.filter(col("source") =!= "src0")
    val tgt = docs.filter(col("source") === "src0")
    val plan = withAqeOff {
      Sampling.dsirLogWeights(docs2, tgt, "text", "doc_id")
        .queryExecution.executedPlan
    }
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val bcasts = plan.collect { case b: BroadcastHashJoinExec => b }
    assert(bcasts.nonEmpty, "log-ratio table must join back as a broadcast")
    // the scoring probe side (the raw corpus) must reach its broadcast
    // join unshuffled: scan -> explode -> hash -> BHJ, all map-side
    val outer = bcasts.head // outermost = the corpus-side scoring join
    val probe = outer.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildRight => outer.left
      case _ => outer.right
    }
    val probeShuffles = probe.collect { case e: ShuffleExchangeLike => e }
    assert(probeShuffles.isEmpty,
      "corpus text must not shuffle before the log-ratio broadcast join")
    // everything else is bounded: two B-row bucket aggs, their two
    // single-row totals, and the one-row-per-doc score agg
    val shuffleCnt = plan.collect { case e: ShuffleExchangeLike => e }.size
    assert(shuffleCnt <= 5, s"expected <=5 bounded shuffles, got $shuffleCnt")
  }

  test("deterministicShuffle: exact permutation, reproducible, seed-sensitive") {
    import spark.implicits._
    val df = (0L until 300L).map(i => (i, s"doc$i")).toDF("id", "body")
    val p1 = Sampling.deterministicShuffle(df, "id", seed = 7L, prefixLen = 1)
      .select("id", "position").collect().map(r => r.getLong(0) -> r.getLong(1))
    // positions are a bijection onto 0..n-1
    assert(p1.map(_._2).sorted.toSeq == (0L until 300L).toSeq, "positions must be 0..n-1 exactly once")
    // same seed reproduces bit-identically
    val p2 = Sampling.deterministicShuffle(df, "id", seed = 7L, prefixLen = 1)
      .select("id", "position").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(p1.toMap == p2.toMap, "same seed must reproduce the same order")
    // a different seed produces a genuinely different permutation
    val p3 = Sampling.deterministicShuffle(df, "id", seed = 8L, prefixLen = 1)
      .select("id", "position").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p1.count { case (id, pos) => p3(id) == pos } < 30,
      "different seeds should agree on almost no positions")
    // prefixLen must not change the order (bucketing is an implementation detail)
    val p4 = Sampling.deterministicShuffle(df, "id", seed = 7L, prefixLen = 3)
      .select("id", "position").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p1.toMap == p4, "bucket prefix length must be invisible in the result")
  }

  test("weightedSample: exact size, reproducible, weight-dominant row wins, w<=0 dropped") {
    import spark.implicits._
    val df = ((1 to 200).map(i => (i.toLong, 1.0)) :+ ((999L, 1e7)) :+ ((1000L, 0.0)) :+ ((1001L, -3.0)))
      .toDF("id", "w")
    val s1 = Sampling.weightedSample(df, "id", "w", k = 50, seed = 11L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(s1.size == 50, "exactly k winners")
    assert(s1.contains(999L), "a 1e7x weight must win a 50-of-201 draw")
    assert(!s1.contains(1000L) && !s1.contains(1001L), "non-positive weights never drawn")
    val s2 = Sampling.weightedSample(df, "id", "w", k = 50, seed = 11L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "same seed must reproduce the same sample")
    val s3 = Sampling.weightedSample(df, "id", "w", k = 50, seed = 12L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert((s1 -- s3).nonEmpty, "a different seed should change the sample")
    // k >= population: everything with positive weight
    val all = Sampling.weightedSample(df, "id", "w", k = 500, seed = 11L).count()
    assert(all == 201L)
  }

  test("hashSplit on a group key: every group lands in exactly one fold") {
    import spark.implicits._
    val df = (0 until 500).map(i => (i.toLong, s"src${i % 23}")).toDF("id", "source")
    val folds = Sampling.hashSplit(df, "source", 80, 10)
      .groupBy("source").agg(countDistinct(col("split")).as("k"), count(lit(1)).as("n"))
      .collect()
    assert(folds.length == 23)
    assert(folds.forall(_.getLong(1) == 1L), "a group must never straddle folds")
    assert(folds.map(_.getLong(2)).sum == 500L)
  }
}
