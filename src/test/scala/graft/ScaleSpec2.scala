package graft

import org.apache.spark.sql.functions._
import graft.scale.{Dedup, Sampling, TextAnalysis}

/** Specs for the round-10 curation additions: char entropy, BM25
  * retrieval, mixture waterfill, cross-source overlap. */
class ScaleSpec2 extends SparkTestBase {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, SF)

  test("charEntropy: closed-form values on known distributions") {
    val df = Seq(
      (1L, "abcd"),      // uniform over 4 chars -> exactly 2 bits
      (2L, "aaaa"),      // degenerate -> 0 bits
      (3L, "aabb"),      // uniform over 2 -> 1 bit
      (4L, "")           // empty -> 0 by convention
    ).toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(df, "text")
      .select("doc_id", "char_entropy", "n_chars_obs")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(out(1L) == ((2.0, 4L)))
    assert(out(2L) == ((0.0, 4L)))
    assert(out(3L) == ((1.0, 4L)))
    assert(out(4L)._1 == 0.0)
  }

  test("charEntropy: corpus docs sit in the natural-text band, spam below") {
    val ent = TextAnalysis.charEntropy(docs, "text")
      .agg(min(col("char_entropy")), max(col("char_entropy"))).collect()(0)
    assert(ent.getDouble(0) > 2.5 && ent.getDouble(1) < 5.5,
      s"corpus entropy band unexpected: $ent")
    val spam = TextAnalysis.charEntropy(
      Seq((1L, "aaaaaaaaaaaaaaaaaaaaaa bbbb")).toDF("doc_id", "text"), "text")
      .select("char_entropy").collect()(0).getDouble(0)
    assert(spam < 1.5, s"char-spam should score far below natural text: $spam")
  }

  test("bm25TopK: planted relevant doc ranks first, scores ordered, k respected") {
    val df = Seq(
      (1L, "spark join performance spark join performance spark join"),
      (2L, "spark is a data engine with good performance overall today"),
      (3L, "gardening tips for tomatoes and herbs in small spaces"),
      (4L, "join the club"),
      (5L, "performance review season is upon us again this year soon")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(df, "text", "doc_id",
      Seq((0L, "spark join performance")), k = 3).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).sortBy(_._3)
    assert(out.length == 3)
    assert(out.head._1 == 1L, s"term-dense doc must rank 1: ${out.toSeq}")
    assert(out.map(_._1).toSet.intersect(Set(3L)).isEmpty,
      "doc with zero query terms cannot be retrieved")
    assert(out.sliding(2).forall { case Array(a, b) => a._2 >= b._2; case _ => true },
      "scores must be non-increasing in rank")
  }

  test("bm25TopK: idf discounts ubiquitous terms") {
    // 'common' appears everywhere, 'rare' once: for a doc holding both,
    // the rare term must contribute more than the common one
    val df = (1L to 20L).map(i => (i, if (i == 1) "rare common" else "common filler"))
      .toDF("doc_id", "text")
    val rare = TextAnalysis.bm25TopK(df, "text", "doc_id", Seq((0L, "rare")), k = 1)
      .select("score").collect()(0).getDouble(0)
    val comm = TextAnalysis.bm25TopK(df, "text", "doc_id", Seq((0L, "common")), k = 1)
      .select("score").collect()(0).getDouble(0)
    assert(rare > comm, s"idf ordering violated: rare=$rare common=$comm")
  }

  test("waterfillMixture: caps at availability, conserves budget up to floor slack") {
    val w = (0 to 19).map(i => s"src$i" -> (if (i <= 4) 0.15 else 0.0125)).toMap
    val out = Sampling.waterfillMixture(docs, "source", "text", w, budget = 20000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getLong(4)))
    assert(out.length == 20)
    assert(out.forall { case (_, avail, alloc, _, _) => alloc <= avail },
      "allocation may never exceed availability")
    out.foreach { case (s, avail, alloc, capped, pm) =>
      if (capped) assert(alloc == avail, s"$s capped but alloc<avail")
      assert(pm >= 0 && pm <= 1000, s"$s permille out of range")
    }
    val total = out.map(_._3).sum
    assert(total <= 20000L, "over-allocated the budget")
    assert(20000L - total <= out.length,
      s"floor slack too large: ${20000L - total}")
    assert(out.count(_._4) >= 1, "heavy-weight sources should cap on this corpus")
  }

  test("waterfillMixture: huge budget takes everything") {
    val w = (0 to 19).map(i => s"src$i" -> 0.05).toMap
    val out = Sampling.waterfillMixture(docs, "source", "text", w, budget = 10000000L)
      .collect()
    assert(out.forall(r => r.getLong(2) == r.getLong(1) && r.getBoolean(3)),
      "with budget >> availability every source caps at its full size")
  }

  test("bigramLogProb: fluent word order outscores shuffled words of the same doc") {
    // same unigram bag -> identical unigram-LM scores; only the bigram
    // model can tell the fluent variant from the scrambled one
    val base = (1L to 30L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
    val df = (base :+ (31L, "dog the lazy jumps fox quick over brown the"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) > out(31L),
      s"fluent=${out(1L)} must beat scrambled=${out(31L)}")
    val uni = TextAnalysis.unigramLogProb(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(uni(1L) - uni(31L)) < 1e-12,
      "control: the unigram model cannot distinguish the two")
  }

  lazy val embs = Tables.embeddings(spark, SF)

  test("sesForecast: closed form equals the l_t recursion; flat across horizons") {
    val ys = Seq(10.0, 12.0, 9.0, 14.0, 11.0, 13.0)
    val alpha = 0.25
    val expected = ys.tail.foldLeft(ys.head)((l, y) => alpha * y + (1 - alpha) * l)
    val df = ys.zipWithIndex.map { case (y, i) => (1L, i.toLong, i.toLong, y) }
      .toDF("sid", "ts", "eid", "y")
    val out = graft.scale.PerSeriesForecast.sesForecast(
        df, "y", "ts", Seq("sid"), horizon = 3, alpha = alpha, tieBreak = Seq("eid"))
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    assert(out.size == 3)
    out.values.foreach(v => assert(math.abs(v - expected) < 1e-8,
      s"closed form $v != recursion $expected"))
    assert(out.values.toSet.size == 1, "SES forecast must be flat in h")
  }

  test("int8Quantize: error bounded by half a quantization step, max lane saturates") {
    val out = graft.scale.Similarity.int8Quantize(embs, "embedding", "vec_id")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (scale, nSat, maxErr9) =
        (r.getDouble(1), r.getLong(2), r.getLong(4))
      assert(scale > 0)
      assert(nSat >= 1, "the max-|x| lane quantizes to exactly +-127")
      // |x - q/scale| <= 0.5/scale for the floor(x*scale+0.5) rule
      assert(maxErr9 <= math.ceil(0.5 / scale * 1e9).toLong + 1,
        s"dequant error ${maxErr9} exceeds half-step bound for scale $scale")
    }
  }

  test("matryoshkaRecall: full-dim prefix is a perfect self-recall, 16-dim degrades gracefully") {
    val full = graft.scale.Similarity.matryoshkaRecall(embs, "embedding", "vec_id",
      subDim = 64, k = 10, nProbes = 3).collect()
    assert(full.length == 3)
    assert(full.forall(_.getDouble(1) == 1.0), "subDim=dim must reproduce the full ranking")
    val tr = graft.scale.Similarity.matryoshkaRecall(embs, "embedding", "vec_id",
      subDim = 16, k = 10, nProbes = 3).collect()
    assert(tr.forall { r => val x = r.getDouble(1); x >= 0.0 && x <= 1.0 })
  }

  test("rollingMadAnomaly: planted spike flagged, clean series clean, neighbors unmasked") {
    val clean = (0 until 40).map(i => (1L, i.toLong, i.toLong, 10.0 + (i % 3)))
    val spiked = clean.map { case (_, ts, eid, y) =>
      (2L, ts, eid, if (ts == 20) 500.0 else y) }
    val df = (clean ++ spiked).toDF("sid", "ts", "eid", "y")
    val out = graft.scale.SeriesDiagnostics.rollingMadAnomaly(
        df, "y", "ts", Seq("sid"), halfWin = 5, nSigmas = 3.5, tieBreak = Seq("eid"))
      .filter(col("is_anomaly"))
      .select("sid", "ts").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((2L, 20L)), s"planted spike missed: $out")
    assert(!out.exists(_._1 == 1L), "clean series must have zero flags")
    assert(out.count(_._1 == 2L) == 1,
      s"median robustness: the spike must not mask or flag neighbors: $out")
  }

  test("cusumChangepoint: level shift located exactly, direction encodes shift sign") {
    val up = (1 to 20).map(i => (1L, i.toLong, i.toLong, if (i <= 10) 0.0 else 10.0))
    val down = (1 to 20).map(i => (2L, i.toLong, i.toLong, if (i <= 10) 10.0 else 0.0))
    val df = (up ++ down).toDF("sid", "ts", "eid", "y")
    val out = graft.scale.SeriesDiagnostics.cusumChangepoint(
        df, "y", "ts", Seq("sid"), Seq("eid"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(4)))).toMap
    assert(out(1L)._1 == 10L, s"upward shift peak at t=10: ${out(1L)}")
    assert(out(1L)._2 == -1L, "upward shift -> CUSUM trough (negative) at the cp")
    assert(out(2L)._1 == 10L)
    assert(out(2L)._2 == 1L, "downward shift -> CUSUM crest (positive)")
  }

  test("crossGroupOverlap: planted shared 6-gram found, disjoint groups absent") {
    val shared = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, "g1", s"$shared tail one extra"),
      (2L, "g2", s"prefix words $shared"),
      (3L, "g3", "completely different vocabulary nothing shared here at all")
    ).toDF("doc_id", "grp", "text")
    val out = Dedup.crossGroupOverlap(df, "text", "grp", L = 6)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(out.contains(("g1", "g2")), s"planted overlap missed: $out")
    assert(out(("g1", "g2")) >= 1L)
    assert(!out.keys.exists { case (a, b) => a == "g3" || b == "g3" },
      "disjoint group must not appear in the overlap matrix")
  }

  test("crossGroupOverlap on the corpus: containment in (0,1], ordered pairs only") {
    val rows = Dedup.crossGroupOverlap(docs, "text", "source", L = 6).collect()
    assert(rows.nonEmpty, "corpus sources share boilerplate grams")
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pairs must be ordered src_a < src_b")
      val c = r.getDouble(3)
      assert(c > 0.0 && c <= 1.0, s"containment out of range: $c")
    }
  }

  test("funnel: strict order enforced, greedy-earliest completion, conversion from step 1") {
    // u1 completes in order; u2 has all steps but out of order (purchase
    // before click); u3 stops at click; u4 never starts
    val rows = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "view", 10L), (2L, "purchase", 15L), (2L, "click", 20L),
      (3L, "view", 5L), (3L, "click", 6L),
      (4L, "click", 1L), (4L, "purchase", 2L))
    val df = rows.toDF("user_id", "event_type", "tsec")
      .withColumn("ts", col("tsec").cast("timestamp"))
    val out = graft.scale.EventAnalytics.funnel(
        df, "event_type", "ts", "user_id", Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out(1) == ((3L, 1.0)), s"u1,u2,u3 viewed: ${out(1)}")
    assert(out(2)._1 == 3L, "all three viewers clicked after their view")
    assert(out(3)._1 == 1L, "only u1 purchased after a post-view click")
    assert(math.abs(out(3)._2 - 1.0 / 3) < 1e-9)
  }

  test("funnel: same-timestamp events do not chain (strict order)") {
    val df = Seq((1L, "view", 10L), (1L, "click", 10L))
      .toDF("user_id", "event_type", "tsec")
      .withColumn("ts", col("tsec").cast("timestamp"))
    val out = graft.scale.EventAnalytics.funnel(
        df, "event_type", "ts", "user_id", Seq("view", "click"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out(1) == 1L && out(2) == 0L, s"ties must not count as progression: $out")
  }

  test("transitionMatrix: hand-built sequences, rows sum to 1, no cross-user pairs") {
    val rows = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "b"),
      (3L, 1L, "c")) // singleton: contributes no pair
    val df = rows.map { case (u, t, e) => (u, t, t, e) }
      .toDF("user_id", "tsec", "event_id", "event_type")
      .withColumn("ts", col("tsec").cast("timestamp"))
    val out = graft.scale.EventAnalytics.transitionMatrix(
        df, "event_type", "ts", "user_id", Seq("event_id"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(4))))
      .toMap
    // pairs: u1 a->b, b->a, a->b; u2 a->b  => a->b:3 (p=1), b->a:1 (p=1)
    assert(out == Map(("a", "b") -> ((3L, 1.0)), ("b", "a") -> ((1L, 1.0))), s"got $out")
    // row-stochastic check on the real corpus
    val corpus = graft.scale.EventAnalytics.transitionMatrix(
        Tables.events(spark, SF), "event_type", "ts", "user_id", Seq("event_id"))
      .groupBy("from_type").agg(sum($"p").as("rowsum")).collect()
    assert(corpus.nonEmpty)
    corpus.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9,
      s"${r.getString(0)} row sums to ${r.getDouble(1)}"))
  }

  test("gapProfile: hand-built cadence, per-type windows never mix users or types") {
    val rows = Seq(
      (1L, 0L, "a"), (1L, 10L, "a"), (1L, 30L, "a"),   // gaps 10, 20
      (1L, 5L, "b"),                                    // no same-type successor
      (2L, 100L, "a"), (2L, 160L, "a"))                 // gap 60
    val df = rows.zipWithIndex.map { case ((u, t, e), i) => (u, t, i.toLong, e) }
      .toDF("user_id", "tsec", "event_id", "event_type")
      .withColumn("ts", col("tsec").cast("timestamp"))
    val out = graft.scale.EventAnalytics.gapProfile(
        df, "event_type", "ts", "user_id", Seq("event_id"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(!out.contains("b"), "a type with no consecutive pair has no gaps")
    val (n, mean, p50) = out("a")
    assert(n == 3 && math.abs(mean - 30.0) < 1e-9, s"gaps {10,20,60}: $out")
    assert(math.abs(p50 - 20.0) < 1e-9, "median of {10,20,60} is 20")
  }

  test("retention: cohorts by first-seen period, k=0 is always full retention") {
    val week = 604800L
    // u1,u2 start week 0; u2 returns weeks 1,2; u3 starts week 1, returns week 3
    val rows = Seq((1L, 0L), (2L, week / 2), (2L, week + 1), (2L, 2 * week + 5),
                   (3L, week + 2), (3L, 4 * week - 1))
    val df = rows.toDF("user_id", "tsec").withColumn("ts", col("tsec").cast("timestamp"))
    val out = graft.scale.EventAnalytics.retention(df, "ts", "user_id", week, 8)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(out((0L, 0)) == ((2L, 2L, 1.0)), "week-0 cohort: both active at k=0")
    assert(out((0L, 1)) == ((1L, 2L, 0.5)) && out((0L, 2)) == ((1L, 2L, 0.5)))
    assert(out((1L, 0)) == ((1L, 1L, 1.0)))
    assert(out((1L, 2)) == ((1L, 1L, 1.0)), "u3 returns 2 periods after its week-1 start")
    assert(!out.contains((0L, 3)), "no activity -> no row (sparse output)")
  }

  test("seasonalStrength: planted weekly pattern reads ~1, noise reads low, constant reads 0") {
    val r = graft.core.DetRandom.doubles(11)
    // trended + strong period-7 pattern; pure noise; constant
    val rows =
      (0 until 140).map { t => (1L, t.toLong, 0.1 * t + 5.0 * (t % 7) + 0.01 * r()) } ++
      (0 until 140).map { t => (2L, t.toLong, 10.0 * r()) } ++
      (0 until 140).map { t => (3L, t.toLong, 4.2) }
    val df = rows.toDF("sid", "ts", "y")
    val out = graft.scale.SeriesDiagnostics.seasonalStrength(
        df, "y", "ts", Seq("sid"), m = 7)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) > 0.99, s"planted seasonality must read ~1, got ${out(1L)}")
    assert(out(2L) < 0.2, s"noise must read low, got ${out(2L)}")
    assert(out(3L) == 0.0, "constant series has no variance to explain")
  }

  test("decompose: components reassemble exactly and recover a planted trend+seasonal") {
    // y = 2 + 0.5 t + s(t mod 4) with s = (1, -1, -1, 1): zero-mean AND
    // orthogonal to t over complete cycles, so OLS recovers the line exactly
    val pat = Array(1.0, -1.0, -1.0, 1.0)
    val rows = (0 until 80).map(t => (1L, t.toLong, 2.0 + 0.5 * t + pat(t % 4)))
    val df = rows.toDF("sid", "ts", "y")
    val out = graft.scale.SeriesDiagnostics.decompose(df, "y", "ts", Seq("sid"), m = 4)
      .collect().map(r => r.getLong(1) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out.size == 80)
    out.foreach { case (t, (y, trend, seasonal, rem)) =>
      assert(math.abs(y - (trend + seasonal + rem)) < 1e-9,
        s"t=$t: components must reassemble y")
      // planted structure: OLS recovers the line, phase means the pattern
      assert(math.abs(trend - (2.0 + 0.5 * t)) < 1e-6, s"t=$t trend $trend")
      assert(math.abs(seasonal - pat((t % 4).toInt)) < 1e-6, s"t=$t seasonal $seasonal")
      assert(math.abs(rem) < 1e-6, s"t=$t remainder should vanish, got $rem")
    }
  }

  test("crossCorrelation: a planted 2-bucket lead peaks at lag 2 with r ~ 1") {
    val r = graft.core.DetRandom.doubles(13)
    val base = (0 until 200).map(_ => 10.0 + 20.0 * r())
    // one observation per hour bucket; y(t) = x(t-2)
    val xs = base.zipWithIndex.map { case (v, i) => (i * 3600L, v) }
    val ys = base.zipWithIndex.map { case (v, i) => ((i + 2) * 3600L, v + 0.5) }
    val a = xs.toDF("tsec", "value").withColumn("ts", col("tsec").cast("timestamp"))
    val b = ys.toDF("tsec", "value").withColumn("ts", col("tsec").cast("timestamp"))
    val out = graft.scale.SeriesDiagnostics.crossCorrelation(a, b, "value", "ts", maxLag = 4)
      .collect().map(row => row.getInt(0) -> row.getDouble(2)).toMap
    assert(out(2) > 0.9999, s"lag-2 correlation must be ~1, got ${out(2)}")
    assert((0 to 4).filter(_ != 2).forall(l => math.abs(out(l)) < 0.3),
      s"off-lags must stay near 0: $out")
  }

  test("thetaForecast: single-pass algebra equals the textbook Theta(0,2) recipe") {
    // Literal definition: OLS trend A + B*t, theta2 line z = 2y - (A+B*t),
    // SES recursion over z, forecast = (trend(n-1+h) + L)/2.
    val ys = Seq(10.0, 12.5, 11.0, 14.0, 13.5, 16.0, 15.0, 18.5)
    val alpha = 0.5
    val n = ys.length
    val ts = ys.indices.map(_.toDouble)
    val (st, stt) = (ts.sum, ts.map(t => t * t).sum)
    val (sy, sty) = (ys.sum, ts.zip(ys).map { case (t, y) => t * y }.sum)
    val slope = (n * sty - st * sy) / (n * stt - st * st)
    val icept = (sy - slope * st) / n
    val z = ts.zip(ys).map { case (t, y) => 2 * y - (icept + slope * t) }
    val lvl = z.tail.foldLeft(z.head)((l, y) => alpha * y + (1 - alpha) * l)
    val df = ys.zipWithIndex.map { case (y, i) => (1L, i.toLong, i.toLong, y) }
      .toDF("sid", "ts", "eid", "y")
    val out = graft.scale.PerSeriesForecast.thetaForecast(
        df, "y", "ts", Seq("sid"), horizon = 3, alpha = alpha, tieBreak = Seq("eid"))
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    assert(out.size == 3)
    (1 to 3).foreach { h =>
      val expected = (icept + slope * (n - 1 + h) + lvl) / 2
      assert(math.abs(out(h) - expected) < 1e-6,
        s"h=$h: distributed ${out(h)} != textbook $expected")
    }
    // the drift is half the trend slope: successive horizons step by B/2
    assert(math.abs((out(2) - out(1)) - slope / 2) < 1e-6)
  }

  test("holtForecast: distributed fold equals the local recursion; trend is linear in h") {
    val ys = Seq(10.0, 11.5, 13.2, 12.8, 15.0, 16.1, 17.9, 18.2)
    val (alpha, beta) = (0.4, 0.3)
    var l = ys(0); var b = ys(1) - ys(0)
    for (t <- 1 until ys.length) {
      val lNew = alpha * ys(t) + (1 - alpha) * (l + b)
      b = beta * (lNew - l) + (1 - beta) * b
      l = lNew
    }
    val df = ys.zipWithIndex.map { case (y, i) => (1L, i.toLong, i.toLong, y) }
      .toDF("sid", "ts", "eid", "y")
    val out = graft.scale.PerSeriesForecast.holtForecast(
        df, "y", "ts", "sid", horizon = 3, alpha = alpha, beta = beta,
        tieBreak = Some("eid"))
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    (1 to 3).foreach { h =>
      assert(math.abs(out(h) - (l + h * b)) < 1e-9,
        s"h=$h: distributed ${out(h)} != local ${l + h * b}")
    }
    assert(math.abs((out(2) - out(1)) - b) < 1e-9, "forecast must step by the final trend")
  }

  test("holtForecast: n=1 degrades to naive, beta=0 freezes the initial trend") {
    val df = (Seq((1L, 0L, 0L, 42.0)) ++
      Seq(10.0, 12.0, 14.0, 16.0).zipWithIndex.map { case (y, i) => (2L, i.toLong, i.toLong, y) })
      .toDF("sid", "ts", "eid", "y")
    val out = graft.scale.PerSeriesForecast.holtForecast(
        df, "y", "ts", "sid", horizon = 2, alpha = 0.5, beta = 0.0,
        tieBreak = Some("eid"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 1)) == 42.0 && out((1L, 2)) == 42.0)
    // exact linear series with beta=0: level tracks the line, b stays 2
    // -> forecasts continue the line exactly
    (1 to 2).foreach { h =>
      assert(math.abs(out((2L, h)) - (16.0 + 2.0 * h)) < 1e-9,
        s"pure line must extrapolate exactly: h=$h got ${out((2L, h))}")
    }
  }

  test("backtestBaselines: each family wins the series shaped for it; short series skipped") {
    val rows =
      // sid 1: constant -> three-way tie -> 'naive' by the simpler-model rule
      (0 until 20).map(t => (1L, t.toLong, 5.0)) ++
      // sid 2: pure line -> drift extrapolates exactly, MAE 0
      (0 until 20).map(t => (2L, t.toLong, 10.0 + 2.0 * t)) ++
      // sid 3: flat at 10 with an outlier as the LAST train point ->
      // naive anchors on the outlier, SES halves it
      ((0 until 16).map(t => (3L, t.toLong, 10.0)) :+ ((3L, 16L, 30.0))) ++
      (17 until 22).map(t => (3L, t.toLong, 10.0)) ++
      // sid 4: too short (h+1 points) -> skipped entirely
      (0 until 6).map(t => (4L, t.toLong, 1.0))
    val df = rows.toDF("sid", "ts", "y")
    val out = graft.scale.PerSeriesForecast.backtestBaselines(
        df, "y", "ts", Seq("sid"), h = 5, alpha = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getString(5)))).toMap
    assert(!out.contains(4L), "series with no train side must be skipped")
    assert(out(1L)._4 == "naive" && out(1L)._1 == 0.0)
    assert(out(2L)._4 == "drift" && out(2L)._2 < 1e-9,
      s"drift must nail the pure line: ${out(2L)}")
    assert(out(3L)._4 == "ses", s"SES must beat the outlier-anchored naive: ${out(3L)}")
    assert(out(3L)._3 < out(3L)._1, "ses MAE strictly below naive MAE")
  }

  test("backtestZoo: every family wins the series shaped for it; eligibility rules hold") {
    val h = 5
    def ser(sid: Long, ys: Seq[Double]): Seq[(Long, Long, Double)] =
      ys.zipWithIndex.map { case (y, t) => (sid, t.toLong, y) }
    val rows =
      // sid 1: constant -> all-candidate tie -> 'naive' by simplest-first
      ser(1L, Seq.fill(25)(5.0)) ++
      // sid 2: pure line -> drift/holt/theta all exact, 'drift' wins priority
      ser(2L, (0 until 25).map(t => 10.0 + 2.0 * t)) ++
      // sid 3: flat 10, outlier as the LAST train point, short enough to
      // exclude HW (ntr = 12 < 2m) -> naive anchors on the outlier,
      // drift/holt tilt on it, SES halves it
      ser(3L, (0 until 11).map(_ => 10.0) ++ Seq(30.0) ++ Seq.fill(h)(10.0)) ++
      // sid 4: trend with a mid-series LEVEL SHIFT -> holt's adaptive
      // level (SES on the detrended series) absorbs the shift; drift's
      // endpoint slope and theta's OLS line are both polluted by it
      ser(4L, (0 until 20).map(t => 10.0 * t + (if (t >= 12) 25.0 else 0.0)) ++
              (20 until 25).map(t => 10.0 * t + 25.0)) ++
      // sid 5: line + equal-and-opposite endpoint outliers, ntr = 13
      // (HW excluded) -> OLS shrugs the outliers off, endpoints
      // (naive/drift/holt-b1) all anchored wrong -> 'theta'
      ser(5L, { val base = (0 until 13).map(t => 2.0 * t)
                val tr = base.updated(0, base(0) + 8.0).updated(12, base(12) - 8.0)
                tr ++ (13 until 18).map(t => 2.0 * t) }) ++
      // sid 6: intermittent demand 6-every-3rd, test = the demand RATE ->
      // croston forecasts 2/period, everything else tracks the raw zeros
      ser(6L, (0 until 12).map(t => if (t % 3 == 0) 6.0 else 0.0) ++ Seq.fill(h)(2.0)) ++
      // sid 7: PURE additive seasonality (m=7, zero trend — the exact-
      // reconstruction regime: the 2-cycle init recovers level and
      // profile exactly and the recursion preserves them) -> 'hw';
      // nothing else tracks the phase
      ser(7L, (0 until 26).map { t =>
        20.0 + Seq(10.0, -5.0, 0.0, 7.0, -8.0, 3.0, -7.0)(t % 7) }) ++
      // sid 8: flattening curve whose holdout IS the damped-Holt(β=0,
      // φ=0.8) extrapolation of the train (closed-form replica below) —
      // damped nails it; holt/drift over-extrapolate the early slope,
      // SES misses the drip, naive misses the residual climb
      ser(8L, {
        val tr = Seq(10.0, 18.0, 24.0, 27.0, 29.0, 30.5, 31.0, 31.5, 31.8, 32.0)
        val (alpha, phi) = (0.5, 0.8)
        val n = tr.length
        val b1 = tr(1) - tr(0)
        var lvl = math.pow(1 - alpha, n - 1) * tr(0)
        for (k <- 1 until n)
          lvl += alpha * math.pow(1 - alpha, n - 1 - k) * tr(k) +
            (1 - alpha) * b1 * math.pow(phi, k) * math.pow(1 - alpha, n - 1 - k)
        val preds = (1 to h).map { k =>
          var pw = 1.0; var acc = 0.0
          for (_ <- 1 to k) { pw *= phi; acc += pw }
          lvl + b1 * math.pow(phi, n - 1) * acc
        }
        tr ++ preds
      })
    val df = rows.toDF("sid", "ts", "y")
    val out = graft.scale.PerSeriesForecast.backtestZoo(
        df, "y", "ts", "sid", h = h, m = 7)
      .collect().map(r => r.getLong(0) -> r).toMap
    val winners = out.view.mapValues(_.getAs[String]("winner")).toMap
    assert(winners == Map(1L -> "naive", 2L -> "drift", 3L -> "ses",
                          4L -> "holt", 5L -> "theta", 6L -> "croston",
                          7L -> "hw", 8L -> "damped"), s"got $winners")
    // eligibility: HW null on short series, present on long ones
    val iHw = out(3L).fieldIndex("mae_hw")
    assert(out(3L).isNullAt(iHw), "ntr < 2m must exclude HW")
    assert(!out(7L).isNullAt(iHw))
    // the intermittency gate: sid 6 (demand every 3rd period) is the
    // only fixture in the ADI >= 1.32 half — SBA/TSB are candidates
    // there (croston still wins: the holdout IS the undeflated rate's
    // regime) and ineligible (null) on every dense series
    assert(out(6L).getAs[String]("quadrant") == "intermittent")
    assert(!out(6L).isNullAt(out(6L).fieldIndex("mae_sba")))
    assert(out(1L).getAs[String]("quadrant") == "smooth")
    assert(out(1L).isNullAt(out(1L).fieldIndex("mae_sba")), "gate must exclude SBA on smooth series")
    assert(out(1L).isNullAt(out(1L).fieldIndex("mae_tsb")), "gate must exclude TSB on smooth series")
    // croston present even on dense series (all-nonzero is a valid
    // demand pattern), and the exact winners carry ~zero MAE
    assert(out(2L).getDouble(3) < 1e-8, "drift must nail the pure line")
    assert(out(7L).getDouble(9) < 1e-6, "HW must reconstruct pure seasonality+trend")
    // (1e-6 band: zooFit's per-term 1e-9 grids vs the spec's ungridded
    // closed form differ by a few 1e-8 — the margin to every other
    // family is orders larger)
    assert(out(8L).getDouble(6) < 1e-6, "damped must nail its own extrapolation")
  }

  test("backtestZoo intermittency gate: a LUMPY series selects SBA, and " +
       "the same demand pattern with a TSB-shaped holdout selects TSB (r12 task #6)") {
    // train: spiky intermittent demand, sizes 8/1 alternating every 3rd
    // period -> nnz = 4 of 12 (ADI = 3 >= 1.32) and CV^2 of {8,1,8,1}
    // = 4*130/324 - 1 ~ 0.60 >= 0.49 -> LUMPY quadrant, gate ON.
    // Croston rate = 3.625/2.75 ~ 1.3182 overshoots; SBA deflates to
    // ~0.9886 and TSB (prob*size) lands ~0.9686 — holdouts pinned next
    // to each in turn.
    val train = Seq(8.0, 0, 0, 1.0, 0, 0, 8.0, 0, 0, 1.0, 0, 0)
    def ser(sid: Long, ys: Seq[Double]): Seq[(Long, Long, Double)] =
      ys.zipWithIndex.map { case (y, t) => (sid, t.toLong, y) }
    val df = (ser(9L, train ++ Seq(0.99, 0.99)) ++
              ser(10L, train ++ Seq(0.97, 0.97))).toDF("sid", "ts", "y")
    val out = graft.scale.PerSeriesForecast.backtestZoo(
        df, "y", "ts", "sid", h = 2, m = 7)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(9L).getAs[String]("quadrant") == "lumpy", s"got ${out(9L)}")
    assert(out(10L).getAs[String]("quadrant") == "lumpy")
    assert(out(9L).getAs[String]("winner") == "sba", s"got ${out(9L)}")
    assert(out(10L).getAs[String]("winner") == "tsb", s"got ${out(10L)}")
    // SBA really is the deflated croston: mae_sba = |0.99 - 0.75*rate|
    val rate = 3.625 / 2.75
    assert(math.abs(out(9L).getAs[Double]("mae_sba") -
      math.abs(0.99 - 0.75 * rate)) < 1e-6)
  }

  test("cleanSelectForecastZoo: HW-seasonal series wins and is REFIT as HW (r11 task #7 fixture)") {
    val h = 3
    val season = Seq(10.0, -5.0, 0.0, 7.0, -8.0, 3.0, -7.0)
    def ser(sid: Long, ys: Seq[Double]): Seq[(Long, Long, Double)] =
      ys.zipWithIndex.map { case (y, t) => (sid, t.toLong, y) }
    val rows =
      // sid 1: pure additive m=7 seasonality, long enough for HW at both
      // train lengths (ntr = 25 >= 14) -> winner 'hw'
      ser(1L, (0 until 28).map(t => 20.0 + season(t % 7))) ++
      // sid 2: constant -> 'naive' by simplest-first
      ser(2L, Seq.fill(20)(5.0))
    val df = rows.toDF("sid", "ts", "y")
    val out = graft.scale.PerSeriesForecast.cleanSelectForecastZoo(
        df, "y", "ts", "sid", h = h, m = 7)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r).toMap
    assert(out((1L, 1L)).getString(2) == "hw", "seasonal series must pick hw")
    assert(out((2L, 1L)).getString(2) == "naive")
    // the REFIT is hw too: its forecast must reconstruct the seasonal
    // pattern at the right phase (exact-reconstruction regime), which
    // no non-seasonal family could do
    for (k <- 1 to h) {
      val want = 20.0 + season((28 - 1 + k) % 7)
      val got = out((1L, k.toLong)).getDouble(4)
      assert(math.abs(got - want) < 1e-6, s"h=$k: $got vs $want")
    }
    // the constant series refits to the constant
    assert(math.abs(out((2L, 1L)).getDouble(4) - 5.0) < 1e-9)
  }

  test("typoPairs: substitution/insertion/deletion found, transposition and distance-2 excluded") {
    val mk = (s: String) => Seq.fill(3)(s).mkString(" ") // clear the support filter
    val df = Seq(
      (1L, mk("receive") + " " + mk("recieve")),   // transposition: dist 2, MUST drop
      (2L, mk("banana") + " " + mk("bananas")),    // insertion: dist 1
      (3L, mk("orange") + " " + mk("ornge")),      // deletion: dist 1
      (4L, mk("kitten") + " " + mk("mitten")),     // substitution: dist 1
      (5L, mk("table") + " " + mk("chair")),       // unrelated
      (6L, mk("cat") + " " + mk("bat")))           // below minLen, ignored
      .toDF("doc_id", "text")
    val got = graft.scale.TextAnalysis.typoPairs(df, "text", "doc_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("banana", "bananas"), ("orange", "ornge"), ("kitten", "mitten")),
      s"got $got")
    // counts carried for the fold-into-canonical decision
    val cnts = graft.scale.TextAnalysis.typoPairs(df, "text", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(cnts.forall { case (_, a, b) => a == 3 && b == 3 })
  }

  test("sbcClassify: the four quadrants land in their classes; all-zero emits nothing") {
    val rows =
      // sid 1 smooth: demand every period, constant size (ADI=1, CV2=0)
      (0 until 12).map(t => (1L, t.toLong, 10.0)) ++
      // sid 2 intermittent: demand every 3rd period, constant size (ADI=3)
      (0 until 12).map(t => (2L, t.toLong, if (t % 3 == 0) 10.0 else 0.0)) ++
      // sid 3 erratic: demand every period, wildly varying size
      (0 until 12).map(t => (3L, t.toLong, if (t % 2 == 0) 1.0 else 40.0)) ++
      // sid 4 lumpy: sparse AND wild
      (0 until 12).map(t => (4L, t.toLong, if (t % 4 == 0) { if (t % 8 == 0) 1.0 else 50.0 } else 0.0)) ++
      // sid 5: never any demand
      (0 until 12).map(t => (5L, t.toLong, 0.0))
    val out = graft.scale.SeriesDiagnostics.sbcClassify(
        rows.toDF("sid", "ts", "y"), "y", "ts", Seq("sid"))
      .collect().map(r => r.getLong(0) -> ((r.getString(5), r.getString(6)))).toMap
    assert(out == Map(
      1L -> (("smooth", "ses")), 2L -> (("intermittent", "croston")),
      3L -> (("erratic", "ses")), 4L -> (("lumpy", "croston"))),
      s"got $out")
  }

  test("holtForecast damped: increments shrink by phi, phi=1 equals plain Holt") {
    val ys = Seq(5.0, 7.0, 8.5, 11.0, 12.0, 14.5)
    val df = ys.zipWithIndex.map { case (y, i) => (1L, i.toLong, i.toLong, y) }
      .toDF("sid", "ts", "eid", "y")
    def run(phi: Double) = graft.scale.PerSeriesForecast.holtForecast(
        df, "y", "ts", "sid", horizon = 4, alpha = 0.4, beta = 0.3,
        tieBreak = Some("eid"), phi = phi)
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    val damped = run(0.8)
    val steps = (2 to 4).map(h => damped(h) - damped(h - 1))
    steps.sliding(2).foreach { case Seq(a, b) =>
      assert(math.abs(b / a - 0.8) < 1e-9, s"increments must damp by phi: $steps")
    }
    val plain = run(1.0)
    val undampedSteps = (2 to 4).map(h => plain(h) - plain(h - 1))
    assert(undampedSteps.forall(s => math.abs(s - undampedSteps.head) < 1e-9),
      "phi=1 must step by a constant trend")
  }

  test("holtWintersForecast: distributed fold equals the local recursion, incl. init") {
    val ys = Seq(10.0, 14.0, 8.0, 11.0, 16.0, 9.5, 13.0, 18.0, 10.0, 12.5,
                 17.0, 11.0, 15.0, 20.0, 12.0)
    val (m, alpha, beta, gamma) = (3, 0.5, 0.25, 0.25)
    // independent local reference fold (same definitions, separate code)
    val yq = ys.map(v => math.floor(v * 1e9 + 0.5).toLong / 1e9)
    var l = yq.take(m).sum / m
    var b = (0 until m).map(i => yq(m + i) - yq(i)).sum / (m * m)
    val s = Array.tabulate(m)(i => yq(i) - l)
    for (t <- m until ys.length) {
      val ph = t % m
      val lNew = alpha * (yq(t) - s(ph)) + (1 - alpha) * (l + b)
      b = beta * (lNew - l) + (1 - beta) * b
      s(ph) = gamma * (yq(t) - lNew) + (1 - gamma) * s(ph)
      l = lNew
    }
    val df = ys.zipWithIndex.map { case (y, i) => (1L, i.toLong, i.toLong, y) }
      .toDF("sid", "ts", "eid", "y")
    val out = graft.scale.PerSeriesForecast.holtWintersForecast(
        df, "y", "ts", "sid", horizon = 4, m = m, alpha = alpha,
        beta = beta, gamma = gamma, tieBreak = Some("eid"))
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    (1 to 4).foreach { h =>
      val want = l + h * b + s((ys.length - 1 + h) % m)
      assert(math.abs(out(h) - want) < 1e-9,
        s"h=$h: distributed ${out(h)} != local $want")
    }
  }

  test("holtWintersForecast: purely seasonal series reconstructed exactly; short series skipped") {
    // exact period-3 pattern, zero trend: init gives l=pattern mean, b=0,
    // s=deviations; every recursion step is then a fixed point -> the
    // forecast replays the pattern exactly at ANY alpha/beta/gamma
    val pattern = Seq(4.0, 9.0, 2.0)
    val rows = (0 until 12).map(i => (1L, i.toLong, i.toLong, pattern(i % 3))) ++
      (0 until 5).map(i => (2L, i.toLong, i.toLong, 1.0 * i)) // n=5 < 2m=6
    val df = rows.toDF("sid", "ts", "eid", "y")
    val out = graft.scale.PerSeriesForecast.holtWintersForecast(
        df, "y", "ts", "sid", horizon = 6, m = 3, alpha = 0.3,
        beta = 0.2, gamma = 0.4, tieBreak = Some("eid"))
      .collect()
    assert(out.forall(_.getLong(0) == 1L), "series shorter than 2m must be skipped")
    val byH = out.map(r => r.getInt(1) -> r.getDouble(2)).toMap
    (1 to 6).foreach { h =>
      val want = pattern((12 - 1 + h) % 3)
      assert(math.abs(byH(h) - want) < 1e-9,
        s"pure seasonal must replay the pattern: h=$h got ${byH(h)} want $want")
    }
  }

  test("crostonForecast: hand-computed demand/interval smoothing, all-zero series emits nothing") {
    // demands z=[3,6,2] at positions t=[3,7,9] -> intervals q=[3,4,2]
    // SES(0.5): level(z) = 0.5*2 + 0.5*(0.5*6 + 0.5*3) = 3.25
    //           level(q) = 0.5*2 + 0.5*(0.5*4 + 0.5*3) = 2.75
    val ys = Seq(0.0, 0.0, 3.0, 0.0, 0.0, 0.0, 6.0, 0.0, 2.0)
    val rows = ys.zipWithIndex.map { case (y, i) => (1L, i.toLong, i.toLong, y) } ++
      (0 until 5).map(i => (2L, i.toLong, i.toLong, 0.0))
    val df = rows.toDF("sid", "ts", "eid", "y")
    val out = graft.scale.PerSeriesForecast.crostonForecast(
        df, "y", "ts", Seq("sid"), horizon = 2, alpha = 0.5, tieBreak = Seq("eid"))
      .collect()
    assert(out.forall(_.getLong(0) == 1L), "the all-zero series must emit no rows")
    val byH = out.map(r => r.getInt(1) -> r.getDouble(2)).toMap
    assert(byH.size == 2)
    (1 to 2).foreach { h =>
      assert(math.abs(byH(h) - 3.25 / 2.75) < 1e-6,
        s"h=$h: expected ${3.25 / 2.75}, got ${byH(h)}")
    }
    assert(out.forall(_.getLong(3) == 3L), "three demand points")
  }

  test("thetaForecast: constant series forecasts the constant; n=1 degrades to naive") {
    val df = (Seq.fill(6)(7.5).zipWithIndex.map { case (y, i) => (1L, i.toLong, i.toLong, y) }
      :+ ((2L, 0L, 0L, 42.0)))
      .toDF("sid", "ts", "eid", "y")
    val out = graft.scale.PerSeriesForecast.thetaForecast(
        df, "y", "ts", Seq("sid"), horizon = 2, alpha = 0.5, tieBreak = Seq("eid"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    (1 to 2).foreach { h =>
      assert(math.abs(out((1L, h)) - 7.5) < 1e-6)
      assert(math.abs(out((2L, h)) - 42.0) < 1e-6)
    }
  }

  test("fourierFeatures: exact quarter-cycle values, phase wraps at the period") {
    val df = (0 until 8).map(i => (1L, i.toLong, i.toLong)).toDF("sid", "ts", "eid")
    val out = graft.core.TimeSeriesOps.fourierFeatures(
        df, "ts", Seq("sid"), m = 4, harmonics = 1, tieBreak = Seq("eid"))
      .orderBy("t").collect()
      .map(r => (r.getLong(3), r.getDouble(4), r.getDouble(5)))
    val wantSin = Seq(0.0, 1.0, 0.0, -1.0)
    val wantCos = Seq(1.0, 0.0, -1.0, 0.0)
    out.foreach { case (t, s, c) =>
      assert(math.abs(s - wantSin((t % 4).toInt)) < 1e-12, s"sin(t=$t)=$s")
      assert(math.abs(c - wantCos((t % 4).toInt)) < 1e-12, s"cos(t=$t)=$c")
    }
    assert(out.map(_._1).toSeq == (0L to 7L), "row index must be dense per series")
  }

  test("rfm: hand-computed recency/frequency/monetary and rank-pinned quintiles") {
    val ev = Seq(
      (1L, 100L, 1.0), (1L, 200L, 2.0),
      (2L, 300L, 10.0),
      (3L, 10L, 0.5), (3L, 20L, 0.5), (3L, 30L, 0.5))
      .map { case (u, sec, v) =>
        (u, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)), v) }
      .toDF("uid", "ts", "v")
    val out = graft.scale.EventAnalytics.rfm(ev, "uid", "ts", "v")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4), r.getInt(5), r.getInt(6)))
      .toMap
    // frontier = 300; quintile of rank k among 3 = ceil(5k/3) in {2,4,5}
    assert(out(1L) == ((100L, 2L, 3.0, 4, 4, 4)), s"u1 ${out(1L)}")
    assert(out(2L) == ((0L, 1L, 10.0, 5, 2, 5)), s"u2 ${out(2L)}")
    assert(out(3L) == ((270L, 3L, 1.5, 2, 5, 2)), s"u3 ${out(3L)}")
  }

  test("semDecontaminate: exact-copy and scaled-copy flagged, orthogonal vector clean") {
    val eval = Seq((100L, Seq(1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val train = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),   // exact copy -> cos 1
      (2L, Seq(5.0, 0.0, 0.0)),   // scaled copy -> cos 1 (paraphrase analogue)
      (3L, Seq(0.0, 1.0, 0.0)),   // orthogonal -> cos 0
      (4L, Seq(1.0, 1.0, 0.0)))   // 45 degrees -> cos ~0.707
      .toDF("vec_id", "embedding")
    val out = graft.scale.Curation.semDecontaminate(train, eval, "embedding", 0.9)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(out(1L)._2 && math.abs(out(1L)._1 - 1.0) < 1e-12)
    assert(out(2L)._2, "magnitude must not matter — cosine is scale-free")
    assert(!out(3L)._2 && math.abs(out(3L)._1) < 1e-12)
    assert(!out(4L)._2 && math.abs(out(4L)._1 - math.sqrt(0.5)) < 1e-12)
  }

  test("hammingPairs: pigeonhole finds hamming<=3, excludes spread-out 4-bit differences") {
    // 1 vs 2: hamming 3 (bits 0-2) -> must be found via the shared upper
    // blocks; 1 vs 3: hamming 4 spread one bit per 16-bit block -> no
    // shared block AND above the filter; 2 vs 3: hamming 7 -> excluded.
    val df = Seq((1L, 0L), (2L, 7L), (3L, 0x0001000100010001L))
      .toDF("id", "sig")
    val got = graft.scale.Dedup.hammingPairs(df, "sig", "id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 3)), s"got $got")
  }

  test("clusterSplit: a near-dup cluster never straddles the fence; singletons match hashSplit") {
    val docs = (1L to 5L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = graft.scale.Sampling.clusterSplit(docs, "doc_id", pairs, "id_a", "id_b")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 5, "split must be total over the corpus")
    assert(out(1L) == out(2L) && out(2L) == out(3L),
      s"cluster {1,2,3} must share a split: $out")
    val solo = graft.scale.Sampling.hashSplit(
        Seq(4L, 5L).toDF("id"), "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(4L) == solo(4L) && out(5L) == solo(5L),
      "unpaired docs must split exactly as row-keyed hashSplit")
  }

  test("binaryAuc: perfect ranking is 1, inverted is 0, ties contribute half; single class is null") {
    def auc(rows: Seq[(Double, Int)]): Option[Double] = {
      val r = graft.stats.Metrics.binaryAuc(rows.toDF("s", "l"), "s", "l")
        .collect().head
      if (r.isNullAt(2)) None else Some(r.getDouble(2))
    }
    assert(auc(Seq((0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1))).contains(1.0))
    assert(auc(Seq((0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0))).contains(0.0))
    // tie case: (0.5,1),(0.5,0),(0.8,1) -> pairs: tie 0.5 + win = 0.75
    assert(auc(Seq((0.5, 1), (0.5, 0), (0.8, 1))).contains(0.75))
    assert(auc(Seq((0.5, 1), (0.8, 1))).isEmpty, "single-class input must be null")
  }

  test("acfPerSeries agrees with the single-series StatTests.acf; constant series gives nulls") {
    val r = graft.core.DetRandom.doubles(7)
    val ys = Array.fill(60)(r() * 10)
    val want = graft.stats.StatTests.acf(ys, 6)
    val rows = ys.toSeq.zipWithIndex.map { case (y, i) => (1L, i.toLong, i.toLong, y) } ++
      (0 until 10).map(i => (2L, i.toLong, i.toLong, 3.0))
    val out = graft.scale.SeriesDiagnostics.acfPerSeries(
        rows.toDF("sid", "ts", "eid", "y"), "y", "ts", Seq("sid"), maxLag = 6,
        tieBreak = Seq("eid"))
      .collect().map(r0 => r0.getLong(0) -> r0).toMap
    (1 to 6).foreach { k =>
      val got = out(1L).getDouble(1 + k)
      assert(math.abs(got - want(k)) < 1e-9,
        s"lag $k: distributed $got != StatTests ${want(k)}")
    }
    (1 to 6).foreach { k =>
      assert(out(2L).isNullAt(1 + k), "constant series must yield null ACF")
    }
  }

  test("targetEncode: hand-computed leave-fold-out means; singleton-fold category degrades to prior") {
    // cat a: ids 0..3 y=10/20/30/40, 2 folds; cat b: id 4 y=100.
    // prior = 200/5 = 40, m = 2.
    // enc(a, f0) = ((100-40) + 2*40)/((4-2)+2) = 35
    // enc(a, f1) = ((100-60) + 2*40)/4 = 30
    // enc(b, f0) = ((100-100) + 2*40)/((1-1)+2) = 40 = prior
    val df = Seq((0L, "a", 10.0), (1L, "a", 20.0), (2L, "a", 30.0),
                 (3L, "a", 40.0), (4L, "b", 100.0))
      .toDF("id", "cat", "y")
    val out = graft.core.Encoders.targetEncode(df, "cat", "y", "id",
        folds = 2, smoothing = 2.0)
      .select("cat", "__fold", "cat_te").distinct()
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(math.abs(out(("a", 0)) - 35.0) < 1e-9, s"${out(("a", 0))}")
    assert(math.abs(out(("a", 1)) - 30.0) < 1e-9, s"${out(("a", 1))}")
    assert(math.abs(out(("b", 0)) - 40.0) < 1e-9, "singleton fold must fall back to the prior")
    // leakage check: a row's own fold's targets never enter its encoding —
    // perturbing fold-1 targets must leave fold-1's OWN encoding of the
    // other rows... i.e. fold-0 rows' encoding changes, fold-1's does not
    // change through its own values: enc(a, f1) depends only on folds != 1.
    val df2 = Seq((0L, "a", 10.0), (1L, "a", 999.0), (2L, "a", 30.0),
                  (3L, "a", 999.0), (4L, "b", 100.0))
      .toDF("id", "cat", "y") // perturb only fold-1 rows (ids 1, 3)
    val out2 = graft.core.Encoders.targetEncode(df2, "cat", "y", "id",
        folds = 2, smoothing = 2.0)
      .select("cat", "__fold", "cat_te").distinct()
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // fold-1's encoding uses fold-0 sums (10+30 unchanged) + prior shift only
    val prior2 = (10.0 + 999.0 + 30.0 + 999.0 + 100.0) / 5
    assert(math.abs(out2(("a", 1)) - ((10 + 30 + 2 * prior2) / 4)) < 1e-9,
      "fold-1 encoding must not contain fold-1 targets")
    // null category / null id rows are PRESERVED and encode to the prior
    // (null keys never equi-match; the left join + coalesce rule)
    val df3 = Seq((Some(0L), Some("a"), 10.0), (Some(1L), None, 20.0),
                  (None, Some("a"), 30.0))
      .toDF("id", "cat", "y")
    val out3 = graft.core.Encoders.targetEncode(df3, "cat", "y", "id",
        folds = 2, smoothing = 2.0)
    assert(out3.count() == 3, "null-key rows must not be dropped")
    val prior3 = 60.0 / 3
    val nullRows = out3.filter($"cat".isNull || $"id".isNull)
      .select($"cat_te").collect().map(_.getDouble(0))
    assert(nullRows.length == 2 &&
      nullRows.forall(v => math.abs(v - prior3) < 1e-9),
      s"null-key rows must encode to the prior, got ${nullRows.toSeq}")
  }

  test("rangeJoin: boundary semantics, bucket false positives filtered, lo>hi dropped, keys respected") {
    val points = Seq((1L, "a", -5.0), (2L, "a", 0.0), (3L, "a", 10.0),
                     (4L, "a", 10.5), (5L, "b", 10.0))
      .toDF("pid", "k", "v")
    val intervals = Seq(("a", "i1", -10.0, 0.0), ("a", "i2", 10.0, 10.0),
                        ("a", "bad", 5.0, 1.0), ("b", "i3", 9.0, 11.0))
      .toDF("k", "iv", "lo", "hi")
    // bucketWidth 3 => interval [-10,0] spans buckets -4..0: point 0.0
    // shares bucket 0 but 10.5 (bucket 3) must not leak into i2 (10,10)
    val got = graft.core.JoinOps.rangeJoin(points, "v", intervals, "lo", "hi",
        bucketWidth = 3.0, keys = Seq("k"))
      .select("pid", "iv").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "i1"), (2L, "i1"), (3L, "i2"), (5L, "i3")), s"got $got")
    // half-open form drops the hi-boundary match
    val halfOpen = graft.core.JoinOps.rangeJoin(points, "v", intervals, "lo", "hi",
        bucketWidth = 3.0, keys = Seq("k"), inclusiveHi = false)
      .select("pid", "iv").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(halfOpen == Set((1L, "i1"), (5L, "i3")), s"got $halfOpen")
  }

  test("timeWindowAgg: RANGE frame means 'last hour', not 'last k rows'; same-second peers share a frame") {
    val rows = Seq((1L, 0L, 1.0), (1L, 1800L, 2.0), (1L, 3600L, 3.0), (1L, 7300L, 4.0),
                   (2L, 10L, 5.0), (2L, 10L, 7.0), (2L, 5000L, 9.0))
      .map { case (u, sec, y) => (u, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)), y) }
    val out = graft.core.TimeSeriesOps.timeWindowAgg(
        rows.toDF("uid", "ts", "y"), "y", "ts", Seq("uid"), 3600L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toInstant.getEpochSecond, r.getDouble(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    assert(out((1L, 0L, 1.0)) == (1L, 1.0))
    assert(out((1L, 1800L, 2.0)) == (2L, 3.0))
    assert(out((1L, 3600L, 3.0)) == (3L, 6.0), "3600-preceding frame is inclusive")
    assert(out((1L, 7300L, 4.0)) == (1L, 4.0), "events older than the window must fall out")
    assert(out((2L, 10L, 5.0)) == (2L, 12.0) && out((2L, 10L, 7.0)) == (2L, 12.0),
      "same-second peers share one frame")
  }

  test("trendStrength: pure line scores ~1, constant scores 0, line beats pure seasonal") {
    val line = (0 until 21).map(i => (1L, i.toLong, 2.0 * i))
    val const = (0 until 21).map(i => (2L, i.toLong, 5.0))
    val seas = (0 until 21).map(i => (3L, i.toLong, Seq(1.0, 8.0, 3.0)(i % 3)))
    val df = (line ++ const ++ seas).map { case (u, t, y) => (u, t, t, y) }
      .toDF("uid", "ts", "eid", "y")
    val out = graft.scale.SeriesDiagnostics.trendStrength(
        df, "y", "ts", Seq("uid"), m = 3, tieBreak = Seq("eid"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) > 0.999, s"pure line: ${out(1L)}")
    assert(out(2L) == 0.0, s"constant (zero variance) must score 0: ${out(2L)}")
    assert(out(3L) < out(1L) && out(3L) < 0.5, s"pure seasonal: ${out(3L)}")
  }

  test("rollingOriginCv: hand-computed fold fits on the line 1..6; short series skipped") {
    // h=1, K=2 on [1..6]: fold1 trains 1..4 (tests 5), fold2 trains 1..5
    // (tests 6). Drift is exact (errors 0) and wins; naive errs 1 per
    // fold; SES_0.5 levels are 3.125 and 4.0625 -> mae_ses = 1.90625.
    val rows = (1 to 6).map(i => (1L, i.toLong, i.toLong, i.toDouble)) ++
      (1 to 3).map(i => (2L, i.toLong, i.toLong, 5.0)) // n=3 < h*K+2=4
    val out = graft.scale.PerSeriesForecast.rollingOriginCv(
        rows.toDF("sid", "ts", "eid", "y"), "y", "ts", Seq("sid"), h = 1,
        folds = 2, alpha = 0.5, tieBreak = Seq("eid"))
      .collect()
    assert(out.forall(_.getLong(0) == 1L), "series shorter than h*K+2 must be skipped")
    val r = out.head
    assert(r.getLong(1) == 6L)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-9, s"mae_naive ${r.getDouble(2)}")
    assert(r.getDouble(3) == 0.0, s"mae_drift ${r.getDouble(3)}")
    assert(math.abs(r.getDouble(4) - 1.90625) < 1e-9, s"mae_ses ${r.getDouble(4)}")
    assert(r.getString(5) == "drift")
  }

  test("cleanSelectForecast: spike is cleaned so drift wins and extends the line; constant ties to naive") {
    // series 1: the line 1..20 with a wild spike (100) at position 10.
    // Uncleaned, the spike sits in the drift train window and wrecks it;
    // Hampel replaces it with the rolling median (11), the endpoints
    // stay on the line, drift wins the backtest with ZERO holdout error
    // and the full-series refit extends the exact line: yhat = 20 + h.
    val rows = (1 to 20).map(i =>
        (1L, i.toLong, i.toLong, if (i == 10) 100.0 else i.toDouble)) ++
      (1 to 10).map(i => (2L, i.toLong, i.toLong, 7.0))
    val out = graft.scale.PerSeriesForecast.cleanSelectForecast(
        rows.toDF("sid", "ts", "eid", "y"), "y", "ts", Seq("sid"), h = 3,
        tieBreak = Seq("eid"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> (r.getString(1), r.getDouble(3)))
      .toMap
    (1 to 3).foreach { h =>
      val (w1, y1) = out((1L, h))
      assert(w1 == "drift", s"spiked line must select drift, got $w1")
      assert(math.abs(y1 - (20.0 + h)) < 1e-6, s"h=$h: $y1")
      val (w2, y2) = out((2L, h))
      assert(w2 == "naive", "exact tie must break to the simplest model")
      assert(y2 == 7.0)
    }
  }

  test("bpeLearn: the classic Sennrich fixture learns (e,s), (es,t), (l,o) in order") {
    // word counts: low:5, lower:2, newest:6, widest:3 — the worked
    // example from Sennrich et al. 2016 §3.2. Round 1: e-s and s-t tie
    // at 9, lexicographic tie-break picks (e,s); round 2: es-t at 9;
    // round 3: l-o and o-w tie at 7, tie-break picks (l,o).
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = graft.scale.TextAnalysis.bpeLearn(docs, "text", merges = 3)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq((1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)),
      s"got ${merges.toSeq}")
  }

  test("bpeLearn: the lazy-persist one-job loop is sequence-equivalent to " +
       "a local reference BPE over a 60-word mixed corpus (20 merges)") {
    // reference: textbook greedy BPE over (word -> count), ties on
    // (count desc, pair asc) — the exact contract bpeLearn documents
    def refBpe(words: Map[String, Long], merges: Int,
               minCount: Long): Seq[(Int, String, String, Long)] = {
      var vocab = words.map { case (w, c) => (w.split("").toVector, c) }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
      var step = 1
      var go = merges >= 1
      while (go) {
        val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
          pairCounts((syms(i), syms(i + 1))) =
            pairCounts.getOrElse((syms(i), syms(i + 1)), 0L) + c
        if (pairCounts.isEmpty) go = false
        else {
          val ((l, r), n) = pairCounts.toSeq
            .minBy { case ((a, b), c) => (-c, a + "" + b) }
          if (n < minCount) go = false
          else {
            out += ((step, l, r, n))
            vocab = vocab.map { case (syms, c) =>
              // same left-fold semantics as bpeLearn's aggregate(): the
              // merged symbol cannot fuse again with a following r
              val acc = syms.foldLeft(Vector.empty[String]) { (a, x) =>
                if (a.nonEmpty && a.last == l && x == r)
                  a.dropRight(1) :+ (l + r)
                else a :+ x
              }
              (acc, c)
            }
            step += 1
            if (step > merges) go = false
          }
        }
      }
      out.toSeq
    }
    // a corpus rich enough that merges interact (shared symbols, fused
    // symbols re-merging) for many rounds
    val words = Map("banana" -> 9L, "bandana" -> 4L, "cabana" -> 6L,
      "analog" -> 3L, "anagram" -> 5L, "nagana" -> 2L, "lowest" -> 7L,
      "lowly" -> 3L, "slowest" -> 2L, "newest" -> 6L, "widest" -> 3L,
      "estuary" -> 2L)
    val docs = words.toSeq.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val got = graft.scale.TextAnalysis.bpeLearn(docs, "text", merges = 20,
        minCount = 2L)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val want = refBpe(words, 20, 2L)
    assert(got == want, s"distributed $got\n!= reference $want")
    assert(got.length >= 10, s"fixture too shallow: ${got.length} merges")
  }

  test("bpeTokenCounts: applying the learned merges reproduces the Sennrich tokenization") {
    // after merges (e,s), (es,t), (l,o): newest -> n e w est,
    // widest -> w i d est, low -> lo w, lower -> lo w e r
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = graft.scale.TextAnalysis.bpeLearn(docs, "text", merges = 3)
    val got = graft.scale.TextAnalysis.bpeTokenCounts(docs, "text", merges, 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Map(
      "est" -> 9L,            // newest x6 + widest x3
      "lo" -> 7L,             // low x5 + lower x2
      "w" -> 16L,             // newest 6 + widest 3 + low 5 + lower 2
      "n" -> 6L, "e" -> 8L,   // newest 6 + lower 2
      "i" -> 3L, "d" -> 3L, "r" -> 2L)
    assert(got == want, s"got $got")
  }

  test("packGreedy: hand fixture packs first-fit in id order; overflow doc gets its own sequence") {
    // single group, single shard; budget 10. token counts: 4, 4, 4, 13, 2
    // greedy: [4,4] (8) | [4] then 13 overflows -> [4],[13] | [2]
    // wait - 4+4=8, +4=12>10 -> seq1=[4,4]=8; seq2=[4]... +13>10 -> seq3=[13]; seq4=[2]
    val docs = Seq(
      (0L, "a b c d"), (8L, "e f g h"), (16L, "i j k l"),
      (24L, "m n o p q r s t u v w x y"), (32L, "z zz")
    ).toDF("doc_id", "text").withColumn("source", lit("s"))
    val got = graft.scale.Packing.packGreedy(docs, "text", "doc_id", "source",
        budget = 10L, shards = 8)
      .orderBy("seq_id")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 2L, 8L), (2L, 1L, 4L), (3L, 1L, 13L), (4L, 1L, 2L)),
      s"got ${got.toSeq}")
  }

  test("packGreedy corpus invariants: token mass preserved; multi-doc sequences within budget") {
    val docs = graft.Tables.documents(spark, SF)
    val budget = 512L
    val packed = graft.scale.Packing.packGreedy(docs, "text", "doc_id", "source",
      budget, shards = 8).cache()
    val totalPacked = packed.agg(sum("n_tokens")).head().getLong(0)
    val totalDocs = docs.select(graft.scale.Packing.tokenCount(col("text")).as("t"))
      .agg(sum("t")).head().getLong(0)
    assert(totalPacked == totalDocs,
      s"token mass changed: packed $totalPacked vs docs $totalDocs")
    val over = packed.filter(col("n_docs") >= 2 && col("n_tokens") > budget).count()
    assert(over == 0L, s"$over multi-doc sequences exceed the budget")
    val singles = packed.filter(col("n_docs") === 1 && col("n_tokens") > budget)
    // overflow singles are allowed (doc longer than budget) - and each such
    // doc must really be longer than the budget
    val fakeOver = singles.count() -
      docs.filter(graft.scale.Packing.tokenCount(col("text")) > budget).count()
    assert(fakeOver <= 0L, s"singleton sequences over budget without an overflow doc")
    packed.unpersist()
  }

  test("budgetSelect: three-level refinement equals the naive ranked prefix, exactly") {
    val docs = graft.Tables.documents(spark, SF)
    val got = graft.scale.Packing.budgetSelect(docs, "text", "doc_id", "source")
      .agg(sum("n_kept"), sum("tok_kept")).head()
    val (nKept, tokKept) = (got.getLong(0), got.getLong(1))
    // naive re-derivation: full sort by (q desc, md5, id), prefix <= budget
    val scored = graft.scale.TextAnalysis.qualityScore(docs, "text")
      .select((floor(col("quality") * 100.0 + 0.5) / 100.0).as("q"),
              md5(col("doc_id").cast("string")).as("h"), col("doc_id"),
              graft.scale.Packing.tokenCount(col("text")).as("toks"))
      .collect().map(r => (r.getDouble(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val budget = math.floor(scored.map(_._4).sum * 2.0 / 5.0).toLong
    val ranked = scored.sortBy { case (q, h, id, _) => (-q, h, id) }
    var cum = 0L; var wantN = 0L; var wantTok = 0L; var stopped = false
    for ((_, _, _, toks) <- ranked if !stopped) {
      if (cum + toks <= budget) { cum += toks; wantN += 1; wantTok += toks }
      else stopped = true
    }
    assert((nKept, tokKept) == ((wantN, wantTok)),
      s"got ($nKept, $tokKept), want ($wantN, $wantTok), budget $budget")
    assert(tokKept <= budget && tokKept > 0, "kept mass out of range")
  }

  test("snakeShard: token imbalance bounded by the largest doc; all docs dealt") {
    val docs = graft.Tables.documents(spark, SF)
    val shards = graft.scale.Packing.snakeShard(docs, "text", "doc_id", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(shards.map(_._1).sorted.toSeq == (0L until 8L), "missing shard ids")
    val totalDocs = docs.count()
    assert(shards.map(_._2).sum == totalDocs, "doc count not preserved")
    val toks = shards.map(_._3)
    val maxDoc = docs
      .select(graft.scale.Packing.tokenCount(col("text")).as("t"))
      .agg(max("t")).head().getLong(0)
    assert(toks.max - toks.min <= maxDoc,
      s"imbalance ${toks.max - toks.min} exceeds largest doc $maxDoc")
  }

  test("budgetSelectDocs: doc-level keeps aggregate to budgetSelect exactly") {
    val docs = graft.Tables.documents(spark, SF)
    val agg = graft.scale.Packing.budgetSelect(docs, "text", "doc_id", "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val fromDocs = graft.scale.Packing
      .budgetSelectDocs(docs, "text", "doc_id", "source")
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum("toks").as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(fromDocs == agg, s"doc-level form diverges: $fromDocs vs $agg")
  }

  test("pqTopK: valid pairings, recall@5 vs exact L2, refinement no worse than seeds") {
    val ids = Seq(0L, 1L, 2L, 3L, 4L)
    val em = graft.Tables.embeddings(spark, SF)
    val vecs = em.select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def l2sq(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => { val t = a(i) - b(i); t * t }).sum
    val exact = ids.map { q =>
      q -> vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (l2sq(vecs(q), v), id) }
        .sorted.take(5).map(_._2).toSet
    }.toMap
    def recallOf(iters: Int): Double = {
      val got = graft.scale.ProductQuant.pqTopK(em, ids, 5, "embedding",
          "vec_id", m = 4, ks = 16, lloydIters = iters)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      assert(got.length == 25 && got.forall { case (q, v) => q != v })
      got.count { case (q, v) => exact(q)(v) }.toDouble / 25.0
    }
    val seedR = recallOf(0); val lloydR = recallOf(1)
    assert(lloydR >= 0.3, s"PQ recall@5 after Lloyd too low: $lloydR (seed $seedR)")
    assert(lloydR >= seedR - 0.12,
      s"Lloyd refinement degraded recall: $lloydR vs seed $seedR")
    // composed IVF+PQ: valid pairings; pruning costs recall vs full-scan
    // PQ but must keep a usable floor, and exhaustive probing must
    // reproduce full-scan PQ exactly (pruning is the ONLY approximation
    // IVF adds on top of the code quantization)
    val ivfpq = graft.scale.ProductQuant.ivfPqTopK(em, ids, 5, "embedding",
        "vec_id", nCells = 8, nProbe = 3, m = 4, ks = 16, lloydIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(ivfpq.length == 25 && ivfpq.forall { case (q, v) => q != v })
    val ivfR = ivfpq.count { case (q, v) => exact(q)(v) }.toDouble / 25.0
    assert(ivfR >= 0.2, s"IVF+PQ recall@5 too low: $ivfR (full-scan PQ $lloydR)")
    val exhaustive = graft.scale.ProductQuant.ivfPqTopK(em, ids, 5, "embedding",
        "vec_id", nCells = 8, nProbe = 8, m = 4, ks = 16, lloydIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fullPq = graft.scale.ProductQuant.pqTopK(em, ids, 5, "embedding",
        "vec_id", m = 4, ks = 16, lloydIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exhaustive == fullPq, "exhaustive-probe IVF+PQ != full-scan PQ")
  }

  test("meanScaleTokens: hand fixture bins, flat series centers, extremes clip") {
    // series 1: values (1, 2, 3) -> mean |y| = 2, ratios (0.5, 1, 1.5)
    //   token = floor((r+15)/30*64): 0.5->33, 1.0->34, 1.5->35
    // series 2: flat zeros -> center token 32
    // series 3: 30 zeros + (+1, -1) -> scale 2/32, ratio ±16 > clip 15
    //   -> the positive point clips to 63, the negative to 0
    val s3 = (0 until 30).map(i => (3L, 30L + i, 0.0)) ++
      Seq((3L, 62L, 1.0), (3L, 63L, -1.0))
    val df = (Seq(
      (1L, 10L, 1.0), (1L, 11L, 2.0), (1L, 12L, 3.0),
      (2L, 20L, 0.0), (2L, 21L, 0.0)
    ) ++ s3).toDF("sid", "id", "y")
    val got = graft.scale.TsTokens.meanScaleTokens(df, "y", "id", "sid")
      .collect().map(r => (r.getLong(1), r.getLong(3))).toMap
    assert(got(10L) == 33L && got(11L) == 34L && got(12L) == 35L,
      s"series-1 bins wrong: $got")
    assert(got(20L) == 32L && got(21L) == 32L, s"flat series must center: $got")
    assert(got(62L) == 63L && got(63L) == 0L, s"extremes must clip: $got")
  }

  test("reconstruct: round-trip error within half a bin for unclipped points") {
    val ev = graft.Tables.events(spark, SF)
    val rec = graft.scale.TsTokens.reconstruct(ev, "value", "event_id",
        "user_id", bins = 64, clip = 15.0)
    // per-series scale for the bound: mean |y| on the 1e-6 grid
    val scales = ev.select(col("user_id").cast("long").as("sid"),
        floor(col("value") * 1e6 + 0.5).cast("long").as("y6"))
      .groupBy("sid").agg((sum(abs(col("y6"))) / count(lit(1)) / 1e6).as("sc"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = rec.collect().map(r =>
      (r.getLong(0), r.getDouble(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val halfBin = 15.0 / 64.0 // clip/bins = half of the 2*clip/bins bin width
    for ((sid, y, token, yHat) <- rows if token > 0 && token < 63) {
      val bound = scales(sid) * halfBin + 1e-6
      assert(math.abs(y - yHat) <= bound,
        s"series $sid: |$y - $yHat| > $bound (token $token)")
    }
  }

  test("bpeLearn: minCount stops early; bpePairCounts top row is round-1's winner") {
    val docs = Seq((1L, "ab ab ab"), (2L, "cd")).toDF("doc_id", "text")
    // pair counts: a-b: 3, c-d: 1. minCount=2 -> only (a,b) learned.
    val merges = graft.scale.TextAnalysis.bpeLearn(docs, "text", merges = 5, minCount = 2L)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq(("a", "b", 3L)), s"got ${merges.toSeq}")
    val top = graft.scale.TextAnalysis.bpePairCounts(docs, "text", 2).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(top.toSeq == Seq(("ab", 3L), ("cd", 1L)), s"got ${top.toSeq}")
  }

  test("annealMixture: budget conservation, caps, and anneal membership = top half by quality") {
    val out = Sampling.annealMixture(docs, "source", "text",
        budgetNum = 2L, budgetDen = 5L, annealPct = 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 20)
    out.foreach { case (s, avail, m, a) =>
      assert(m >= 0 && a >= 0, s"$s negative allocation")
      assert(m <= avail, s"$s main alloc exceeds availability")
      assert(a <= avail, s"$s anneal alloc exceeds availability")
    }
    val tot = out.map(_._2).sum
    val budget = math.floor(tot.toDouble * 2.0 / 5.0).toLong
    val mainB = math.floor(budget.toDouble * 0.8).toLong
    val annealB = budget - mainB
    // proportional-with-floor conservation: each phase within |sources| slack
    val mainTot = out.map(_._3).sum; val annTot = out.map(_._4).sum
    assert(mainTot <= mainB && mainB - mainTot <= out.length,
      s"main phase slack: alloc=$mainTot budget=$mainB")
    assert(annTot <= annealB && annealB - annTot <= out.length,
      s"anneal phase slack: alloc=$annTot budget=$annealB")
    // exactly half the sources participate in the anneal phase
    assert(out.count(_._4 > 0) == 10,
      s"anneal membership should be the top 10 of 20 sources, got ${out.count(_._4 > 0)}")
    // membership is quality-ranked: anneal sources have mean quality >=
    // every non-anneal source's (ties broken by name, so compare the cut)
    val q = TextAnalysis.qualityScore(docs, "text")
      .groupBy("source").agg(avg("quality").as("mq"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val inA = out.filter(_._4 > 0).map(t => q(t._1)).min
    val outA = out.filter(_._4 == 0).map(t => q(t._1)).max
    assert(inA >= outA - 1e-9,
      s"anneal cut not quality-ranked: min-in=$inA max-out=$outA")
  }

  test("wordDropout: exact drop layout, phase varies the mask, short docs pass through") {
    val df = Seq(
      (0L, "a b c d e f g h i j"),  // id 0: drop positions 10 -> "j"
      (9L, "a b c d e f g h i j"),  // id 9: drop i where (9+i)%10=0 -> i=1 "a"
      (1L, "a b c")                  // short -> untouched
    ).toDF("doc_id", "text")
    val out = graft.scale.Curation.wordDropout(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(0L) == ((true, 1L, "a b c d e f g h i")), s"got ${out(0L)}")
    assert(out(9L) == ((true, 1L, "b c d e f g h i j")), s"got ${out(9L)}")
    assert(out(1L) == ((false, 0L, "a b c")))
    // a different phase produces a different mask on the same doc
    val p1 = graft.scale.Curation.wordDropout(df, "text", "doc_id", phase = 1L)
      .filter(col("id") === 0L).collect()(0).getString(3)
    assert(p1 != out(0L)._3 && p1 == "a b c d e f g h j",
      s"phase=1 should shift the mask: $p1")
    // corpus-wide: drop rate is ~1/modulus, never more than ceil(n/10)
    val rates = graft.scale.Curation.wordDropout(docs, "text", "doc_id")
      .filter(col("dropped"))
      .select(col("n_dropped"),
        size(split(col("out_text"), " ")).cast("long").as("n_kept"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rates.nonEmpty)
    rates.foreach { case (nd, nk) =>
      val n = nd + nk
      assert(nd <= n / 10 + 1, s"drop count $nd too high for n=$n") }
  }

  test("spanCorrupt: exact sentinel layout, pass-through shorts, lossless reconstruction") {
    val df = Seq(
      (0L, "a b c d e f g h i j k l m"),  // start=1: spans at 1 and 11
      (2L, "a b c d e f g h i j k l m"),  // start=3: spans at 3 and 13? 13+2>13 -> only 3
      (1L, "a b")                          // too short -> pass-through
    ).toDF("doc_id", "text")
    val out = graft.scale.Curation.spanCorrupt(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getString(2), r.getString(3)))).toMap
    assert(out(0L) == ((true, "<X0> d e f g h i j <X1>",
                        "<X0> a b c <X1> k l m")), s"got ${out(0L)}")
    assert(out(2L) == ((true, "a b <X0> f g h i j k l m",
                        "<X0> c d e")), s"got ${out(2L)}")
    assert(out(1L) == ((false, "a b", "")))
    // corpus-wide: splicing each target span back over its sentinel in the
    // input reconstructs the original token stream exactly
    val both = graft.scale.Curation.spanCorrupt(docs, "text", "doc_id")
      .join(docs.select(col("doc_id").as("id"), col("text")), Seq("id"))
      .filter(col("corrupted"))
      .select(col("input"), col("target"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(both.nonEmpty)
    both.foreach { case (inp, tgt, orig) =>
      val spans = tgt.split("<X\\d+> ").filter(_.nonEmpty).map(_.stripSuffix(" "))
      var rebuilt = inp
      spans.zipWithIndex.foreach { case (sp, j) =>
        rebuilt = rebuilt.replace(s"<X$j>", sp) }
      assert(rebuilt == orig, s"reconstruction mismatch: ${rebuilt.take(60)}")
    }
  }

  test("fimTransform: exact PSM layout, pass-through off-rate/short, lossless reassembly") {
    val df = Seq(
      (2L, "a b c d e f g h i"),   // 9 tokens, even id -> PSM at p=3, q=6
      (3L, "a b c d e f g h i"),   // odd id -> unchanged
      (4L, "a b c")                // short -> unchanged
    ).toDF("doc_id", "text")
    val out = graft.scale.Curation.fimTransform(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(out(2L) == ((true, "<PRE> a b c <SUF> g h i <MID> d e f")))
    assert(out(3L) == ((false, "a b c d e f g h i")))
    assert(out(4L) == ((false, "a b c")))
    // corpus-wide: the transform is lossless — PSM pieces reassemble to
    // the original token sequence for every transformed doc
    val both = graft.scale.Curation.fimTransform(docs, "text", "doc_id")
      .join(docs.select(col("doc_id").as("id"), col("text")), Seq("id"))
      .filter(col("fim_applied"))
      .select(col("out_text"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(both.nonEmpty)
    both.foreach { case (psm, orig) =>
      val m = "(?s)^<PRE> (.*) <SUF> (.*) <MID> (.*)$".r
      psm match {
        case m(p, sfx, mid) =>
          assert(Seq(p, mid, sfx).mkString(" ") == orig, "reassembly mismatch")
        case _ => fail(s"PSM layout broken: ${psm.take(60)}")
      }
    }
  }

  test("unimaxMixture: uniform fill, epoch cap bites on small sources, surplus redistributes") {
    // three sources: tiny (10 tokens), small (100), huge (10000);
    // budget 600, cap 2 epochs -> tiny caps at 20, small caps at 200,
    // huge absorbs the rest uniformly
    val df = Seq(
      (1L, "tiny", Seq.fill(10)("w").mkString(" ")),
      (2L, "small", Seq.fill(100)("w").mkString(" ")),
      (3L, "huge", Seq.fill(10000)("w").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val out = Sampling.unimaxMixture(df, "source", "text",
        budget = 600L, epochsNum = 2L, epochsDen = 1L, rounds = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4), r.getLong(5)))).toMap
    val (_, tCap, tAlloc, tCapped, tEp) = out("tiny")
    assert(tCap == 20L && tAlloc == 20L && tCapped, s"tiny should cap at 2 epochs: $tAlloc")
    assert(tEp == 2000000L, s"tiny epochs_micro should be exactly 2.0: $tEp")
    val (_, _, sAlloc, sCapped, _) = out("small")
    assert(sAlloc == 200L && sCapped, s"small should cap at 200: $sAlloc")
    // huge gets the remainder of the uniform redistribution: round 1 gives
    // everyone 200; rounds 2+ push tiny's surplus (180) to huge
    val (_, _, hAlloc, hCapped, _) = out("huge")
    assert(!hCapped && hAlloc >= 200L && hAlloc <= 400L,
      s"huge should absorb redistributed surplus uncapped: $hAlloc")
    val total = tAlloc + sAlloc + hAlloc
    assert(total <= 600L && 600L - total <= 3L,
      s"budget conservation up to div slack: $total")
    // the no-cap control: with a huge epoch allowance nothing caps and the
    // fill is exactly uniform
    val flat = Sampling.unimaxMixture(df, "source", "text",
        budget = 300L, epochsNum = 1000L, epochsDen = 1L, rounds = 2)
      .collect().map(r => (r.getString(0), r.getLong(3), r.getBoolean(4)))
    assert(flat.forall(t => t._2 == 100L && !t._3),
      s"uniform no-cap fill should be budget/3 each: ${flat.toSeq}")
  }

  test("zipfSlope: recovers the exponent of a planted power law; corpus in natural band") {
    // word i repeated round(1e5 / i^1.0) times -> ln(cnt) = ln(1e5) - 1.0*ln(rank)
    val rows = (1 to 50).flatMap { i =>
      val c = math.round(1e5 / i).toInt
      Seq.fill(c)(("p", f"w$i%03d"))   // zero-padded so count desc == name asc on ties
    }
    val df = rows.grouped(5000).zipWithIndex.map { case (g, j) =>
      (j.toLong, "p", g.map(_._2).mkString(" "))
    }.toSeq.toDF("doc_id", "source", "text")
    val fit = TextAnalysis.zipfSlope(df, "text", "source", topV = 50)
      .collect()(0)
    val slope = fit.getDouble(2); val icept = fit.getDouble(3)
    assert(math.abs(slope - (-1.0)) < 0.01, s"planted slope -1, fit $slope")
    assert(math.abs(icept - math.log(1e5)) < 0.05, s"intercept off: $icept")
    // the real corpus: every source fits a decaying power law, not flat
    val corp = TextAnalysis.zipfSlope(docs, "text", "source", topV = 200)
      .collect().map(r => r.getString(0) -> r.getDouble(2))
    assert(corp.length == 20)
    corp.foreach { case (s, sl) =>
      assert(sl < -0.1 && sl > -3.0, s"source $s slope $sl outside natural band") }
  }

  test("mixSchedule: closed-form rank == global-sort rank, permutation, even spacing") {
    val alloc = Seq(("a", 3000L), ("b", 1000L), ("c", 500L), ("z", 3000L))
      .toDF("source", "alloc")   // a and z have IDENTICAL chunk counts ->
                                 // every fraction ties; name order must decide
    val out = Sampling.mixSchedule(alloc, "source", "alloc", chunkTokens = 500L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = out.groupBy(_._1).map(_._2.head._3).sum
    assert(out.length == total, s"one row per chunk: ${out.length} vs $total")
    assert(out.map(_._4).sorted.toSeq == (1L to total).toSeq,
      "steps must be a permutation of 1..N")
    // twin: the honest global sort over (k/n, source, k)
    val twin = out.sortBy { case (s, k, nc, _) => (k.toDouble / nc, s, k) }
      .zipWithIndex.map { case ((s, k, _, _), i) => (s, k) -> (i + 1L) }.toMap
    out.foreach { case (s, k, _, step) =>
      assert(twin((s, k)) == step,
        s"closed form disagrees with sort at ($s,$k): $step vs ${twin((s, k))}") }
    // even interleave: source a (6 chunks of 18 total) gaps within ceil(18/6)+2
    val aSteps = out.filter(_._1 == "a").sortBy(_._2).map(_._4)
    val gaps = aSteps.zip(aSteps.drop(1)).map { case (x, y) => y - x }
    assert(gaps.forall(_ <= (total / aSteps.length) + 2),
      s"schedule front-loads source a: gaps=${gaps.toSeq}")
  }

  test("incrementalDedup: corpus hits drop, within-batch dups collapse to min id, novel survive") {
    val corpus = Seq((1L, "alpha text"), (2L, "beta text")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha text"),   // exact corpus dup -> dropped
      (11L, "gamma text"),   // novel, first in batch -> kept
      (12L, "gamma text"),   // within-batch dup -> collapsed into 11
      (13L, "delta text")    // novel -> kept
    ).toDF("doc_id", "text")
    val out = graft.scale.Dedup.incrementalDedup(batch, corpus, "text", "doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(11L, 13L), s"expected ids 11,13 to survive, got $out")
  }

  test("qualityRankNorm: mid-rank percentiles — uniform on distinct, 500000 on constant") {
    // source u: 4 docs with strictly increasing quality proxies is hard to
    // plant via text; verify properties on the real corpus instead
    val out = Sampling.qualityRankNorm(docs, "text", "doc_id", "source")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 500)
    out.foreach { case (s, _, p) =>
      assert(p >= 0 && p <= 1000000, s"$s pct out of range: $p") }
    // within a source, pct is monotone in q100 and equal scores share pct
    out.groupBy(_._1).foreach { case (s, rows) =>
      val byQ = rows.groupBy(_._2).map { case (q, rs) =>
        assert(rs.map(_._3).distinct.length == 1,
          s"$s: equal q100=$q got distinct pcts")
        q -> rs.head._3
      }.toSeq.sortBy(_._1)
      assert(byQ.map(_._2) == byQ.map(_._2).sorted,
        s"$s: pct not monotone in q100") }
    // a constant-quality source pins every doc at the 50th percentile
    import spark.implicits._
    val const = (1L to 7L).map(i => (i, "c", "same words " * 30)).toSeq
      .toDF("doc_id", "source", "text")
    val cp = Sampling.qualityRankNorm(const, "text", "doc_id", "source")
      .collect().map(_.getLong(3)).distinct
    assert(cp.length == 1 && math.abs(cp(0) - 500000L) <= 1L,
      s"constant source should sit at pct 0.5: ${cp.toSeq}")
  }

  test("curriculumSchedule: global permutation, every main step precedes every anneal step") {
    val alloc = Seq(("a", 2000L, 500L), ("b", 1000L, 0L), ("c", 1500L, 1000L))
      .toDF("source", "main_tokens", "anneal_tokens")
    val out = Sampling.curriculumSchedule(alloc, "source",
        "main_tokens", "anneal_tokens", chunkTokens = 500L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(4)))
    // chunks: main a=4 b=2 c=3 (9), anneal a=1 c=2 (3)
    assert(out.length == 12)
    assert(out.map(_._4).sorted.toSeq == (1L to 12L).toSeq,
      "steps must be a permutation of 1..N across phases")
    val maxMain = out.filter(_._2 == "main").map(_._4).max
    val minAnneal = out.filter(_._2 == "anneal").map(_._4).min
    assert(maxMain == 9L && minAnneal == 10L,
      s"anneal must start after the last main step: $maxMain vs $minAnneal")
    assert(!out.exists(t => t._2 == "anneal" && t._1 == "b"),
      "a zero-anneal source emits no anneal chunks")
  }

  test("annealMixture: annealPct=0 degenerates to a single availability-proportional phase") {
    val out = Sampling.annealMixture(docs, "source", "text",
        budgetNum = 1L, budgetDen = 2L, annealPct = 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.forall(_._4 == 0L), "annealPct=0 must allocate zero anneal tokens")
    val tot = out.map(_._2).sum
    val budget = math.floor(tot.toDouble / 2.0).toLong
    val mainTot = out.map(_._3).sum
    assert(mainTot <= budget && budget - mainTot <= out.length)
  }
}
