package graft

import org.apache.spark.sql.functions._
import graft.scale._
import graft.stats.{MultipleTesting, Quantiles}

/** Round-13 additions: BH FDR, MAD outliers, exact fixed-point
  * PageRank, JL random projection, IMAPA, C4 rules. */
class ScaleSpec6 extends SparkTestBase {
  import spark.implicits._

  // ---- Benjamini–Hochberg --------------------------------------------------

  test("bhAdjust: textbook step-up — m=5, q=0.1 rejects exactly the " +
       "three small p's and p_adj is the monotone suffix-min") {
    val df = Seq((1L, 0.01), (2L, 0.02), (3L, 0.03), (4L, 0.5), (5L, 0.9))
      .toDF("id", "p")
    val out = MultipleTesting.bhAdjust(df, "p", "id", q = 0.1)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(out.forall(_.getAs[Long]("m") == 5L))
    val padj = out.map(_.getAs[Double]("p_adj"))
    // raw = m·p/i = 0.05, 0.05, 0.05, 0.625, 0.9; suffix-min keeps them
    assert(math.abs(padj(0) - 0.05) < 1e-9 && math.abs(padj(2) - 0.05) < 1e-9)
    assert(math.abs(padj(3) - 0.625) < 1e-9 && math.abs(padj(4) - 0.9) < 1e-9)
    assert(out.map(_.getAs[Boolean]("reject")).toSeq ==
      Seq(true, true, true, false, false))
  }

  test("bhAdjust: p_adj is monotone nondecreasing in rank and capped at 1") {
    val df = (1 to 40).map(i => (i.toLong, (i * i % 97) / 97.0)).toDF("id", "p")
    val out = MultipleTesting.bhAdjust(df, "p", "id").orderBy("rank")
      .select("p_adj").collect().map(_.getDouble(0))
    assert(out.zip(out.tail).forall { case (a, b) => a <= b + 1e-12 })
    assert(out.forall(v => v >= 0.0 && v <= 1.0))
  }

  // ---- MAD outliers --------------------------------------------------------

  test("madOutliers: a gross outlier is flagged, the bulk is not, and " +
       "med/mad are the exact medians") {
    val df = Seq(1.0, 2.0, 3.0, 4.0, 100.0).map(("g", _)).toDF("g", "v")
    val r = Quantiles.madOutliers(df, "v", Seq("g")).collect().head
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Double]("med") == 3.0)
    assert(r.getAs[Double]("mad") == 1.0)
    assert(r.getAs[Long]("n_outliers") == 1L)
  }

  test("madOutliers: MAD = 0 group falls back to the x != med rule") {
    val df = (Seq.fill(6)(5.0) ++ Seq(7.0)).map(("g", _)).toDF("g", "v")
    val r = Quantiles.madOutliers(df, "v", Seq("g")).collect().head
    assert(r.getAs[Double]("mad") == 0.0)
    assert(r.getAs[Long]("n_outliers") == 1L)
  }

  // ---- PageRank ------------------------------------------------------------

  test("pageRankFixed: a symmetric 2-cycle is a fixed point at exactly " +
       "scale, and a hub out-ranks its symmetric leaves") {
    val two = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val pr2 = Graph.pageRankFixed(two, "src", "dst", iters = 5)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("pr")).toMap
    assert(pr2(1L) == 1000000000000L && pr2(2L) == 1000000000000L)

    // undirected star a–b, c–b: b is the hub
    val star = Seq((1L, 2L), (2L, 1L), (3L, 2L), (2L, 3L)).toDF("src", "dst")
    val pr = Graph.pageRankFixed(star, "src", "dst", iters = 5)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("pr")).toMap
    assert(pr(2L) > pr(1L), s"hub must out-rank leaf: $pr")
    assert(pr(1L) == pr(3L), s"symmetric leaves must tie exactly: $pr")
    // integer floors only ever LOSE mass relative to the ideal total
    assert(pr.values.sum <= 3L * 1000000000000L)
    assert(pr.values.sum > (3L * 1000000000000L * 99L) / 100L)
  }

  // ---- JL random projection ------------------------------------------------

  test("randomProject: deterministic, 16-wide, and exactly additive on " +
       "grid-friendly inputs") {
    val v1 = Array.tabulate(8)(i => (i + 1) * 0.25f)
    val v2 = Array.tabulate(8)(i => (8 - i) * 0.5f)
    val sum = v1.zip(v2).map { case (a, b) => a + b }
    val df = Seq((1L, v1.toSeq), (2L, v2.toSeq), (3L, sum.toSeq))
      .toDF("id", "embedding")
    val out = Similarity.randomProject(df, "embedding", "id", 16)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getSeq[Long](1).toList).toMap
    assert(out(1L).size == 16)
    // rerun: bit-identical (pure function of the input)
    val again = Similarity.randomProject(df, "embedding", "id", 16)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getSeq[Long](1).toList).toMap
    assert(out == again)
    // linear: proj(v1 + v2) = proj(v1) + proj(v2) exactly (inputs land
    // exactly on the 1e-9 grid, so quantisation commutes with +)
    val lhs = out(3L)
    val rhs = out(1L).zip(out(2L)).map { case (a, b) => a + b }
    assert(lhs == rhs, s"additivity: $lhs vs $rhs")
    // non-degenerate: the sign matrix must vary with i, not just j — a
    // rank-1 matrix (the low-bit-of-LCG failure mode: sign(i,j) depends
    // only on parity(i·outDim+j), constant in i for even outDim) makes
    // every output dim ±(the same signed sum), i.e. all |out_j| equal
    assert(out(1L).map(math.abs).distinct.size > 1,
      s"rank-1 degenerate projection — all dims ±equal: ${out(1L)}")
    assert(out(2L).map(math.abs).distinct.size > 1,
      s"rank-1 degenerate projection — all dims ±equal: ${out(2L)}")
  }

  // ---- bucket-offset global rank -------------------------------------------

  test("Ranks.globalRank equals the single-window rank definition — asc " +
       "and desc, heavy ties, multi-bucket") {
    import org.apache.spark.sql.expressions.Window
    // v has heavy ties (mod 7) AND a near-unique stretch; u unique
    val df = ((1 to 300).map(i => ((i % 7).toLong, i.toLong)) ++
      (301 to 400).map(i => (i.toLong * 1000L, i.toLong))).toDF("v", "u")
    for (desc <- Seq(false, true)) {
      val ord = if (desc) Seq(col("v").desc, col("u")) else Seq(col("v"), col("u"))
      val expected = df
        .withColumn("rk", row_number().over(Window.orderBy(ord: _*)).cast("long"))
        .select("u", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // buckets = 8 forces every level of the decomposition to matter
      val got = Ranks.globalRank(df, col("v"), col("u"), desc, "rk", buckets = 8)
        .select("u", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"desc=$desc: bucket-offset ranks diverge")
    }
  }

  // ---- IMAPA ---------------------------------------------------------------

  test("imapaForecast: constant demand forecasts the constant at every " +
       "level, so the combination is the constant") {
    val df = (1 to 8).map(t => (1L, t.toLong, 2.0)).toDF("sid", "ts", "y")
    val out = PerSeriesForecast.imapaForecast(df, "y", "ts", Seq("sid"),
      levels = Seq(1, 2, 4)).collect().head
    assert(out.getAs[Long]("n_levels") == 3L)
    assert(out.getAs[Long]("n_periods") == 8L)
    assert(math.abs(out.getAs[Double]("yhat_imapa") - 2.0) < 1e-9)
  }

  test("imapaForecast: series shorter than 2·max(levels) are excluded " +
       "from every level (consistent panel)") {
    val df = ((1 to 8).map(t => (1L, t.toLong, 2.0)) ++
      (1 to 6).map(t => (2L, t.toLong, 3.0))).toDF("sid", "ts", "y")
    val out = PerSeriesForecast.imapaForecast(df, "y", "ts", Seq("sid"),
      levels = Seq(1, 2, 4)).collect()
    assert(out.length == 1 && out.head.getAs[Long]("sid") == 1L)
  }

  // ---- C4 rules ------------------------------------------------------------

  test("c4Rules: lorem ipsum / braces / too-few-sentences drop; a " +
       "3-sentence terminal-punct doc keeps") {
    val df = Seq(
      (1L, "alpha beta gamma delta one. second sentence here. third one."),
      (2L, "some Lorem Ipsum dolor text. more words here. and a third."),
      (3L, "code sample { x = 1 } here. more words. third sentence."),
      (4L, "too short."),
      (5L, "no terminal punctuation at all just words and words and words"))
      .toDF("doc_id", "text")
    val out = QualityFilters.c4Rules(df, "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("keep") && out(2L).getAs[Boolean]("has_lorem"))
    assert(!out(3L).getAs[Boolean]("keep") && out(3L).getAs[Boolean]("has_brace"))
    assert(!out(4L).getAs[Boolean]("keep") &&
      out(4L).getAs[Long]("n_sents") == 1L)
    assert(!out(5L).getAs[Boolean]("keep") &&
      out(5L).getAs[Double]("term_line_ratio") == 0.0)
  }

  // ---- Count-Min sketch ----------------------------------------------------

  test("cmsTopKAudit: estimates are one-sided (est >= exact) and the " +
       "heavy key's exact count is right") {
    val keys = Seq.fill(100)(1L) ++ (2L to 40L).flatMap(k => Seq.fill(3)(k))
    val df = keys.map(Tuple1(_)).toDF("k")
    val out = graft.stats.Sketches.cmsTopKAudit(df, "k", k = 10, width = 32)
      .collect()
    assert(out.length == 10)
    assert(out.forall(r => r.getAs[Long]("est") >= r.getAs[Long]("exact")))
    assert(out.forall(_.getAs[Long]("overcount") >= 0L))
    val heavy = out.find(_.getAs[Long]("key") == 1L).get
    assert(heavy.getAs[Long]("exact") == 100L)
  }

  // ---- sequential looks ----------------------------------------------------

  test("sequentialLooks: 5 cumulative looks, monotone n, OBF bounds " +
       "shrink to z975 at the final look") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 400).map { i =>
      (i.toLong % 97, math.floor(rnd.nextDouble() * 500 + 0.5) / 100,
        java.sql.Timestamp.valueOf(f"2024-01-${1 + i % 28}%02d 12:00:00"))
    }.toDF("uid", "v", "ts")
    val out = graft.stats.ExperimentDesign.sequentialLooks(
      df, "uid", "v", "ts", k = 5).orderBy("look").collect()
    assert(out.length == 5)
    val ns = out.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a <= b })
    assert(ns.last == 400L)
    val bounds = out.map(_.getAs[Double]("bound"))
    assert(bounds.zip(bounds.tail).forall { case (a, b) => a > b })
    assert(math.abs(bounds.last - 1.959963984540054) < 1e-12)
    // a null split (random values, hash arms) should not cross OBF bounds
    assert(out.count(_.getAs[Boolean]("crossed")) == 0)
  }

  // ---- Kneser–Ney ----------------------------------------------------------

  test("knBigram: hand-computed KN probability on a 4-token corpus") {
    val df = Seq(Tuple1("a b a b")).toDF("text")
    val out = graft.scale.TextAnalysis.knBigram(df, "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = out(("a", "b"))
    assert(ab.getAs[Long]("c12") == 2L && ab.getAs[Long]("c1") == 2L)
    assert(ab.getAs[Long]("n1p_left") == 1L && ab.getAs[Long]("n1p_right") == 1L)
    assert(ab.getAs[Long]("n_types") == 2L)
    // (2-0.75)/2 + 0.75·(1/2)·(1/2) = 0.8125
    assert(math.abs(ab.getAs[Double]("p_kn") - 0.8125) < 1e-9)
    // probabilities over a fixed history sum to <= 1 (KN is a proper LM)
    val fromA = out.collect { case ((w1, _), r) if w1 == "a" =>
      r.getAs[Double]("p_kn") }
    assert(fromA.sum <= 1.0 + 1e-9)
  }

  // ---- WAV decode ----------------------------------------------------------

  private def wavBytes(samples: Array[Short], rate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(rate)
    bb.putInt(rate * 2); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("decodeWavMeta/wavSamples: a real PCM WAV round-trips; text does not") {
    val samples = Array.tabulate(64)(i => ((i * 400) % 30000 - 15000).toShort)
    val wav = wavBytes(samples)
    val meta = Multimodal.decodeWavMeta(wav)
    assert(meta.contains((1, 1, 8000, 16, 128)))
    val got = Multimodal.wavSamples(wav, 64).get
    assert(got.toSeq == samples.map(_.toInt).toSeq)
    assert(Multimodal.decodeWavMeta("RIFF but not really audio".getBytes).isEmpty)
  }

  test("audioFramesFromText: frame count/energies match a hand fold") {
    val text = "a" * 64
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val out = Multimodal.audioFramesFromText(df, "text", "doc_id")
      .orderBy("frame_idx").collect()
    assert(out.length == 3) // (64-32)/16 + 1
    assert(out.forall(_.getAs[Long]("n_samples") == 64L))
    // mirror the stub synth for frame 0
    val s = Array.tabulate(64)(i => ((97L * 131 + i * 17) % 4096 - 2048).toInt)
    val sumsq = s.take(32).map(x => x.toLong * x).sum
    val rms = math.floor(math.sqrt(sumsq.toDouble / 32) * 1e6 + 0.5) / 1e6
    val zcr = (0 until 31).count(i => s(i).toLong * s(i + 1) < 0)
    assert(out.head.getAs[Double]("rms") == rms)
    assert(out.head.getAs[Long]("zcr") == zcr.toLong)
  }

  // ---- Mann–Whitney U ------------------------------------------------------

  test("mwuTest: no-tie and tied hand examples come out exact") {
    // ref {1,2,3} vs other {4,5,6}: U=9, sigma^2=5.25, z=4.5/sqrt(5.25)
    val df = Seq(("r", 1L), ("r", 2L), ("r", 3L),
                 ("o", 4L), ("o", 5L), ("o", 6L)).toDF("g", "v")
    val r1 = graft.stats.RankTests.mwuTest(df, "v", "g", "r").collect().head
    assert(r1.getAs[Double]("u_ref") == 9.0)
    assert(math.abs(r1.getAs[Double]("z") - 4.5 / math.sqrt(5.25)) < 1e-12)

    // ties: ref {1,1} vs other {1,2}: U=3, tcorr=24, sigma^2=1, z=1
    val df2 = Seq(("r", 1L), ("r", 1L), ("o", 1L), ("o", 2L)).toDF("g", "v")
    val r2 = graft.stats.RankTests.mwuTest(df2, "v", "g", "r").collect().head
    assert(r2.getAs[Double]("u_ref") == 3.0)
    assert(math.abs(r2.getAs[Double]("z") - 1.0) < 1e-12)
  }

  // ---- trimmed means -------------------------------------------------------

  test("trimmedMeans: 1..10 at 10/90 trims to 2..9 and winsorizes the " +
       "tails onto the fences") {
    val df = (1L to 10L).map(("g", _)).toDF("g", "v")
    val r = graft.stats.Quantiles.trimmedMeans(df, "v", Seq("g")).collect().head
    assert(r.getAs[Long]("n") == 10L && r.getAs[Long]("n_kept") == 8L)
    assert(r.getAs[Double]("trimmed_mean") == 5.5)
    // clamp: 1 -> 1.9, 10 -> 9.1; sum = 55.0 exactly
    assert(r.getAs[Double]("winsorized_mean") == 5.5)
  }

  // ---- Adamic–Adar ---------------------------------------------------------

  test("adamicAdar: shared rare neighbors dominate, hubs above maxDeg " +
       "are excluded") {
    val inc = Seq(
      (1L, 101L), (2L, 101L),                       // z=101: deg 2
      (1L, 102L), (2L, 102L), (3L, 102L)) ++        // z=102: deg 3
      (1L to 12L).map(s => (s, 999L))               // z=999: hub, deg 12
    val df = inc.toDF("s", "p")
    val out = Graph.adamicAdar(df, "s", "p", topK = 10, maxDeg = 10)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) -> r).toMap
    val t2 = math.floor(1e9 / math.log(2.0) + 0.5) / 1e9
    val t3 = math.floor(1e9 / math.log(3.0) + 0.5) / 1e9
    assert(out((1L, 2L)).getAs[Long]("n_common") == 2L)
    assert(math.abs(out((1L, 2L)).getAs[Double]("aa_score") - (t2 + t3)) < 1e-12)
    assert(out((1L, 3L)).getAs[Long]("n_common") == 1L)
    assert(math.abs(out((1L, 3L)).getAs[Double]("aa_score") - t3) < 1e-12)
    assert(out((1L, 2L)).getAs[Long]("rk") == 1L)
    // hub 999 is capped out: pairs like (4,5) share ONLY the hub -> absent
    assert(!out.contains((4L, 5L)))
  }

  // ---- Heaps' law ----------------------------------------------------------

  test("heapsLaw: a corpus with V ~ sqrt(2N) growth fits beta near 0.5") {
    // doc i introduces exactly one new word and repeats all older ones:
    // V(d) = d, N(d) = d(d+1)/2, so V ~ sqrt(2N) -> beta ~ 0.5
    val docs = (1 to 40).map { i =>
      (i.toLong, (0 until i).map(j => s"w$j").mkString(" "))
    }.toDF("doc_id", "text")
    val r = graft.scale.TextAnalysis.heapsLaw(docs, "text", "doc_id",
      sampleEvery = 5).collect().head
    assert(r.getAs[Long]("n_docs") == 40L)
    assert(r.getAs[Long]("vocab") == 40L)
    assert(r.getAs[Long]("tokens") == 820L)
    val beta = r.getAs[Double]("beta")
    assert(beta > 0.4 && beta < 0.62, s"beta should be near 0.5, got $beta")
  }

  // ---- streaming CMS ---------------------------------------------------------

  test("StreamCms: final counters equal the batch sketch under any " +
       "micro-batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val keys = (1L to 300L).map(_ % 37L)
    val batch = graft.stats.Sketches.cmsSketch(keys.map(Tuple1(_)).toDF("k"),
        "k", width = 16)
      .collect().map(r => (r.getInt(0), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("c")).toMap

    for (splitAt <- Seq(1, 150, 299)) {
      val mem = MemoryStream[Long]
      val q = graft.streaming.StreamCms.attach(mem.toDS(), width = 16)
        .writeStream.format("memory").queryName(s"cms_out_$splitAt")
        .outputMode("update").start()
      mem.addData(keys.take(splitAt))
      q.processAllAvailable()
      mem.addData(keys.drop(splitAt))
      q.processAllAvailable()
      q.stop()
      // Update mode: keep the LAST emission per cell
      val got = spark.table(s"cms_out_$splitAt")
        .groupBy($"r", $"bucket").agg(max($"c").as("c"))
        .collect().map(r => (r.getInt(0), r.getAs[Long]("bucket")) ->
          r.getAs[Long]("c")).toMap
      assert(got == batch, s"split at $splitAt: streaming != batch")
    }
  }

  // ---- robust scaler ---------------------------------------------------------

  test("robustScaled: (x - median)/IQR on 1..10; zero-IQR group nulls") {
    val df = (1L to 10L).map(("g", _)).toDF("g", "v")
    val out = graft.core.Encoders.robustScaled(df, "v", Seq("g"))
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Any]("v_robust")).toMap
    // q25=3.25, q50=5.5, q75=7.75, IQR=4.5
    assert(math.abs(out(10L).asInstanceOf[Double] - 1.0) < 1e-12)
    assert(math.abs(out(1L).asInstanceOf[Double] - (-1.0)) < 1e-12)
    val const = Seq.fill(5)(("c", 7L)).toDF("g", "v")
    val cOut = graft.core.Encoders.robustScaled(const, "v", Seq("g")).collect()
    assert(cOut.forall(_.getAs[Any]("v_robust") == null))
  }

  // ---- effective tokens ------------------------------------------------------

  test("effectiveTokens: 1 epoch is face value; 4 epochs buys less than " +
       "4x and more than 1x") {
    val df = Seq(("s", "one two three four five")).toDF("src", "text")
    val e1 = Sampling.effectiveTokens(df, "src", "text", 1.0).collect().head
    assert(e1.getAs[Double]("eff_tokens") == e1.getAs[Long]("n_unique").toDouble)
    assert(e1.getAs[Double]("eff_frac") == 1.0)
    val e4 = Sampling.effectiveTokens(df, "src", "text", 4.0).collect().head
    val u = e4.getAs[Long]("n_unique").toDouble
    val eff = e4.getAs[Double]("eff_tokens")
    assert(eff > u && eff < 4 * u)
    assert(e4.getAs[Double]("eff_frac") < 1.0)
  }

  // ---- Cramér–von Mises -------------------------------------------------------

  test("cvmStatistic: identical distributions score 0, a clean shift " +
       "scores large") {
    val same = ((1 to 50).map(i => ("a", i.toDouble)) ++
      (1 to 50).map(i => ("b", i.toDouble))).toDF("g", "v")
    val t0 = graft.stats.DriftAudit.cvmStatistic(same, "v", "g")
      .collect().head.getAs[Double]("t_cvm")
    assert(t0 == 0.0)
    val shift = ((1 to 50).map(i => ("a", i.toDouble)) ++
      (1 to 50).map(i => ("b", i + 100.0))).toDF("g", "v")
    val t1 = graft.stats.DriftAudit.cvmStatistic(shift, "v", "g")
      .collect().head.getAs[Double]("t_cvm")
    assert(t1 > 5.0, s"disjoint samples must score large, got $t1")
  }

  // ---- assortativity ----------------------------------------------------------

  test("degreeAssortativity: a bidirectional star is perfectly " +
       "disassortative (r = -1)") {
    val star = (1L to 6L).flatMap(l => Seq((0L, l), (l, 0L))).toDF("src", "dst")
    val r = Graph.degreeAssortativity(star, "src", "dst").collect().head
    assert(r.getAs[Long]("n_edges") == 12L)
    assert(math.abs(r.getAs[Double]("r") - (-1.0)) < 1e-12)
  }

  // ---- MSTTR ------------------------------------------------------------------

  test("msttr: all-distinct text scores 1, one-word text scores 1/window") {
    val df = Seq(
      (1L, (1 to 50).map(i => s"t$i").mkString(" ")),
      (2L, Seq.fill(50)("a").mkString(" ")),
      (3L, "short text only")).toDF("doc_id", "text")
    val out = graft.scale.TextAnalysis.msttr(df, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Double]("msttr") == 1.0)
    assert(out(1L).getAs[Long]("n_segments") == 2L)
    assert(out(2L).getAs[Double]("msttr") == 0.04) // 1/25
    assert(out(2L).getAs[Double]("ttr") == 0.02)   // 1/50
    assert(out(3L).getAs[Any]("msttr") == null)
  }

  // ---- code detection -------------------------------------------------------------

  test("codeDetect: code-like text flags, prose does not") {
    val df = Seq(
      (1L, "def main(args) { return x[0] <= y; } import sys"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val out = QualityFilters.codeDetect(df, "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("is_code"))
    assert(out(1L).getAs[Long]("kw_hits") >= 3L) // def, return, import
    assert(!out(2L).getAs[Boolean]("is_code"))
    assert(out(2L).getAs[Double]("sym_ratio") == 0.0)
  }

  // ---- centroid similarity ----------------------------------------------------------

  test("centroidSimilarity: identical-direction labels score 1, " +
       "orthogonal labels score 0") {
    val e1 = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val e2 = Seq(0.0f, 1.0f, 0.0f, 0.0f)
    val df = (Seq.fill(3)((0, e1)) ++ Seq.fill(3)((1, e1)) ++
      Seq.fill(3)((2, e2))).toDF("label", "embedding")
    val out = Similarity.centroidSimilarity(df, "embedding", "label")
      .collect().map(r => (r.getAs[Int]("label_a"), r.getAs[Int]("label_b"))
        -> r.getAs[Double]("cos")).toMap
    assert(math.abs(out((0, 1)) - 1.0) < 1e-9)
    assert(math.abs(out((0, 2))) < 1e-9)
  }

  // ---- weight ESS --------------------------------------------------------------------

  test("weightEss: flat weights give ESS = n; a dominant weight " +
       "collapses it") {
    val flat = (1 to 10).map(i => ("s", 5L)).toDF("src", "w")
    val f = Sampling.weightEss(flat, "src", "w").collect().head
    assert(f.getAs[Double]("ess") == 10.0)
    assert(f.getAs[Double]("ess_frac") == 1.0)
    val skew = ((1 to 9).map(_ => ("s", 1L)) :+ (("s", 1000L))).toDF("src", "w")
    val k = Sampling.weightEss(skew, "src", "w").collect().head
    assert(k.getAs[Double]("ess") < 2.0, s"got ${k.getAs[Double]("ess")}")
  }

  // ---- source JSD ---------------------------------------------------------------------

  test("sourceJsd: identical sources are ~0, disjoint vocabularies " +
       "approach ln 2") {
    val df = Seq(
      ("a", "alpha beta gamma alpha beta"), ("a", "alpha beta gamma"),
      ("b", "alpha beta gamma alpha beta"), ("b", "alpha beta gamma"),
      ("c", "delta epsilon zeta delta epsilon"), ("c", "delta epsilon zeta"))
      .toDF("source", "text")
    val out = TextAnalysis.sourceJsd(df, "text", "source", topV = 10)
      .collect().map(r => (r.getString(0), r.getString(1))
        -> r.getAs[Double]("jsd")).toMap
    assert(out(("a", "b")) < 1e-6, s"identical sources: ${out(("a", "b"))}")
    // the ½-count Laplace smoothing carries ~40% of the mass on this
    // tiny fixture, so "disjoint" tops out well below ln 2 — assert a
    // large, bounded separation instead
    assert(out(("a", "c")) > 0.2 && out(("a", "c")) < 0.6932,
      s"disjoint sources well separated: ${out(("a", "c"))}")
  }

  // ---- k-core peeling --------------------------------------------------------------

  test("kCorePeel: a triangle survives k=2 forever; a pendant chain " +
       "burns off round by round") {
    // triangle 1-2-3 plus a pendant path 3-4-5 (bidirectional)
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val out = Graph.kCorePeel(edges, "src", "dst", k = 2, rounds = 3)
      .orderBy("round").collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("n_edges")))
    // round 1: node 5 (deg 1) drops -> 4 survivors, edges among them 8
    assert(out(0) == ((1L, 4L, 8L)), s"got ${out(0)}")
    // round 2: node 4 (now deg 1) drops -> triangle remains
    assert(out(1) == ((2L, 3L, 6L)), s"got ${out(1)}")
    // round 3: fixpoint
    assert(out(2) == ((3L, 3L, 6L)), s"got ${out(2)}")
    // k=3: the whole graph dies immediately (max degree 2 except node 3)
    val dead = Graph.kCorePeel(edges, "src", "dst", k = 3, rounds = 2)
      .orderBy("round").collect()
    assert(dead(1).getAs[Long]("n_nodes") == 0L)
  }

  // ---- readability -------------------------------------------------------------------

  test("readability: hand-computed Flesch on a fixed sentence") {
    val df = Seq((1L, "the cat sat. the dog ran."), (2L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.readability(df, "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r = out(1L)
    assert(r.getAs[Long]("n_words") == 6L)
    assert(r.getAs[Long]("n_sents") == 2L)
    // vowel groups: e, a, a, e, o, a -> 6
    assert(r.getAs[Long]("n_syll") == 6L)
    val want = math.floor(
      (206.835 - 1.015 * 3.0 - 84.6 * 1.0) * 1e6 + 0.5) / 1e6
    assert(r.getAs[Double]("flesch") == want)
    assert(out(2L).getAs[Any]("flesch") == null)
  }

  // ---- Spearman -----------------------------------------------------------------

  test("spearman: perfect monotone = 1, perfect inverse = -1, ties " +
       "handled via average ranks") {
    val mono = (1L to 20L).map(i => (i, i * i)).toDF("x", "y")
    val m = graft.stats.RankTests.spearman(mono, "x", "y").collect().head
    assert(math.abs(m.getAs[Double]("rho") - 1.0) < 1e-12)
    val inv = (1L to 20L).map(i => (i, 100L - i)).toDF("x", "y")
    val iv = graft.stats.RankTests.spearman(inv, "x", "y").collect().head
    assert(math.abs(iv.getAs[Double]("rho") + 1.0) < 1e-12)
    // constant y: dy = 0 -> null, not NaN
    val const = (1L to 5L).map((_, 7L)).toDF("x", "y")
    assert(graft.stats.RankTests.spearman(const, "x", "y")
      .collect().head.getAs[Any]("rho") == null)
  }

  // ---- runs test ------------------------------------------------------------------

  test("runsTest: alternating signs give maximal runs (z > 0), a " +
       "two-block series gives 2 runs (z < 0)") {
    val alt = (1L to 20L).map(t => (t, if (t % 2 == 0) 10L else 1L))
      .toDF("t", "v")
    val a = graft.stats.RankTests.runsTest(alt, "t", "v").collect().head
    assert(a.getAs[Long]("runs") == 20L)
    assert(a.getAs[Double]("z") > 3.0)
    val blocks = ((1L to 10L).map((_, 1L)) ++ (11L to 20L).map((_, 10L)))
      .toDF("t", "v")
    val b = graft.stats.RankTests.runsTest(blocks, "t", "v").collect().head
    assert(b.getAs[Long]("runs") == 2L)
    assert(b.getAs[Double]("z") < -3.0)
    assert(b.getAs[Long]("n1") == 10L && b.getAs[Long]("n2") == 10L)
  }

  // ---- Chow test --------------------------------------------------------------

  test("chowTest: a clean kink at the midpoint scores huge; one straight " +
       "line scores tiny") {
    // slope 1 before t=20, slope 5 after, plus a deterministic wiggle so
    // neither segment fits EXACTLY (an exact fit nulls F by contract)
    def wig(t: Long) = 0.1 * ((t * 7) % 5)
    val kinked = (0L to 40L).map(t =>
      (t, (if (t <= 20) t.toDouble else 20.0 + 5.0 * (t - 20)) + wig(t)))
      .toDF("t", "y")
    val k = graft.stats.Econometrics.chowTest(kinked, "t", "y").collect().head
    assert(k.getAs[Long]("break_t") == 20L)
    assert(k.getAs[Long]("n1") == 21L && k.getAs[Long]("n2") == 20L)
    assert(k.getAs[Double]("f_stat") > 100.0,
      s"kink must fire, got ${k.getAs[Double]("f_stat")}")

    val line = (0L to 40L).map(t => (t, 2.0 * t + 1.0)).toDF("t", "y")
    val l = graft.stats.Econometrics.chowTest(line, "t", "y").collect().head
    // an exactly-fitting model has RSS 0 everywhere and a NULL F
    assert(l.getAs[Double]("rss_p") < 1e-6)
    assert(l.getAs[Any]("f_stat") == null)
  }

  // ---- spectral entropy ----------------------------------------------------------

  test("spectralEntropy: a pure period-4 series is low-entropy with " +
       "peak_p = 4; an aperiodic one is higher") {
    val pure = (0 until 24).map(t =>
      (1L, t.toLong, Seq(10.0, 20.0, 10.0, 0.0)(t % 4), t.toLong))
    val noisy = (0 until 24).map(t =>
      (2L, t.toLong, ((t * 7) % 11).toDouble, t.toLong))
    val df = (pure ++ noisy).toDF("uid", "ts", "v", "eid")
    val out = SeriesDiagnostics.spectralEntropy(df, "v", "ts", Seq("uid"),
      2 to 8, minLen = 20, tieBreak = Seq("eid"))
      .collect().map(r => r.getAs[Long]("uid") -> r).toMap
    assert(out(1L).getAs[Long]("peak_p") == 4L)
    val e1 = out(1L).getAs[Double]("entropy")
    val e2 = out(2L).getAs[Double]("entropy")
    assert(e1 < 0.5, s"pure period must be low entropy, got $e1")
    assert(e2 > e1, s"aperiodic ($e2) must exceed periodic ($e1)")
    assert(out(1L).getAs[Double]("peak_share") > 0.9)
  }

  // ---- vocab coverage --------------------------------------------------------------

  test("vocabCoverage: hand-counted top-k shares") {
    val df = Seq(Tuple1("a a a b b c")).toDF("text")
    val out = TextAnalysis.vocabCoverage(df, "text", Seq(1, 2))
      .collect().map(r => r.getAs[Long]("k") -> r).toMap
    assert(out(1L).getAs[Long]("vocab_size") == 3L)
    assert(out(1L).getAs[Long]("covered_tokens") == 3L)
    assert(out(1L).getAs[Double]("coverage") == 0.5)
    assert(out(2L).getAs[Long]("covered_tokens") == 5L)
    assert(out(2L).getAs[Long]("total_tokens") == 6L)
  }

  // ---- weighted median --------------------------------------------------------------

  test("weightedMedian: mass pulls the median; even split takes the " +
       "lower value") {
    val df = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 10L))
      .toDF("g", "v", "w")
    val r = Quantiles.weightedMedian(df, "v", "w", Seq("g")).collect().head
    assert(r.getAs[Long]("wmedian") == 3L && r.getAs[Long]("w_total") == 12L)
    assert(r.getAs[Long]("n") == 3L)
    val even = Seq(("g", 1L, 1L), ("g", 2L, 1L)).toDF("g", "v", "w")
    val e = Quantiles.weightedMedian(even, "v", "w", Seq("g")).collect().head
    assert(e.getAs[Long]("wmedian") == 1L)
  }

  // ---- nearest as-of join ------------------------------------------------------------

  test("asofNearestJoin: picks the closer side, breaks ties to the " +
       "earlier right row, and exact matches win") {
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val left = Seq((1L, 1L, t(14)), (2L, 1L, t(16)), (3L, 1L, t(15)),
                   (4L, 1L, t(20)), (5L, 1L, t(5)), (6L, 2L, t(100)))
      .toDF("event_id", "uid", "ts")
    val right = Seq((1L, t(10), 100L), (1L, t(20), 200L))
      .toDF("uid", "rts", "pv")
    val out = graft.core.JoinOps.asofNearestJoin(left, right, "ts", "rts",
        Seq("uid"), Seq("pv"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Any]("near_pv"))).toMap
    assert(out(1L).contains(100L)) // d=4 back vs 6 fwd
    assert(out(2L).contains(200L)) // d=6 back vs 4 fwd
    assert(out(3L).contains(100L)) // tie 5/5 -> earlier
    assert(out(4L).contains(200L)) // exact match
    assert(out(5L).contains(100L)) // nothing behind -> forward
    assert(out(6L).isEmpty)        // user 2 has no purchases
  }

  // ---- two-proportion z ---------------------------------------------------------

  test("twoProportionZ: arms partition units, counts are exact, and the " +
       "CI brackets the point difference") {
    val df = (1L to 400L).map(u => (u, u % 5 == 0)).toDF("uid", "conv")
    val out = graft.stats.ExperimentDesign.twoProportionZ(
      df, "uid", col("conv"), salts = Seq(1, 2, 3)).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == 400L)
      assert(r.getAs[Long]("x_a") + r.getAs[Long]("x_b") == 80L)
      val d = r.getAs[Double]("p_a") - r.getAs[Double]("p_b")
      assert(r.getAs[Double]("ci_lo") <= d && d <= r.getAs[Double]("ci_hi"))
    }
  }
}
