package graft

import org.apache.spark.sql.functions._
import graft.scale._

/** Round-12 session-2 additions: Kalman local-level, split-conformal
  * intervals, hierarchical reconciliation, pack manifests, SFT loss
  * masks, bitext margin mining, DoReMi reweighting. */
class ScaleSpec4 extends SparkTestBase {
  import spark.implicits._

  // ---- Kalman local level ------------------------------------------------

  test("kalman: constant series keeps the level exactly and the gain " +
       "converges to the steady-state fixed point") {
    val rows = (1 to 200).map(i => (1L, i.toDouble, i.toLong, 7.25))
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    val out = PerSeriesForecast.kalmanLocalLevel(
        df, "value", "ts", "user_id", "event_id", q = 0.25, r = 1.0)
      .orderBy(col("event_id")).collect()
    assert(out.length == 200)
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("level") - 7.25) < 1e-12,
        "constant input must keep the level constant")
    }
    // steady-state prior variance f solves f^2 - q f - q r = 0
    val f = (0.25 + math.sqrt(0.25 * 0.25 + 4 * 0.25 * 1.0)) / 2
    val kStar = f / (f + 1.0)
    val kLast = out.last.getAs[Double]("k_gain")
    assert(math.abs(kLast - kStar) < 1e-9,
      s"gain must converge to $kStar, got $kLast")
    // posterior variance decreases monotonically to its fixed point
    val ps = out.map(_.getAs[Double]("p_var"))
    ps.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-12) }
  }

  test("kalman: the filter is a variance-adaptive SES — early gains " +
       "exceed the steady gain, and yhat_prior is the previous level") {
    val y = Array(10.0, 0.0, 10.0, 0.0, 10.0, 0.0, 10.0, 0.0)
    val df = y.zipWithIndex.map { case (v, i) => (1L, i.toDouble, i.toLong, v) }
      .toSeq.toDF("user_id", "ts", "event_id", "value")
    val out = PerSeriesForecast.kalmanLocalLevel(
        df, "value", "ts", "user_id", "event_id").orderBy(col("event_id")).collect()
    val gains = out.drop(1).map(_.getAs[Double]("k_gain"))
    assert(gains.head > gains.last, "first gain must exceed the settled gain")
    // one-step prediction before absorbing = previous row's posterior level
    out.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur.getAs[Double]("yhat_prior") == prev.getAs[Double]("level"))
    }
    // independent replay of the recursion
    var a = y(0); var p = 1.0
    for (t <- 1 until y.length) {
      val f = p + 0.25; val k = f / (f + 1.0)
      a = a + k * (y(t) - a); p = (1 - k) * f
    }
    assert(math.abs(out.last.getAs[Double]("level") - a) < 1e-12)
    assert(math.abs(out.last.getAs[Double]("p_var") - p) < 1e-12)
  }

  // ---- split-conformal intervals ------------------------------------------

  test("conformal: a noiseless linear series yields a zero-width band on " +
       "the exact line") {
    val df = (1 to 40).map(i => (1L, i.toDouble, i.toLong, 2.0 * i + 3.0))
      .toSeq.toDF("user_id", "ts", "event_id", "value")
    val out = PerSeriesForecast.conformalForecast(
        df, "value", "ts", "user_id", 3, tieBreak = Some("event_id"))
      .orderBy(col("h")).collect()
    assert(out.length == 3)
    out.foreach { r =>
      val h = r.getAs[Int]("h")
      val want = 2.0 * (40 + h) + 3.0
      assert(math.abs(r.getAs[Double]("yhat") - want) < 1e-9)
      assert(r.getAs[Double]("qhat") == 0.0, "zero residuals => zero q-hat")
      assert(r.getAs[Double]("lo") == r.getAs[Double]("yhat"))
      assert(r.getAs[Double]("hi") == r.getAs[Double]("yhat"))
    }
  }

  test("conformal: q-hat is the ceil((c+1)*0.8) order statistic and the " +
       "band covers >= 80% of calibration points by construction") {
    // 32 points: train = 24 on an exact line, calibration = 8 with known
    // alternating deviations
    val dev = Array(0.1, 0.9, 0.2, 0.8, 0.3, 0.7, 0.4, 0.6)
    val rows = (1 to 32).map { i =>
      val base = 5.0 * i
      val v = if (i <= 24) base else base + dev(i - 25)
      (1L, i.toDouble, i.toLong, v)
    }
    val out = PerSeriesForecast.conformalForecast(
        rows.toDF("user_id", "ts", "event_id", "value"),
        "value", "ts", "user_id", 1, tieBreak = Some("event_id"))
      .collect().head
    assert(out.getAs[Long]("c") == 8)
    // kq = min(8, ceil(0.8*9)) = 8 -> the 8th smallest of the 8 scores
    assert(math.abs(out.getAs[Double]("qhat") - 0.9) < 1e-9)
    val covered = dev.count(_ <= out.getAs[Double]("qhat") + 1e-12)
    assert(covered >= math.ceil(0.8 * dev.length).toInt)
  }

  // ---- hierarchical reconciliation ----------------------------------------

  test("reconcile: when every customer shares the same last day, " +
       "bottom-up equals base (coherent); top-down splits by history") {
    val orders = Seq(
      // nation 0: two customers, both with orders on day 2 (the max)
      (1L, 1L, "2024-01-01 00:00:00", 100.0),
      (1L, 2L, "2024-01-02 00:00:00", 50.0),
      (2L, 3L, "2024-01-01 00:00:00", 30.0),
      (2L, 4L, "2024-01-02 00:00:00", 70.0),
      // nation 1: one customer
      (3L, 5L, "2024-01-01 00:00:00", 200.0),
      (3L, 6L, "2024-01-02 00:00:00", 80.0)
    ).toDF("o_custkey", "o_orderkey", "d", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
    val customer = Seq((1L, 0), (2L, 0), (3L, 1))
      .toDF("c_custkey", "c_nationkey")
    val nation = Seq((0, "ALPHA"), (1, "BETA")).toDF("n_nationkey", "n_name")
    val out = Reconcile.naiveDaily(orders, customer, nation)
      .collect().map(r => r.getAs[String]("n_name") -> r).toMap
    // nation ALPHA: cust1 last=50, cust2 last=70 -> bu=120; nation daily
    // series: d1=130, d2=120 -> base=120 (same last day) -> gap 0
    assert(out("ALPHA").getAs[Double]("yhat_base") == 120.0)
    assert(out("ALPHA").getAs[Double]("yhat_bu") == 120.0)
    assert(out("ALPHA").getAs[Double]("gap_bu") == 0.0)
    // top naive: grand daily d1=330, d2=200 -> 200; ALPHA hist share =
    // 250/530
    val td = out("ALPHA").getAs[Double]("yhat_td")
    assert(math.abs(td - 200.0 * 250.0 / 530.0) < 1e-4)
    // top-down is coherent with the top by construction
    val tdSum = Seq("ALPHA", "BETA").map(out(_).getAs[Double]("yhat_td")).sum
    assert(math.abs(tdSum - 200.0) < 1e-4)
  }

  // ---- packed-sequence manifest --------------------------------------------

  test("pk6 manifest: starts are exclusive token prefix sums and agree " +
       "with the per-doc token counts") {
    val docs = Tables.documents(spark, SF)
    val asg = graft.streaming.StreamPack.assignBatch(
        docs, "text", "doc_id", "source", budget = 512L, shards = 8).toDF()
    val man = graft.queries.ScaleQueries6.queries("pk6_manifest")(spark, SF)
    val rows = man.collect()
    assert(rows.nonEmpty)
    val toks = asg.select(col("id"), col("toks")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val ids = r.getAs[String]("doc_ids").split(",").map(_.toLong)
      val starts = r.getAs[String]("starts").split(",").map(_.toLong)
      assert(ids.length == r.getAs[Long]("n_docs"))
      assert(starts.length == ids.length)
      assert(starts.head == 0L, "first doc starts at position 0")
      // each start = previous start + previous doc's tokens
      for (i <- 1 until ids.length)
        assert(starts(i) == starts(i - 1) + toks(ids(i - 1)))
      assert(starts.last + toks(ids.last) == r.getAs[Long]("n_tokens"))
    }
  }

  // ---- SFT loss masks -------------------------------------------------------

  test("x27 loss mask: every train span points exactly at assistant-turn " +
       "content and the char accounting closes") {
    val out = graft.queries.ScaleQueries6.queries("x27_loss_mask")(spark, SF)
      .collect()
    assert(out.nonEmpty)
    var sawSpan = false
    out.foreach { r =>
      val doc = r.getAs[String]("doc")
      assert(doc.length == r.getAs[Long]("n_total_chars"))
      val spans = r.getAs[String]("train_spans")
      val spanLens = if (spans.isEmpty) 0L else
        spans.split(";").map { sp =>
          val Array(a, b) = sp.split(":").map(_.toInt)
          val content = doc.substring(a, b)
          assert(Set("purchase", "error")(content),
            s"span [$a,$b) must cover assistant content, got '$content'")
          assert(doc.substring(a - 11, a) == "<assistant>",
            "span must be preceded by the assistant marker")
          sawSpan = true
          (b - a).toLong
        }.sum
      assert(spanLens == r.getAs[Long]("n_train_chars"))
    }
    assert(sawSpan, "fixture corpus must contain assistant turns")
  }

  // ---- bitext margin mining --------------------------------------------------

  test("s16 bitext margin: matches an independent array replay on a " +
       "hand-built fixture") {
    val vecs = Seq(
      (0L, 0, Array(1.0f, 0.0f, 0.0f)),
      (10L, 1, Array(0.9f, 0.1f, 0.0f)),
      (11L, 1, Array(0.6f, 0.8f, 0.0f)),
      (12L, 1, Array(0.0f, 1.0f, 0.0f)),
      (13L, 1, Array(0.5f, 0.5f, 0.2f))
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.bitextMargin(vecs, Seq(0L), 2, "embedding",
        "vec_id", "label").collect().head
    // independent replay
    def cos6(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      math.floor(dot / (na * nb) * 1e6 + 0.5) / 1e6
    }
    // replay through the float32 the table stores, as Spark's cast does
    val a0 = Array(1.0f, 0.0f, 0.0f).map(_.toDouble)
    val tgt = Map(
      10L -> Array(0.9f, 0.1f, 0.0f), 11L -> Array(0.6f, 0.8f, 0.0f),
      12L -> Array(0.0f, 1.0f, 0.0f), 13L -> Array(0.5f, 0.5f, 0.2f)
    ).map { case (k, v) => k -> v.map(_.toDouble) }
    val cs = tgt.map { case (id, v) => id -> cos6(a0, v) }
    val fwd = cs.values.toSeq.sorted.reverse.take(2)
    val aFwd = fwd.map(c => math.floor(c * 1e6 + 0.5).toLong).sum.toDouble / 2 / 1e6
    // backward: one anchor, so each target's k-NN mean over anchors = its own cos
    val margins = cs.map { case (id, c) =>
      id -> math.floor(c / ((aFwd + c) / 2.0) * 1e6 + 0.5) / 1e6
    }
    val best = margins.toSeq.sortBy { case (id, m) => (-m, id) }.head
    assert(got.getAs[Long]("vid") == best._1)
    assert(math.abs(got.getAs[Double]("margin") - best._2) < 1e-12)
  }

  test("s16 bitext margin: anchors never match same-label vectors") {
    val out = Similarity.bitextMargin(Tables.embeddings(spark, SF),
        Seq(0L, 1L, 2L), 4, "embedding", "vec_id", "label")
    val lbl = Tables.embeddings(spark, SF)
      .select(col("vec_id").cast("long"), col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.collect().foreach { r =>
      assert(lbl(r.getAs[Long]("qid")) != lbl(r.getAs[Long]("vid")))
    }
  }

  // ---- DoReMi domain reweighting -----------------------------------------------

  test("doremi: weights stay a near-exact simplex with the uniform floor, " +
       "and the persistently lossier domain gains weight monotonically") {
    // domain B docs are 9x longer -> higher proxy loss -> positive excess;
    // both id ranges cover every step residue so every batch mixes domains
    val docs = ((0 until 64).map(i => ("A", i.toLong, 500L)) ++
                (0 until 64).map(i => ("B", 1000L + i, 4500L)))
      .toDF("source", "doc_id", "n_chars")
    val out = Sampling.doremiWeights(docs, "source", "doc_id", "n_chars",
        steps = 8).collect()
    assert(out.length == 16)
    val byStep = out.groupBy(_.getAs[Long]("step"))
    byStep.foreach { case (_, rows) =>
      val s = rows.map(_.getAs[Double]("weight")).sum
      assert(math.abs(s - 1.0) < 1e-6, s"weights must sum to ~1, got $s")
      rows.foreach(r =>
        assert(r.getAs[Double]("weight") >= 0.015625 / 2 - 1e-9,
          "uniform mixing must floor every weight"))
    }
    val bTraj = (1L to 8L).map(t => byStep(t)
      .find(_.getAs[String]("source") == "B").get.getAs[Double]("weight"))
    bTraj.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-12, s"B's weight must not decrease: $bTraj")
    }
    assert(bTraj.last > 0.5, "the lossier domain must end above uniform")
  }

  // ---- forecast combination -----------------------------------------------------

  test("combo: weights form a simplex, and on an exact line the drift " +
       "member dominates so the combo tracks the truth closely") {
    val df = (1 to 30).map(i => (1L, i.toDouble, i.toLong, 3.0 * i + 10.0))
      .toSeq.toDF("user_id", "ts", "event_id", "value")
    val out = PerSeriesForecast.comboForecast(
        df, "value", "ts", "user_id", h = 5, horizon = 3,
        tieBreak = Some("event_id")).orderBy(col("h")).collect()
    assert(out.length == 3)
    out.foreach { r =>
      val ws = Seq("w_naive", "w_drift", "w_ses").map(r.getAs[Double])
      assert(math.abs(ws.sum - 1.0) < 1e-9, "weights must sum to 1")
      assert(r.getAs[Double]("w_drift") > 0.9,
        "zero drift error must dominate the inverse-MAE weights")
      val h = r.getAs[Int]("h")
      val truth = 3.0 * (30 + h) + 10.0
      // naive/ses members drag slightly below the line; bounded by the
      // residual weight mass times the trend offset
      assert(math.abs(r.getAs[Double]("yhat") - truth) < 5.0)
      assert(r.getAs[Double]("yhat") <= truth)
    }
  }

  // ---- WoE encoding ---------------------------------------------------------------

  test("woe: hand-counted fixture matches the smoothed log-odds formula") {
    val df = Seq(
      ("A", true), ("A", true), ("A", true), ("A", false),
      ("B", true), ("B", false), ("B", false), ("B", false)
    ).toDF("cat", "y")
    val out = graft.core.Encoders.woeEncode(df, "cat", "y")
      .select(col("cat"), col("cat_woe")).distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // A: pos 3, neg 1; totals pos 4, neg 4, K 2
    val wantA = math.log(((3 + 0.5) / (4 + 1.0)) / ((1 + 0.5) / (4 + 1.0)))
    assert(math.abs(out("A") - wantA) < 1e-12)
    assert(math.abs(out("B") + wantA) < 1e-12, "symmetric fixture => -WoE(A)")
  }

  // ---- pipe11 composition -----------------------------------------------------------

  test("pipe11: composition invariants — fills bounded by the budget, " +
       "and the chain equals composing the stages by hand") {
    val out = graft.queries.ScaleQueries6.queries("pipe11_pretrain")(spark, SF)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val seqs = r.getAs[Long]("n_seqs")
      val toks = r.getAs[Long]("n_tokens")
      val pad = r.getAs[Long]("pad_tokens")
      assert(toks + pad >= 512L * (seqs - 1),
        "only over-budget singleton docs may exceed the budget")
      assert(pad < 512L * seqs, "padding can never exceed the budget x seqs")
    }
    // stage-by-hand replay
    val docs = Tables.documents(spark, SF)
    val keep = Dedup.exact(docs, "text", "doc_id")
      .select(col("keep_id").as("doc_id"))
    val bal = Sampling.temperatureSample(docs.join(keep, Seq("doc_id")),
        "source", "doc_id", alpha = 0.5)
    val byHand = Packing.packGreedy(bal, "text", "doc_id", "source",
        budget = 512L, shards = 8)
      .groupBy(col("source")).agg(sum(col("n_tokens")).as("t2"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n_tokens") == byHand(r.getAs[String]("source")))
    }
  }

  // ---- n-gram containment ---------------------------------------------------

  test("containment: a quoted subset scores 1.0 where jaccard stays low") {
    val short = (1 to 10).map(i => s"tok$i").mkString(" ")
    val long = short + " " + (100 to 200).map(i => s"pad$i").mkString(" ")
    val docs = Seq((1L, short), (2L, long), (3L, "totally different words entirely"))
      .toDF("doc_id", "text")
    val cont = Dedup.ngramContainment(docs, "text", "doc_id", n = 3,
        threshold = 0.8).collect()
    assert(cont.length == 1)
    val r = cont.head
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    assert(r.getAs[Double]("cont_a") == 1.0, "the short doc is fully contained")
    assert(r.getAs[Double]("cont_b") < 0.2)
    // jaccard misses the same pair at any near-dup threshold
    val jac = Dedup.ngramJaccard(docs, "text", "doc_id", n = 3,
        threshold = 0.5).collect()
    assert(jac.isEmpty, "jaccard must NOT flag the subset pair")
  }

  test("prefix-filtered jaccard join equals the full inverted-index join") {
    val docs = Tables.documents(spark, SF)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        math.floor(r.getAs[Double]("jaccard") * 1e6 + 0.5))).toSet
    val full = canon(Dedup.ngramJaccard(docs, "text", "doc_id", 3, 0.5))
    val pref = canon(Dedup.ngramJaccardPrefix(docs, "text", "doc_id", 3, 0.5))
    assert(pref == full, "prefix filtering must be lossless")
    assert(full.nonEmpty, "fixture must contain near-dup pairs")
    // and at a higher threshold the prefix shrinks but equality holds
    val f9 = canon(Dedup.ngramJaccard(docs, "text", "doc_id", 3, 0.9))
    val p9 = canon(Dedup.ngramJaccardPrefix(docs, "text", "doc_id", 3, 0.9))
    assert(p9 == f9)
  }

  test("prefix filtering collapses the boilerplate df² candidate blow-up") {
    // 120 docs: unique body + a SHARED boilerplate footer. The footer
    // shingles pair every doc with every other in the full inverted
    // index; the prefix plan never probes them (highest df = last in
    // the (df, h) order, outside every prefix).
    val docs = (1 to 120).map { i =>
      val body = (1 to 12).map(j => s"u${i}w$j").mkString(" ")
      (i.toLong, body + " subscribe to our newsletter today")
    }.toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPrefix(docs, "text", "doc_id", 3, 0.5)
      .collect().isEmpty, "no pair is a real near-dup")
    // candidate observability: every pair shares the footer shingles in
    // the full inverted index; the prefix plan's candidates collapse
    val docTok = docs.select(col("doc_id").as("sid"),
        expr("""array_distinct(transform(sequence(1, size(split(text, ' ')) - 2),
          i -> concat_ws(' ', element_at(split(text, ' '), i),
            element_at(split(text, ' '), i + 1),
            element_at(split(text, ' '), i + 2))))""").as("hs"))
      .withColumn("nsh", size(col("hs")))
    val cand = Dedup.prefixCandidates(docTok, 0.5).count()
    val allSharing = Dedup.ngramJaccard(docs, "text", "doc_id", 3, 1e-9).count()
    assert(allSharing >= 120L * 119 / 2,
      "boilerplate must pair everyone with everyone in the full join")
    assert(cand <= allSharing / 20,
      s"prefix candidates must collapse: $cand vs $allSharing pairs")
  }

  // ---- MMR λ=1 twin + IVF recall curve ------------------------------------------

  test("mmr at lambda=1 reproduces the exact brute-force top-k rows") {
    val emb = Tables.embeddings(spark, SF)
    val mmr = Similarity.mmrTopK(emb, Seq(0L, 1L, 2L), 5, 1.0, 50,
        "embedding", "vec_id")
      .select(col("qid"), col("sel_rank"), col("vid")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val bf = Similarity.bruteForceTopK(emb, Seq(0L, 1L, 2L), 5,
        "embedding", "vec_id")
      .select(col("qid"), col("rank"), col("vid")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(mmr == bf)
  }

  test("ivf recall curve: monotone in nProbe and exactly 1.0 at full probe") {
    val out = Similarity.ivfRecallCurve(Tables.embeddings(spark, SF),
        Seq(0L, 1L, 2L, 3L, 4L), 5, "embedding", "vec_id", nCells = 4)
      .orderBy(col("n_probe")).collect()
    assert(out.length == 4)
    val rec = out.map(_.getAs[Double]("recall"))
    rec.sliding(2).foreach { case Array(a, b) =>
      assert(b >= a - 1e-9, s"recall must not decrease: ${rec.toSeq}")
    }
    assert(rec.last == 1.0, "probing every cell is exhaustive")
  }

  // ---- length-bucketed batching -------------------------------------------------

  test("length buckets: docs land in the smallest fitting boundary, " +
       "oversize reports as bucket 0, batch arithmetic exact") {
    // 1-token, 64-token, 65-token, 600-token docs
    val docs = Seq(
      (1L, "one"), (2L, Seq.fill(64)("w").mkString(" ")),
      (3L, Seq.fill(65)("w").mkString(" ")),
      (4L, Seq.fill(600)("w").mkString(" "))
    ).map { case (id, t) => (id, t, "s") }.toDF("doc_id", "text", "source")
    val out = Packing.lengthBuckets(docs, "text", "doc_id", "source",
        bounds = Seq(64L, 128L, 256L, 512L), batchSize = 2)
      .collect().map(r => r.getAs[Long]("bucket") -> r).toMap
    assert(out(64L).getAs[Long]("n_docs") == 2)     // 1-token + 64-token
    assert(out(64L).getAs[Long]("pad_tokens") == 63L)
    assert(out(64L).getAs[Long]("n_batches") == 1L)
    assert(out(128L).getAs[Long]("n_docs") == 1)    // the 65-token doc
    assert(out(128L).getAs[Long]("pad_tokens") == 63L)
    assert(out(0L).getAs[Long]("n_docs") == 1)      // oversize
    assert(out(0L).getAs[Long]("pad_tokens") == 0L)
    assert(out(0L).isNullAt(out(0L).fieldIndex("fill_permille")))
  }

  test("sba: exactly (1 - alpha/2) times croston, the first-order " +
       "bias correction") {
    val src = Tables.events(spark, SF).withColumn("demand",
      when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0)))
    val cro = PerSeriesForecast.crostonForecast(src, "demand", "ts",
        Seq("user_id"), 2, 0.5, Seq("event_id"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("h")) ->
        r.getAs[Double]("yhat")).toMap
    val sba = PerSeriesForecast.crostonSbaForecast(src, "demand", "ts",
        Seq("user_id"), 2, 0.5, Seq("event_id")).collect()
    assert(sba.nonEmpty)
    sba.foreach { r =>
      val k = (r.getAs[Long]("user_id"), r.getAs[Int]("h"))
      assert(r.getAs[Double]("yhat") == cro(k) * 0.75)
    }
  }

  // ---- tokenizer fertility --------------------------------------------------------

  test("bpe fertility: a vocabulary-covered source scores near 1, an " +
       "uncovered one pays full character fertility") {
    // source A: one word, repeated — the merges learn it completely;
    // source B: words the merges never touch
    val docs = ((1 to 40).map(i => (i.toLong, "abab abab abab", "A")) ++
                (1 to 10).map(i => (100L + i, "xq zk wv", "B")))
      .toDF("doc_id", "text", "source")
    // 2 merges: (a,b) then (ab,ab) — B's rare pairs never win a round
    val merges = TextAnalysis.bpeLearn(docs, "text", 2)
    val out = TextAnalysis.bpeFertility(docs, "text", "source", merges)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val fA = out("A").getAs[Double]("fertility")
    val fB = out("B").getAs[Double]("fertility")
    assert(fA == 1.0, s"fully-learned word must be one piece, got $fA")
    assert(fB == 2.0, s"untouched 2-char words stay at char fertility, got $fB")
    assert(out("B").getAs[Long]("fallback_permille") == 1000L)
    assert(out("A").getAs[Long]("n_words") == 120L)
  }

  // ---- delta-method ratio CI -----------------------------------------------------

  test("ratio delta CI: constant per-unit ratio gives se 0 at the exact " +
       "ratio; unit-correlated rows widen the naive-iid interval") {
    // cohort 0: every user has y = 3x exactly -> R = 3, zero variance
    val const = (0 until 50).flatMap { u =>
      (0 until 4).map(i => (0L, u.toLong, 3.0, 1L))
    }
    // cohort 1: half the users all-high, half all-low (unit correlation)
    val corr = (0 until 50).flatMap { u =>
      val y = if (u % 2 == 0) 6.0 else 0.0
      (0 until 4).map(i => (1L, 100L + u, y, 1L))
    }
    val df = (const ++ corr).toDF("cohort", "user_id", "rev", "one")
    val out = graft.stats.Cuped.ratioDeltaCi(df, "rev", "one", "user_id",
        "cohort").collect().map(r => r.getAs[Long]("cohort") -> r).toMap
    assert(out(0L).getAs[Double]("r") == 3.0)
    assert(out(0L).getAs[Double]("se") == 0.0)
    assert(out(1L).getAs[Double]("r") == 3.0)
    assert(out(1L).getAs[Double]("se") > 0.2,
      "all-or-nothing users must produce a wide delta-method se")
    assert(out(1L).getAs[Double]("lo") < 3.0 &&
           out(1L).getAs[Double]("hi") > 3.0)
  }

  // ---- SFT pipeline ----------------------------------------------------------------

  test("pipe12: packed SFT sequences conserve the conversation token mass") {
    val out = graft.queries.ScaleQueries6.queries("pipe12_sft")(spark, SF)
      .collect()
    assert(out.nonEmpty)
    val masked = EventAnalytics.sftLossMask(
        Tables.events(spark, SF), "event_type", "ts", "event_id", "user_id",
        assistantTypes = Seq("purchase", "error"))
    val totalToks = masked
      .select(Packing.tokenCount(col("doc")).as("t"))
      .agg(sum(col("t"))).collect().head.getLong(0)
    assert(out.map(_.getAs[Long]("n_tokens")).sum == totalToks,
      "packing must conserve tokens")
    assert(out.map(_.getAs[Long]("n_docs")).sum == masked.count(),
      "every conversation lands in exactly one sequence")
  }

  // ---- CUPED variance reduction ----------------------------------------------

  test("cuped: variance of the adjusted metric shrinks by ~(1 - rho^2) " +
       "and the unit-mean is preserved") {
    // y correlated with x: y = 2x + noise
    val noise = lcg(11L, 400)
    val rows = (0 until 400).flatMap { u =>
      val x = 10.0 + (u % 7)
      val y = 2.0 * x + noise(u) * 4.0
      Seq((u.toLong, 100L + u, x, true), (u.toLong, 10000L + u, y, false))
    }.map { case (u, id, v, pre) => (u, id, v, pre) }
      .toDF("user_id", "event_id", "value", "pre")
    val out = graft.stats.Cuped.adjustMeanMetric(
        rows, "value", "user_id", col("pre")).collect()
    val y = out.map(_.getAs[Double]("y"))
    val yAdj = out.map(_.getAs[Double]("y_adj"))
    def variance(a: Array[Double]) = {
      val m = a.sum / a.length
      a.map(v => (v - m) * (v - m)).sum / a.length
    }
    assert(math.abs(y.sum / y.length - yAdj.sum / yAdj.length) < 1e-6,
      "CUPED must preserve the metric mean")
    assert(variance(yAdj) < 0.5 * variance(y),
      s"strong pre-period correlation must cut variance, got " +
      s"${variance(yAdj)} vs ${variance(y)}")
    val theta = out.head.getAs[Double]("theta")
    assert(math.abs(theta - 2.0) < 0.2, s"theta must recover ~2, got $theta")
  }

  // ---- Poisson bootstrap ------------------------------------------------------

  test("poisson bootstrap: a constant-valued group collapses to a " +
       "zero-width interval at the constant") {
    val docs = (1 to 500).map(i => ("k", i.toLong, 42.5))
      .toDF("grp", "id", "x")
    val out = graft.stats.Bootstrap.poissonMeanCi(docs, "x", "id", "grp", b = 32)
      .collect().head
    assert(out.getAs[Long]("b_eff") == 32)
    assert(out.getAs[Double]("mean") == 42.5)
    assert(out.getAs[Double]("lo") == 42.5 && out.getAs[Double]("hi") == 42.5)
  }

  test("poisson bootstrap: interval brackets, and width shrinks ~sqrt(n)") {
    val noise = lcg(7L, 11000)
    val rows = (0 until 1000).map(i => ("small", i.toLong, 10.0 + noise(i))) ++
               (0 until 10000).map(i => ("big", 100000L + i, 10.0 + noise(1000 + i)))
    val out = graft.stats.Bootstrap.poissonMeanCi(
        rows.toDF("grp", "id", "x"), "x", "id", "grp", b = 64)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    out.values.foreach { r =>
      assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi"))
      assert(r.getAs[Long]("b_eff") == 64)
      // replicate means concentrate around the sample mean
      assert(r.getAs[Double]("lo") <= r.getAs[Double]("mean") + 0.05)
      assert(r.getAs[Double]("hi") >= r.getAs[Double]("mean") - 0.05)
    }
    val wSmall = out("small").getAs[Double]("hi") - out("small").getAs[Double]("lo")
    val wBig = out("big").getAs[Double]("hi") - out("big").getAs[Double]("lo")
    assert(wBig < wSmall / 1.5,
      s"10x rows must shrink the interval ~3x, got $wSmall vs $wBig")
  }

  private def lcg(seed: Long, n: Int): Array[Double] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 40) % 1000) / 1000.0
    }
  }

  test("doremi: zero excess everywhere keeps the uniform mixture") {
    val docs = (0 until 32).map(i => ("A", i.toLong, 1000L)) ++
               (0 until 32).map(i => ("B", i.toLong + 100, 1000L))
    val out = Sampling.doremiWeights(docs.toDF("source", "doc_id", "n_chars"),
        "source", "doc_id", "n_chars", steps = 4).collect()
    out.foreach(r =>
      assert(math.abs(r.getAs[Double]("weight") - 0.5) < 1e-8))
  }
}
