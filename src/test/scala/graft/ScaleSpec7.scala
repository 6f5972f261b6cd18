package graft

import org.apache.spark.sql.functions._

/** Round-14 additions: Anderson–Darling two-sample, Kendall tau-b,
  * triangle census. */
class ScaleSpec7 extends SparkTestBase {
  import spark.implicits._

  // ---- Anderson–Darling ------------------------------------------------

  test("adStatistic: textbook 2+2 case matches the hand computation, " +
       "and separation increases A2") {
    // A = {1,2}, B = {3,4}: distinct pooled values 1,2,3 (4 has B_j = N):
    //   j=1: l=1, B=1, M=1, D=4·1−2·1=2 -> 4/(1·3)
    //   j=2: l=1, B=2, M=2, D=4        -> 16/(2·2)
    //   j=3: l=1, B=3, M=2, D=2        -> 4/(3·1)
    // A² = (1/4)·(1/2+1/2)·(4/3 + 4 + 4/3) = 5/3
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("g", "v")
    val out = graft.stats.DriftAudit.adStatistic(df, "v", "g").collect().head
    assert(out.getAs[Long]("n_a") == 2L && out.getAs[Long]("n_b") == 2L)
    assert(math.abs(out.getAs[Double]("a2") - 5.0 / 3.0) < 1e-6, s"$out")
    // interleaved samples score lower than separated ones
    val near = Seq(("a", 1.0), ("b", 2.0), ("a", 3.0), ("b", 4.0)).toDF("g", "v")
    val a2near = graft.stats.DriftAudit.adStatistic(near, "v", "g")
      .collect().head.getAs[Double]("a2")
    assert(a2near < out.getAs[Double]("a2"), s"near=$a2near")
  }

  test("adStatistic: non-binary split is a clear error, not a MatchError") {
    val df = Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      graft.stats.DriftAudit.adStatistic(df, "v", "g").collect()
    }
    assert(e.getMessage.contains("exactly 2"))
  }

  // ---- Kendall tau-b -----------------------------------------------------

  test("kendallTau: perfect concordance = 1, reversal = -1, tied grid = 0") {
    val up = (1 to 6).map(i => (i.toLong, i.toLong)).toDF("x", "y")
    val r1 = graft.stats.RankTests.kendallTau(up, "x", "y").collect().head
    assert(math.abs(r1.getAs[Double]("tau_b") - 1.0) < 1e-12)
    assert(r1.getAs[Long]("concordant") == 15L &&
           r1.getAs[Long]("discordant") == 0L)
    val down = (1 to 6).map(i => (i.toLong, (7 - i).toLong)).toDF("x", "y")
    val r2 = graft.stats.RankTests.kendallTau(down, "x", "y").collect().head
    assert(math.abs(r2.getAs[Double]("tau_b") + 1.0) < 1e-12)
    // symmetric 2x2 grid: C = D = 1, tau = 0; ties counted in n1/n2
    val grid = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)).toDF("x", "y")
    val r3 = graft.stats.RankTests.kendallTau(grid, "x", "y").collect().head
    assert(r3.getAs[Long]("concordant") == 1L &&
           r3.getAs[Long]("discordant") == 1L)
    assert(math.abs(r3.getAs[Double]("tau_b")) < 1e-12)
  }

  test("kendallTau: the bounded-joint-domain contract is enforced") {
    val big = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      graft.stats.RankTests.kendallTau(big, "x", "y", maxCombos = 10)
    }
    assert(e.getMessage.contains("maxCombos"))
  }

  // ---- interval-overlap join ----------------------------------------------

  test("overlapJoin: duplicate-free across shared buckets, inclusive " +
       "endpoints, and exactly the brute-force pair set") {
    // intervals spanning MANY 10-wide buckets — a naive bucket join
    // would emit some pairs up to 9 times
    val l = Seq((1L, 0.0, 95.0), (2L, 20.0, 25.0), (3L, 50.0, 50.0),
                (4L, 200.0, 210.0))
      .toDF("lid", "lo_l", "hi_l")
    val r = Seq((10L, 90.0, 120.0), (11L, 25.0, 30.0), (12L, 49.0, 51.0),
                (13L, 300.0, 310.0))
      .toDF("rid", "lo_r", "hi_r")
    val got = graft.core.JoinOps.overlapJoin(l, "lo_l", "hi_l",
        r, "lo_r", "hi_r", bucketWidth = 10.0)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    val brute = for {
      (a, alo, ahi) <- Seq((1L, 0.0, 95.0), (2L, 20.0, 25.0),
        (3L, 50.0, 50.0), (4L, 200.0, 210.0))
      (b, blo, bhi) <- Seq((10L, 90.0, 120.0), (11L, 25.0, 30.0),
        (12L, 49.0, 51.0), (13L, 300.0, 310.0))
      if alo <= bhi && blo <= ahi
    } yield (a, b)
    assert(got.sorted.toSeq == brute.sorted,
      s"got ${got.sorted.toSeq} vs brute ${brute.sorted}")
    assert(got.length == got.distinct.length, "pairs must be emitted once")
    // endpoint touch (2,11) at 25.0 must be IN (closed intervals)
    assert(got.contains((2L, 11L)))
  }

  // ---- triangle census ---------------------------------------------------

  test("triangleStats: K4 counts 4 triangles at gcc 1; a path has none; " +
       "duplicate/reversed edges collapse") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
                 (2L, 1L), (3L, 1L)) // reversed dups must not double-count
      .toDF("a", "b")
    val r = graft.scale.Graph.triangleStats(k4, "a", "b").collect().head
    assert(r.getAs[Long]("n_nodes") == 4L && r.getAs[Long]("n_edges") == 6L)
    assert(r.getAs[Long]("n_triangles") == 4L)
    assert(r.getAs[Long]("n_wedges") == 12L) // 4 nodes x C(3,2)
    assert(math.abs(r.getAs[Double]("gcc") - 1.0) < 1e-12)
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val p = graft.scale.Graph.triangleStats(path, "a", "b").collect().head
    assert(p.getAs[Long]("n_triangles") == 0L && p.getAs[Long]("n_wedges") == 1L)
    assert(p.isNullAt(p.fieldIndex("gcc")) == false && p.getAs[Double]("gcc") == 0.0)
  }

  test("cosineLsh mega-bucket cap: a degenerate exact-duplicate pile is " +
       "dropped from the candidate stream; normal near-dups still verify") {
    // 40 IDENTICAL vectors (every band puts them in one bucket —
    // occupancy 40 > maxBucket 8) plus one genuine near-dup pair in a
    // different direction. The cap must kill the pile's C(40,2) pairs
    // and keep the pair.
    val dim = 8
    val pile = (0L until 40L).map(i => (i, Seq.fill(dim)(1.0)))
    val va = Seq.tabulate(dim)(j => if (j % 2 == 0) -1.0 else 0.5)
    val vb = va.map(_ * 1.02) // cos = 1 exactly up to scaling
    val df = (pile ++ Seq((100L, va), (101L, vb))).toDF("vec_id", "v")
    val out = graft.scale.Dedup.cosineNearDupLsh(df, "v", "vec_id",
        threshold = 0.95, maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((100L, 101L)), s"near-dup pair lost: $out")
    assert(!out.exists { case (a, b) => a < 40L && b < 40L },
      s"mega-bucket pairs must be capped away: $out")
    // uncapped (default 64x targetBucket) the pile IS reported
    val full = graft.scale.Dedup.cosineNearDupLsh(df, "v", "vec_id",
        threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.exists { case (a, b) => a < 40L && b < 40L })
  }

  test("cosineNearDupLsh sketch cascade: pair set equals the direct-verify " +
       "path (standing recall-contract spec)") {
    // the scale-dependent branch (n >= sketchMinRows) screens candidates
    // with a 128-bit sign sketch before the full-vector verify; the
    // >=4.9-sigma guard band makes a lost true pair a <1e-6 event. Force
    // the cascade on a deterministic near-dup fixture (seeded LCG base
    // vectors + 0.957-cosine perturbed twins) and assert the emitted
    // pair SET equals the direct path's — same operator contract the
    // r15 sf10 soak measured byte-identical at n=400k.
    val dim = 16
    val r = graft.core.DetRandom.longs(4242L)
    def vec(): Seq[Double] = Seq.fill(dim)(((r() % 1000L) - 500L) / 250.0)
    val base = (0L until 500L).map(i => (i, vec()))
    val twins = base.map { case (i, v) =>
      (i + 100000L,
       v.zipWithIndex.map { case (x, j) => if (j % 2 == 0) x * 1.3 else x * 0.7 })
    }
    val df = (base ++ twins).toDF("vec_id", "v")
    val direct = graft.scale.Dedup.cosineNearDupLsh(df, "v", "vec_id",
        threshold = 0.9, knownRows = 1000L)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val cascade = graft.scale.Dedup.cosineNearDupLsh(df, "v", "vec_id",
        threshold = 0.9, knownRows = 1000L, sketchMinRows = 0L)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(direct.nonEmpty, "fixture must produce near-dup pairs")
    assert(cascade == direct,
      s"cascade lost/gained pairs: only-direct=${direct -- cascade} " +
      s"only-cascade=${cascade -- direct}")
  }

  test("lshBucketProfile: sums signatures and pairs exactly on a known pile") {
    val dim = 4
    val df = (0L until 10L).map(i => (i, Seq.fill(dim)(1.0))).toDF("vec_id", "v")
    // identical vectors: every band has ONE bucket of occupancy 10
    val r = graft.scale.Dedup.lshBucketProfile(df, "v", "vec_id",
        bands = 4, planesPerBand = 2, knownRows = 10L).collect().head
    assert(r.getAs[Long]("n_sigs") == 40L)
    assert(r.getAs[Long]("n_buckets") == 4L)
    assert(r.getAs[Long]("max_occ") == 10L)
    assert(r.getAs[Long]("cand_pairs") == 4L * 45L)
    // default cap (64*targetBucket) doesn't bind: capped view == uncapped
    assert(r.getAs[Long]("dropped_buckets") == 0L)
    assert(r.getAs[Long]("dropped_sigs") == 0L)
    assert(r.getAs[Long]("capped_pairs") == r.getAs[Long]("cand_pairs"))
    // a binding cap reports EXACTLY what cosineLshCandidates will drop
    val c = graft.scale.Dedup.lshBucketProfile(df, "v", "vec_id",
        bands = 4, planesPerBand = 2, knownRows = 10L, maxBucket = 8)
      .collect().head
    assert(c.getAs[Long]("dropped_buckets") == 4L)
    assert(c.getAs[Long]("dropped_sigs") == 40L)
    assert(c.getAs[Long]("capped_pairs") == 0L)
  }

  test("two-level assignCells: above-crossover assignment keeps separated clusters intact") {
    // 80 orthogonal one-hot clusters (>= Similarity.twoLevelMin = 64, so
    // kmeansAssign routes assignment through the coarse-then-refine path)
    // with jittered members: the two-level coarse routing must land every
    // member in its prototype's cell — on separated clusters this IS
    // agreement with the flat max-cosine scan.
    val dim = 96
    val nClu = 80
    val rows = (0 until nClu).map { c =>
      (c.toLong, Seq.tabulate(dim)(j => if (j == c) 1.0 else 0.0))
    } ++ (0 until 400).map { i =>
      val c = i % nClu
      (1000L + i, Seq.tabulate(dim)(j =>
        if (j == c) 1.0
        else if (j == (c + 7) % dim) 0.05 * ((i % 5) - 2) else 0.0))
    }
    val df = rows.toDF("vec_id", "v")
    val out = graft.scale.Similarity.kmeansAssign(df, "v", "vec_id",
        nCells = nClu, lloydIters = 1)
      .select(col("vid"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0 until 400).foreach { i =>
      val c = i % nClu
      assert(out(1000L + i) == out(c.toLong), s"member $i strayed from cluster $c")
    }
    assert(out.values.toSet.size == nClu,
      "separated clusters must keep distinct cells")
  }

  test("triangleStats: the maxDeg cap removes hubs BEFORE the census") {
    // hub 0 connects to 1..5 (deg 5 > cap 4) plus one triangle 1-2-3
    val edges = ((1L to 5L).map(i => (0L, i)) ++
      Seq((1L, 2L), (2L, 3L), (1L, 3L))).toDF("a", "b")
    val r = graft.scale.Graph.triangleStats(edges, "a", "b", maxDeg = 4)
      .collect().head
    // hub gone: nodes 1,2,3 with their triangle survive (4 and 5 lose
    // their only edge and drop out of the degree table)
    assert(r.getAs[Long]("n_nodes") == 3L, s"$r")
    assert(r.getAs[Long]("n_edges") == 3L && r.getAs[Long]("n_triangles") == 1L)
  }
}
