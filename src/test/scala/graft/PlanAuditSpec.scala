package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.scale.Dedup

/** Plan-shape guards for the scale properties the operators promise:
  * counts of physical shuffle exchanges must not silently grow. Counted
  * with AQE OFF — an AQE-wrapped plan is a leaf to collect(), which made
  * these budgets vacuous before round 4. (Reused exchanges don't
  * double-count — ReusedExchangeExec is not a ShuffleExchangeLike.) */
class PlanAuditSpec extends SparkTestBase {

  private def shuffles(df: => DataFrame): Int = withAqeOff {
    df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeLike => e
    }.size
  }

  /** Content-keyed (hash/range) exchanges only — round-robin widening
    * ([[graft.core.Par.widen]]) moves raw rows without clustering them,
    * so it is parallelism plumbing, not dataflow. */
  private def keyedShuffles(df: => DataFrame): Int = withAqeOff {
    df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeLike
        if !e.outputPartitioning.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning] => e
    }.size
  }

  private lazy val docs = Tables.documents(spark, SF)

  test("SimHash fingerprints are map-side: no content-keyed shuffle") {
    assert(keyedShuffles(Dedup.simHash(docs, "text", "doc_id")) == 0)
  }

  test("MinHash signatures are map-side: zero shuffles") {
    val sig = docs.select(col("doc_id"),
      graft.functions.MinHashSig(col("text"), 3, 16).as("sig"))
    assert(shuffles(sig) == 0)
  }

  test("exact dedup is at most one content-hash shuffle") {
    // == 0 here: a single-partition sf0.001 scan already satisfies the
    // clustered distribution, so EnsureRequirements elides the exchange;
    // at real partition counts it is exactly 1
    assert(shuffles(Dedup.exact(docs, "text", "doc_id")) <= 1)
  }

  test("j1_star: fact shuffled once on the join key, plus the final agg exchange") {
    // lineitem is exchanged ONCE (hash on l_orderkey) — that exchange
    // serves both the per-orderkey partial aggregation and the join;
    // dims broadcast; the only other exchange is the final (post-agg,
    // tiny) groupBy(region, month)
    assert(shuffles(SparkEntry.queries("j1_star")(spark, SF)) <= 2)
  }

  test("j1_star shuffle regime: agg exchange is reused by the orders join") {
    // the 100 TB case — orders too big to broadcast. Force the shuffle
    // join and assert the reuse claim directly: lineitem is hashed once
    // on l_orderkey (serving partial agg AND join), orders hashed once,
    // final tiny agg exchange — 3 total, none between the partial agg
    // and the join.
    withAqeOff {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = SparkEntry.queries("j1_star")(spark, SF)
          .queryExecution.executedPlan
        val n = plan.collect { case e: ShuffleExchangeLike => e }.size
        assert(n <= 3, s"shuffle-regime exchange count grew: $n")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("ngramJaccard stays within its contracted shuffle budget") {
    // set aggregation (1) + pairing join sides (<=2, one may be reused)
    // + pair aggregate (1)
    val d2 = Dedup.ngramJaccard(docs, "text", "doc_id", 3, 0.5)
    assert(keyedShuffles(d2) <= 4, s"d2 shuffle count grew: ${keyedShuffles(d2)}")
  }

  test("repetitionStats is pure map-side: zero shuffles") {
    assert(shuffles(
      graft.scale.TextAnalysis.repetitionStats(docs, "text", "doc_id")) == 0)
  }

  test("chunkDocuments is pure map-side: zero shuffles") {
    assert(shuffles(graft.scale.Curation.chunkDocuments(docs, "text", "doc_id", 32, 8)) == 0)
  }

  test("hashSplit is pure map-side: zero shuffles") {
    assert(shuffles(graft.scale.Sampling.hashSplit(docs, "doc_id")) == 0)
  }

  test("capPerGroup costs at most one keyed shuffle (the group window)") {
    assert(keyedShuffles(graft.scale.Sampling.capPerGroup(docs, "lang", "doc_id", 3)) <= 1)
  }

  test("iqrOutliers: one bounds aggregation, data side joins by broadcast") {
    val out = graft.stats.Quantiles.iqrOutliers(docs, "n_chars", Seq("lang"))
    assert(keyedShuffles(out) <= 1, s"iqr shuffle count grew: ${keyedShuffles(out)}")
  }

  test("rowCorrTopK never shuffles the corpus (TakeOrdered top-k)") {
    val em = Tables.embeddings(spark, SF)
    assert(shuffles(graft.scale.Similarity.rowCorrTopK(em, "vec_id", "embedding", 7L, 10)) == 0)
  }

  test("stream-static enrichment broadcasts the dim: stream side never shuffles for the join") {
    val plan = withAqeOff {
      graft.streaming.StreamEnrich
        .enrichBatch(Tables.events(spark, SF), Tables.customer(spark, SF))
        .queryExecution.executedPlan
    }
    val bhj = plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty, s"expected BroadcastHashJoin:\n$plan")
    // the only exchange allowed is the final aggregation's
    val enrich = graft.streaming.StreamEnrich
      .enrichBatch(Tables.events(spark, SF), Tables.customer(spark, SF))
    assert(shuffles(enrich) <= 1, s"join shuffled the fact side: ${shuffles(enrich)}")
  }

  test("interval self-join shuffles each side once on the key (no ts in the join key)") {
    val j = graft.streaming.IntervalJoin.selfJoinBatch(Tables.events(spark, SF), 30)
    // one exchange per side at real partition counts; 0 when the scan is
    // already a single partition (sf0.001)
    assert(shuffles(j) <= 2, s"interval join over-shuffles: ${shuffles(j)}")
  }

  test("tfidf does one corpus-sized shuffle; later stages shuffle the aggregated table") {
    val t = graft.scale.TextAnalysis.tfidfTopTerms(docs, "text", "lang", 15)
    // (g,term) agg (the only corpus-sized one) + term window + group
    // top-k window + the 2-exchange distinct-group count over the tiny
    // aggregated table
    assert(keyedShuffles(t) <= 5, s"tfidf shuffle count grew: ${keyedShuffles(t)}")
  }

  test("label centroids: explode stays map-side, one aggregation shuffle") {
    val c = graft.scale.Similarity.labelCentroids(
      Tables.embeddings(spark, SF), "embedding", "label")
    assert(shuffles(c) <= 1, s"centroids over-shuffle: ${shuffles(c)}")
  }

  test("lineDedup: line-keyed agg + join + doc rebuild, bounded shuffle budget") {
    val d = graft.scale.Curation.lineDedup(docs, "text", "doc_id", " ")
    // first-occurrence selection is a partial-aggregated groupBy(line)
    // (never a window over a skewed line partition), the join reuses the
    // line hashing, the rebuild is one groupBy(id), plus the final left
    // join back to the doc table — all on keyed exchanges
    assert(keyedShuffles(d) <= 5, s"lineDedup shuffle count grew: ${keyedShuffles(d)}")
  }

  test("bag-of-words transform is map-side once the vocabulary is frozen") {
    import graft.models.NlpFeatures
    val vocab = NlpFeatures.vocabulary(docs, "text", 10) // bounded agg, off-plan
    val bow = NlpFeatures.withBow(docs, "text", vocab, "bow")
    assert(keyedShuffles(bow) == 0,
      s"frozen-vocab transform should not shuffle: ${keyedShuffles(bow)}")
  }

  test("temperatureSample: corpus side joins the rate table broadcast, never shuffles") {
    val out = graft.scale.Sampling.temperatureSample(docs, "source", "doc_id", 0.5)
    // every keyed exchange belongs to the TINY rate-table side: the
    // per-source count agg, the global min over it, and the cross-joined
    // rate projection — all operating on ~|sources| rows. The corpus
    // itself reaches the filter through a BroadcastHashJoin, so its scan
    // is exchange-free at any SF
    assert(keyedShuffles(out) <= 3, s"rate-table agg grew: ${keyedShuffles(out)}")
    val bcast = withAqeOff {
      out.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }.size
    }
    assert(bcast >= 1, "corpus-side join must be broadcast")
  }

  test("decontaminateBloom: train side is a pure map-side filter plus one count agg") {
    val train = docs.filter(col("source") =!= "src0")
    val eval = docs.filter(col("source") === "src0")
    val out = graft.scale.Curation.decontaminateBloom(train, eval, "text", "doc_id", 4)
    // the Bloom sketch is built OFF-plan (driver-held, fixed size); the
    // registered plan has no join at all — only the per-doc hit-count
    // aggregation may exchange (plus the grams distinct)
    val joins = withAqeOff {
      out.queryExecution.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }.size
    }
    assert(joins == 0, s"bloom path must not join, found $joins")
    assert(keyedShuffles(out) <= 2, s"shuffle budget grew: ${keyedShuffles(out)}")
  }

  test("partitioned sink: filter on the partition key prunes at planning time") {
    val path = "target/plan_audit_part_sink"
    graft.sources.PartitionedSink.write(Tables.events(spark, SF), "event_type", path)
    val pruned = graft.sources.PartitionedSink.read(spark, path)
      .filter(col("event_type") === "purchase")
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.nonEmpty)
    // the partition filter must reach the scan node (directory-level
    // pruning — unmatched partitions are never listed into tasks), and
    // exactly one of the five event_type directories survives it
    assert(scan.head.partitionFilters.exists(_.toString.contains("event_type")),
      s"no partition filter on scan: ${scan.head.partitionFilters}")
    assert(scan.head.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned partition, got ${scan.head.selectedPartitions.partitionCount}")
  }

  test("deterministicShuffle: one data shuffle (bucket window) + tiny offset agg, offsets broadcast") {
    // the data moves ONCE (hash on the bucket prefix for the window);
    // the offset table's own agg+window exchanges are 16^p-row traffic.
    // The join back must be broadcast — the corpus must NOT shuffle a
    // second time for it.
    val df = graft.scale.Sampling.deterministicShuffle(docs, "doc_id", 42L)
    val n = shuffles(df)
    assert(n <= 4, s"expected the data exchange + bounded offset-table exchanges, got $n")
    val bcast = withAqeOff {
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }.size
    }
    assert(bcast >= 1, "offset table must broadcast back onto the data")
  }

  test("psiBins: the corpus is binned map-side off two broadcast scalars") {
    val ev = Tables.events(spark, SF)
      .filter(col("event_type").isin("purchase", "view"))
    val df = graft.stats.DriftAudit.psiBins(ev, "value", "event_type", 10)
    // data-sized shuffles: ONE (the bin/pivot count agg). min/max and the
    // split totals are scalar aggregates whose exchanges carry 1-2 rows.
    assert(shuffles(df) <= 4, s"psiBins plan grew: ${shuffles(df)} shuffles")
  }

  test("retention: events collapse to distinct (user, period) before any join") {
    val df = graft.scale.EventAnalytics.retention(
      Tables.events(spark, SF), "ts", "user_id", 604800L, 8)
    // all exchanges are user-keyed reductions of the events table or the
    // |users|-row cohort table; the sizes table joins back broadcast
    val bcast = withAqeOff {
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }.size
    }
    assert(bcast >= 1, "cohort sizes must broadcast")
    assert(shuffles(df) <= 6, s"retention plan grew: ${shuffles(df)} shuffles")
  }

  test("crossCorrelation: bucket tables reduce before the lag join; lags broadcast") {
    val ev = Tables.events(spark, SF)
    val df = graft.scale.SeriesDiagnostics.crossCorrelation(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"), "value", "ts", 6)
    // two bucket aggs + the final per-lag agg; the bucket-to-bucket join
    // happens on already-reduced tables
    assert(shuffles(df) <= 5, s"ccf plan grew: ${shuffles(df)} shuffles")
  }

  test("holtWintersForecast: one series-keyed exchange, nothing else") {
    val df = graft.scale.PerSeriesForecast.holtWintersForecast(
      Tables.events(spark, SF), "value", "ts", "user_id", 3, 7,
      tieBreak = Some("event_id"))
    assert(keyedShuffles(df) == 1,
      s"hw must be exactly the groupByKey exchange: ${keyedShuffles(df)}")
  }

  test("bpePairCounts: word agg + pair agg, top-k without a global sort exchange") {
    val df = graft.scale.TextAnalysis.bpePairCounts(docs, "text", 20)
    // corpus -> word counts (1 keyed shuffle), words -> pair counts (1);
    // the limit is TakeOrdered, not a range-partitioned sort
    assert(keyedShuffles(df) == 2, s"bpe pair plan grew: ${keyedShuffles(df)}")
  }

  test("calibrationBins: map-side binning, one O(bins) aggregate shuffle") {
    val df = graft.stats.DriftAudit.calibrationBins(
      docs.withColumn("p", col("n_chars").cast("double") / 1000)
        .withColumn("lbl", (col("lang") === "en").cast("int")),
      "p", "lbl", 10)
    assert(shuffles(df) == 1, s"calibration plan grew: ${shuffles(df)}")
  }

  /** Queries excluded from the registry-wide plan sweeps: the model-fit
    * registries (estimator constructions run full fits; their outputs
    * are bounded result frames) and the queries whose CONSTRUCTION is an
    * iterative job at test scale. */
  private lazy val sweepSkip: Set[String] =
    graft.queries.ModelQueries.queries.keySet ++
      graft.queries.ModelQueries2.queries.keySet ++
      Set("d5_cosine_neardup",   // all-pairs by documented API-capped contract
          "x19_bpe_merges",      // merge-loop actions at construction
          "sm14_cluster_split",  // components fixpoint at construction
          "d12_semdedup", "s3_ann_ivf", // Lloyd iterations at construction
          "x13_quality_lr",      // LBFGS fit at construction
          "f3_series_arima",     // per-series CSS fits
          "pipe4_image",         // components fixpoint at construction
          "g1_pagerank",         // 5 eager rank sweeps at construction
          "f24_winner_rt")       // parquet sink write at construction

  /** One physical plan per swept query, built once (AQE off) and shared
    * by every registry-wide sweep — planning ~300 queries is the
    * expensive part, the collects over the trees are free. */
  private lazy val sweptPlans: Seq[(String, org.apache.spark.sql.execution.SparkPlan)] =
    withAqeOff {
      graft.SparkEntry.queries.toSeq.sortBy(_._1)
        .filterNot { case (name, _) => sweepSkip(name) }
        .map { case (name, q) => name -> q(spark, SF).queryExecution.executedPlan }
    }

  test("registry-wide: no unplanned cartesian product in ANY query plan") {
    // Every registered query's physical plan is swept for
    // CartesianProductExec — the one join shape that is never
    // acceptable at 100 TB unless a documented contract says so.
    val offenders = sweptPlans.collect {
      case (name, plan) if plan.collect {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      }.nonEmpty => name
    }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("registry-wide: no single-partition WindowExec over an unbounded frame") {
    // A window with an EMPTY partition spec funnels its ENTIRE input
    // through one task — the shape that made round-13's g1/g2 top-k
    // correct-but-wrong-at-100-TB. A single-partition window is
    // acceptable ONLY when its input frame is provably bounded:
    // (a) a limit / TakeOrdered below it in the same plan subtree, or
    // (b) a grand (no-grouping) aggregate below it (emits one row per
    //     upstream partition then one row), or
    // (c) the query is in the justified allowlist below, where the
    //     window input is a REDUCED frame whose row count is a small
    //     domain (number of tests / models / groups), not data rows.
    import org.apache.spark.sql.execution.{GlobalLimitExec, LocalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
    // A broadcast branch never bounds the STREAMED side of its join, so
    // the recursion must not cross it (else `x.crossJoin(broadcast(agg))`
    // would launder any unbounded frame past the check).
    def bounded(p: SparkPlan): Boolean = p match {
      case _: GlobalLimitExec | _: LocalLimitExec |
           _: TakeOrderedAndProjectExec => true
      case a: BaseAggregateExec if a.groupingExpressions.isEmpty => true
      case _: BroadcastExchangeLike => false
      case other => other.children.exists(bounded)
    }
    // Windows over REDUCED frames whose row count is a small domain, not
    // data rows — each justified at its operator site:
    val allow: Map[String, String] = Map(
      "a16_ks"        -> "cumulative ECDF over the distinct-value table (ksStatistic bounded-cardinality contract)",
      "a51_cvm"       -> "same distinct-value ECDF frame as a16_ks (cvmStatistic)",
      "a54_ad"        -> "same distinct-value ECDF frame as a16_ks (adStatistic)",
      "a28_auc"       -> "rank window over the distinct-SCORE table (binaryAuc; scores pre-rounded)",
      "a29_gains"     -> "cumulative window over the distinct-score cutoff table (gainsCurve)",
      "a30_rfm"       -> "Ranks.globalRank level-0 grid window — ≤4097 range-bucket rows",
      "a56_key_skew"  -> "same Ranks.globalRank ≤4097-row bucket-grid window (SkewAudit gini rank fold)",
      "a53_spearman"  -> "rank maps from the distinct-value tables of x and y (spearman rankMap)",
      "a45_bh_fdr"    -> "sorts m p-VALUES — m = number of hypotheses tested, never data rows",
      "a46_obf"       -> "cumulative window over the k=5 sequential-look grid (sequentialLooks)",
      "e1_label_encode" -> "vocabulary window over DISTINCT labels (label-encoder domain)",
      "e2_unseen_encode" -> "same distinct-label vocabulary window",
      "e8_label_decode"  -> "same distinct-label vocabulary window",
      "m14_granger"   -> "single bounded per-period series by the grangerLag1 contract",
      "m15_coint"     -> "single bounded per-period series (Engle–Granger two-step)",
      "m16_hac"       -> "single bounded per-period series (Newey–West)",
      "m17_archlm"    -> "single bounded per-period series (ARCH-LM)",
      "m20_runs"      -> "single bounded per-period series (runsTest documented contract)",
      "pipe5_tokens"  -> "budgetSelect windows: ≤101-row score grid + 4096 md5-prefix bucket histogram",
      "pipe7_fim_pack" -> "same budgetSelect grid/bucket windows",
      "pk2_budget_select" -> "same budgetSelect grid/bucket windows",
      "pk3_shard_snake" -> "offset window over the distinct-token-count grid (snakeShard)",
      "sm8_dsir"      -> "1024-bucket hashed n-gram feature grid",
      "sm9_ppl_tiers" -> "grouped-score cut table (scores on the 1e-4 grid)",
      "sm11_shuffle"  -> "offset window over the 16^4 md5-prefix bucket count grid",
      "x33_kn_bigram" -> "vocabulary type-table rank window (bounded by distinct words)",
      "x34_heaps"     -> "bucket-offset window over the ≤4097-row doc-range grid (two-level cumulative)",
      "x36_coverage"  -> "vocabulary type-table rank window (bounded by distinct words)")
    val offenders = sweptPlans.collect {
      case (name, plan) if !allow.contains(name) && plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty && !bounded(w.child) => w
      }.nonEmpty => name
    }
    assert(offenders.isEmpty,
      s"single-partition WindowExec over an unbounded frame in: ${offenders.mkString(", ")} " +
        "— use orderBy(...).limit(k) (TakeOrderedAndProject) or partition the window")
  }

  test("adamicAdar: top-k is TakeOrderedAndProject over the pair table, " +
       "and no single-partition WindowExec anywhere") {
    val inc = Tables.lineitem(spark, SF)
      .select(col("l_partkey").as("a"), col("l_suppkey").as("z"))
    val plan = withAqeOff(graft.scale.Graph.adamicAdar(inc, "a", "z")
      .queryExecution.executedPlan)
    assert(plan.collectFirst {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.isDefined, s"expected TakeOrderedAndProject:\n$plan")
    val badWin = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(badWin.isEmpty, s"single-partition window in adamicAdar:\n$plan")
  }

  test("rangeJoin: bucket decomposition plans as a hash join, never a nested loop") {
    val ev = Tables.events(spark, SF)
      .select(col("event_id"), col("value").cast("double").as("v"))
    val iv = Tables.events(spark, SF).groupBy(col("event_type").as("bt"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    val df = graft.core.JoinOps.rangeJoin(ev, "v", iv, "lo", "hi", 50.0)
    val plan = withAqeOff(df.queryExecution.executedPlan)
    val nested = plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(nested.isEmpty, s"range join must not plan a nested loop:\n$plan")
  }

  test("rollingOriginCv: K fold fits are agg columns — data never multiplies by K, one series key") {
    val df = graft.scale.PerSeriesForecast.rollingOriginCv(
      Tables.events(spark, SF), "value", "ts", Seq("user_id"), 3, 3,
      tieBreak = Seq("event_id"))
    // window + fit agg + holdout join + error agg, all on user_id — the
    // explode-by-fold alternative would shuffle K x data on a wider key
    assert(shuffles(df) <= 4, s"rollingOriginCv plan grew: ${shuffles(df)} shuffles")
  }

  test("cleanSelectForecast: every stage keys on the series — bounded exchanges, horizons broadcast") {
    val df = graft.scale.PerSeriesForecast.cleanSelectForecast(
      Tables.events(spark, SF), "value", "ts", Seq("user_id"), 3,
      tieBreak = Seq("event_id"))
    // Hampel window + backtest branch + refit branch: all on user_id.
    // The identical exchange under both branches dedupes via
    // ReusedExchange; budget pins that no stage introduced a second
    // data-sized key.
    assert(shuffles(df) <= 5, s"pipe3 plan grew: ${shuffles(df)} shuffles")
  }

  test("scaledBacktest: window/lag/aggs/join all reuse the series key") {
    val df = graft.stats.Metrics.scaledBacktest(
      Tables.events(spark, SF), "value", "ts", Seq("user_id"), 3,
      tieBreak = Seq("event_id"))
    assert(shuffles(df) <= 4, s"scaledBacktest plan grew: ${shuffles(df)}")
  }
}
