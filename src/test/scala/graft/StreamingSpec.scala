package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{EventWindows, SessionState}
import graft.streaming.SessionState.{Ev, ClosedSession}

/** Structured Streaming specs beyond the parquet-source smoke test:
  * watermarked windows and custom flatMapGroupsWithState sessionization,
  * both driven through MemoryStream micro-batches so state carry across
  * batches is actually exercised. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("stateful sessionization carries open sessions across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val sessions = SessionState.sessionize(mem.toDS(), gapMinutes = 30)
    val q = sessions.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode("append")
      .start()

    val min = 60000L
    // batch 1: user 1 starts a session (2 events), user 2 starts one
    mem.addData(Ev(1, 0 * min, 1.0), Ev(1, 10 * min, 2.0), Ev(2, 5 * min, 5.0))
    q.processAllAvailable()
    // batch 2: user 1 continues the SAME session (gap 20m < 30m), then a
    // 100m gap closes it and opens another; user 2's session also closes
    mem.addData(Ev(1, 30 * min, 3.0), Ev(1, 130 * min, 4.0), Ev(2, 200 * min, 6.0))
    q.processAllAvailable()
    // sentinel far in the future closes everything still open
    mem.addData(Ev(1, 10000 * min, 0.0), Ev(2, 10000 * min, 0.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sessions_out").as[ClosedSession].collect()
      .filter(_.n > 0).filter(s => s.startMs < 10000 * min)
      .map(s => (s.userId, s.startMs / min, s.endMs / min, s.n, s.value)).toSet
    val want = Set(
      (1L, 0L, 30L, 3L, 6.0),    // spans batches 1-2: state carried
      (1L, 130L, 130L, 1L, 4.0),
      (2L, 5L, 5L, 1L, 5.0),
      (2L, 200L, 200L, 1L, 6.0))
    assert(got == want, s"got $got")
  }

  test("streaming sessionization agrees with the batch operator on one-batch input") {
    implicit val sqlCtx = spark.sqlContext
    val evs = (0 until 200).map { i =>
      Ev(i % 7, i.toLong * 11 * 60000L % (50L * 60000L) + (i / 50) * 600L * 60000L, 1.0)
    }
    // batch reference result
    val batchDf = evs.toDF("user_id", "ts_ms", "value")
      .withColumn("ts", timestamp_millis($"ts_ms"))
      .withColumn("event_id", monotonically_increasing_id())
    val batch = EventWindows.sessionize(batchDf, 30)
      .groupBy($"user_id").agg(count(lit(1)).as("n_sessions"), sum($"n_events").as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val mem = MemoryStream[Ev]
    val q = SessionState.sessionize(mem.toDS(), 30).writeStream
      .format("memory").queryName("sessions_eq")
      .outputMode("append").start()
    mem.addData(evs: _*)
    q.processAllAvailable()
    // sentinel closes the last open session per user
    mem.addData((0 until 7).map(u => Ev(u.toLong, Long.MaxValue / 4, 0.0)): _*)
    q.processAllAvailable()
    q.stop()

    val stream = spark.table("sessions_eq").as[ClosedSession].collect()
      .filter(s => s.startMs < Long.MaxValue / 8)
      .groupBy(_.userId).map { case (u, ss) =>
        (u, ss.size.toLong, ss.map(_.n).sum)
      }.toSet
    assert(stream == batch, s"stream $stream vs batch $batch")
  }

  test("event-time timeout flushes idle sessions without sentinel traffic") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = SessionState.sessionizeWithTimeout(mem.toDS(), gapMinutes = 30,
        watermarkDelay = "0 seconds").writeStream
      .format("memory").queryName("sessions_timeout")
      .outputMode("append").start()
    val min = 60000L
    // t starts at 1min: an event at exactly t=0 would be dropped by the
    // initial watermark's late-row filter (eventTime <= watermark)
    mem.addData(Ev(1, 1 * min, 1.0), Ev(1, 10 * min, 2.0))
    q.processAllAvailable()
    // a different user's much-later event advances the watermark past
    // user 1's gap; the NEXT batch evaluates the timeout
    mem.addData(Ev(2, 500 * min, 9.0))
    q.processAllAvailable()
    mem.addData(Ev(2, 501 * min, 1.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions_timeout").as[ClosedSession].collect()
      .map(s => (s.userId, s.startMs / min, s.endMs / min, s.n)).toSet
    assert(got.contains((1L, 1L, 10L, 2L)), s"user 1's idle session not flushed: $got")
  }

  test("late event across batches merges without rewinding the session frontier") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = SessionState.sessionize(mem.toDS(), 30).writeStream
      .format("memory").queryName("sessions_late")
      .outputMode("append").start()
    val min = 60000L
    mem.addData(Ev(1, 100 * min, 1.0))
    q.processAllAvailable()
    mem.addData(Ev(1, 90 * min, 2.0)) // late, within gap of frontier
    q.processAllAvailable()
    mem.addData(Ev(1, 110 * min, 3.0), Ev(1, 500 * min, 0.0)) // continue, then close
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions_late").as[ClosedSession].collect()
      .filter(_.startMs < 400 * min)
      .map(s => (s.userId, s.startMs / min, s.endMs / min, s.n)).toSet
    // one session spanning 90..110, never endMs < startMs
    assert(got == Set((1L, 90L, 110L, 3L)), s"got $got")
  }

  test("streaming exact dedup: duplicate content dropped across micro-batches within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // the streaming twin of Dedup.exact: same content key, state bounded
    // by the watermark instead of a full-corpus shuffle
    val deduped = mem.toDS()
      .withColumn("ts", timestamp_millis($"tsMs"))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("userId", "value")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    val min = 60000L
    mem.addData(Ev(1, 0 * min, 1.0), Ev(1, 5 * min, 1.0), Ev(2, 6 * min, 1.0))
    q.processAllAvailable()
    // batch 2: another duplicate of (1, 1.0) within the watermark, plus
    // one genuinely new row — only the new row may survive
    mem.addData(Ev(1, 10 * min, 1.0), Ev(1, 11 * min, 2.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_out")
      .select($"userId", $"value").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.sorted == Seq((1L, 1.0), (1L, 2.0), (2L, 1.0)), s"got $got")
  }

  test("StreamDedup.exact keeps the first arrival per content hash across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val src = mem.toDS().toDF("doc_id", "ts_ms", "text")
      .withColumn("ts", timestamp_millis($"ts_ms"))
    val q = graft.streaming.StreamDedup.exact(src, "text", "ts", "1 hour")
      .writeStream.format("memory").queryName("sdedup_out")
      .outputMode("append").start()
    val min = 60000L
    // start at 1min: a row at exactly t=0 is dropped by the initial
    // watermark's late-row filter (eventTime <= watermark)
    mem.addData((1L, 1 * min, "aaa"), (2L, 5 * min, "bbb"))
    q.processAllAvailable()
    // second batch: duplicate content arrives again within the horizon —
    // only the genuinely new document survives
    mem.addData((3L, 10 * min, "aaa"), (4L, 11 * min, "ccc"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sdedup_out").select($"doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 4L), s"got $got")
  }

  test("StreamDedup.nearDupBlock: Hamming near-dups suppressed, streaming == batch twin") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamDedup
    val min = 60000L
    // fixture: base docs + one-token-edited variants arriving later. An
    // edit flips a few SimHash bits; variants whose flips avoid the
    // routing block MUST be suppressed, others legitimately survive
    // (single-block recall trade, see scaladoc). A chain fixture checks
    // greedy semantics: b≈a and c≈b ⇒ only a survives.
    val bases = (0 until 8).map { k =>
      (k.toLong, (1 + k) * min, (1 to 400).map(i => s"w${k}x$i").mkString(" "))
    }
    val variants = bases.map { case (id, ts, text) =>
      (id + 100L, ts + 9 * min, text.replaceFirst("\\S+", "EDITED"))
    }
    val rows = bases ++ variants
    val batch = rows.toDF("doc_id", "ts_ms", "text")
      .withColumn("ts", timestamp_millis($"ts_ms"))
    val expect = StreamDedup.nearDupBlockBatch(batch, "text", "doc_id", "ts",
        maxHamming = 12)
      .select($"id").collect().map(_.getLong(0)).toSet
    // every base survives; at least one variant must be caught (3-bit
    // flips landing entirely in one 16-bit block for all 8 fixtures is
    // astronomically unlikely — and the fixture is deterministic anyway)
    assert((0L until 8L).toSet.subsetOf(expect), s"a base doc was dropped: $expect")
    assert(expect.size < 16, "no variant was suppressed — fixture degenerate")

    val mem = MemoryStream[(Long, Long, String)]
    val src = mem.toDS().toDF("doc_id", "ts_ms", "text")
      .withColumn("ts", timestamp_millis($"ts_ms"))
    val q = StreamDedup.nearDupBlock(src, "text", "doc_id", "ts", "1 hour",
        maxHamming = 12)
      .writeStream.format("memory").queryName("sneardup_out")
      .outputMode("append").start()
    mem.addData(bases: _*)
    q.processAllAvailable()
    mem.addData(variants: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sneardup_out").select($"id").collect()
      .map(_.getLong(0)).toSet
    assert(got == expect, s"streaming $got != batch twin $expect")

    // same parity for the md5SimHash fingerprint (the DuckDB-verifiable
    // st_neardup_w path) — streaming and batch share sigDocs, but pin
    // that the pluggable sigExpr actually reaches both
    val sigE = Some(StreamDedup.md5SimHash("text"))
    val expectW = StreamDedup.nearDupBlockBatch(batch, "text", "doc_id", "ts",
        maxHamming = 12, blockIdx = 0, sigExpr = sigE)
      .select($"id").collect().map(_.getLong(0)).toSet
    val memW = MemoryStream[(Long, Long, String)]
    val srcW = memW.toDS().toDF("doc_id", "ts_ms", "text")
      .withColumn("ts", timestamp_millis($"ts_ms"))
    val qw = StreamDedup.nearDupBlock(srcW, "text", "doc_id", "ts", "1 hour",
        maxHamming = 12, blockIdx = 0, sigExpr = sigE)
      .writeStream.format("memory").queryName("sneardup_w_out")
      .outputMode("append").start()
    memW.addData(bases: _*)
    qw.processAllAvailable()
    memW.addData(variants: _*)
    qw.processAllAvailable()
    qw.stop()
    val gotW = spark.table("sneardup_w_out").select($"id").collect()
      .map(_.getLong(0)).toSet
    assert(gotW == expectW, s"md5-sig streaming $gotW != batch twin $expectW")
  }

  test("nearDupBlock parity holds under ANY micro-batch split (3 random splits)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamDedup
    val min = 60000L
    val bases = (0 until 6).map { k =>
      (k.toLong, (1 + k) * min, (1 to 400).map(i => s"s${k}y$i").mkString(" "))
    }
    val variants = bases.map { case (id, ts, text) =>
      (id + 100L, ts + 7 * min, text.replaceFirst("\\S+", "EDITED"))
    }
    val rows = (bases ++ variants).sortBy(_._2) // in event-time order
    val expect = StreamDedup.nearDupBlockBatch(
        rows.toDF("doc_id", "ts_ms", "text")
          .withColumn("ts", timestamp_millis($"ts_ms")),
        "text", "doc_id", "ts", maxHamming = 12)
      .select($"id").collect().map(_.getLong(0)).toSet
    val cut = graft.core.DetRandom.longs(99L)
    for (trial <- 1 to 3) {
      // random ordered split points -> 1..4 batches, arrivals stay in order
      val cuts = Seq.fill(3)((cut() % (rows.size + 1)).toInt).sorted.distinct
      val bounds = (0 +: cuts :+ rows.size).distinct.sorted
      val batches = bounds.zip(bounds.tail).map { case (a, b) => rows.slice(a, b) }
        .filter(_.nonEmpty)
      val mem = MemoryStream[(Long, Long, String)]
      val src = mem.toDS().toDF("doc_id", "ts_ms", "text")
        .withColumn("ts", timestamp_millis($"ts_ms"))
      val q = StreamDedup.nearDupBlock(src, "text", "doc_id", "ts", "1 hour",
          maxHamming = 12)
        .writeStream.format("memory").queryName(s"sneardup_split_$trial")
        .outputMode("append").start()
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val got = spark.table(s"sneardup_split_$trial").select($"id").collect()
        .map(_.getLong(0)).toSet
      assert(got == expect,
        s"trial $trial (splits $bounds): streaming $got != batch $expect")
    }
  }

  test("compactSurvivors: streaming + pigeonhole compaction == full 4-block batch recall") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamDedup
    val min = 60000L
    // per-k disjoint vocabularies => the only possible near-dup pair is
    // (base_k, variant_k); TWO token edits spread the flipped bits wider,
    // so some variants straddle the routing block and ESCAPE the
    // streaming pass — exactly the gap the compaction must close
    val bases = (0 until 10).map { k =>
      (k.toLong, (1 + k) * min, (1 to 400).map(i => s"c${k}z$i").mkString(" "))
    }
    val variants = bases.map { case (id, ts, text) =>
      (id + 100L, ts + 9 * min,
       text.replaceFirst(s"c${id}z7 ", "EDITA ").replaceFirst(s"c${id}z300 ", "EDITB "))
    }
    val rows = bases ++ variants
    val batch = rows.toDF("doc_id", "ts_ms", "text")
      .withColumn("ts", timestamp_millis($"ts_ms"))
    // reference: the full-recall batch pipeline on the ORIGINAL docs —
    // 4-block pigeonhole pairs -> components -> earliest rep per cluster
    val sigs = batch.select($"doc_id".as("id"), $"ts",
      graft.functions.SimHashSig($"text").as("sig"))
    val fullBatch = StreamDedup.compactSurvivors(sigs, maxHamming = 12)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert((0L until 10L).toSet.subsetOf(fullBatch), s"a base dropped: $fullBatch")

    // streaming pass (single routing block), then compaction over its output
    val mem = MemoryStream[(Long, Long, String)]
    val src = mem.toDS().toDF("doc_id", "ts_ms", "text")
      .withColumn("ts", timestamp_millis($"ts_ms"))
    val q = StreamDedup.nearDupBlock(src, "text", "doc_id", "ts", "1 hour",
        maxHamming = 12)
      .writeStream.format("memory").queryName("scompact_out")
      .outputMode("append").start()
    mem.addData(bases: _*)
    q.processAllAvailable()
    mem.addData(variants: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("scompact_out")
    val streamedIds = streamed.select($"id").collect().map(_.getLong(0)).toSet
    val compacted = StreamDedup.compactSurvivors(streamed, maxHamming = 12)
      .select($"id").collect().map(_.getLong(0)).toSet
    // recall equality: every pair the 4-block join can see is caught by
    // stream+compaction (streaming-caught is a subset of compaction-caught)
    assert(compacted == fullBatch,
      s"stream+compaction $compacted != full batch $fullBatch")
    // and the fixture did real work: the stream let escapees through
    // (block-straddling edits) that the compaction then removed
    assert(streamedIds.size > fullBatch.size,
      s"fixture degenerate - no escapees: streamed=$streamedIds full=$fullBatch")
    // idempotent: compacting the compacted set changes nothing
    val again = StreamDedup.compactSurvivors(
        StreamDedup.compactSurvivors(streamed, 12), 12)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(again == compacted)
  }

  test("nearDupBlockBatch greedy chain: one representative per near-dup chain") {
    import graft.streaming.StreamDedup
    // c differs from b by one token, b from a by one token — visiting in
    // ts order, a is kept, b suppressed vs a; c is then compared against
    // SURVIVORS only (a): if hamming(a, c) <= 3 it is suppressed too,
    // else kept. Either way b must never appear.
    val text = (1 to 1000).map(i => s"q$i").mkString(" ")
    val rows = Seq(
      (1L, 60000L, text),
      (2L, 120000L, text.replaceFirst("q50 ", "AA ")),
      (3L, 180000L, text.replaceFirst("q90 ", "BB ")))
    import spark.implicits._
    val out = StreamDedup.nearDupBlockBatch(
        rows.toDF("doc_id", "ts_ms", "text")
          .withColumn("ts", timestamp_millis($"ts_ms")),
        "text", "doc_id", "ts", maxHamming = 12)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(out.contains(1L), "first arrival must survive")
    assert(!out.contains(2L), s"direct near-dup must be suppressed: $out")
  }

  test("stream-static broadcast enrichment matches the batch twin on the events table") {
    val batch = graft.streaming.StreamEnrich
      .enrichBatch(Tables.events(spark, SF), Tables.customer(spark, SF))
      .collect().map(r => (r.getInt(0), r.getLong(1), math.round(r.getDouble(2) * 1e6)))
      .toSet
    val stream = graft.streaming.StreamEnrich.enrichStreaming(spark, SF)
      .collect().map(r => (r.getInt(0), r.getLong(1), math.round(r.getDouble(2) * 1e6)))
      .toSet
    assert(stream == batch, s"stream-static join diverged: ${stream.diff(batch)} vs ${batch.diff(stream)}")
    assert(batch.nonEmpty)
  }

  test("stream-stream interval self-join pairs events across micro-batches like the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val min = 60000L
    val evs = Seq((1L, 1L, 5 * min, "a"), (1L, 2L, 10 * min, "b"),
                  (1L, 3L, 20 * min, "c"), (2L, 4L, 25 * min, "a"),
                  (1L, 5L, 200 * min, "d")) // outside the 30-min gap of all others
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .toDF("user_id", "event_id", "ts_ms", "event_type")
      .withColumn("ts", timestamp_millis($"ts_ms")).drop("ts_ms")
    val batch = graft.streaming.IntervalJoin
      .selfJoinBatch(shape(evs.toDF()), 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val mem = MemoryStream[(Long, Long, Long, String)]
    val src = shape(mem.toDF())
    val q = graft.streaming.IntervalJoin.selfJoinStreaming(src, src, 30, "1 hour")
      .writeStream.format("memory").queryName("sjoin_out")
      .outputMode("append").start()
    // pairs must form ACROSS batches: 1-3 and 2-3 span the batch boundary
    mem.addData(evs.take(2): _*)
    q.processAllAvailable()
    mem.addData(evs.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val stream = spark.table("sjoin_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch == Set((1L, 1L, 2L), (1L, 1L, 3L), (1L, 2L, 3L)), s"batch $batch")
    assert(stream == batch, s"stream $stream vs batch $batch")
  }

  test("stream-stream LEFT OUTER interval join emits null rows once the watermark proves no match") {
    implicit val sqlCtx = spark.sqlContext
    val min = 60000L
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .toDF("user_id", "event_id", "ts_ms", "event_type")
      .withColumn("ts", timestamp_millis($"ts_ms")).drop("ts_ms")
    val mem = MemoryStream[(Long, Long, Long, String)]
    val src = shape(mem.toDF())
    val q = graft.streaming.IntervalJoin
      .selfJoinStreamingOuter(src, src, 30, "1 hour")
      .writeStream.format("memory").queryName("sjoin_outer_out")
      .outputMode("append").start()
    // user 1 has a matched pair; user 2's single event has no follow-up
    mem.addData((1L, 1L, 5 * min, "a"), (1L, 2L, 10 * min, "b"),
                (2L, 3L, 25 * min, "a"))
    q.processAllAvailable()
    // user 2's null row may only emit after the watermark passes its
    // whole match window (25min + 30 gap + 60 delay); push it far past
    mem.addData((9L, 99L, 1000 * min, "z"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sjoin_outer_out").collect()
    assert(rows.exists(r => r.getLong(0) == 1L && !r.isNullAt(2) && r.getLong(2) == 2L),
      s"matched pair missing: ${rows.mkString("; ")}")
    assert(rows.exists(r => r.getLong(0) == 2L && r.isNullAt(2)),
      s"null row for match-less trigger missing: ${rows.mkString("; ")}")
    // batch twin agrees on which triggers are match-less
    val batchNulls = graft.streaming.IntervalJoin
      .selfJoinBatchOuter(shape(Seq((1L, 1L, 5 * min, "a"), (1L, 2L, 10 * min, "b"),
                                    (2L, 3L, 25 * min, "a")).toDF()), 30)
      .filter(col("id_b").isNull).select("id_a")
      .collect().map(_.getLong(0)).toSet
    // 2 (user 1's LAST event — nothing later to pair with) and 3 are
    // both match-less; 1 pairs forward with 2
    assert(batchNulls == Set(2L, 3L), s"batch twin null set: $batchNulls")
  }

  test("watermarked sliding window aggregation over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = mem.toDS()
      .withColumn("ts", timestamp_millis($"tsMs"))
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "30 minutes", "15 minutes"))
      .agg(count(lit(1)).as("n"), sum($"value").as("total"))
    val min = 60000L
    // data must land BEFORE start(): AvailableNow drains whatever is
    // available at trigger time and then terminates — rows added after
    // an empty first drain would never be processed (observed flake)
    mem.addData(Ev(1, 0 * min, 1.0), Ev(1, 10 * min, 2.0), Ev(1, 20 * min, 4.0))
    val q = agg.writeStream.format("memory").queryName("sliding_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sliding_out")
      .select($"window.start".cast("long").as("s"), $"n", $"total").collect()
      .map(r => (r.getLong(0) / 60, r.getLong(1), r.getDouble(2))).toSet
    // event at 10min lands in windows [-15,15) [0,30); at 20min in [0,30) [15,45)
    assert(rows.contains((0L, 3L, 7.0)), s"window [0,30) wrong: $rows")
    assert(rows.contains((15L * 60 / 60, 1L, 4.0)) || rows.exists(_._1 == 15), s"missing [15,45): $rows")
  }

  test("online trend forecast: streaming == batch twin across micro-batch splits") {
    import graft.streaming.OnlineForecast
    import graft.streaming.OnlineForecast.{Pt, Forecast}
    // a deterministic slice of the events fixture: 3 users, all their events
    val evs = Tables.events(spark, SF)
      .filter(col("user_id") <= 2)
      .select(col("user_id").as("userId"),
              (col("ts").cast("double") * 1000).cast("long").as("tsMs"),
              col("event_id").as("eventId"), col("value"))
      .as[Pt].collect().sortBy(p => (p.tsMs, p.eventId))
    assert(evs.length > 20, "fixture slice too small to exercise state carry")

    val batch = OnlineForecast.expandingTrendBatch(
        Tables.events(spark, SF).filter(col("user_id") <= 2),
        "value", "ts", Seq("user_id"), Seq("event_id"))
      .select(col("event_id"), col("yhat")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap

    for ((nSplits, seed) <- Seq((1, 0), (3, 1), (7, 2))) {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Pt]
      val name = s"trend_out_$seed"
      val q = OnlineForecast.forecast(mem.toDS()).writeStream
        .format("memory").queryName(name).outputMode("update").start()
      // split the GLOBALLY time-ordered feed into contiguous chunks: each
      // series sees its events in order, state must carry across batches
      val rnd = new scala.util.Random(seed)
      val cuts = (Seq(0, evs.length) ++ Seq.fill(nSplits - 1)(rnd.nextInt(evs.length))).sorted
      for (Seq(a, b) <- cuts.sliding(2) if b > a) {
        mem.addData(evs.slice(a, b).toIndexedSeq)
        q.processAllAvailable()
      }
      q.stop()
      val got = spark.table(name).as[Forecast].collect()
        .map(f => f.eventId -> f.yhat).toMap
      assert(got.size == evs.length, s"split $nSplits: missing forecasts")
      def diverges(a: Option[Double], b: Option[Double]): Boolean = (a, b) match {
        case (Some(x), Some(y)) => math.abs(x - y) > 1e-9
        case _ => a.isDefined != b.isDefined
      }
      val diffs = got.collect { case (id, yh) if diverges(yh, batch(id)) => id }
      assert(diffs.isEmpty,
        s"split $nSplits: ${diffs.size} forecasts diverge from batch twin, e.g. ${diffs.take(3)}")
    }
  }

  test("online trend forecast drops late events instead of rewinding state") {
    import graft.streaming.OnlineForecast
    import graft.streaming.OnlineForecast.{Pt, Forecast}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Pt]
    val q = OnlineForecast.forecast(mem.toDS()).writeStream
      .format("memory").queryName("trend_late").outputMode("update").start()
    mem.addData(Pt(9L, 1000L, 1L, 1.0), Pt(9L, 2000L, 2L, 2.0), Pt(9L, 3000L, 3L, 3.0))
    q.processAllAvailable()
    // a late arrival behind the frontier and a duplicate of the frontier row
    mem.addData(Pt(9L, 1500L, 10L, 99.0), Pt(9L, 3000L, 3L, 3.0), Pt(9L, 4000L, 4L, 4.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("trend_late").as[Forecast].collect()
      .sortBy(f => (f.tsMs, f.eventId))
    assert(got.map(_.eventId).toSeq == Seq(1L, 2L, 3L, 4L), s"got ${got.toSeq}")
    // the linear series 1,2,3 predicts 4 exactly
    assert(math.abs(got.last.yhat.get - 4.0) < 1e-9, s"got ${got.last}")
  }

  test("StreamTopK: exact parity with batch counts when capacity covers the vocabulary") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[String]
    val hh = graft.streaming.StreamTopK.heavyHitters(mem.toDS(), m = 64, nShards = 4)
    val q = hh.writeStream.format("memory").queryName("topk_out")
      .outputMode("update").start()
    val b1 = Seq("a", "b", "a", "c", "a", "b")
    val b2 = Seq("a", "c", "d", "a", "b", "e", "a")
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    // Update mode: latest emission per (shard, key) is the live estimate
    val rows = spark.table("topk_out")
      .as[graft.streaming.StreamTopK.HH].collect()
    val latest = rows.groupBy(r => (r.shard, r.key))
      .map { case (_, v) => v.last }.map(r => r.key -> r.count).toMap
    val exact = (b1 ++ b2).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(latest == exact, s"sketch $latest != exact $exact")
    assert(rows.forall(_.err == 0), "no evictions can occur below capacity")
  }

  test("StreamTopK: Space-Saving bounds and count conservation under tight capacity") {
    import graft.streaming.StreamTopK
    // single-shard deterministic replay of a skewed stream, m = 3 << vocab 6
    val stream = Seq.fill(30)("hot") ++ (1 to 12).map(i => s"k${i % 6}") ++ Seq.fill(10)("hot")
    var t = Map.empty[String, (Long, Long)]
    stream.foreach(x => t = StreamTopK.offer(t, x, 3))
    val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(t.size <= 3)
    t.foreach { case (k, (c, e)) =>
      val truth = exact.getOrElse(k, 0L)
      assert(truth <= c, s"$k: estimate $c must overcount truth $truth")
      assert(c - e <= truth, s"$k: guaranteed count ${c - e} must undercount truth $truth")
    }
    assert(t.values.map(_._1).sum == stream.size,
      "each arrival adds exactly one to some counter")
    assert(t.contains("hot"), "a key with frequency > N/m is guaranteed tracked")
    assert(t("hot")._1 - t("hot")._2 <= exact("hot") && exact("hot") <= t("hot")._1)
  }

  test("expanding z-score: streaming equals the batch twin under any micro-batch split") {
    import graft.streaming.StreamAnomaly
    import graft.streaming.StreamAnomaly.{Pt, Score}
    val evs = Tables.events(spark, SF)
      .filter(col("user_id") <= 2)
      .select(col("user_id").as("userId"),
              (col("ts").cast("double") * 1000).cast("long").as("tsMs"),
              col("event_id").as("eventId"), col("value"))
      .as[Pt].collect().sortBy(p => (p.tsMs, p.eventId))
    assert(evs.length > 20)

    val batch = StreamAnomaly.flagsBatch(
        Tables.events(spark, SF).filter(col("user_id") <= 2),
        "value", "ts", Seq("user_id"), Seq("event_id"))
      .select(col("event_id"), col("z"), col("is_anomaly")).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Double]), r.getBoolean(2)))).toMap

    for ((nSplits, seed) <- Seq((1, 0), (4, 1))) {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Pt]
      val name = s"zscore_out_$seed"
      val q = StreamAnomaly.flags(mem.toDS()).writeStream
        .format("memory").queryName(name).outputMode("update").start()
      val rnd = new scala.util.Random(seed)
      val cuts = (Seq(0, evs.length) ++ Seq.fill(nSplits - 1)(rnd.nextInt(evs.length))).sorted
      for (Seq(a, b) <- cuts.sliding(2) if b > a) {
        mem.addData(evs.slice(a, b).toIndexedSeq)
        q.processAllAvailable()
      }
      q.stop()
      val got = spark.table(name).as[Score].collect()
        .map(s => s.eventId -> ((s.z, s.isAnomaly))).toMap
      assert(got.size == evs.length, s"split $nSplits: missing scores")
      val diffs = got.collect {
        case (id, (z, f)) if f != batch(id)._2 ||
          ((z, batch(id)._1) match {
            case (Some(x), Some(y)) => math.abs(x - y) > 1e-9
            case (a, b) => a.isDefined != b.isDefined
          }) => id
      }
      assert(diffs.isEmpty,
        s"split $nSplits: ${diffs.size} scores diverge, e.g. ${diffs.take(3)}")
    }
  }

  test("streaming drift monitor: closed-window counts + shared fold equal the batch twin") {
    import graft.streaming.StreamDrift
    implicit val sqlCtx = spark.sqlContext
    val day = 86400000L
    // day0: uniform over bins 0-4; day1: all mass in the top bin; day2: coarse uniform
    val data = (0 until 100).map(i => (0L * day + i * 1000L, (i % 10) * 10.0)) ++
               (0 until 100).map(i => (1L * day + i * 1000L, 80.0 + (i % 3))) ++
               (0 until 100).map(i => (2L * day + i * 1000L, (i % 5) * 20.0))
    val mem = MemoryStream[(Long, Double)]
    val stream = mem.toDS().toDF("tsMs", "value")
      .withColumn("ts", timestamp_millis($"tsMs"))
    val q = StreamDrift.dayBinCounts(stream, "value", "ts", 0.0, 100.0, 5)
      .writeStream.format("memory").queryName("drift_counts")
      .outputMode("append").start()
    mem.addData(data.take(150))
    q.processAllAvailable()
    mem.addData(data.drop(150))
    q.processAllAvailable()
    mem.addData((10L * day, 0.0)) // sentinel advances the watermark past day 2
    q.processAllAvailable()
    q.stop()

    val batchDf = data.toDF("tsMs", "value")
      .withColumn("ts", timestamp_millis($"tsMs"))
    val wantC = StreamDrift.dayBinCountsBatch(batchDf, "value", "ts", 0.0, 100.0, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val streamed = spark.table("drift_counts").filter($"day" < 10)
    val gotC = streamed
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(gotC == wantC, s"closed-window counts diverge: got $gotC want $wantC")

    // fold parity + the monitoring semantics: reference = day 0's own
    // distribution, so day 0 reads clean and day 1 (top-bin pileup) alarms
    val ref = StreamDrift.referenceShares(
      batchDf.filter($"tsMs" < day), "value", 0.0, 100.0, 5)
    val viaStream = StreamDrift.psiFold(streamed, ref, 5)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
    val viaBatch = StreamDrift.psiPerDayBatch(batchDf, "value", "ts", ref, 0.0, 100.0, 5)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(viaStream.keySet == viaBatch.keySet)
    viaStream.foreach { case (d, (psi, fl)) =>
      assert(math.abs(psi - viaBatch(d)._1) < 1e-9 && fl == viaBatch(d)._2,
        s"day $d: stream fold $psi/$fl != batch ${viaBatch(d)}")
    }
    assert(!viaStream(0L)._2, "day 0 scored against itself must not alarm")
    assert(viaStream(1L)._2, "the top-bin pileup day must cross the action line")
  }

  test("expanding z-score flags a planted spike and only the spike") {
    import graft.streaming.StreamAnomaly
    import graft.streaming.StreamAnomaly.Pt
    implicit val sqlCtx = spark.sqlContext
    // stable cyclic wiggle around 10 (max |z| ~ 2.1), one wild spike at t=15
    val pts = (1 to 30).map { i =>
      val v = if (i == 15) 500.0 else 10.0 + (i % 5) * 0.1
      Pt(1L, i * 1000L, i.toLong, v)
    }
    val mem = MemoryStream[Pt]
    val q = StreamAnomaly.flags(mem.toDS()).writeStream
      .format("memory").queryName("zscore_spike").outputMode("update").start()
    mem.addData(pts)
    q.processAllAvailable()
    q.stop()
    val flagged = spark.table("zscore_spike")
      .filter(col("isAnomaly")).select("eventId")
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(15L), s"only the spike should flag, got $flagged")
  }

  test("streaming Holt-Winters equals the shared fold across micro-batch splits; warm-up emits null") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamHoltWinters
    import graft.streaming.StreamHoltWinters.{Out, Pt}
    val ys = Seq(4.0, 9.0, 2.0, 5.0, 10.0, 3.0, 6.2, 11.1, 3.9, 7.0,
                 12.3, 4.8, 8.1, 13.0)
    val pts = ys.zipWithIndex.map { case (y, i) => Pt(1L, i.toLong * 1000, i.toLong, y) }
    val (_, want) = StreamHoltWinters.foldSeries(3, 0.5, 0.25, 0.25)(
      1L, pts.iterator, StreamHoltWinters.empty)
    val mem = MemoryStream[Pt]
    val q = StreamHoltWinters.forecast(mem.toDS(), m = 3).writeStream
      .format("memory").queryName("hw_out").outputMode("update").start()
    mem.addData(pts.take(4): _*); q.processAllAvailable()
    mem.addData(pts.slice(4, 9): _*); q.processAllAvailable()
    mem.addData(pts.drop(9): _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("hw_out").as[Out].collect().sortBy(_.eventId).toSeq
    assert(got == want, s"streaming must replay the one-shot fold:\n$got\nvs\n$want")
    assert(got.take(6).forall(_.yhat.isEmpty), "first 2m events have no defined HW state")
    assert(got.drop(6).forall(_.yhat.isDefined))
  }

  test("Holt-Winters one-step frontier forecast equals the batch estimator at h=1") {
    import graft.streaming.StreamHoltWinters
    import graft.streaming.StreamHoltWinters.Pt
    val ys = Seq(4.0, 9.0, 2.0, 5.0, 10.0, 3.0, 6.2, 11.1, 3.9, 7.0,
                 12.3, 4.8, 8.1, 13.0)
    val pts = ys.zipWithIndex.map { case (y, i) => Pt(1L, i.toLong * 1000, i.toLong, y) }
    // stream the full series: the LAST event's pre-absorption forecast
    // was made from exactly the first n-1 points
    val (_, folded) = StreamHoltWinters.foldSeries(3, 0.5, 0.25, 0.25)(
      1L, pts.iterator, StreamHoltWinters.empty)
    val streamed = folded.last.yhat.get
    val prefix = ys.dropRight(1).zipWithIndex
      .map { case (y, i) => (1L, i.toLong, i.toLong, y) }
      .toDF("sid", "ts", "eid", "y")
    val batch = graft.scale.PerSeriesForecast.holtWintersForecast(
        prefix, "y", "ts", "sid", horizon = 1, m = 3, alpha = 0.5,
        beta = 0.25, gamma = 0.25, tieBreak = Some("eid"))
      .collect().head.getDouble(2)
    // identical integer-grid init + identical recursion → EXACT equality,
    // not epsilon parity (the warm-up longs make this structural)
    assert(streamed == batch, s"stream frontier $streamed != batch h=1 $batch")
  }

  test("streaming Holt-Winters is split-invariant: 20 random micro-batch splits") {
    // the st_zscore property pattern: the emitted forecasts must be
    // IDENTICAL under any in-order micro-batch partitioning of the
    // arrivals — state handoff across batches can't change a value
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamHoltWinters
    import graft.streaming.StreamHoltWinters.{Out, Pt}
    // two interleaved series, awkward lengths (one mid-warm-up at most cuts)
    val pts = (0 until 23).map { i =>
      Pt(1L + i % 2, i.toLong * 1000, i.toLong, 4.0 + 3.1 * (i % 3) + 0.21 * i)
    }
    val want = pts.groupBy(_.userId).toSeq.flatMap { case (uid, ps) =>
      StreamHoltWinters.foldSeries(3, 0.5, 0.25, 0.25)(
        uid, ps.iterator, StreamHoltWinters.empty)._2
    }.sortBy(_.eventId)
    for (seed <- 0 until 20) {
      val rnd = new scala.util.Random(seed)
      val nCuts = 1 + rnd.nextInt(5)
      val cuts = (Seq(0, pts.length) ++ Seq.fill(nCuts)(rnd.nextInt(pts.length))).sorted
      val mem = MemoryStream[Pt]
      val name = s"hw_prop_$seed"
      val q = StreamHoltWinters.forecast(mem.toDS(), m = 3).writeStream
        .format("memory").queryName(name).outputMode("update").start()
      for (Seq(a, b) <- cuts.sliding(2) if b > a) {
        mem.addData(pts.slice(a, b): _*)
        q.processAllAvailable()
      }
      q.stop()
      val got = spark.table(name).as[Out].collect().sortBy(_.eventId).toSeq
      assert(got == want, s"seed $seed (cuts $cuts): split changed the output")
    }
  }

  test("streaming packing is split-invariant and equals batch packGreedy per sequence") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamPack
    import graft.streaming.StreamPack.{Assign, Doc}
    // two (grp, shard) keys, budget 10; sizes force mid-sequence cuts
    val docs = (0 until 17).map { i =>
      Doc(if (i % 3 == 0) "a" else "b", i.toLong % 2, i.toLong, 2L + i % 6)
    }
    val want = docs.groupBy(d => (d.grp, d.shard)).toSeq.flatMap { case (k, ds) =>
      StreamPack.foldShard(10L)(k, ds.iterator, StreamPack.empty)._2
    }.sortBy(_.id)
    for (seed <- 0 until 10) {
      val rnd = new scala.util.Random(seed)
      val nCuts = 1 + rnd.nextInt(4)
      val cuts = (Seq(0, docs.length) ++ Seq.fill(nCuts)(rnd.nextInt(docs.length))).sorted
      val mem = MemoryStream[Doc]
      val name = s"pack_prop_$seed"
      val q = StreamPack.assign(mem.toDS(), budget = 10L).writeStream
        .format("memory").queryName(name).outputMode("update").start()
      for (Seq(a, b) <- cuts.sliding(2) if b > a) {
        mem.addData(docs.slice(a, b): _*)
        q.processAllAvailable()
      }
      q.stop()
      val got = spark.table(name).as[Assign].collect().sortBy(_.id).toSeq
      assert(got == want, s"seed $seed (cuts $cuts): split changed the packing")
    }
    // the assignment stream aggregates to the batch packer, row-for-row
    val corpus = graft.Tables.documents(spark, SF)
    val viaStream = StreamPack.assignBatch(corpus, "text", "doc_id", "source",
        budget = 512L, shards = 8)
      .toDF().groupBy("grp", "shard", "seqId")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val viaBatch = graft.scale.Packing.packGreedy(corpus, "text", "doc_id",
        "source", budget = 512L, shards = 8)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(viaStream == viaBatch, "assignment aggregation != packGreedy")
  }

  test("streaming conversation assembly: closed sessions equal batch docs under any split") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamConversations
    import graft.streaming.StreamConversations.{ConvDoc, Ev}
    val min = 60000L
    // user 1: two sessions (gap 40 min between), user 2: one session;
    // a far-future sentinel per user closes the final sessions
    val evs = Seq(
      Ev(1L, 0 * min, 1L, "view"), Ev(1L, 5 * min, 2L, "click"),
      Ev(1L, 10 * min, 3L, "buy"),
      Ev(1L, 50 * min, 4L, "view"), Ev(1L, 55 * min, 5L, "click"),
      Ev(2L, 0 * min, 6L, "signup"), Ev(2L, 20 * min, 7L, "view"),
      Ev(1L, 10000 * min, 98L, "sentinel"), Ev(2L, 10000 * min, 99L, "sentinel"))
    // batch twin over the same events (sentinels form their own trailing
    // session, excluded from the comparison)
    val batchDf = evs.map(e => (e.userId, e.tsMs, e.eventId, e.eventType))
      .toDF("user_id", "ts_ms", "event_id", "event_type")
      .withColumn("ts", timestamp_millis($"ts_ms"))
    val want = graft.scale.EventAnalytics.conversations(
        batchDf, "event_type", "ts", "event_id", "user_id", gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .filter(!_._4.contains("sentinel")).toSet
    assert(want == Set(
      (1L, 1L, 3L, "view click buy"), (1L, 2L, 2L, "view click"),
      (2L, 1L, 2L, "signup view")), s"batch fixture sanity: $want")
    for (seed <- 0 until 6) {
      val rnd = new scala.util.Random(seed)
      val cuts = (Seq(0, evs.length) ++ Seq.fill(1 + rnd.nextInt(4))(
        rnd.nextInt(evs.length))).sorted
      val mem = MemoryStream[Ev]
      val name = s"conv_prop_$seed"
      val q = StreamConversations.assemble(mem.toDS(), gapMinutes = 30)
        .writeStream.format("memory").queryName(name).outputMode("update").start()
      for (Seq(a, b) <- cuts.sliding(2) if b > a) {
        mem.addData(evs.slice(a, b): _*)
        q.processAllAvailable()
      }
      q.stop()
      val got = spark.table(name).as[ConvDoc].collect()
        .map(d => (d.userId, d.sessionId, d.nTurns, d.convo)).toSet
      assert(got == want, s"seed $seed (cuts $cuts): streaming $got != batch $want")
    }
  }

  test("streaming budget gate is split-invariant; strict-stop prefix semantics hold") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamBudget
    import graft.streaming.StreamBudget.{Decision, Doc}
    // two sources; source a overflows at doc 6, a later SMALLER doc (id 8,
    // 1 token) must STAY dropped — strict stop, not greedy knapsack
    val docs = Seq(
      Doc("a", 1L, 4L), Doc("a", 2L, 4L), Doc("a", 6L, 5L), Doc("a", 8L, 1L),
      Doc("b", 3L, 9L), Doc("b", 5L, 1L), Doc("b", 7L, 1L))
    val want = docs.groupBy(_.grp).toSeq.flatMap { case (k, ds) =>
      StreamBudget.foldGrp(10L)(k, ds.iterator, StreamBudget.empty)._2
    }.sortBy(_.id)
    assert(want.filter(_.grp == "a").map(_.kept) == Seq(true, true, false, false),
      "strict-stop: the would-have-fit doc 8 stays dropped")
    assert(want.filter(_.grp == "b").map(_.kept) == Seq(true, true, false),
      "b overflows exactly at the 11th token")
    for (seed <- 0 until 10) {
      val rnd = new scala.util.Random(seed)
      val nCuts = 1 + rnd.nextInt(4)
      val cuts = (Seq(0, docs.length) ++ Seq.fill(nCuts)(rnd.nextInt(docs.length))).sorted
      val mem = MemoryStream[Doc]
      val name = s"budget_prop_$seed"
      val q = StreamBudget.assign(mem.toDS(), cap = 10L).writeStream
        .format("memory").queryName(name).outputMode("update").start()
      for (Seq(a, b) <- cuts.sliding(2) if b > a) {
        mem.addData(docs.slice(a, b): _*)
        q.processAllAvailable()
      }
      q.stop()
      val got = spark.table(name).as[Decision].collect().sortBy(_.id).toSeq
      assert(got == want, s"seed $seed (cuts $cuts): split changed the decisions")
    }
  }

  test("online TSB: streaming == batch twin across micro-batch splits") {
    import graft.streaming.StreamTsb
    import graft.streaming.StreamTsb.{Pt, Out}
    val src = Tables.events(spark, SF)
      .filter(col("user_id") <= 2)
      .withColumn("demand",
        when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0)))
    val evs = src
      .select(col("user_id").as("userId"),
              (col("ts").cast("double") * 1000).cast("long").as("tsMs"),
              col("event_id").as("eventId"), col("demand"))
      .as[Pt].collect().sortBy(p => (p.tsMs, p.eventId))
    assert(evs.length > 20, "fixture slice too small")
    val batch = StreamTsb.tsbExpandingBatch(src, "demand", "ts", "user_id", "event_id")
      .select(col("event_id"), col("yhat")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    for ((nSplits, seed) <- Seq((1, 0), (4, 1), (9, 2))) {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Pt]
      val name = s"tsb_out_$seed"
      val q = StreamTsb.forecast(mem.toDS()).writeStream
        .format("memory").queryName(name).outputMode("update").start()
      val rnd = new scala.util.Random(seed)
      val cuts = (Seq(0, evs.length) ++ Seq.fill(nSplits - 1)(rnd.nextInt(evs.length))).sorted
      for (Seq(a, b) <- cuts.sliding(2) if b > a) {
        mem.addData(evs.slice(a, b).toIndexedSeq)
        q.processAllAvailable()
      }
      q.stop()
      val got = spark.table(name).as[Out].collect()
        .map(o => o.eventId -> o.yhat).toMap
      assert(got.size == evs.length, s"split $nSplits: missing emissions")
      val diffs = got.collect { case (id, yh) if yh != batch(id) => id }
      assert(diffs.isEmpty,
        s"split $nSplits: ${diffs.size} forecasts diverge, e.g. ${diffs.take(3)}")
    }
  }

  test("online TSB: probability decays on zeros, late events dropped") {
    import graft.streaming.StreamTsb
    import graft.streaming.StreamTsb.{Pt, Out}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Pt]
    val q = StreamTsb.forecast(mem.toDS()).writeStream
      .format("memory").queryName("tsb_late").outputMode("update").start()
    // demand 8 at t1, zeros after: p halves each zero event
    mem.addData(Pt(9L, 1000L, 1L, 8.0), Pt(9L, 2000L, 2L, 0.0),
                Pt(9L, 3000L, 3L, 0.0))
    q.processAllAvailable()
    // late arrival behind the frontier must be dropped
    mem.addData(Pt(9L, 1500L, 10L, 99.0), Pt(9L, 4000L, 4L, 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("tsb_late").as[Out].collect().sortBy(_.eventId)
    assert(!got.exists(_.eventId == 10L), "late event must be dropped")
    val byId = got.map(o => o.eventId -> o.yhat).toMap
    assert(byId(1L).isEmpty, "no forecast before any state")
    assert(byId(2L) == Some(8.0), "after the demand: p=1, z=8")
    assert(byId(3L) == Some(4.0), "one zero: p=0.5")
    assert(byId(4L) == Some(2.0), "two zeros: p=0.25")
  }

  test("online Kalman == batch filter under random micro-batch splits") {
    import graft.streaming.StreamKalman
    import graft.streaming.StreamKalman.{Pt, Out}
    val src = Tables.events(spark, SF).filter(col("user_id") <= 2)
    val evs = src
      .select(col("user_id").as("userId"),
              (col("ts").cast("double") * 1000).cast("long").as("tsMs"),
              col("event_id").as("eventId"), col("value"))
      .as[Pt].collect().sortBy(p => (p.tsMs, p.eventId))
    assert(evs.length > 20, "fixture slice too small")
    val batch = graft.scale.PerSeriesForecast.kalmanLocalLevel(
        src, "value", "ts", "user_id", "event_id")
      .select(col("event_id"), col("level"), col("p_var")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for ((nSplits, seed) <- Seq((1, 0), (5, 1), (11, 2))) {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Pt]
      val name = s"kalman_out_$seed"
      val q = StreamKalman.filter(mem.toDS()).writeStream
        .format("memory").queryName(name).outputMode("update").start()
      val rnd = new scala.util.Random(seed)
      val cuts = (Seq(0, evs.length) ++
        Seq.fill(nSplits - 1)(rnd.nextInt(evs.length))).sorted
      for (Seq(a, b) <- cuts.sliding(2) if b > a) {
        mem.addData(evs.slice(a, b).toIndexedSeq)
        q.processAllAvailable()
      }
      q.stop()
      val got = spark.table(name).as[Out].collect()
        .map(o => o.eventId -> (o.level, o.pVar)).toMap
      assert(got.size == evs.length, s"split $nSplits: missing emissions")
      val diffs = got.collect { case (id, lv) if lv != batch(id) => id }
      assert(diffs.isEmpty,
        s"split $nSplits: ${diffs.size} levels diverge, e.g. ${diffs.take(3)}")
    }
  }

  test("online Kalman: prediction precedes absorption, late events dropped") {
    import graft.streaming.StreamKalman
    import graft.streaming.StreamKalman.{Pt, Out}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Pt]
    val q = StreamKalman.filter(mem.toDS()).writeStream
      .format("memory").queryName("kalman_late").outputMode("update").start()
    mem.addData(Pt(9L, 1000L, 1L, 10.0), Pt(9L, 2000L, 2L, 20.0))
    q.processAllAvailable()
    mem.addData(Pt(9L, 1500L, 10L, 99.0), Pt(9L, 3000L, 3L, 20.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("kalman_late").as[Out].collect().sortBy(_.eventId)
    assert(!got.exists(_.eventId == 10L), "late event must be dropped")
    val byId = got.map(o => o.eventId -> o).toMap
    assert(byId(1L).yhatPrior.isEmpty && byId(1L).level == 10.0)
    // k1 = 1.25/2.25; level = 10 + k*(20-10)
    val k1 = 1.25 / 2.25
    assert(byId(2L).yhatPrior == Some(10.0))
    assert(math.abs(byId(2L).level - (10.0 + k1 * 10.0)) < 1e-12)
    assert(byId(3L).yhatPrior == Some(byId(2L).level),
      "prediction must be the pre-absorption level")
  }

  test("online GARCH == batch filter under random micro-batch splits, " +
       "and batch twin == garchFilter exactly") {
    import graft.streaming.StreamGarch
    import graft.streaming.StreamGarch.{Pt, Out}
    val src = Tables.events(spark, SF).filter(col("user_id") <= 2)
    val evs = src
      .select(col("user_id").as("userId"),
              (col("ts").cast("double") * 1000).cast("long").as("tsMs"),
              col("event_id").as("eventId"), col("value"))
      .as[Pt].collect().sortBy(p => (p.tsMs, p.eventId))
    assert(evs.length > 20, "fixture slice too small")
    val batch = StreamGarch.garchExpandingBatch(src, "value", "ts", "user_id", "event_id")
      .select(col("event_id"), col("h"), col("z")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // the batch twin IS garchFilter's trajectory (same absorb fold)
    val filt = graft.scale.PerSeriesForecast.garchFilter(
        src, "value", "ts", "user_id", "event_id")
      .select(col("event_id"), col("h"), col("z")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(filt == batch, "batch twin must equal garchFilter bit-for-bit")
    for ((nSplits, seed) <- Seq((1, 0), (4, 1), (9, 2))) {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Pt]
      val name = s"garch_out_$seed"
      val q = StreamGarch.track(mem.toDS()).writeStream
        .format("memory").queryName(name).outputMode("update").start()
      val rnd = new scala.util.Random(seed)
      val cuts = (Seq(0, evs.length) ++ Seq.fill(nSplits - 1)(rnd.nextInt(evs.length))).sorted
      for (Seq(a, b) <- cuts.sliding(2) if b > a) {
        mem.addData(evs.slice(a, b).toIndexedSeq)
        q.processAllAvailable()
      }
      q.stop()
      val got = spark.table(name).as[Out].collect()
        .map(o => o.eventId -> (o.h, o.z)).toMap
      assert(got.size == batch.size, s"split $nSplits: missing emissions")
      val diffs = got.collect { case (id, hz) if hz != batch(id) => id }
      assert(diffs.isEmpty,
        s"split $nSplits: ${diffs.size} trajectories diverge, e.g. ${diffs.take(3)}")
    }
  }

  test("online GARCH: late events dropped; first return carries h0") {
    import graft.streaming.StreamGarch
    import graft.streaming.StreamGarch.{Pt, Out}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Pt]
    val q = StreamGarch.track(mem.toDS()).writeStream
      .format("memory").queryName("garch_late").outputMode("update").start()
    mem.addData(Pt(9L, 1000L, 1L, 10.0), Pt(9L, 2000L, 2L, 14.0))
    q.processAllAvailable()
    mem.addData(Pt(9L, 1500L, 10L, 99.0), Pt(9L, 3000L, 3L, 14.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("garch_late").as[Out].collect().sortBy(_.eventId)
    assert(!got.exists(_.eventId == 10L), "late event must be dropped")
    val byId = got.map(o => o.eventId -> o).toMap
    assert(!byId.contains(1L), "no return for the first observation")
    assert(byId(2L).r == 4.0 && byId(2L).h == 1.0, "first return carries h0")
    // second return: h = 0.25 + 0.25*16 + 0.5*1 = 4.75
    assert(byId(3L).r == 0.0 && byId(3L).h == 4.75)
  }

  test("online tracking signal == batch twin under micro-batch splits; " +
       "drift saturates TS live") {
    import graft.streaming.StreamTracking
    import graft.streaming.StreamTracking.{Pt, Out}
    val src = Tables.events(spark, SF).filter(col("user_id") <= 2)
    val evs = src
      .select(col("user_id").as("userId"),
              (col("ts").cast("double") * 1000).cast("long").as("tsMs"),
              col("event_id").as("eventId"), col("value"))
      .as[Pt].collect().sortBy(p => (p.tsMs, p.eventId))
    val batch = StreamTracking.trackingExpandingBatch(
        src, "value", "ts", "user_id", "event_id")
      .select(col("event_id"), col("e_smooth"), col("ts")).collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    for ((nSplits, seed) <- Seq((1, 0), (5, 1))) {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Pt]
      val name = s"track_out_$seed"
      val q = StreamTracking.track(mem.toDS()).writeStream
        .format("memory").queryName(name).outputMode("update").start()
      val rnd = new scala.util.Random(seed)
      val cuts = (Seq(0, evs.length) ++ Seq.fill(nSplits - 1)(rnd.nextInt(evs.length))).sorted
      for (Seq(a, b) <- cuts.sliding(2) if b > a) {
        mem.addData(evs.slice(a, b).toIndexedSeq)
        q.processAllAvailable()
      }
      q.stop()
      val got = spark.table(name).as[Out].collect()
        .map(o => o.eventId -> (o.eSmooth, o.ts)).toMap
      assert(got.size == batch.size, s"split $nSplits: missing emissions")
      val diffs = got.collect { case (id, v) if v != batch(id) => id }
      assert(diffs.isEmpty, s"split $nSplits: ${diffs.size} diverge")
    }
    // pure drift: every error +3 -> TS pins at exactly 1 from the first error
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Pt]
    val q = StreamTracking.track(mem.toDS()).writeStream
      .format("memory").queryName("track_drift").outputMode("update").start()
    mem.addData((0 until 10).map(t => Pt(7L, 1000L * t, t.toLong, 3.0 * t)): _*)
    q.processAllAvailable(); q.stop()
    val ds = spark.table("track_drift").as[Out].collect()
    assert(ds.forall(_.ts == Some(1.0)))
  }
}
