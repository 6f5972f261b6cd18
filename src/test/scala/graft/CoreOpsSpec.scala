package graft

import org.apache.spark.sql.functions._
import graft.core.{TimeSeriesOps => TS, CleanOps}
import graft.cv.ExpandingWindowSplit
import graft.infer.{FreqInfer, ColumnClassifier, DatetimeFormatInfer}

class CoreOpsSpec extends SparkTestBase {
  import spark.implicits._

  lazy val series = Seq(
    ("2024-01-01", 1.0), ("2024-01-02", 2.0), ("2024-01-03", 3.0),
    ("2024-01-04", 4.0), ("2024-01-05", 5.0), ("2024-01-06", 6.0),
    ("2024-01-07", 7.0), ("2024-01-08", 8.0), ("2024-01-09", 9.0),
    ("2024-01-10", 10.0)
  ).toDF("d", "v").withColumn("ts", to_timestamp($"d"))

  test("lag then lead is identity away from boundaries") {
    val df = TS.addLags(series, Seq("v"), 1, "ts")
    val back = TS.addLeads(df, Seq("v_lag1"), 1, "ts")
    val bad = back.filter($"v_lag1_lead1".isNotNull && $"v_lag1_lead1" =!= $"v").count()
    assert(bad == 0)
  }

  test("diff then cumsum restores the series") {
    val d = TS.diff(series, "v", 1, "ts")
    val anchor = 1.0 // first value
    val restored = TS.cumsumRestore(d, "v_diff", anchor, "ts")
    val bad = restored.filter(abs($"restored" - $"v") > 1e-9).count()
    assert(bad == 0)
  }

  test("events loader normalizes ts to TimestampType regardless of parquet physical type") {
    // The generator has stored ts as TIMESTAMP(NANOS), as µs TIMESTAMP_NTZ,
    // and as a UTC timestamp across rounds; every downstream cast("double")
    // (sessionize, interval joins, StatTests) requires TimestampType.
    import org.apache.spark.sql.types.TimestampType
    assert(Tables.events(spark, SF).schema("ts").dataType == TimestampType)
  }

  test("calendar features are in range") {
    val f = TS.calendarFeatures(Tables.events(spark, SF), "ts")
    val viol = f.filter(
      $"dayofweek" < 0 || $"dayofweek" > 6 ||
      !$"weekend".isin(0, 1) ||
      $"month" < 1 || $"month" > 12 ||
      $"quarter" < 1 || $"quarter" > 4 ||
      $"hour" < 0 || $"hour" > 23).count()
    assert(viol == 0)
  }

  test("expanding CV folds are expanding and test windows disjoint") {
    val folds = ExpandingWindowSplit.folds(100, 4, 10)
    assert(folds.map(_.trainEnd) == Seq(60L, 70L, 80L, 90L))
    assert(folds.map(_.testEnd) == Seq(70L, 80L, 90L, 100L))
    val pairs = folds.sliding(2).forall { case Seq(a, b) => a.testEnd == b.trainEnd }
    assert(pairs)
  }

  test("assignFolds matches folds() boundaries") {
    val df = ExpandingWindowSplit.assignFolds(series, "ts", Nil, 2, 3)
    val byFold = df.groupBy("fold").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byFold(1) == 3 && byFold(2) == 3 && byFold(0) == 4)
  }

  test("freq bucket boundaries mirror the reference") {
    assert(FreqInfer.bucket(60) == FreqInfer.Minutely)
    assert(FreqInfer.bucket(3600) == FreqInfer.Hourly)
    assert(FreqInfer.bucket(86400) == FreqInfer.Daily)
    assert(FreqInfer.bucket(7 * 86400) == FreqInfer.Weekly)
    assert(FreqInfer.bucket(30 * 86400) == FreqInfer.Monthly)
    assert(FreqInfer.bucket(91 * 86400) == FreqInfer.Quarterly)
    assert(FreqInfer.bucket(182 * 86400) == FreqInfer.SemiAnnual)
    assert(FreqInfer.bucket(365 * 86400) == FreqInfer.Annual)
    assert(FreqInfer.Monthly.seasonalPeriod == 12)
    assert(FreqInfer.inferFromFirstTwo(series, "ts") == FreqInfer.Daily)
  }

  test("dedupeColumns keeps first occurrence") {
    val df = series.select($"v", $"v".as("v"), $"ts")
    assert(CleanOps.dedupeColumns(df).columns.toSeq == Seq("v", "ts"))
  }

  test("downcast decision picks narrowest type") {
    import org.apache.spark.sql.types._
    val df = Seq((1L, 300L, 1e10, 0.5)).toDF("a", "b", "c", "d")
    val dec = CleanOps.downcastDecision(df)
    assert(dec("a") == ByteType && dec("b") == ShortType)
    assert(dec("c") == FloatType && dec("d") == FloatType)
  }

  test("column classifier on customer") {
    val classes = ColumnClassifier.classifyTable(Tables.customer(spark, SF))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(classes("c_custkey") == "id")
    assert(classes("c_mktsegment") == "categorical")
    assert(classes("c_acctbal") == "continuous")
  }

  test("datetime format inference") {
    val df = Seq("2024-01-15", "2024-02-01").toDF("s")
    assert(DatetimeFormatInfer.infer(df, "s").contains("yyyy-MM-dd"))
    val df2 = Seq("01/15/2024 10:30", "02/01/2024 11:00").toDF("s")
    assert(DatetimeFormatInfer.infer(df2, "s").contains("MM/dd/yyyy HH:mm"))
    // widened vocabulary (reference etl.py:336-391 families)
    assert(DatetimeFormatInfer.infer(Seq("15-Jan-2024", "01-Feb-2024").toDF("s"), "s")
      .contains("dd-MMM-yyyy"))
    assert(DatetimeFormatInfer.infer(Seq("01/15/2024 10:30:00 PM").toDF("s"), "s")
      .contains("MM/dd/yyyy hh:mm:ss a"))
    assert(DatetimeFormatInfer.infer(Seq("2024-01-15T10:30:00Z").toDF("s"), "s")
      .contains("yyyy-MM-dd'T'HH:mm:ss'Z'"))
    // round-7 widening: compact month-name dates ('%d%b%Y'/'%b%d%Y'/'%B%Y'),
    // two-digit-year datetimes, double-space variants
    assert(DatetimeFormatInfer.infer(Seq("19Jan1990", "03Feb1991").toDF("s"), "s")
      .contains("ddMMMyyyy"))
    assert(DatetimeFormatInfer.infer(Seq("Jan191990").toDF("s"), "s")
      .contains("MMMddyyyy"))
    assert(DatetimeFormatInfer.infer(Seq("January1990").toDF("s"), "s")
      .contains("MMMMyyyy"))
    assert(DatetimeFormatInfer.infer(Seq("03/15/24 10:30:00").toDF("s"), "s")
      .contains("MM/dd/yy HH:mm:ss"))
    assert(DatetimeFormatInfer.infer(Seq("03-15-24 10:30 PM").toDF("s"), "s")
      .contains("MM-dd-yy hh:mm a"))
    assert(DatetimeFormatInfer.infer(Seq("15/03/2024  10:30:00 PM").toDF("s"), "s")
      .contains("dd/MM/yyyy  hh:mm:ss a"))
    // round-8 widening: the is_time time-only family (etl.py:359-362) —
    // pure times infer, parse onto the epoch date, and 24h samples never
    // match the 12-hour pattern (13:45 has no hh interpretation)
    assert(DatetimeFormatInfer.infer(Seq("13:45:10", "09:30:00").toDF("s"), "s")
      .contains("HH:mm:ss"))
    assert(DatetimeFormatInfer.infer(Seq("09:30 PM", "01:05 AM").toDF("s"), "s")
      .contains("hh:mm a"))
    assert(DatetimeFormatInfer.infer(Seq("13:45", "23:59").toDF("s"), "s")
      .contains("HH:mm"))
    val t = DatetimeFormatInfer.parseTimestamp(Seq("13:45:10").toDF("s"), "s", "ts")
      .select($"ts".cast("string")).head().getString(0)
    assert(t == "1970-01-01 13:45:10", s"epoch-anchored time parse, got $t")
    // the r9 numeric-offset family (`%d %b %Y %T %z`): the offset must be
    // HONORED, not stripped — +0200 lands 2 hours earlier in UTC
    val off = DatetimeFormatInfer.parseTimestamp(
        Seq("05 Mar 2024 07:00:00 +0200").toDF("s"), "s", "ts")
      .select($"ts".cast("string")).head().getString(0)
    assert(off == "2024-03-05 05:00:00", s"offset not honored: $off")
    // the r10 weekday-prefixed family ('%a, %d %b %Y' etc.): inferred,
    // and parsed by stripping the validated prefix (strptime never
    // cross-validates %a against the date, so stripping is faithful)
    assert(DatetimeFormatInfer.infer(
        Seq("Tue, 05 Mar 2024", "Wed, 06 Mar 2024").toDF("s"), "s")
      .contains("EEE, dd MMM yyyy"))
    assert(DatetimeFormatInfer.infer(Seq("Fri, 05/Jan/24").toDF("s"), "s")
      .contains("EEE, dd/MMM/yy"))
    // a NON-weekday prefix must not match the family
    assert(!DatetimeFormatInfer.infer(Seq("Xyz, 05 Mar 2024").toDF("s"), "s")
      .exists(_.startsWith("EEE")))
    // the r11 zone-NAME family ('%Y-%m-%d %H:%M:%S %Z%z' etc,
    // etl.py:382-385): the name is validated+stripped; with a %z offset
    // the INSTANT comes from the offset (strptime semantics), name-only
    // parses naive. An unknown name must not match.
    assert(DatetimeFormatInfer.infer(
        Seq("2024-03-05 07:00:00 CET+0100", "2024-03-06 08:00:00 UTC+0000")
          .toDF("s"), "s")
      .contains("yyyy-MM-dd HH:mm:ss @ZZ"))
    assert(DatetimeFormatInfer.infer(Seq("2024-03-05 07:00:00 UTC").toDF("s"), "s")
      .contains("yyyy-MM-dd HH:mm:ss @Z"))
    assert(!DatetimeFormatInfer.infer(Seq("2024-03-05 07:00:00 XQZ+0100").toDF("s"), "s")
      .exists(_.contains("@Z")))
    val zn = DatetimeFormatInfer.parseTimestamp(
        Seq("2024-03-05 07:00:00 CET+0100").toDF("s"), "s", "ts")
      .select($"ts".cast("string")).head().getString(0)
    assert(zn == "2024-03-05 06:00:00", s"zone-name offset not honored: $zn")
    val zo = DatetimeFormatInfer.parseTimestamp(
        Seq("2024-03-05 07:00:00 UTC").toDF("s"), "s", "ts")
      .select($"ts".cast("string")).head().getString(0)
    assert(zo == "2024-03-05 07:00:00", s"name-only parse: $zo")
    val wd = DatetimeFormatInfer.parseTimestamp(
        Seq("Tue, 05 Mar 2024").toDF("s"), "s", "ts")
      .select($"ts".cast("string")).head().getString(0)
    assert(wd == "2024-03-05 00:00:00", s"weekday-prefix parse: $wd")
    // every candidate must round-trip through the REAL parse path
    // (parseTimestamp — to_timestamp for plain patterns, prefix-strip
    // for the EEE family; Spark 4 forbids E/F/q/Q in parse patterns) —
    // probe each against a literal (formatted from a ZONED datetime so
    // offset patterns can render; java.time CAN format E)
    DatetimeFormatInfer.candidates.foreach { fmt =>
      val now = java.time.ZonedDateTime.of(2024, 3, 5, 7, 9, 11, 0,
        java.time.ZoneOffset.UTC)
      // the @Z/@ZZ markers aren't java.time letters — render the base
      // and append a representative zone-name (+offset) token
      val sample =
        if (fmt.endsWith(" @ZZ"))
          now.format(java.time.format.DateTimeFormatter.ofPattern(
            fmt.stripSuffix(" @ZZ"))) + " UTC+0000"
        else if (fmt.endsWith(" @Z"))
          now.format(java.time.format.DateTimeFormatter.ofPattern(
            fmt.stripSuffix(" @Z"))) + " UTC"
        else now.format(java.time.format.DateTimeFormatter.ofPattern(fmt))
      val parsed = DatetimeFormatInfer.parseTimestamp(
        Seq(sample).toDF("s"), "s", "t", Some(fmt)).select($"t").head()
      assert(!parsed.isNullAt(0), s"Spark cannot parse its own format $fmt on '$sample'")
    }
  }

  test("every table loads to its canonical logical schema (drift guard)") {
    // r9 lost 10 queries to the driver regenerating testdata with a
    // different timestamp physical type; this pins the LOGICAL schema of
    // every table so a future regeneration fails the suite loudly here,
    // not obscurely in the correctness run.
    Tables.canonicalSchemas.foreach { case (name, want) =>
      val got = Tables.t(spark, SF, name).schema.fields
        .map(f => f.name -> f.dataType.simpleString).toMap
      assert(got == want, s"table $name drifted: $got vs canonical $want")
    }
  }

  test("all registered queries return rows at sf0.001 and have matching oracle keys") {
    val qs = SparkEntry.queries
    qs.foreach { case (name, fn) =>
      val n = fn(spark, SF).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
    val orphanOracles = SparkEntry.oracleSql.keySet -- qs.keySet
    assert(orphanOracles.isEmpty, s"oracles without queries: $orphanOracles")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("minMaxWithKeys works with non-numeric keys and ties break to min key") {
    val df = Seq(("b", 5.0), ("a", 5.0), ("c", 1.0), ("d", 1.0))
      .toDF("k", "v")
    val r = CleanOps.minMaxWithKeys(df, "v", "k").head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 5.0)
    assert(r.getString(2) == "c" && r.getString(3) == "a")
    // numeric-key fast path, same tie-break semantics
    val dfn = Seq((2L, 5.0), (1L, 5.0), (3L, 1.0), (4L, 1.0)).toDF("k", "v")
    val rn = CleanOps.minMaxWithKeys(dfn, "v", "k").head()
    assert(rn.getLong(2) == 3L && rn.getLong(3) == 1L)
  }

  test("orderColumns puts target first; leftSubtract anti-projects") {
    val df = Seq((1, 2.0, "x")).toDF("a", "y", "s")
    assert(CleanOps.orderColumns(df, "y", Seq("s", "a")).columns.toSeq == Seq("y", "s", "a"))
    assert(CleanOps.leftSubtract(Seq("a", "y", "s"), Seq("y")) == Seq("a", "s"))
  }

  test("asofJoin attaches the latest right row at or before each left ts") {
    import graft.core.JoinOps
    val left = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 15L)).toDF("k", "t")
      .withColumn("ts", timestamp_seconds($"t"))
    val right = Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 99L, "z")).toDF("k", "t2", "v")
      .withColumn("rts", timestamp_seconds($"t2")).drop("t2")
    val out = JoinOps.asofJoin(left, right, "ts", "rts", Seq("k"), Seq("v"))
      .select($"k", $"t", $"asof_v").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)).orNull)).toSet
    // t=10 matches the equal-ts right row (non-strict); t=20 keeps it;
    // t=30 advances to "b"; user 2 has no right row at or before t=15
    assert(out == Set((1L, 10L, "a"), (1L, 20L, "a"), (1L, 30L, "b"), (2L, 15L, null)))
  }

  test("saltedJoin matches plain join on skewed keys and spreads the hot key") {
    import graft.core.JoinOps
    // 90% of left rows share one key — the classic straggler shape
    val left = ((1 to 900).map(i => (1L, i.toLong)) ++ (1 to 100).map(i => (i.toLong % 7 + 2, i.toLong)))
      .toDF("k", "rid")
    val right = (1L to 9L).map(k => (k, s"v$k")).toDF("k", "v")
    val plain = left.join(right, Seq("k")).select($"k", $"rid", $"v")
      .collect().map(_.toSeq).toSet
    val salted = JoinOps.saltedJoin(left, right, Seq("k"), 8, Seq("rid"))
      .select($"k", $"rid", $"v").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("label dictionary is dense, sorted, and encode maps null to -1") {
    import graft.core.Encoders
    val df = Seq(Some("b"), Some("a"), Some("c"), Some("a"), None).map(Tuple1(_)).toDF("v")
    val dict = Encoders.labelDictionary(df, "v")
    val codes = dict.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(codes == Map("a" -> 0, "b" -> 1, "c" -> 2))
    val enc = Encoders.labelEncode(df, "v", dict, "code")
      .select($"v", $"code").collect()
      .map(r => Option(r.getString(0)).orNull -> r.getInt(1)).toSet
    assert(enc.contains((null, -1)))
    // unseen values at transform time grow the dictionary deterministically
    val df2 = Seq("a", "z", "x", "z").toDF("v")
    val enc2 = Encoders.labelEncode(df2, "v", dict, "code")
      .select($"v", $"code").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(enc2 == Map("a" -> 0, "x" -> 3, "z" -> 4), s"got $enc2")
  }

  test("labelDecode round-trips seen codes; grown codes recover via grownDictionary") {
    import graft.core.Encoders
    val df = Seq(Some("b"), Some("a"), Some("c"), None).map(Tuple1(_)).toDF("v")
    val dict = Encoders.labelDictionary(df, "v")
    // round trip: every seen value decodes back to itself, null (-1) → null
    val rt = Encoders.labelDecode(
        Encoders.labelEncode(df, "v", dict, "code"), "code", dict, "back")
      .select($"v", $"back").collect()
      .map(r => Option(r.getString(0)) -> Option(r.getString(1)))
    rt.foreach { case (v, back) => assert(back == v, s"round trip $v -> $back") }
    // grown-on-unseen codes are absent from the ORIGINAL dict → null
    // (the reference's pandas .map missing-key rule, my_encoders.py:97-105)
    val test2 = Seq("a", "z").toDF("v")
    val grown = Encoders.labelEncode(test2, "v", dict, "code")
    val dec = Encoders.labelDecode(grown, "code", dict, "back")
      .select($"v", $"back").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(dec == Map("a" -> Some("a"), "z" -> None), s"got $dec")
    // the reference's inverse_transform sees the GROWN inverse_transformer
    // (my_encoders.py:77): decoding through grownDictionary recovers z
    val gdict = Encoders.grownDictionary(test2, "v", dict)
    val dec2 = Encoders.labelDecode(grown, "code", gdict, "back")
      .select($"v", $"back").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(dec2 == Map("a" -> Some("a"), "z" -> Some("z")), s"got $dec2")
  }

  test("dropZeroVariance drops constants, keeps varying columns") {
    val df = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("a", "b")
    val kept = CleanOps.dropZeroVariance(df, Seq("a", "b")).columns.toSet
    assert(kept == Set("a"))
  }

  test("prependBuffer tail is deterministic on duplicate timestamps via tieBreak") {
    val train = Seq((1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-02"),
                    (4L, "2024-01-02"), (5L, "2024-01-01")).toDF("id", "d")
      .withColumn("ts", to_timestamp($"d")).drop("d")
    val test_ = Seq((9L, "2024-02-01")).toDF("id", "d")
      .withColumn("ts", to_timestamp($"d")).drop("d")
    val got = (1 to 3).map { _ =>
      TS.prependBuffer(train, test_, 2, "ts", Seq("id"))
        .select("id").collect().map(_.getLong(0)).toSeq
    }
    assert(got.distinct.size == 1, "nondeterministic tail")
    // last 2 by (ts desc, id desc) = ids 4, 3
    assert(got.head.toSet == Set(3L, 4L, 9L))
  }
}
