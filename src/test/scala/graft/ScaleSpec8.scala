package graft

import org.apache.spark.sql.functions._

/** Round-15 additions: PII scan / redaction and the blocklist gate
  * ([[graft.scale.Curation]]). */
class ScaleSpec8 extends SparkTestBase {
  import spark.implicits._

  // ---- PII scan ----------------------------------------------------------

  test("piiScan: counts every category exactly, clean text counts zero") {
    val df = Seq(
      (1L, "mail a@b.io and c.d+x@e-f.org end"),          // 2 emails
      (2L, "host 10.0.0.1 and 192.168.3.44 up"),          // 2 ipv4
      (3L, "call +14155550123 or +4930123456"),           // 2 phones
      (4L, "ref 123-45-6789 ok"),                         // 1 ssn
      (5L, "no pii here at all"),
      (6L, "mixed a@b.co 10.1.2.3 +1234567 999-88-7777")  // one of each
    ).toDF("id", "t")
    val out = graft.scale.Curation.piiScan(df, "t")
      .select("id", "n_email", "n_ipv4", "n_phone", "n_ssn", "pii_total")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out(1L) == ((2L, 0L, 0L, 0L, 2L)), s"${out(1L)}")
    assert(out(2L) == ((0L, 2L, 0L, 0L, 2L)), s"${out(2L)}")
    assert(out(3L) == ((0L, 0L, 2L, 0L, 2L)), s"${out(3L)}")
    assert(out(4L) == ((0L, 0L, 0L, 1L, 1L)), s"${out(4L)}")
    assert(out(5L) == ((0L, 0L, 0L, 0L, 0L)), s"${out(5L)}")
    assert(out(6L) == ((1L, 1L, 1L, 1L, 4L)), s"${out(6L)}")
  }

  test("piiScan: category boundaries — digits glued to words don't match") {
    // no \b IP match inside user123 / mail5; 16+ digit runs are not phones
    val df = Seq(
      (1L, "user123@mail5.example.com"),
      (2L, "+1234567890123456 too long"),
      (3L, "1234-56-7890 not an ssn")).toDF("id", "t")
    val out = graft.scale.Curation.piiScan(df, "t")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("pii_total"))
      .toMap
    assert(out(1L) == 1L, s"email only: ${out(1L)}")  // the email itself
    assert(out(2L) == 0L, s"${out(2L)}")
    assert(out(3L) == 0L, s"${out(3L)}")
  }

  // ---- PII redaction ------------------------------------------------------

  test("piiRedact: sentinels replace every match, clean spans untouched") {
    val df = Seq(
      (1L, "mail a@b.io ip 10.0.0.1 call +1234567 ref 123-45-6789 done"),
      (2L, "nothing sensitive")).toDF("id", "t")
    val out = graft.scale.Curation.piiRedact(df, "t")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("redacted"))
      .toMap
    assert(out(1L) ==
      "mail <EMAIL> ip <IPV4> call <PHONE> ref <SSN> done", s"${out(1L)}")
    assert(out(2L) == "nothing sensitive")
  }

  test("piiRedact: redacted text scans clean (idempotence of the gate)") {
    val df = Seq((1L, "a@b.io 10.0.0.1 +1234567 123-45-6789")).toDF("id", "t")
    val red = graft.scale.Curation.piiRedact(df, "t")
    val rescanned = graft.scale.Curation.piiScan(red, "redacted")
      .collect().head.getAs[Long]("pii_total")
    assert(rescanned == 0L, s"rescan found $rescanned")
  }

  // ---- blocklist gate ------------------------------------------------------

  test("blocklistStats: token-exact lowercase matching and the ratio") {
    val df = Seq(
      (1L, "Slow slow SLOWER merge"),   // slower is NOT a hit (token-exact)
      (2L, "clean words only here"),
      (3L, "merge")).toDF("id", "t")
    val out = graft.scale.Curation
      .blocklistStats(df, "t", Seq("slow", "merge"))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_blocked"),
         r.getAs[Double]("blocked_ratio"))).toMap
    assert(out(1L) == ((4L, 3L, 0.75)), s"${out(1L)}")
    assert(out(2L) == ((4L, 0L, 0.0)), s"${out(2L)}")
    assert(out(3L) == ((1L, 1L, 1.0)), s"${out(3L)}")
  }

  // ---- snapshot diff -------------------------------------------------------

  test("snapshotDiff: all four statuses classified, unchanged never emitted") {
    val prev = Seq((1L, "same"), (2L, "old text"), (3L, "gone"))
      .toDF("id0", "t")
    val next = Seq((1L, "same"), (2L, "new text"), (4L, "fresh"))
      .toDF("id0", "t")
    val out = graft.scale.Curation.snapshotDiff(prev, next, "t", "id0")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("status"))
      .toMap
    assert(out == Map(2L -> "changed", 3L -> "removed", 4L -> "added"),
      s"$out")
  }

  test("snapshotDiff: identical snapshots emit zero rows") {
    val snap = Seq((1L, "a"), (2L, "b")).toDF("id0", "t")
    assert(graft.scale.Curation.snapshotDiff(snap, snap, "t", "id0")
      .count() == 0L)
  }

  // ---- key-skew audit ------------------------------------------------------

  test("keySkewProfile: hand-computed Gini on counts {1, 1, 2}") {
    // keys 10->1 row, 20->1, 30->2; sorted asc ranks 1,2,3
    // G = (2*(1+2+6) - 4*4)/(3*4) = 2/12 = 1/6
    val df = Seq(10L, 20L, 30L, 30L).toDF("k0")
    val out = graft.scale.SkewAudit.keySkewProfile(df, col("k0"), topK = 2)
      .collect().head
    assert(out.getAs[Long]("n_keys") == 3L && out.getAs[Long]("n_rows") == 4L)
    assert(out.getAs[Long]("max_count") == 2L)
    assert(math.abs(out.getAs[Double]("max_share") - 0.5) < 1e-12)
    assert(math.abs(out.getAs[Double]("topk_share") - 0.75) < 1e-12) // 2+1 of 4
    assert(math.abs(out.getAs[Double]("gini") - 1.0 / 6.0) < 1e-12, s"$out")
  }

  test("keySkewProfile: uniform keys score gini 0, one hot key scores high") {
    val uniform = (1L to 8L).flatMap(k => Seq(k, k)).toDF("k0")
    val gU = graft.scale.SkewAudit.keySkewProfile(uniform, col("k0"))
      .collect().head.getAs[Double]("gini")
    assert(math.abs(gU) < 1e-12, s"uniform gini $gU")
    // 9 singleton keys + one key with 91 rows
    val hot = ((1L to 9L) ++ Seq.fill(91)(100L)).toDF("k0")
    val r = graft.scale.SkewAudit.keySkewProfile(hot, col("k0"))
      .collect().head
    assert(r.getAs[Double]("gini") > 0.8, s"$r")
    assert(math.abs(r.getAs[Double]("max_share") - 0.91) < 1e-12)
  }

  test("keySkewProfile: matches the single-window Gini on mixed counts") {
    val df = Seq.tabulate(200)(i => (i.toLong % 37) * 7L).toDF("k0")
    val out = graft.scale.SkewAudit.keySkewProfile(df, col("k0"))
      .collect().head
    // direct reference computation
    val counts = df.groupBy("k0").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(t => (t._2, t._1))
    val n = counts.length.toLong
    val rows = counts.map(_._2).sum
    val src = counts.zipWithIndex.map { case ((_, c), i) => (i + 1) * c }.sum
    val gRef = (2.0 * src - (n + 1) * rows) / (n.toDouble * rows)
    assert(out.getAs[Long]("n_keys") == n && out.getAs[Long]("n_rows") == rows)
    assert(math.abs(out.getAs[Double]("gini") - gRef) < 1e-12,
      s"${out.getAs[Double]("gini")} vs $gRef")
  }

  test("blocklistStats: empty list rejected, case-folded list accepted") {
    intercept[IllegalArgumentException] {
      graft.scale.Curation.blocklistStats(Seq((1L, "x")).toDF("id", "t"),
        "t", Nil)
    }
    val out = graft.scale.Curation
      .blocklistStats(Seq((1L, "bad")).toDF("id", "t"), "t", Seq("BAD"))
      .collect().head
    assert(out.getAs[Long]("n_blocked") == 1L)
  }
}
