package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream product analytics: ordered funnels and cohort
  * retention — the two queries every events warehouse runs daily.
  * Both are expressed as per-entity aggregates on the SAME key
  * (user), so however many billions of events arrive, the plan is a
  * handful of user-keyed aggregates whose exchanges Spark reuses —
  * never a per-event self-join. */
object EventAnalytics {

  /** Ordered funnel: for steps (s₁, …, s_k), a user is "at depth i"
    * when there exist events of type s₁ < s₂ < … < s_i in STRICT
    * timestamp order (the classic earliest-completion greedy: t₁ =
    * min ts of s₁, t₂ = min ts of s₂ AFTER t₁, …; greedy-earliest is
    * optimal here — choosing any later t_i only shrinks what can
    * follow). Returns one row per step: (step, step_type, users,
    * conversion from step 1).
    *
    * Shape: one filtered user-keyed aggregate per step, each joined on
    * the user key (depth tables are |users| rows, exchanges on the
    * same key reuse); the events table is scanned once per step with
    * the step filter pushed to the scan. */
  def funnel(events: DataFrame, typeCol: String, tsCol: String,
             userCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val spark = events.sparkSession
    // depth(i): per-user earliest completion time of the length-i prefix
    val depths = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val stepEvents = events.filter(col(typeCol) === step)
        val d = prev match {
          case None =>
            stepEvents.groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
          case Some(p) =>
            stepEvents.join(p.withColumnRenamed("t", "t_prev"), userCol)
              .filter(col(tsCol) > col("t_prev"))
              .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
        }
        Some(d)
    }.flatten
    val counts = depths.zip(steps).zipWithIndex.map { case ((d, st), i) =>
      d.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step"), lit(st).as("step_type"), col("users"))
    }
    val all = counts.reduce(_ unionByName _)
    val base = all.filter(col("step") === 1).select(col("users").as("u0"))
    all.crossJoin(broadcast(base))
      .withColumn("conversion", col("users").cast("double") / col("u0"))
      .drop("u0")
  }

  /** Cohort retention: users are cohorted by the period of their FIRST
    * event (floor(epoch/periodSeconds)); retention(c, k) = distinct
    * users of cohort c active in period c+k, k = 0..maxPeriods.
    * Returns (cohort, k, active, cohort_size, retention).
    *
    * Shape: first-seen is one user-keyed aggregate; activity reduces
    * to DISTINCT (user, period) before joining the |users|-row cohort
    * table back on the user key — the billion-event table collapses
    * BEFORE any join, and the output is |cohorts|·maxPeriods rows. */
  def retention(events: DataFrame, tsCol: String, userCol: String,
                periodSeconds: Long, maxPeriods: Int): DataFrame = {
    val period = floor(col(tsCol).cast("double") / lit(periodSeconds.toDouble))
      .cast("long")
    val firstSeen = events
      .groupBy(col(userCol)).agg(min(period).as("cohort"))
    val active = events
      .select(col(userCol), period.as("p")).distinct()
    val sizes = firstSeen.groupBy(col("cohort"))
      .agg(count(lit(1)).as("cohort_size"))
    active.join(firstSeen, userCol)
      .withColumn("k", (col("p") - col("cohort")).cast("int"))
      .filter(col("k") >= 0 && col("k") <= maxPeriods)
      .groupBy(col("cohort"), col("k"))
      .agg(count(lit(1)).as("active"))
      .join(broadcast(sizes), "cohort")
      .withColumn("retention", col("active").cast("double") / col("cohort_size"))
  }

  /** First-order Markov transition matrix over each entity's event
    * sequence: P(next = b | current = a), from consecutive
    * (event, next-event) pairs within a user ordered by time. The
    * "what do users do after X" staple, and the empirical transition
    * model sequence simulators start from.
    *
    * Shape: one user-keyed window (lead), one (a, b) count, row
    * totals from the O(|types|²) count table itself — the event table
    * shuffles once. */
  def transitionMatrix(events: DataFrame, typeCol: String, tsCol: String,
                       userCol: String,
                       tieBreak: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val pairs = events
      .withColumn("next_type", lead(col(typeCol), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val rowTot = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
      .toDF("from_type2", "n_from")
    pairs.join(broadcast(rowTot), col("from_type") === col("from_type2"))
      .withColumn("p", col("n").cast("double") / col("n_from"))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"), col("p"))
  }

  /** Inter-event gap profile per event type: mean / median / p90 of the
    * seconds between an entity's consecutive events of that type — the
    * cadence audit behind session-gap and watermark choices. Exact
    * percentiles (oracle path); swap `percentile` for
    * `approx_percentile` at 100 TB (q2's contract). One (user, type)
    * window + one agg. */
  def gapProfile(events: DataFrame, typeCol: String, tsCol: String,
                 userCol: String,
                 tieBreak: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol), col(typeCol))
      .orderBy((tsCol +: tieBreak).map(col): _*)
    events
      .withColumn("gap",
        col(tsCol).cast("double") - lag(col(tsCol), 1).over(w).cast("double"))
      .filter(col("gap").isNotNull)
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_gaps"),
           avg(col("gap")).as("mean_gap"),
           expr("percentile(gap, array(0.5D, 0.9D))").as("qs"))
      .select(col(typeCol), col("n_gaps"), col("mean_gap"),
        element_at(col("qs"), 1).as("p50_gap"),
        element_at(col("qs"), 2).as("p90_gap"))
  }

  /** RFM segmentation — recency / frequency / monetary per entity plus
    * deterministic quintile scores (the classic behavioral-cohort
    * operator; Hughes 1994). Recency is seconds from the entity's last
    * event to the corpus frontier (max ts — no wall clock, so the
    * result is a pure function of the data); monetary sums on the
    * 1e-6 BIGINT grid.
    *
    * Scoring discipline: quintiles are NOT `ntile` (tie order is
    * engine-dependent) — each metric ranks by (value, entity-id) [value
    * DESC for recency, so fresher = higher score] and the score is
    * ⌈5·rank/n⌉, a pure integer function of the deterministic rank.
    * Ranks come from [[Ranks.globalRank]] (bucket-offset decomposition),
    * NOT a global row_number window: the per-entity table is itself
    * data-sized at fleet scale (billions of entities), so no stage here
    * funnels it through one task — every window is either partitioned
    * or over a ≤4097-row bucket grid.
    * Output: (entity, recency_s, frequency, monetary, r_score, f_score,
    * m_score). */
  def rfm(events: DataFrame, userCol: String, tsCol: String,
          valueCol: String,
          checkpointDir: Option[String] = None): DataFrame = {
    val perUser0 = events
      .select(col(userCol), col(tsCol).cast("long").as("sec"),
        floor(col(valueCol).cast("double") * 1e6 + 0.5).cast("long").as("v6"))
      .groupBy(col(userCol))
      .agg(max(col("sec")).as("last_sec"), count(lit(1)).as("frequency"),
           sum(col("v6")).as("m6"))
      .crossJoin(broadcast(events.agg(
        max(col(tsCol).cast("long")).as("frontier_sec"))))
      .select(col(userCol), (col("frontier_sec") - col("last_sec")).as("recency_s"),
        col("frequency"), (col("m6") / 1e6).as("monetary"), col("m6"))
      // five consumers read this per-entity table (the output row, the
      // count, and the three rank maps) — materialize the one corpus
      // aggregate instead of re-running it per consumer (localCheckpoint
      // by default; `checkpointDir` = the executor-loss-safe reliable
      // checkpoint, see [[Lineage.truncate]])
    val perUser = Lineage.truncate(perUser0, checkpointDir)
    // Each metric's rank map is built INDEPENDENTLY from the same narrow
    // (entity, value) projection and joined back on the entity key — the
    // identical perUser subtrees share one exchange, and chaining the
    // rank constructions (each rescanning the previous output) would
    // multiply plan recomputation instead.
    def rankMap(vName: String, desc: Boolean, out: String): DataFrame =
      Ranks.globalRank(perUser.select(col(userCol), col(vName)),
          col(vName), col(userCol), descending = desc, out = out,
          checkpointDir = checkpointDir)
        .select(col(userCol), col(out))
    def score(r: String) =
      ceil(lit(5) * col(r).cast("double") / col("__n")).cast("int")
    perUser
      .crossJoin(broadcast(perUser.agg(count(lit(1)).as("__n"))))
      .join(rankMap("recency_s", desc = true, "__rr"), Seq(userCol))
      .join(rankMap("frequency", desc = false, "__rf"), Seq(userCol))
      .join(rankMap("m6", desc = false, "__rm"), Seq(userCol))
      .withColumn("r_score", score("__rr"))
      .withColumn("f_score", score("__rf"))
      .withColumn("m_score", score("__rm"))
      .drop("m6", "__n", "__rr", "__rf", "__rm")
  }

  /** Conversation/session assembly — event logs rendered into ordered
    * training documents: gap-sessionize per user, then concatenate each
    * session's event types in (ts, event_id) order into one text — the
    * "assemble dialogue/behavioral sequences from an event stream" step
    * of a chat-style or recsys pretraining pipeline.
    *
    * Time-ordering inside an aggregate is done the deterministic Spark
    * way: sort_array over collect_list of (ts, id, type) structs — the
    * sort happens per group AFTER the partial-agg shuffle of already
    * grouped rows, not as a corpus-wide orderBy. One shuffle on
    * (user, session); gap detection shares the user-keyed window with
    * the session assignment. Returns (user_id, session_id, n_turns,
    * convo). */
  def conversations(events: DataFrame, typeCol: String, tsCol: String,
                    idCol: String, userCol: String,
                    gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("gap_s",
        col(tsCol).cast("double") - lag(col(tsCol).cast("double"), 1).over(w))
      .withColumn("new_session",
        when(col("gap_s").isNull || col("gap_s") > gapMinutes * 60, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(wCum))
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_turns"),
           array_join(
             transform(
               sort_array(collect_list(struct(col(tsCol).as("t"),
                 col(idCol).as("i"), col(typeCol).as("e")))),
               x => x.getField("e")), " ").as("convo"))
  }

  /** SFT loss-mask construction — the step AFTER [[conversations]] in an
    * instruction-tuning data pipeline: render each session as a
    * role-templated training document (`<role>turn` segments joined by
    * newline) and emit the character spans the loss should actually
    * train on (assistant-turn CONTENT only — the user turns and the
    * template markers are context, not targets; the standard
    * completion-only masking rule).
    *
    * Emits per session: the rendered doc, `train_spans` as
    * `start:end;start:end` (end-exclusive character offsets into the
    * doc), and the train/total char accounting. Everything is exact
    * integer length arithmetic over the same sessionize window
    * [[conversations]] uses, then per-turn EXCLUSIVE prefix offsets from
    * one more window on the same partitioning — a single exchange, all
    * map-side after it; at 100 TB this is sessionize plus free
    * arithmetic. Span construction is replayable in SQL (window prefix
    * sums + ordered string_agg), so the whole mask geometry
    * hash-checks. */
  def sftLossMask(events: DataFrame, typeCol: String, tsCol: String,
                  idCol: String, userCol: String,
                  assistantTypes: Seq[String],
                  gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSess = Window.partitionBy(col(userCol), col("session_id"))
      .orderBy(col(tsCol), col(idCol))
    events
      .withColumn("gap_s",
        col(tsCol).cast("double") - lag(col(tsCol).cast("double"), 1).over(w))
      .withColumn("new_session",
        when(col("gap_s").isNull || col("gap_s") > gapMinutes * 60, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(wCum))
      .withColumn("role",
        when(col(typeCol).isin(assistantTypes: _*), lit("assistant"))
          .otherwise(lit("user")))
      .withColumn("seg", concat(lit("<"), col("role"), lit(">"), col(typeCol)))
      .withColumn("seg_len", length(col("seg")).cast("long"))
      // exclusive prefix offset of this segment in the rendered doc
      // (+1 per preceding segment for the newline joiner)
      .withColumn("start", coalesce(
        sum(col("seg_len") + 1L).over(
          wSess.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("c_start",
        col("start") + length(col("role")).cast("long") + 2L)
      .withColumn("c_end", col("start") + col("seg_len"))
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_turns"),
           array_join(
             transform(
               sort_array(collect_list(struct(col(tsCol).as("t"),
                 col(idCol).as("i"), col("seg").as("s")))),
               x => x.getField("s")), "\n").as("doc"),
           // collect_list drops the nulls the user turns produce
           array_join(
             transform(
               sort_array(collect_list(
                 when(col("role") === "assistant",
                   struct(col(tsCol).as("t"), col(idCol).as("i"),
                     concat(col("c_start").cast("string"), lit(":"),
                            col("c_end").cast("string")).as("sp"))))),
               x => x.getField("sp")), ";").as("train_spans"),
           sum(when(col("role") === "assistant",
             length(col(typeCol)).cast("long")).otherwise(0L))
             .as("n_train_chars"),
           (sum(col("seg_len")) + count(lit(1)) - 1L).as("n_total_chars"))
  }
}
