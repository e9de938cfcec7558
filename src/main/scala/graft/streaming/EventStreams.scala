package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Cols.moneySum

/** Streaming forms of the testdata `events` queries — the same
  * declarative plans as the batch gate queries, driven incrementally.
  * Input: any streaming DataFrame with the events schema
  * ([[EventStreams.schema]]); [[fileSource]] builds one from a
  * parquet directory (the pattern a production job uses for
  * continuously-landing files).
  */
object EventStreams {

  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-stream source over a directory of parquet drops. */
  def fileSource(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** q03 streaming: running per-type counts (update mode). */
  def runningTypeCounts(events: DataFrame): DataFrame =
    events.groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))

  /** q05/q07-style: per-day per-type exact revenue, append mode on
    * watermark close. */
  def dailyTypeRevenue(events: DataFrame): DataFrame =
    events.withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), moneySum(col("value")).as("revenue"))
      .select(col("window.start").as("day"), col("event_type"),
              col("cnt"), col("revenue"))

  /** Streaming exact dedup: keep the first occurrence per content
    * key, with state bounded by the watermark horizon — the streaming
    * face of x01 (a crawl pipeline dedups in-flight before landing).
    * Uses dropDuplicatesWithinWatermark so a duplicate arriving
    * within the horizon of its first occurrence is dropped even when
    * their event times differ. */
  def dedupStream(events: DataFrame, horizon: String, keyCols: Seq[String]): DataFrame =
    events.withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark(keyCols)

  /** q08 streaming: stream-stream interval join — every purchase
    * joined to the same user's events in [ts − 1h, ts + 30m]
    * (bounds inclusive, the reference's intervalJoin contract).
    * Watermarks on BOTH sides + the two-sided range condition let
    * Spark bound join state: each side buffers only rows inside the
    * other side's live interval horizon. */
  def purchaseContext(purchases: DataFrame, events: DataFrame): DataFrame = {
    val l = purchases.filter(col("event_type") === "purchase")
      .select(col("user_id").as("a_user"), col("ts").as("a_ts"),
              col("event_id").as("a_id"))
      .withWatermark("a_ts", "0 seconds")
    val r = events
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
              col("event_id").as("b_id"), col("event_type").as("b_type"),
              col("value").as("b_value"))
      .withWatermark("b_ts", "0 seconds")
    l.join(r, expr(
      """a_user = b_user
         AND b_ts BETWEEN a_ts - INTERVAL 1 HOUR AND a_ts + INTERVAL 30 MINUTE
         AND a_id <> b_id"""))
  }

  /** x50 streaming: the changelog-compaction view maintained
    * CONTINUOUSLY — every event upserts its user's state (latest by
    * (ts, event_id) wins), exactly the batch x50 aggregation run as
    * an unbounded streaming aggregation. State = one struct per user
    * (key-cardinality-bounded, the same state any upsert
    * materialization must keep); emit in update mode and filter
    * tombstones ('error' latest) downstream of the agg so a
    * tombstone UPDATE overwrites the user's previous emission.
    * Late/out-of-order events fold in correctly because max_by is
    * order-insensitive. */
  def latestState(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(max_by(
        struct(col("ts"), col("event_id"), col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("st"))
      .select(col("user_id"), col("st.event_type").as("last_type"),
        col("st.value").as("last_value"), col("st.ts").as("last_ts"),
        (col("st.event_type") === "error").as("tombstone"))

  /** q18 streaming: session windows work natively under watermark —
    * a session emits once the watermark passes last_ts + gap. */
  def userSessions(events: DataFrame): DataFrame =
    events.withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), moneySum(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
              col("n_events"), col("sum_value"))

  /** x57 streaming: the retention triangle maintained continuously —
    * one append row (user_id, cohort_week, week_offset) the FIRST
    * time a user is active in a given week offset from their cohort
    * (first-seen) week; a downstream
    * `groupBy(cohort_week, week_offset).count()` is the live
    * retention table, equal to batch x57's distinct-user counts
    * because rows are already unique per (user, offset).
    *
    * Disorder threatens the COHORT here: a late-arriving earlier
    * event re-bases first_seen, shifting every offset already
    * emitted — a retraction no append stream can express. So, like
    * [[funnelStream]], events buffer in per-user state until the
    * watermark passes them and fold in (event-time, event_id) order:
    * the cohort is assigned by the true earliest finalized event and
    * never moves. State per user = cohort epoch-day + emitted
    * offsets + the un-finalized buffer (lateness-horizon-bounded).
    * Weeks are date_trunc('week') Mondays in the SESSION time zone
    * (spark.sql.session.timeZone, read at plan time — exactly the
    * zone the batch x57 gate truncates in, so labels bit-match for
    * any session zone, not just the UTC one Sessions.tune sets),
    * emitted yyyy-MM-dd. */
  def retentionStream(events: DataFrame,
                      lateness: String = "0 seconds"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import java.sql.Timestamp
    import java.time.DayOfWeek
    import java.time.temporal.TemporalAdjusters
    val zone = java.time.ZoneId.of(
      spark.conf.get("spark.sql.session.timeZone",
        java.util.TimeZone.getDefault.getID))
    def weekDay(t: Timestamp): Long =
      t.toInstant.atZone(zone).toLocalDate
        .`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
        .toEpochDay
    val typed = events
      .withWatermark("ts", lateness)
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[(Long, Timestamp, Long)]
    // state = (cohort epoch-day, −1 = unassigned; emitted offsets)
    BufferedFold.run[Long, (Long, Timestamp, Long),
        (Long, List[Long]), (Long, String, Long)](
      typed, _._1, _._2, _._3, (-1L, Nil),
      step = { case ((cohort0, seen), (user, t, _)) =>
        val wd = weekDay(t)
        val cohort = if (cohort0 < 0) wd else cohort0
        val off = (wd - cohort) / 7
        if (!seen.contains(off))
          ((cohort, off :: seen), List((user,
            java.time.LocalDate.ofEpochDay(cohort).toString, off)))
        else ((cohort, seen), Nil)
      },
      retain = _._1 >= 0)
      .toDF("user_id", "cohort_week", "week_offset")
  }

  /** x59 streaming: the SCD2 dimension history maintained
    * continuously. Append rows carry full interval records; an
    * interval first appears OPEN (sentinel valid_to, is_current) and
    * is re-emitted CLOSED when the next state change finalizes — the
    * CDC-sink upsert pattern, so the live dimension is the LATEST row
    * per (user_id, event_id) and equals batch x59 over the same
    * events (Scd2StreamSpec pins it on the real corpus).
    *
    * Disorder: an out-of-order event can change WHICH transitions
    * exist (a late earlier event splits or absorbs an interval), so —
    * like [[funnelStream]]/[[retentionStream]] — events buffer until
    * the watermark passes them and fold in (event-time, event_id)
    * order: every emitted interval is final except for its single
    * possible close re-emission. State per user = the open interval +
    * the un-finalized buffer. */
  def scd2Stream(events: DataFrame,
                 lateness: String = "0 seconds"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import java.sql.Timestamp
    val openEnd = graft.queries.Extensions.OpenEnd
    val typed = events
      .withWatermark("ts", lateness)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .as[(Long, Timestamp, Long, String)]
    // state = (open-interval state name, open (from, event_id)).
    // DateTimeFormatter is not Serializable, so it cannot ride the
    // closure; TsFormatter's executor-side lazy val constructs it
    // once per JVM instead of once per event.
    BufferedFold.run[Long, (Long, Timestamp, Long, String),
        (String, Option[(Timestamp, Long)]),
        (Long, Long, String, String, String, Boolean)](
      typed, _._1, _._2, _._3, ("", None),
      step = { case ((lastState, open), (user, t, id, st)) =>
        def f(x: Timestamp): String = TsFormatter.fmt.format(x.toInstant)
        if (open.isEmpty || st != lastState) {
          val closed = open.toList.map { case (from, oid) =>
            (user, oid, lastState, f(from), f(t), false)
          }
          ((st, Some((t, id))),
            closed :+ ((user, id, st, f(t), openEnd, true)))
        } else ((lastState, open), Nil)
      },
      retain = _._2.isDefined)
      .toDF("user_id", "event_id", "state", "valid_from", "valid_to",
        "is_current")
  }

  /** x58 streaming: the ordered funnel maintained continuously — one
    * append row (user_id, step, step_name, ts) per step TRANSITION,
    * carrying exactly the chained min timestamp the batch
    * min-chaining computes (step t = earliest step-t event strictly
    * after the step-(t−1) time). A downstream `groupBy(step).count()`
    * is the live funnel.
    *
    * Correctness under disorder: a fold over raw ARRIVAL order is not
    * order-insensitive — a click arriving before its user's earlier
    * view would be discarded, yet it qualifies once the view lands —
    * so events BUFFER in per-user state until the watermark passes
    * them, then fold in (event-time, event_id) order. Transitions
    * therefore fire only on finalized prefixes: deterministic, final,
    * no retractions — the same contract as the CEP engine's
    * watermark-gated NFA ([[Cep]]), specialized to the monotone
    * step-chain where full generality isn't needed.
    *
    * State per user = the achieved step-time chain (≤ |steps|
    * timestamps) + the un-finalized buffer (bounded by the lateness
    * horizon × the user's event rate). Ripe events drain every
    * trigger — via the key's own new data or the event-time timeout
    * that re-fires while anything is buffered. Spark's stateful-op
    * late-row filtering drops arrivals AT or older than the watermark
    * (ts <= wm, verified empirically) before they reach the operator,
    * matching the buffered fold's finality assumption — but note the
    * boundary: under `lateness = "0 seconds"` an event whose time
    * exactly TIES a previous trigger's max event time is dropped.
    * Give a nonzero lateness budget whenever exact event-time ties
    * can straddle triggers (StreamFoldPropertiesSpec exercises this
    * with tie-heavy corpora at 1 s lateness); the same contract
    * applies to [[retentionStream]] and [[scd2Stream]].
    *
    * Watermark contract: Catalyst pushes the step-type filter BELOW
    * the watermark node, so the stream's watermark advances on STEP
    * events only — a stream of exclusively non-step events never
    * finalizes buffered transitions (FunnelStreamSpec's sentinels
    * are step-typed for exactly this reason). */
  def funnelStream(events: DataFrame,
                   steps: Seq[String] = Seq("view", "click", "purchase"),
                   lateness: String = "0 seconds"): DataFrame = {
    require(steps.nonEmpty, "funnelStream requires at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    import java.sql.Timestamp
    val typed = events
      .withWatermark("ts", lateness)
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, Timestamp, Long, String)]
    // state = achieved step-time chain, newest first. A user with
    // progress keeps state FOREVER (forgetting a completed funnel
    // would let a later event restart it and re-emit transitions);
    // a completed user's buffer is useless — bufferDone drops it.
    BufferedFold.run[Long, (Long, Timestamp, Long, String),
        List[Timestamp], (Long, Int, String, Timestamp)](
      typed, _._1, _._2, _._3, Nil,
      step = { case (achieved, (user, t, _, tp)) =>
        val next = achieved.length
        if (next < steps.length && tp == steps(next) &&
            achieved.forall(prev => t.compareTo(prev) > 0))
          (t :: achieved, List((user, next + 1, steps(next), t)))
        else (achieved, Nil)
      },
      retain = _.nonEmpty,
      bufferDone = _.length == steps.length)
      .toDF("user_id", "step", "step_name", "ts")
  }
}

/** Executor-side lazy holder for the microsecond timestamp formatter:
  * DateTimeFormatter is thread-safe but NOT Serializable, so it can't
  * ride a closure — this constructs it once per JVM instead of once
  * per folded event. */
private[streaming] object TsFormatter {
  lazy val fmt: java.time.format.DateTimeFormatter =
    java.time.format.DateTimeFormatter
      .ofPattern(graft.queries.Extensions.TsFmt)
      .withZone(java.time.ZoneOffset.UTC)
}
