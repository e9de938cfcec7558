package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import java.sql.Timestamp

/** Randomized equivalence for the buffered-until-watermark twins:
  * random event sets, random in-batch disorder, random chunk
  * boundaries — the streamed result must equal its batch operator
  * on every draw. Seeds are fixed (deterministic suite); event times
  * include duplicate timestamps ON PURPOSE (the tie paths are where
  * order bugs hide). The twins run with a 1-second lateness budget:
  * Spark's stateful late-filter drops rows with ts <= watermark, so
  * under lateness 0 an event TYING a previous trigger's max event
  * time is dropped before the operator (verified empirically; the
  * scaladocs document it) — a nonzero budget is the correct
  * configuration whenever exact event-time ties can straddle
  * triggers, and it is exactly what this spec's tie-heavy corpora
  * manufacture. */
class StreamFoldPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit lazy val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val types = Seq("view", "click", "purchase", "signup", "error")
  private val base = java.time.Instant.parse("2024-01-01T00:00:00Z")

  /** Random corpus: nUsers users, nEv events, second-granular times
    * over ~3 weeks with collisions likely. */
  private def corpus(seed: Int, nUsers: Int = 8, nEv: Int = 120): Seq[Ev] = {
    val rnd = new scala.util.Random(seed)
    // 20% of events land on a 15-slot hot pool → guaranteed exact-time
    // ties across users and types (the order-tie code paths)
    val hot = Vector.fill(15)(rnd.nextInt(1800000).toLong)
    (1 to nEv).map { i =>
      val secs = if (rnd.nextInt(5) == 0) hot(rnd.nextInt(hot.length))
                 else rnd.nextInt(1800000).toLong
      Ev(i.toLong, Timestamp.from(base.plusSeconds(secs)),
        1L + rnd.nextInt(nUsers),
        types(rnd.nextInt(types.length)), 1.0, "{}")
    }
  }

  /** Feed sorted-by-time chunks (disorder inside each chunk), with a
    * step-typed far-future sentinel tail to flush buffers. */
  private def feed(name: String, events: Seq[Ev], seed: Int,
                   make: DataFrame => DataFrame): DataFrame = {
    val rnd = new scala.util.Random(seed + 7919)
    val sorted = events.sortBy(e => (e.ts.getTime, e.event_id))
    val nChunks = 2 + rnd.nextInt(4)
    val chunks = sorted.grouped((sorted.size / nChunks) + 1)
      .map(c => rnd.shuffle(c)).toSeq
    val far = base.plusSeconds(4000000)
    val sentinel = (0 until 3).map(k => Seq(Ev(999900L + k,
      Timestamp.from(far.plusSeconds(k * 3600L)), 999L, "view", 1.0, "{}")))
    val in = MemoryStream[Ev]
    val q = make(in.toDF()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      (chunks ++ sentinel).foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name)
    } finally q.stop()
  }

  private def batchFunnel(events: DataFrame): Set[(Long, Int, Timestamp)] = {
    def step(prev: Option[DataFrame], name: String): DataFrame = {
      val b = events.filter(col("event_type") === name)
      prev match {
        case None => b.groupBy(col("user_id")).agg(min(col("ts")).as("t"))
        case Some(p) => b
          .join(p.select(col("user_id"), col("t").as("pt")), Seq("user_id"))
          .filter(col("ts") > col("pt"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
      }
    }
    val s1 = step(None, "view"); val s2 = step(Some(s1), "click")
    val s3 = step(Some(s2), "purchase")
    Seq(s1, s2, s3).zipWithIndex.flatMap { case (df, i) =>
      df.as[(Long, Timestamp)].collect().map { case (u, t) => (u, i + 1, t) }
    }.toSet
  }

  test("funnelStream == batch min-chaining on random corpora") {
    for (seed <- Seq(1, 2, 3)) {
      val evs = corpus(seed)
      val got = feed(s"pfun$seed", evs, seed, EventStreams.funnelStream(_, lateness = "1 second"))
        .as[(Long, Int, String, Timestamp)].collect()
        .filter(_._1 != 999L).map { case (u, s, _, t) => (u, s, t) }.toSet
      val want = batchFunnel(evs.toDF())
      assert(got == want, s"seed=$seed missing=${(want -- got).take(3)} " +
        s"extra=${(got -- want).take(3)}")
    }
  }

  test("retentionStream aggregates == batch x57 construction on random corpora") {
    for (seed <- Seq(4, 5, 6)) {
      val evs = corpus(seed)
      val rows = feed(s"pret$seed", evs, seed, EventStreams.retentionStream(_, lateness = "1 second"))
        .as[(Long, String, Long)].collect().filter(_._1 != 999L).toSeq
      assert(rows.distinct.size == rows.size, s"seed=$seed dup emission")
      val got = rows.groupBy(r => (r._2, r._3))
        .map { case (k, v) => (k._1, k._2, v.size.toLong) }.toSet
      val ev = evs.toDF()
      val fs = ev.groupBy(col("user_id")).agg(min(col("ts")).as("first_ts"))
      val want = ev.join(fs, Seq("user_id"))
        .select(col("user_id"),
          date_trunc("week", col("first_ts")).as("cw"),
          date_trunc("week", col("ts")).as("aw"))
        .select(col("user_id"),
          date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
          expr("CAST(datediff(aw, cw) div 7 AS BIGINT)").as("week_offset"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .as[(String, Long, Long)].collect().toSet
      assert(got == want, s"seed=$seed missing=${(want -- got).take(3)} " +
        s"extra=${(got -- want).take(3)}")
    }
  }

  test("scd2Stream materialized view == batch x59 construction on random corpora") {
    import org.apache.spark.sql.expressions.Window
    for (seed <- Seq(7, 8, 9)) {
      val evs = corpus(seed)
      val rows = feed(s"pscd$seed", evs, seed, EventStreams.scd2Stream(_, lateness = "1 second"))
        .as[(Long, Long, String, String, String, Boolean)].collect()
        .filter(_._1 != 999L).toSeq
      val got = rows.zipWithIndex.groupBy { case (r, _) => (r._1, r._2) }
        .map { case (_, v) => v.maxBy(_._2)._1 }.toSet
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val want = evs.toDF()
        .select(col("user_id"), col("event_type").as("state"),
          col("ts"), col("event_id"))
        .withColumn("prev", lag(col("state"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("state"))
        .withColumn("nxt", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("event_id"), col("state"),
          date_format(col("ts"), graft.queries.Extensions.TsFmt)
            .as("valid_from"),
          coalesce(date_format(col("nxt"), graft.queries.Extensions.TsFmt),
            lit(graft.queries.Extensions.OpenEnd)).as("valid_to"),
          col("nxt").isNull.as("is_current"))
        .as[(Long, Long, String, String, String, Boolean)].collect().toSet
      assert(got == want, s"seed=$seed missing=${(want -- got).take(2)} " +
        s"extra=${(got -- want).take(2)}")
    }
  }
}
