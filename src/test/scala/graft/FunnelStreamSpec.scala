package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import java.sql.Timestamp
import CommitFixtures.t

/** Streaming ordered funnel: the buffered-until-watermark fold must
  * emit exactly the batch min-chaining's transitions — including the
  * retroactive case a naive arrival-order fold gets wrong — and must
  * never re-open a completed funnel. */
class FunnelStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit lazy val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ev(id: Long, ts0: String, user: Long, typ: String) =
    Ev(id, t(ts0), user, typ, 1.0, "{}")

  /** Drive funnelStream over batches of events; returns transitions. */
  private def run(name: String, batches: Seq[Seq[Ev]]): Seq[(Long, Int, String, Timestamp)] = {
    val in = MemoryStream[Ev]
    val q = EventStreams.funnelStream(in.toDF()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).as[(Long, Int, String, Timestamp)].collect().toSeq
    } finally q.stop()
  }

  test("retroactive qualification: disorder within a batch folds in event-time order") {
    // click arrives BEFORE its user's earlier view — an arrival-order
    // fold discards it (no t1 yet); the buffered fold must not
    val got = run("fun1", Seq(
      Seq(ev(1, "2024-01-01T10:05:00Z", 1, "click"),
          ev(2, "2024-01-01T10:00:00Z", 1, "view")),
      Seq(ev(3, "2024-01-01T10:10:00Z", 1, "purchase")),
      Seq(ev(99, "2024-01-01T12:00:00Z", 9, "view")),   // step-typed sentinels: the op's watermark tracks STEP events only (the event_type filter pushes below the watermark node), so sentinels must be step-typed; user 9 excluded from asserts
      Seq(ev(98, "2024-01-01T13:00:00Z", 9, "view")),
      Seq(ev(97, "2024-01-01T14:00:00Z", 9, "view"))))
    assert(got.filter(_._1 != 9L).toSet == Set(
      (1L, 1, "view", t("2024-01-01T10:00:00Z")),
      (1L, 2, "click", t("2024-01-01T10:05:00Z")),
      (1L, 3, "purchase", t("2024-01-01T10:10:00Z"))))
  }

  test("strictly-after: a click at exactly t1 is skipped, a later one qualifies") {
    val got = run("fun2", Seq(
      Seq(ev(1, "2024-01-01T10:00:00Z", 2, "view"),
          ev(2, "2024-01-01T10:00:00Z", 2, "click"),    // == t1: skipped
          ev(3, "2024-01-01T10:02:00Z", 2, "click")),
      Seq(ev(99, "2024-01-01T12:00:00Z", 9, "view")),
      Seq(ev(98, "2024-01-01T13:00:00Z", 9, "view")),
      Seq(ev(97, "2024-01-01T14:00:00Z", 9, "view"))))
    assert(got.filter(_._1 != 9L).toSet == Set(
      (2L, 1, "view", t("2024-01-01T10:00:00Z")),
      (2L, 2, "click", t("2024-01-01T10:02:00Z"))))
  }

  test("a completed funnel never re-opens; an unstarted user leaves no state") {
    val got = run("fun3", Seq(
      Seq(ev(1, "2024-01-01T10:00:00Z", 3, "view"),
          ev(2, "2024-01-01T10:01:00Z", 3, "click"),
          ev(3, "2024-01-01T10:02:00Z", 3, "purchase"),
          ev(4, "2024-01-01T10:00:30Z", 4, "click")),    // never views
      Seq(ev(5, "2024-01-01T11:00:00Z", 3, "view"),      // after completion
          ev(6, "2024-01-01T11:00:10Z", 4, "click")),
      Seq(ev(99, "2024-01-01T12:00:00Z", 9, "view")),
      Seq(ev(98, "2024-01-01T13:00:00Z", 9, "view")),
      Seq(ev(97, "2024-01-01T14:00:00Z", 9, "view"))))
    assert(got.count(_._1 == 3L) == 3, s"completed funnel re-emitted: $got")
    assert(!got.exists(_._1 == 4L), "click without view must not transition")
  }

  /** Batch min-chaining (the x58 construction) over a plain frame. */
  private def batchChain(events: DataFrame): Set[(Long, Int, Timestamp)] = {
    def step(prev: Option[DataFrame], name: String): DataFrame = {
      val base = events.filter(col("event_type") === name)
      prev match {
        case None => base.groupBy(col("user_id")).agg(min(col("ts")).as("t"))
        case Some(p) => base
          .join(p.select(col("user_id"), col("t").as("pt")), Seq("user_id"))
          .filter(col("ts") > col("pt"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
      }
    }
    val s1 = step(None, "view")
    val s2 = step(Some(s1), "click")
    val s3 = step(Some(s2), "purchase")
    Seq(s1, s2, s3).zipWithIndex.flatMap { case (df, i) =>
      df.as[(Long, Timestamp)].collect().map { case (u, ts) => (u, i + 1, ts) }
    }.toSet
  }

  test("real corpus: streamed transitions == batch min-chaining, chunked + shuffled") {
    val all = Tables.events(spark, "/root/testdata/sf0.001")
      .as[Ev].collect().sortBy(e => (e.ts.getTime, e.event_id))
    // in-order chunks (watermark 0s), arbitrary order INSIDE a chunk
    val rnd = new scala.util.Random(7)
    val chunks = all.grouped((all.length / 3) + 1)
      .map(c => rnd.shuffle(c.toSeq)).toSeq
    val sentinel = Seq(
      Seq(ev(999901, "2024-03-01T00:00:00Z", 999, "view")),
      Seq(ev(999902, "2024-03-02T00:00:00Z", 999, "view")),
      Seq(ev(999903, "2024-03-03T00:00:00Z", 999, "view")))
    val got = run("fun4", chunks ++ sentinel)
      .filter(_._1 != 999L)
      .map { case (u, s, _, ts) => (u, s, ts) }.toSet
    val want = batchChain(Tables.events(spark, "/root/testdata/sf0.001"))
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }
}
