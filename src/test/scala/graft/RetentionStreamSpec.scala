package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import CommitFixtures.t

/** Streaming retention triangle: the buffered fold must assign the
  * cohort by the true earliest finalized event (disorder-proof),
  * emit each (user, offset) once, and aggregate to exactly the batch
  * x57 table on the real corpus. */
class RetentionStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit lazy val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ev(id: Long, ts0: String, user: Long) =
    Ev(id, t(ts0), user, "click", 1.0, "{}")

  private def run(name: String, batches: Seq[Seq[Ev]]): Seq[(Long, String, Long)] = {
    val in = MemoryStream[Ev]
    val q = EventStreams.retentionStream(in.toDF()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).as[(Long, String, Long)].collect().toSeq
    } finally q.stop()
  }

  test("cohort is the earliest finalized event even when it arrives last in its batch") {
    // 2024-01-02 is in the week of Mon 2024-01-01; 2024-01-10 in the
    // week of Mon 2024-01-08. Arrival order would base the cohort on
    // Jan 10; event-time order must base it on Jan 2.
    val got = run("ret1", Seq(
      Seq(ev(1, "2024-01-10T12:00:00Z", 1), ev(2, "2024-01-02T09:00:00Z", 1)),
      Seq(ev(99, "2024-02-01T00:00:00Z", 9)),
      Seq(ev(98, "2024-02-02T00:00:00Z", 9)),
      Seq(ev(97, "2024-02-03T00:00:00Z", 9))))
    assert(got.filter(_._1 == 1L).toSet == Set(
      (1L, "2024-01-01", 0L), (1L, "2024-01-01", 1L)))
  }

  test("one row per (user, offset): same-week repeats don't re-emit") {
    val got = run("ret2", Seq(
      Seq(ev(1, "2024-01-02T09:00:00Z", 2), ev(2, "2024-01-03T09:00:00Z", 2),
          ev(3, "2024-01-06T09:00:00Z", 2),   // Sat, still week of Jan 1
          ev(4, "2024-01-08T00:00:00Z", 2)),  // Mon, week of Jan 8
      Seq(ev(99, "2024-02-01T00:00:00Z", 9)),
      Seq(ev(98, "2024-02-02T00:00:00Z", 9)),
      Seq(ev(97, "2024-02-03T00:00:00Z", 9))))
    assert(got.filter(_._1 == 2L).toSet == Set(
      (2L, "2024-01-01", 0L), (2L, "2024-01-01", 1L)))
  }

  test("real corpus: aggregated stream == batch x57 gate, chunked + shuffled") {
    val all = Tables.events(spark, "/root/testdata/sf0.001")
      .as[Ev].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val rnd = new scala.util.Random(11)
    val chunks = all.grouped((all.length / 3) + 1)
      .map(c => rnd.shuffle(c.toSeq)).toSeq
    val sentinel = Seq(
      Seq(ev(999901, "2024-03-01T00:00:00Z", 999)),
      Seq(ev(999902, "2024-03-02T00:00:00Z", 999)),
      Seq(ev(999903, "2024-03-03T00:00:00Z", 999)))
    val rows = run("ret3", chunks ++ sentinel).filter(_._1 != 999L)
    // rows are unique per (user, offset) — plain count == countDistinct
    assert(rows.distinct.length == rows.length)
    val got = rows.groupBy(r => (r._2, r._3))
      .map { case (k, v) => (k._1, k._2, v.length.toLong) }.toSet
    val want = SparkEntry.queries("x57_retention_cohorts")(
        spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long)].collect().toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }
}
