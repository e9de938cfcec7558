package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStreams
import CommitFixtures.t

/** Streaming SCD2: open intervals re-emit closed on the next state
  * change (CDC-sink upsert pattern); the latest row per
  * (user, event_id) must equal the batch x59 table. */
class Scd2StreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit lazy val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ev(id: Long, ts0: String, user: Long, typ: String) =
    Ev(id, t(ts0), user, typ, 1.0, "{}")

  private type Row6 = (Long, Long, String, String, String, Boolean)

  private def run(name: String, batches: Seq[Seq[Ev]]): Seq[Row6] = {
    val in = MemoryStream[Ev]
    val q = EventStreams.scd2Stream(in.toDF()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).as[Row6].collect().toSeq
    } finally q.stop()
  }

  /** CDC-sink materialization: latest emission per (user, event_id) —
    * the closed re-emission supersedes the open one. */
  private def view(rows: Seq[Row6]): Set[Row6] =
    rows.zipWithIndex
      .groupBy { case (r, _) => (r._1, r._2) }
      .map { case (_, v) => v.maxBy(_._2)._1 }.toSet

  test("state changes close intervals; consecutive repeats collapse") {
    val got = run("scd1", Seq(
      Seq(ev(1, "2024-01-01T10:00:00Z", 1, "view"),
          ev(2, "2024-01-01T10:05:00Z", 1, "view"),     // repeat: no row
          ev(3, "2024-01-01T10:10:00Z", 1, "click")),
      Seq(ev(99, "2024-01-02T00:00:00Z", 9, "view")),
      Seq(ev(98, "2024-01-03T00:00:00Z", 9, "view")),
      Seq(ev(97, "2024-01-04T00:00:00Z", 9, "view"))))
    assert(view(got.filter(_._1 == 1L)) == Set(
      (1L, 1L, "view", "2024-01-01 10:00:00.000000",
        "2024-01-01 10:10:00.000000", false),
      (1L, 3L, "click", "2024-01-01 10:10:00.000000",
        "9999-12-31 00:00:00.000000", true)))
  }

  test("disorder: a late-arriving earlier event folds into the right interval") {
    // arrival order: click@10:10 then view@10:00 in the SAME batch —
    // event-time order must make view the first interval
    val got = run("scd2", Seq(
      Seq(ev(2, "2024-01-01T10:10:00Z", 2, "click"),
          ev(1, "2024-01-01T10:00:00Z", 2, "view")),
      Seq(ev(99, "2024-01-02T00:00:00Z", 9, "view")),
      Seq(ev(98, "2024-01-03T00:00:00Z", 9, "view")),
      Seq(ev(97, "2024-01-04T00:00:00Z", 9, "view"))))
    assert(view(got.filter(_._1 == 2L)) == Set(
      (2L, 1L, "view", "2024-01-01 10:00:00.000000",
        "2024-01-01 10:10:00.000000", false),
      (2L, 2L, "click", "2024-01-01 10:10:00.000000",
        "9999-12-31 00:00:00.000000", true)))
  }

  test("real corpus: materialized stream view == batch x59, chunked + shuffled") {
    val all = Tables.events(spark, "/root/testdata/sf0.001")
      .as[Ev].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val rnd = new scala.util.Random(13)
    val chunks = all.grouped((all.length / 3) + 1)
      .map(c => rnd.shuffle(c.toSeq)).toSeq
    val sentinel = Seq(
      Seq(ev(999901, "2024-03-01T00:00:00Z", 999, "view")),
      Seq(ev(999902, "2024-03-02T00:00:00Z", 999, "view")),
      Seq(ev(999903, "2024-03-03T00:00:00Z", 999, "view")))
    val got = view(run("scd3", chunks ++ sentinel).filter(_._1 != 999L))
    val want = SparkEntry.queries("x59_scd2_history")(
        spark, "/root/testdata/sf0.001")
      .as[Row6].collect().toSet
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }
}
