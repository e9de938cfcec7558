package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStreams
import java.sql.Timestamp
import CommitFixtures.t

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double, props: String)

/** Streaming events queries: update-mode counts, watermark-closed
  * daily revenue, and streaming session windows (merge + emit). */
class EventStreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit lazy val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ev(id: Long, ts0: String, user: Long, typ: String, v: Double) =
    Ev(id, t(ts0), user, typ, v, "{}")

  test("running type counts grow across batches (update mode)") {
    val in = MemoryStream[Ev]
    val q = EventStreams.runningTypeCounts(in.toDF()).writeStream
      .format("memory").queryName("etc").outputMode("update").start()
    in.addData(ev(1, "2024-01-01T10:00:00Z", 1, "click", 1.0))
    q.processAllAvailable()
    in.addData(ev(2, "2024-01-01T11:00:00Z", 1, "click", 1.0))
    q.processAllAvailable()
    val got = spark.table("etc").as[(String, Long)].collect().toSeq
    assert(got.sorted == Seq(("click", 1L), ("click", 2L)))
    q.stop()
  }

  test("daily revenue fires on watermark with exact decimal sums") {
    val in = MemoryStream[Ev]
    val q = EventStreams.dailyTypeRevenue(in.toDF()).writeStream
      .format("memory").queryName("rev").outputMode("append").start()
    in.addData(
      ev(1, "2024-01-01T10:00:00Z", 1, "purchase", 10.10),
      ev(2, "2024-01-01T11:00:00Z", 2, "purchase", 0.20))
    q.processAllAvailable()
    in.addData(ev(3, "2024-01-02T00:00:01Z", 1, "click", 1.0))
    q.processAllAvailable()
    val got = spark.table("rev")
      .as[(Timestamp, String, Long, Double)].collect()
    assert(got.length == 1)
    assert(got.head._2 == "purchase" && got.head._3 == 2 && got.head._4 == 10.30)
    q.stop()
  }

  test("streaming dedup drops in-horizon duplicates, keeps first occurrence") {
    val in = MemoryStream[Ev]
    val q = EventStreams.dedupStream(in.toDF(), "1 hour", Seq("props"))
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    in.addData(
      ev(1, "2024-01-01T10:00:00Z", 1, "click", 1.0).copy(props = "contentA"),
      ev(2, "2024-01-01T10:10:00Z", 2, "click", 2.0).copy(props = "contentA"), // dup in horizon
      ev(3, "2024-01-01T10:20:00Z", 3, "click", 3.0).copy(props = "contentB"))
    q.processAllAvailable()
    in.addData(ev(4, "2024-01-01T10:30:00Z", 4, "click", 4.0).copy(props = "contentA")) // still dup
    q.processAllAvailable()
    val got = spark.table("dedup").as[Ev].collect().map(_.event_id).toSet
    assert(got == Set(1L, 3L))
    q.stop()
  }

  test("stream-stream interval join honors inclusive [-1h, +30m] bounds") {
    val inA = MemoryStream[Ev]
    val inB = MemoryStream[Ev]
    val q = EventStreams.purchaseContext(inA.toDF(), inB.toDF()).writeStream
      .format("memory").queryName("pctx").outputMode("append").start()
    val purchase = ev(100, "2024-01-01T10:00:00Z", 1, "purchase", 9.99)
    inA.addData(purchase)
    inB.addData(
      purchase, // self — excluded by a_id <> b_id
      ev(1, "2024-01-01T09:00:00Z", 1, "view", 1.0),     // exactly -1h: in
      ev(2, "2024-01-01T08:59:59Z", 1, "view", 1.0),     // before: out
      ev(3, "2024-01-01T10:30:00Z", 1, "click", 1.0),    // exactly +30m: in
      ev(4, "2024-01-01T10:30:01Z", 1, "click", 1.0),    // after: out
      ev(5, "2024-01-01T10:10:00Z", 2, "view", 1.0))     // other user: out
    q.processAllAvailable()
    // advance both watermarks past the horizon so all matches flush
    inA.addData(ev(200, "2024-01-02T00:00:00Z", 9, "purchase", 1.0))
    inB.addData(ev(201, "2024-01-02T00:00:00Z", 9, "click", 1.0))
    q.processAllAvailable()
    val got = spark.table("pctx").select("b_id")
      .as[Long].collect().toSet
    assert(got.contains(1L) && got.contains(3L))
    assert(!got.contains(2L) && !got.contains(4L) && !got.contains(5L))
    q.stop()
  }

  test("streaming session windows merge and emit after the gap passes") {
    val in = MemoryStream[Ev]
    val q = EventStreams.userSessions(in.toDF()).writeStream
      .format("memory").queryName("sess").outputMode("append").start()
    in.addData( // one session: 10:00 + 10:20 (gap 20m < 30m)
      ev(1, "2024-01-01T10:00:00Z", 1, "click", 1.0),
      ev(2, "2024-01-01T10:20:00Z", 1, "click", 2.0))
    q.processAllAvailable()
    assert(spark.table("sess").count() == 0) // session still open
    in.addData(ev(3, "2024-01-01T12:00:00Z", 1, "click", 4.0)) // closes it
    q.processAllAvailable()
    val got = spark.table("sess")
      .as[(Long, Timestamp, Long, Double)].collect()
    assert(got.length == 1)
    assert(got.head == ((1L, t("2024-01-01T10:00:00Z"), 2L, 3.0)))
    q.stop()
  }

  test("x50 streaming twin: upserts overwrite, tombstones flag, late events fold in") {
    val in = MemoryStream[Ev]
    val q = graft.streaming.EventStreams.latestState(in.toDF())
      .writeStream.format("memory").queryName("cdc")
      .outputMode("update").start()
    def state() = spark.table("cdc")
      .as[(Long, String, Double, Timestamp, Boolean)].collect()
      .groupBy(_._1).map { case (u, rows) =>
        u -> rows.maxBy(_._4.getTime) }.toMap // latest emission per user
    in.addData(
      Ev(1, t("2024-01-01T10:00:00Z"), 7, "view", 1.0, "{}"),
      Ev(2, t("2024-01-01T10:05:00Z"), 7, "purchase", 9.0, "{}"),
      Ev(3, t("2024-01-01T10:00:00Z"), 8, "signup", 0.0, "{}"))
    q.processAllAvailable()
    val s1 = state()
    assert(s1(7L)._2 == "purchase" && s1(7L)._3 == 9.0 && !s1(7L)._5)
    assert(s1(8L)._2 == "signup")
    // a LATE event older than user 7's current state must NOT win…
    in.addData(Ev(4, t("2024-01-01T10:01:00Z"), 7, "click", 2.0, "{}"))
    q.processAllAvailable()
    assert(state()(7L)._2 == "purchase", "older event must not overwrite")
    // …and a newer tombstone must
    in.addData(Ev(5, t("2024-01-01T10:30:00Z"), 8, "error", 0.0, "{}"))
    q.processAllAvailable()
    val s3 = state()
    assert(s3(8L)._2 == "error" && s3(8L)._5,
      s"latest emission for user 8 must be the tombstone: $s3")
    q.stop()
  }
}
