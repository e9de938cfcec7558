package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.LateData

/** Flink-style late-data surface ([[graft.streaming.LateData]]):
  * bounded-out-of-orderness tagging on a raw stream, the side-output
  * split, and per-bucket watermark independence. */
class LateDataSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def t(iso: String) =
    java.sql.Timestamp.from(java.time.Instant.parse(iso))

  private val Delay = 10 * 60 * 1000L // 10 minutes

  test("in-order events are never late; an event behind max-delay is") {
    val in = MemoryStream[Sensor]
    val q = LateData.tagLate(in.toDS(), (e: Sensor) => e.ets.getTime, Delay)
      .map { case (e, late) => (e.kind, late) }
      .toDF("kind", "late")
      .writeStream.format("memory").queryName("late1")
      .outputMode(OutputMode.Append).start()
    in.addData(
      Sensor("d1", "a", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "b", t("2019-06-26T10:30:00Z"))) // advances max to 10:30
    q.processAllAvailable()
    in.addData(
      Sensor("d1", "in_allowance", t("2019-06-26T10:21:00Z")), // 9m behind: ok
      Sensor("d1", "too_old", t("2019-06-26T10:00:00Z")))      // 30m behind: late
    q.processAllAvailable()
    val got = spark.table("late1").as[(String, Boolean)].collect().toMap
    assert(got == Map("a" -> false, "b" -> false,
      "in_allowance" -> false, "too_old" -> true))
    q.stop()
  }

  test("a batch judges against the watermark as of its start (burst semantics)") {
    val in = MemoryStream[Sensor]
    val q = LateData.tagLate(in.toDS(), (e: Sensor) => e.ets.getTime, Delay)
      .map { case (e, late) => (e.kind, late) }
      .toDF("kind", "late")
      .writeStream.format("memory").queryName("late2")
      .outputMode(OutputMode.Append).start()
    // one burst: the fresh event and a 30m-older one arrive together —
    // neither is late, because the watermark had not advanced when the
    // burst arrived (Flink's periodic generator behaves the same way)
    in.addData(
      Sensor("d1", "fresh", t("2019-06-26T10:30:00Z")),
      Sensor("d1", "old_same_batch", t("2019-06-26T10:00:00Z")))
    q.processAllAvailable()
    // next batch: now the 10:30 max is the baseline
    in.addData(Sensor("d1", "old_next_batch", t("2019-06-26T10:00:00Z")))
    q.processAllAvailable()
    val got = spark.table("late2").as[(String, Boolean)].collect().toMap
    assert(got == Map("fresh" -> false, "old_same_batch" -> false,
      "old_next_batch" -> true))
    q.stop()
  }

  test("per-bucket watermarks are independent (per-split semantics)") {
    val in = MemoryStream[Sensor]
    val q = LateData.tagLate(in.toDS(), (e: Sensor) => e.ets.getTime, Delay,
        bucketOf = (e: Sensor) => e.device.hashCode)
      .map { case (e, late) => (e.device + ":" + e.kind, late) }
      .toDF("key", "late")
      .writeStream.format("memory").queryName("late3")
      .outputMode(OutputMode.Append).start()
    in.addData(Sensor("d1", "adv", t("2019-06-26T12:00:00Z"))) // d1 far ahead
    q.processAllAvailable()
    in.addData(
      Sensor("d2", "first", t("2019-06-26T10:00:00Z")), // d2's own first event
      Sensor("d1", "old", t("2019-06-26T10:00:00Z")))   // 2h behind d1's max
    q.processAllAvailable()
    val got = spark.table("late3").as[(String, Boolean)].collect().toMap
    assert(got == Map("d1:adv" -> false, "d2:first" -> false,
      "d1:old" -> true),
      s"d2 must not inherit d1's watermark: $got")
    q.stop()
  }

  test("split routes late rows to the side output; on-time branch windows cleanly") {
    val in = MemoryStream[Sensor]
    val (onTime, late) = LateData.split(
      in.toDS(), (e: Sensor) => e.ets.getTime, Delay)
    // the on-time branch is watermark-safe by construction: count
    // per 30m tumbling window downstream
    val agg = onTime
      .withWatermark("ets", "10 minutes")
      .groupBy(org.apache.spark.sql.functions.window(
        org.apache.spark.sql.functions.col("ets"), "30 minutes"))
      .count()
    val q1 = agg.select("window.start", "count")
      .writeStream.format("memory").queryName("lateAgg")
      .outputMode(OutputMode.Update).start()
    val q2 = late.map(_.kind).toDF("kind")
      .writeStream.format("memory").queryName("lateSide")
      .outputMode(OutputMode.Append).start()
    in.addData(
      Sensor("d1", "a", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "b", t("2019-06-26T10:10:00Z")))
    q1.processAllAvailable(); q2.processAllAvailable()
    in.addData(
      Sensor("d1", "c", t("2019-06-26T10:12:00Z")), // on time, same window
      Sensor("d1", "z", t("2019-06-26T09:00:00Z"))) // 70m behind: side output
    q1.processAllAvailable(); q2.processAllAvailable()
    val sideRows = spark.table("lateSide").as[String].collect().toSet
    assert(sideRows == Set("z"), s"side output must hold exactly z: $sideRows")
    val counts = spark.table("lateAgg")
      .as[(java.sql.Timestamp, Long)].collect().toMap
    assert(counts(t("2019-06-26T10:00:00Z")) == 3L,
      s"a, b, c all land in the 10:00 window: $counts")
    q1.stop(); q2.stop()
  }

  test("allowedLateness mapping: update-mode refinement rows, then drop past allowance") {
    // pins the documented Flink divergence (LateData scaladoc): Flink
    // allowedLateness(d) RE-FIRES the window's full result d past the
    // watermark; the Spark mapping — withWatermark(delay + allowance)
    // + update sink — emits REFINEMENT rows for the same window
    // instead, and silently drops rows once behind the extended
    // watermark. This test pins that exact update-row sequence.
    val delayPlusAllowance = "30 minutes" // 10m ooo-bound + 20m allowance
    val in = MemoryStream[Sensor]
    val q = in.toDS()
      .withWatermark("ets", delayPlusAllowance)
      .groupBy(org.apache.spark.sql.functions.window(
        org.apache.spark.sql.functions.col("ets"), "30 minutes"))
      .count()
      .select("window.start", "count")
      .writeStream.format("memory").queryName("lateness")
      .outputMode(OutputMode.Update).start()
    def rows() = spark.table("lateness")
      .as[(java.sql.Timestamp, Long)].collect().toSeq
    // batch 1: the 10:00 window fires with count 2
    in.addData(
      Sensor("d1", "a", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "b", t("2019-06-26T10:10:00Z")))
    q.processAllAvailable()
    assert(rows() == Seq((t("2019-06-26T10:00:00Z"), 2L)))
    // batch 2: rows are judged against the watermark as of the batch
    // START (09:40 here), so the out-of-order 10:15 row is inside the
    // allowance; the 10:00 window is still open (its end 10:30 is
    // ahead of the post-batch watermark 10:20) and refines to a
    // SECOND update row, count=3 — Flink would re-fire the window,
    // Spark emits the refinement: the pinned divergence.
    in.addData(
      Sensor("d1", "adv", t("2019-06-26T10:50:00Z")),
      Sensor("d1", "late_ok", t("2019-06-26T10:15:00Z")))
    q.processAllAvailable()
    assert(rows().toSet ==
      Set((t("2019-06-26T10:00:00Z"), 2L), (t("2019-06-26T10:00:00Z"), 3L),
          (t("2019-06-26T10:30:00Z"), 1L)),
      s"late row within allowance must emit a refinement row: ${rows()}")
    // batch 3: advance watermark past the 10:00 window's end + let a
    // too-late row arrive — it must be silently dropped (no new
    // update row for the 10:00 window)
    in.addData(Sensor("d1", "adv2", t("2019-06-26T11:30:00Z"))) // wm → 11:00
    q.processAllAvailable()
    in.addData(Sensor("d1", "too_late", t("2019-06-26T10:20:00Z")))
    q.processAllAvailable()
    val finalRows = rows().filter(_._1 == t("2019-06-26T10:00:00Z"))
    assert(finalRows.map(_._2).max == 3L,
      s"row past the allowance must not refine the closed window: ${rows()}")
    q.stop()
  }

  test("allowedLatenessAgg: first fire, tagged refinement within allowance, purge past it") {
    // window 30m, allowance 20m, stream watermark = delay+allowance
    // = 30m — the operator's contract. Pins the fire-kind sequence
    // the raw update-mode mapping (test above) can only express by
    // sink-side diffing.
    val in = MemoryStream[Sensor]
    val fires = graft.streaming.LateData.allowedLatenessAgg[Sensor, String, Long](
      in.toDS().withWatermark("ets", "30 minutes"),
      _.device, _.ets,
      java.time.Duration.ofMinutes(30), java.time.Duration.ofMinutes(20),
      0L, (n, _) => n + 1)
    val q = fires.map(f => (f.key, f.windowStart, f.agg, f.kind, f.seq))
      .toDF("key", "ws", "cnt", "kind", "seq")
      .writeStream.format("memory").queryName("alat")
      .outputMode(OutputMode.Append).start()
    def w1 = t("2019-06-26T10:00:00Z")
    def got() = spark.table("alat")
      .as[(String, java.sql.Timestamp, Long, String, Int)].collect().toSeq
    in.addData(
      Sensor("d1", "a", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "b", t("2019-06-26T10:10:00Z")))
    q.processAllAvailable() // wm -> 09:40: window open, nothing fires
    assert(got().isEmpty)
    in.addData(Sensor("d1", "adv", t("2019-06-26T10:45:00Z")))
    q.processAllAvailable() // wm -> 10:15
    in.addData(Sensor("d1", "adv2", t("2019-06-26T10:46:00Z")))
    q.processAllAvailable() // timeout at wm 10:15: 10:15+20m >= 10:30 -> FIRST fire
    assert(got().filter(_._2 == w1) ==
      Seq(("d1", w1, 2L, "first", 0)), s"first fire: ${got()}")
    // late but above the widened watermark (10:16): refinement
    in.addData(Sensor("d1", "late_ok", t("2019-06-26T10:20:00Z")))
    q.processAllAvailable()
    assert(got().filter(_._2 == w1) ==
      Seq(("d1", w1, 2L, "first", 0), ("d1", w1, 3L, "refinement", 1)),
      s"refinement fire: ${got()}")
    // advance past end + allowance: the window purges; a straggler is
    // dropped upstream and can never re-fire it
    in.addData(Sensor("d1", "adv3", t("2019-06-26T11:35:00Z")))
    q.processAllAvailable()
    in.addData(Sensor("d1", "too_late", t("2019-06-26T10:25:00Z")))
    q.processAllAvailable()
    (1 to 2).foreach { k => // flush remaining timeouts
      in.addData(Sensor("d1", s"s$k", t(s"2019-06-26T12:0$k:00Z")))
      q.processAllAvailable()
    }
    val w1Fires = got().filter(_._2 == w1)
    assert(w1Fires.size == 2, s"no fire past the allowance: $w1Fires")
    // batch/stream agreement on the final refinement: last fire per
    // window equals the batch count of the rows that reached the
    // operator (W1: a, b, late_ok = 3; W2 [10:30,11:00): adv, adv2 = 2)
    val lastPerWindow = got().groupBy(_._2).map { case (ws, fs) =>
      ws -> fs.maxBy(_._5)._3 }
    assert(lastPerWindow(w1) == 3L)
    assert(lastPerWindow(t("2019-06-26T10:30:00Z")) == 2L)
    q.stop()
  }

  test("allowedLatenessAgg with zero allowance degenerates to one first fire per window") {
    val in = MemoryStream[Sensor]
    val fires = graft.streaming.LateData.allowedLatenessAgg[Sensor, String, Long](
      in.toDS().withWatermark("ets", "0 seconds"),
      _.device, _.ets,
      java.time.Duration.ofMinutes(30), java.time.Duration.ZERO,
      0L, (n, _) => n + 1)
    val q = fires.map(f => (f.windowStart, f.agg, f.kind, f.seq))
      .toDF("ws", "cnt", "kind", "seq")
      .writeStream.format("memory").queryName("alat0")
      .outputMode(OutputMode.Append).start()
    in.addData(
      Sensor("d1", "a", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "b", t("2019-06-26T10:10:00Z")))
    q.processAllAvailable()
    (1 to 3).foreach { k =>
      in.addData(Sensor("d1", s"s$k", t(f"2019-06-26T11:0$k%d:00Z")))
      q.processAllAvailable()
    }
    val got = spark.table("alat0")
      .as[(java.sql.Timestamp, Long, String, Int)].collect().toSeq
      .filter(_._1 == t("2019-06-26T10:00:00Z"))
    assert(got == Seq((t("2019-06-26T10:00:00Z"), 2L, "first", 0)),
      s"zero allowance = plain append windows: $got")
    q.stop()
  }
}
