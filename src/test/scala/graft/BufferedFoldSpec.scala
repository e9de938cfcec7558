package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.BufferedFold
import java.sql.Timestamp
import CommitFixtures.t

/** Direct contract tests for the public BufferedFold operator (the
  * twins cover it end-to-end; this pins the operator's own
  * guarantees with a minimal fold: per-key running index of each
  * finalized event in event-time order). */
class BufferedFoldSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit lazy val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ev(id: Long, ts0: String, user: Long) =
    Ev(id, t(ts0), user, "view", 1.0, "{}")

  /** Fold: state = events folded so far; emit (user, event_id, idx). */
  private def indexFold(df: org.apache.spark.sql.DataFrame) = {
    val typed = df.withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[(Long, Timestamp, Long)]
    BufferedFold.run[Long, (Long, Timestamp, Long), Long, (Long, Long, Long)](
      typed, _._1, _._2, _._3, 0L,
      step = { case (n, (u, _, id)) => (n + 1, List((u, id, n + 1))) },
      retain = _ > 0)
  }

  test("events fold in event-time order regardless of arrival order") {
    val in = MemoryStream[Ev]
    val q = indexFold(in.toDF()).toDF("user_id", "event_id", "idx")
      .writeStream.format("memory").queryName("bf1")
      .outputMode("append").start()
    try {
      // arrival order 3,1,2 within one batch; event-time order 1,2,3
      in.addData(
        ev(3, "2024-01-01T10:30:00Z", 1),
        ev(1, "2024-01-01T10:00:00Z", 1),
        ev(2, "2024-01-01T10:15:00Z", 1))
      q.processAllAvailable()
      for (k <- 0 until 3) {
        in.addData(ev(90 + k, s"2024-01-01T1${2 + k}:00:00Z", 9))
        q.processAllAvailable()
      }
      val got = spark.table("bf1").as[(Long, Long, Long)].collect()
        .filter(_._1 == 1L).sortBy(_._3).toSeq
      assert(got == Seq((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L)),
        s"fold order wrong: $got")
    } finally q.stop()
  }

  test("equal-time events tie-break by the id function, deterministically") {
    val in = MemoryStream[Ev]
    val q = indexFold(in.toDF()).toDF("user_id", "event_id", "idx")
      .writeStream.format("memory").queryName("bf2")
      .outputMode("append").start()
    try {
      in.addData( // same timestamp, ids out of order
        ev(7, "2024-01-01T10:00:00Z", 2),
        ev(5, "2024-01-01T10:00:00Z", 2),
        ev(6, "2024-01-01T10:00:00Z", 2))
      q.processAllAvailable()
      for (k <- 0 until 3) {
        in.addData(ev(90 + k, s"2024-01-01T1${2 + k}:00:00Z", 9))
        q.processAllAvailable()
      }
      val got = spark.table("bf2").as[(Long, Long, Long)].collect()
        .filter(_._1 == 2L).sortBy(_._3).map(_._2).toSeq
      assert(got == Seq(5L, 6L, 7L), s"tie-break wrong: $got")
    } finally q.stop()
  }

  test("nothing emits before the watermark finalizes the events") {
    val in = MemoryStream[Ev]
    val q = indexFold(in.toDF()).toDF("user_id", "event_id", "idx")
      .writeStream.format("memory").queryName("bf3")
      .outputMode("append").start()
    try {
      in.addData(ev(1, "2024-01-01T10:00:00Z", 3))
      q.processAllAvailable()
      // watermark has not passed 10:00 — the event must still buffer
      assert(spark.table("bf3").count() == 0,
        "emitted before finalization")
      in.addData(ev(2, "2024-01-01T11:00:00Z", 3))
      q.processAllAvailable()
      assert(spark.table("bf3").as[(Long, Long, Long)].collect().toSet ==
        Set((3L, 1L, 1L)), "first event should finalize once wm passes it")
    } finally q.stop()
  }
}
