package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import java.sql.Timestamp
import CommitFixtures.t

/** Checkpointed stop/restart recovery for the buffered-fold twins:
  * the per-key state (achieved chain + un-finalized buffer) and the
  * watermark live in the checkpoint, so a restarted query must
  * continue the fold exactly — no duplicate transitions, no lost
  * buffered events — the exactly-once contract a production funnel
  * needs across deploys. Uses a file source (MemoryStream cannot
  * restart) with maxFilesPerTrigger=1 so each drop is its own
  * micro-batch. */
class RestartRecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(id: Long, ts0: String, user: Long, typ: String) =
    Ev(id, t(ts0), user, typ, 1.0, "{}")

  test("funnelStream continues exactly across a checkpointed restart") {
    val root = java.nio.file.Files.createTempDirectory("graft-restart")
    val inDir = s"$root/in"; val outDir = s"$root/out"; val cp = s"$root/cp"
    def drop(evs: Ev*): Unit =
      evs.toSeq.toDF().coalesce(1).write.mode("append").parquet(inDir)
    def runOnce(): Unit = {
      val src = spark.readStream.schema(EventStreams.schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
      val q = EventStreams.funnelStream(src).writeStream
        .format("parquet").option("checkpointLocation", cp)
        .option("path", outDir).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    // phase 1: disorder within the first drop; everything buffers
    // (wm starts at 0), then the query STOPS with state checkpointed
    drop(ev(1, "2024-01-01T10:05:00Z", 1, "click"),
         ev(2, "2024-01-01T10:00:00Z", 1, "view"))
    runOnce()
    // phase 2: new drops arrive while the query is down; the restart
    // must resume from the recovered buffer + watermark
    drop(ev(3, "2024-01-01T10:10:00Z", 1, "purchase"))
    drop(ev(90, "2024-01-01T12:00:00Z", 9, "view"))
    drop(ev(91, "2024-01-01T13:00:00Z", 9, "view"))
    drop(ev(92, "2024-01-01T14:00:00Z", 9, "view"))
    drop(ev(93, "2024-01-01T15:00:00Z", 9, "view"))
    runOnce()
    val got = spark.read.parquet(outDir)
      .as[(Long, Int, String, Timestamp)].collect()
      .filter(_._1 == 1L).toSeq
    assert(got.size == got.distinct.size, s"duplicate transitions: $got")
    assert(got.toSet == Set(
      (1L, 1, "view", t("2024-01-01T10:00:00Z")),
      (1L, 2, "click", t("2024-01-01T10:05:00Z")),
      (1L, 3, "purchase", t("2024-01-01T10:10:00Z"))),
      s"restart lost or duplicated fold state: $got")
  }

  /** Shared restart harness for the other BufferedFold twins. */
  private def restartRun(op: org.apache.spark.sql.DataFrame =>
                             org.apache.spark.sql.DataFrame,
                         phase1: Seq[Ev], phase2: Seq[Seq[Ev]])
      : org.apache.spark.sql.DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft-restart")
    val inDir = s"$root/in"; val outDir = s"$root/out"; val cp = s"$root/cp"
    def drop(evs: Seq[Ev]): Unit =
      evs.toDF().coalesce(1).write.mode("append").parquet(inDir)
    def runOnce(): Unit = {
      val src = spark.readStream.schema(EventStreams.schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
      val q = op(src).writeStream
        .format("parquet").option("checkpointLocation", cp)
        .option("path", outDir).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    drop(phase1)
    runOnce() // buffers everything, checkpoints, stops
    phase2.foreach(drop)
    runOnce() // must resume from the recovered buffer + watermark
    spark.read.parquet(outDir)
  }

  test("retentionStream continues exactly across a checkpointed restart") {
    // cohort-rebase disorder buffered at stop time: the later event
    // arrives first; the restart must still assign the 2024-01-01
    // cohort from the recovered buffer, once
    val got = restartRun(df => EventStreams.retentionStream(df),
      Seq(ev(1, "2024-01-10T12:00:00Z", 1, "click"),
          ev(2, "2024-01-02T09:00:00Z", 1, "click")),
      (0 to 3).map(i => Seq(ev(90 + i, s"2024-02-0${i + 1}T00:00:00Z", 9, "click"))))
      .as[(Long, String, Long)].collect().filter(_._1 == 1L).toSeq
    assert(got.size == got.distinct.size, s"duplicate cohort rows: $got")
    assert(got.toSet == Set((1L, "2024-01-01", 0L), (1L, "2024-01-01", 1L)),
      s"restart lost or duplicated retention state: $got")
  }

  test("scd2Stream continues exactly across a checkpointed restart") {
    val rows = restartRun(df => EventStreams.scd2Stream(df),
      Seq(ev(2, "2024-01-01T10:10:00Z", 1, "click"),
          ev(1, "2024-01-01T10:00:00Z", 1, "view")),
      (0 to 3).map(i => Seq(ev(90 + i, s"2024-01-0${i + 2}T00:00:00Z", 9, "view"))))
      .as[(Long, Long, String, String, String, Boolean)].collect()
      .filter(_._1 == 1L).toSeq
    assert(rows.size == rows.distinct.size, s"duplicate interval rows: $rows")
    // CDC-sink materialization per (user, event_id): the closed
    // re-emission supersedes the open one (file read order is not an
    // arrival order across restarts, so pick by content, not index)
    val view = rows.groupBy(r => (r._1, r._2))
      .map { case (_, v) => v.find(!_._6).getOrElse(v.head) }.toSet
    assert(view == Set(
      (1L, 1L, "view", "2024-01-01 10:00:00.000000",
        "2024-01-01 10:10:00.000000", false),
      (1L, 2L, "click", "2024-01-01 10:10:00.000000",
        "9999-12-31 00:00:00.000000", true)),
      s"restart lost or duplicated interval state: $rows")
  }

  test("noveltyStream continues exactly across a checkpointed restart (both state stores)") {
    // the chained pipeline checkpoints TWO stateful operators — the
    // per-bigram dedup store and the window store; a restart must
    // recover both: post-restart docs may not re-own PRE-restart
    // bigrams, and no window fires twice
    def ts(min: Int) = new Timestamp(min * 60000L)
    val root = java.nio.file.Files.createTempDirectory("graft-restart-nv")
    val inDir = s"$root/in"; val outDir = s"$root/out"; val cp = s"$root/cp"
    def drop(d: SDoc): Unit =
      Seq(d).toDF().coalesce(1).write.mode("append").parquet(inDir)
    def runOnce(): Unit = {
      val src = spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[SDoc].schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
      val q = graft.streaming.DocStreams
        .noveltyStream(src, "1000 minutes", "1 hour").writeStream
        .format("parquet").option("checkpointLocation", cp)
        .option("path", outDir).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    drop(SDoc(1, "a b c", ts(1))) // owns "a b", "b c"
    drop(SDoc(2, "a b d", ts(2))) // owns "b d"
    runOnce()                     // STOP with both stores checkpointed
    drop(SDoc(3, "a b", ts(3)))   // nothing novel — only if the dedup
                                  // store recovered "a b"
    drop(SDoc(4, "b d e", ts(4))) // "b d" pre-restart, "d e" new -> 1
    drop(SDoc(99, "zz zz2", ts(50000))) // closes the [0, 60) window
    runOnce()
    val got = spark.read.parquet(outDir)
      .select("doc_id", "n_bg", "novel").as[(Long, Long, Long)]
      .collect().filter(_._1 < 99).toSeq
    assert(got.size == got.distinct.size, s"window fired twice: $got")
    assert(got.toSet == Set((1L, 2L, 2L), (2L, 2L, 1L), (4L, 2L, 1L)),
      s"restart lost or re-owned dedup state: $got")
  }
}
