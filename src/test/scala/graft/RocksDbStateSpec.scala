package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.CommitStreams
import CommitFixtures._

/** The RocksDB state-store provider (flag `SPARK_GRAFT_STATE_STORE`,
  * [[Sessions.stateStoreProviders]]) — the bounded-heap scale path —
  * must run the keyed-state operators with identical results to the
  * default on-heap store. providerClass binds at query start, so the
  * suite session can flip it per test. */
class RocksDbStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val key = "spark.sql.streaming.stateStore.providerClass"

  test("per-record running counter is exact under the RocksDB store") {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, Sessions.stateStoreProviders("rocksdb"))
    try {
      val in = MemoryStream[graft.schema.Protocol.Commit]
      val q = CommitStreams.runningCountsPerRecord(in.toDF()).toDF("ext", "n")
        .writeStream.format("memory").queryName("rocks1")
        .outputMode(OutputMode.Append).start()
      in.addData(commit("a", t("2019-06-26T10:00:00Z"),
        files = Seq(file(Some("A.java")), file(Some("B.java")))))
      q.processAllAvailable()
      in.addData(commit("b", t("2019-06-26T11:00:00Z"),
        files = Seq(file(Some("C.java")))))
      q.processAllAvailable()
      val got = spark.table("rocks1").as[(String, Long)].collect().toSet
      assert(got == Set(("java", 1L), ("java", 2L), ("java", 3L)))
      q.stop()
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("CEP state machine matches identically under the RocksDB store") {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, Sessions.stateStoreProviders("rocksdb"))
    try {
      val in = MemoryStream[graft.schema.Protocol.Commit]
      val q = CommitStreams.addedThenRemoved(in.toDF()).toDF("repo", "filename")
        .writeStream.format("memory").queryName("rocks2")
        .outputMode(OutputMode.Append).start()
      in.addData(commit("a1", t("2019-06-26T10:00:00Z"),
        files = Seq(file(Some("doomed.txt"), Some("added")))))
      q.processAllAvailable()
      in.addData(commit("r1", t("2019-06-26T20:00:00Z"),
        files = Seq(file(Some("doomed.txt"), Some("removed")))))
      q.processAllAvailable()
      val got = spark.table("rocks2").as[(String, String)].collect().toSeq
      assert(got == Seq(("apache/flink", "doomed.txt")))
      q.stop()
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("domain-cap admission state is identical under the RocksDB store") {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, Sessions.stateStoreProviders("rocksdb"))
    try {
      val rich = "the quick brown fox jumps over a lazy dog and then " +
        "rests of course with ample unique words in this sentence"
      val docs =
        (0L until 12L).map(i =>
          CapDoc(i, if (i % 3 == 0) rich else "x x x x x x", "en", "hot", 1L)) ++
        (100L until 103L).map(i => CapDoc(i, rich, "en", "small", 1L))
      val in = MemoryStream[CapDoc]
      val q = graft.streaming.DocStreams.domainCapStream(in.toDF(), k = 3)
        .writeStream.format("memory").queryName("rocksCap")
        .outputMode(OutputMode.Append).start()
      val shuffled = docs.sortBy(d => (-(d.doc_id % 3), d.doc_id))
      in.addData(shuffled.take(6)); q.processAllAvailable()
      in.addData(shuffled.drop(6)); q.processAllAvailable()
      val events = spark.table("rocksCap")
        .as[(Long, String, Int, String)].collect()
      def ids(ev: String) = events.filter(_._4 == ev).map(_._1).toSet
      val live = ids("admit") -- ids("evict")
      // same batch-kept-set contract DocStreamsSpec pins on the
      // default provider — flipping the store must not perturb it
      val batchKept = graft.queries.Extensions.domainCapped(
        docs.toDF("doc_id", "text", "lang", "source", "n_chars"), 3, 2)
        .filter("kept").select("doc_id").as[Long].collect().toSet
      assert(live == batchKept,
        s"rocksdb live set $live != batch kept $batchKept")
      assert(ids("admit").size + ids("reject").size == docs.size)
      q.stop()
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("x50 latest-state upsert view is identical under the RocksDB store") {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, Sessions.stateStoreProviders("rocksdb"))
    try {
      val in = MemoryStream[Ev]
      val q = graft.streaming.EventStreams.latestState(in.toDF())
        .writeStream.format("memory").queryName("rocksCdc")
        .outputMode("update").start()
      def state() = spark.table("rocksCdc")
        .as[(Long, String, Double, java.sql.Timestamp, Boolean)].collect()
        .groupBy(_._1).map { case (u, rows) =>
          u -> rows.maxBy(_._4.getTime) }.toMap
      def ts(iso: String) =
        java.sql.Timestamp.from(java.time.Instant.parse(iso))
      in.addData(
        Ev(1, ts("2024-01-01T10:00:00Z"), 7, "view", 1.0, "{}"),
        Ev(2, ts("2024-01-01T10:05:00Z"), 7, "purchase", 9.0, "{}"))
      q.processAllAvailable()
      // late-arriving older event must not overwrite; newer tombstone must
      in.addData(Ev(3, ts("2024-01-01T10:01:00Z"), 7, "click", 2.0, "{}"))
      q.processAllAvailable()
      assert(state()(7L)._2 == "purchase")
      in.addData(Ev(4, ts("2024-01-01T10:30:00Z"), 7, "error", 0.0, "{}"))
      q.processAllAvailable()
      val s = state()
      assert(s(7L)._2 == "error" && s(7L)._5, s"tombstone must win: $s")
      q.stop()
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  private def tsOf(iso: String) =
    java.sql.Timestamp.from(java.time.Instant.parse(iso))

  test("funnel buffered fold + timeouts are identical under the RocksDB store") {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, Sessions.stateStoreProviders("rocksdb"))
    try {
      val in = MemoryStream[Ev]
      val q = graft.streaming.EventStreams.funnelStream(in.toDF())
        .writeStream.format("memory").queryName("rocksFun")
        .outputMode("append").start()
      // the FunnelStreamSpec disorder fixture: click arrives before
      // its user's earlier view; sentinels drain via timeouts
      in.addData(Ev(1, tsOf("2024-01-01T10:05:00Z"), 1, "click", 1.0, "{}"),
                 Ev(2, tsOf("2024-01-01T10:00:00Z"), 1, "view", 1.0, "{}"))
      q.processAllAvailable()
      in.addData(Ev(3, tsOf("2024-01-01T10:10:00Z"), 1, "purchase", 1.0, "{}"))
      q.processAllAvailable()
      Seq("12:00", "13:00", "14:00").zipWithIndex.foreach { case (h, i) =>
        in.addData(Ev(90 + i, tsOf(s"2024-01-01T$h:00Z"), 9, "view", 1.0, "{}"))
        q.processAllAvailable()
      }
      val got = spark.table("rocksFun")
        .as[(Long, Int, String, java.sql.Timestamp)].collect()
        .filter(_._1 == 1L).toSet
      assert(got == Set(
        (1L, 1, "view", tsOf("2024-01-01T10:00:00Z")),
        (1L, 2, "click", tsOf("2024-01-01T10:05:00Z")),
        (1L, 3, "purchase", tsOf("2024-01-01T10:10:00Z"))))
      q.stop()
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("retention cohort state is identical under the RocksDB store") {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, Sessions.stateStoreProviders("rocksdb"))
    try {
      val in = MemoryStream[Ev]
      val q = graft.streaming.EventStreams.retentionStream(in.toDF())
        .writeStream.format("memory").queryName("rocksRet")
        .outputMode("append").start()
      // cohort-rebase fixture: the earlier event arrives second
      in.addData(Ev(1, tsOf("2024-01-10T12:00:00Z"), 1, "click", 1.0, "{}"),
                 Ev(2, tsOf("2024-01-02T09:00:00Z"), 1, "click", 1.0, "{}"))
      q.processAllAvailable()
      Seq("2024-02-01", "2024-02-02", "2024-02-03").zipWithIndex.foreach {
        case (d, i) =>
          in.addData(Ev(90 + i, tsOf(s"${d}T00:00:00Z"), 9, "click", 1.0, "{}"))
          q.processAllAvailable()
      }
      val got = spark.table("rocksRet")
        .as[(Long, String, Long)].collect().filter(_._1 == 1L).toSet
      assert(got == Set((1L, "2024-01-01", 0L), (1L, "2024-01-01", 1L)))
      q.stop()
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("SCD2 interval state is identical under the RocksDB store") {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, Sessions.stateStoreProviders("rocksdb"))
    try {
      val in = MemoryStream[Ev]
      val q = graft.streaming.EventStreams.scd2Stream(in.toDF())
        .writeStream.format("memory").queryName("rocksScd")
        .outputMode("append").start()
      // the Scd2StreamSpec disorder fixture: click arrives before the
      // earlier view in the same batch; sentinels drain the buffer
      in.addData(Ev(2, tsOf("2024-01-01T10:10:00Z"), 1, "click", 1.0, "{}"),
                 Ev(1, tsOf("2024-01-01T10:00:00Z"), 1, "view", 1.0, "{}"))
      q.processAllAvailable()
      Seq("2024-01-02", "2024-01-03", "2024-01-04").zipWithIndex.foreach {
        case (d, i) =>
          in.addData(Ev(90 + i, tsOf(s"${d}T00:00:00Z"), 9, "view", 1.0, "{}"))
          q.processAllAvailable()
      }
      val rows = spark.table("rocksScd")
        .as[(Long, Long, String, String, String, Boolean)].collect()
        .filter(_._1 == 1L).toSeq
      // CDC-sink materialization: latest emission per (user, event_id)
      val view = rows.zipWithIndex.groupBy { case (r, _) => (r._1, r._2) }
        .map { case (_, v) => v.maxBy(_._2)._1 }.toSet
      assert(view == Set(
        (1L, 1L, "view", "2024-01-01 10:00:00.000000",
          "2024-01-01 10:10:00.000000", false),
        (1L, 2L, "click", "2024-01-01 10:10:00.000000",
          "9999-12-31 00:00:00.000000", true)), s"rows: $rows")
      q.stop()
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("novelty stream (chained dedup -> windowed agg) is identical under the RocksDB store") {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, Sessions.stateStoreProviders("rocksdb"))
    try {
      def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
      val in = MemoryStream[SDoc]
      val q = graft.streaming.DocStreams.noveltyStream(in.toDF(), "2 hours", "1 hour")
        .writeStream.format("memory").queryName("rocksNv")
        .outputMode("append").start()
      in.addData(SDoc(1, "a b c", ts(1))); q.processAllAvailable()
      in.addData(SDoc(2, "a b d", ts(2))); q.processAllAvailable()
      in.addData(SDoc(3, "a b", ts(3))); q.processAllAvailable()
      in.addData(SDoc(99, "zz zz2", ts(10000))); q.processAllAvailable()
      val got = spark.table("rocksNv")
        .select("doc_id", "n_bg", "novel").as[(Long, Long, Long)]
        .collect().filter(_._1 < 99).sortBy(_._1)
      // the DocStreamsSpec fixture verbatim: both stateful stages
      // (dedup state + window state) ride the RocksDB provider
      assert(got.toSeq == Seq((1L, 2L, 2L), (2L, 2L, 1L)), got.toSeq)
      q.stop()
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}
