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
}
