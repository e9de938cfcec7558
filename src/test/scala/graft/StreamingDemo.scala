package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.CommitStreams
import graft.schema.Protocol._
import CommitFixtures._

/** Dev demo: drive the streaming layer live and print what each sink
  * holds after each micro-batch (runtime evidence, not assertions). */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // 1. update-mode running counter
    val in1 = MemoryStream[Commit]
    val q1 = CommitStreams.runningCounts(in1.toDF()).writeStream
      .format("memory").queryName("counts").outputMode("update").start()
    in1.addData(commit("a", t("2019-06-26T10:00:00Z"),
      files = Seq(file(Some("A.java")), file(Some("B.scala")))))
    q1.processAllAvailable()
    println("== running counts after batch 1 ==")
    spark.table("counts").show()
    in1.addData(commit("b", t("2019-06-26T11:00:00Z"), files = Seq(file(Some("C.java")))))
    q1.processAllAvailable()
    println("== running counts after batch 2 (update rows appended to sink) ==")
    spark.table("counts").show()
    q1.stop()

    // 2. per-record emission
    val in2 = MemoryStream[Commit]
    val q2 = CommitStreams.runningCountsPerRecord(in2.toDF()).toDF("ext", "n")
      .writeStream.format("memory").queryName("perrec").outputMode("append").start()
    in2.addData(commit("a", t("2019-06-26T10:00:00Z"),
      files = Seq(file(Some("A.java")), file(Some("B.java")), file(Some("C.scala")))))
    q2.processAllAvailable()
    println("== per-record running emission ==")
    spark.table("perrec").orderBy("ext", "n").show()
    q2.stop()

    // 3. CEP with a probe: same-file re-add after match, plus an
    //    unknown status that must be ignored
    val in3 = MemoryStream[Commit]
    val q3 = CommitStreams.addedThenRemoved(in3.toDF()).toDF("repo", "filename")
      .writeStream.format("memory").queryName("cep").outputMode("append").start()
    val mk = (sha: String, ts0: String, name: String, status: String) =>
      commit(sha, t(ts0), files = Seq(file(Some(name), Some(status))))
    in3.addData(
      mk("a1", "2019-06-26T10:00:00Z", "f.txt", "added"),
      mk("x1", "2019-06-26T10:30:00Z", "f.txt", "renamed")) // ignored status
    q3.processAllAvailable()
    in3.addData(mk("r1", "2019-06-26T12:00:00Z", "f.txt", "removed"))
    q3.processAllAvailable()
    in3.addData( // re-add then remove again -> second independent match
      mk("a2", "2019-06-26T13:00:00Z", "f.txt", "added"),
      mk("r2", "2019-06-26T14:00:00Z", "f.txt", "removed"))
    q3.processAllAvailable()
    println("== CEP matches (expect 2 rows for f.txt, renamed ignored) ==")
    spark.table("cep").show()
    q3.stop()
    spark.stop()
  }
}
