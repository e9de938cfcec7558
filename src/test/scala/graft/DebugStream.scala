package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.schema.Protocol._
import CommitFixtures._

/** Scratch: inspect the streaming interval join step by step. */
object DebugStream {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val commits = MemoryStream[Commit]
    val geos = MemoryStream[CommitGeo]

    val ts = col("commit.committer.date")
    val javaFiles = commits.toDF()
      .select(col("sha"), ts.as("c_ts"), col("files"))
      .withWatermark("c_ts", "0 seconds")
      .select(col("sha"), col("c_ts"), explode(col("files")).as("file"))
      .filter(col("file.filename").endsWith(".java"))
      .select(col("sha"), col("c_ts"), col("file.changes").as("changes"))
    val geoW = geos.toDF().withWatermark("createdAt", "0 seconds")
    val joined = javaFiles.join(geoW,
      javaFiles("sha") === geoW("sha") &&
        geoW("createdAt") >= col("c_ts") - expr("INTERVAL 1 HOUR") &&
        geoW("createdAt") <= col("c_ts") + expr("INTERVAL 30 MINUTE"))

    val q = joined.writeStream.format("memory").queryName("dbg")
      .outputMode("append").start()

    commits.addData(commit("s1", t("2019-06-26T12:00:00Z"),
      files = Seq(file(Some("A.java"), Some("modified"), changes = 5))))
    geos.addData(
      geo("s1", t("2019-06-26T11:00:00Z"), "Europe"),
      geo("s1", t("2019-06-26T12:30:00Z"), "Asia"))
    q.processAllAvailable()
    println("== join-only after batch1: " + spark.table("dbg").count())

    for (i <- 2 to 4) {
      commits.addData(commit(s"s$i", t(s"2019-07-${10 + i}T00:00:00Z"), files = Seq(file(Some("Close.java"), Some("modified"), changes = 1))))
      geos.addData(geo(s"s$i", t(s"2019-07-${10 + i}T00:00:00Z"), "Europe"))
      q.processAllAvailable()
      val p = q.lastProgress
      println(s"== join-only after closing batch $i: rows=" + spark.table("dbg").count()
        + " watermark=" + p.eventTime.get("watermark"))
    }
    q.stop()
    spark.stop()
  }
}
