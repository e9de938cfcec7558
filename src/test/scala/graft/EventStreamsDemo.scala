package graft

import graft.streaming.EventStreams

/** Dev demo: drive the parquet file-stream source against a real
  * testdata drop directory — the production-shaped ingestion path. */
object EventStreamsDemo {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    // simulate a landing directory: copy the real events file in
    val dir = java.nio.file.Files.createTempDirectory("events-drop")
    java.nio.file.Files.copy(
      java.nio.file.Path.of("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("part-000.parquet"))
    // ts is TIMESTAMP_NS in testdata: nanosAsLong gives LongType, so
    // adapt the schema for the raw file (the normalization lives in
    // Tables for batch; here we stream the raw file with ts as ns)
    val raw = spark.readStream
      .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(dir.toString)
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    val q = EventStreams.runningTypeCounts(raw).writeStream
      .format("memory").queryName("filecounts").outputMode("update").start()
    q.processAllAvailable()
    println("== file-stream running counts over real events.parquet ==")
    spark.table("filecounts").orderBy("event_type").show()
    q.stop()

    val q2 = EventStreams.userSessions(raw).writeStream
      .format("memory").queryName("filesess").outputMode("append").start()
    q2.processAllAvailable()
    println("== sessions emitted so far (watermark at max file ts) ==")
    println("closed sessions: " + spark.table("filesess").count())
    q2.stop()
    spark.stop()
  }
}
