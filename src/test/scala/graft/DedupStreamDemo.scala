package graft
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStreams
import CommitFixtures.t
object DedupStreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.dedupStream(in.toDF(), "1 hour", Seq("props"))
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    def ev(id: Long, ts0: String, content: String) =
      Ev(id, t(ts0), id, "click", 1.0, content)
    in.addData(ev(1, "2024-01-01T10:00:00Z", "A"), ev(2, "2024-01-01T10:10:00Z", "A"),
               ev(3, "2024-01-01T10:20:00Z", "B"))
    q.processAllAvailable()
    in.addData(ev(4, "2024-01-01T10:30:00Z", "A")) // cross-batch dup, in horizon
    q.processAllAvailable()
    // probe: same content far BEYOND the horizon -> state expired -> passes again
    in.addData(ev(5, "2024-01-02T12:00:00Z", "A"))
    q.processAllAvailable()
    in.addData(ev(6, "2024-01-02T13:30:01Z", "x")) // advance watermark
    q.processAllAvailable()
    println("== kept event_ids (expect 1,3 then 5 after horizon expiry; 6 distinct) ==")
    spark.table("dd").select("event_id", "props").orderBy("event_id").show()
    q.stop(); spark.stop()
  }
}
