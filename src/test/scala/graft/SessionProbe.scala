package graft
import org.apache.spark.sql.functions._
object SessionProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = Seq( // u1: exactly 30m gap -> 2 sessions; u2: 29m59s -> 1 session
      (1L, java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T10:00:00Z"))),
      (1L, java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T10:30:00Z"))),
      (2L, java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T10:00:00Z"))),
      (2L, java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T10:29:59Z")))
    ).toDF("user_id", "ts")
    rows.groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"))
      .select($"user_id", $"session_window.start", $"n").orderBy("user_id", "start").show(false)
    spark.stop()
  }
}
