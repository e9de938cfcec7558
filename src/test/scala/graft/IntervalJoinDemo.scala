package graft
import graft.ops.IntervalJoin
import org.apache.spark.sql.functions._
/** Dev demo: bucketed interval join on real events with a degenerate
  * 1-second bucket (hundreds of buckets per left row) and a probe of
  * the invalid-argument path. */
object IntervalJoinDemo {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    val a = e.filter($"event_type" === "purchase")
      .select($"user_id".as("k"), $"ts".as("lts"), $"event_id".as("l_id"))
    val b = e.select($"user_id".as("k"), $"ts".as("rts"), $"event_id".as("r_id"))
    val naive = a.join(b.withColumnRenamed("k","k2"),
      $"k"===$"k2" && $"rts" >= $"lts" - expr("INTERVAL 3600 SECOND") &&
        $"rts" <= $"lts" + expr("INTERVAL 1800 SECOND")).count()
    val tiny = IntervalJoin.bucketed(a, b, "k", "lts", "rts", -3600, 1800, 1).count()
    val wide = IntervalJoin.bucketed(a, b, "k", "lts", "rts", -3600, 1800, 86400).count()
    println(s"naive=$naive bucket1s=$tiny bucket1d=$wide equal=${naive==tiny && naive==wide}")
    try IntervalJoin.bucketed(a, b, "k", "lts", "rts", 1800, -3600, 60)
    catch { case e: IllegalArgumentException => println("inverted bounds rejected") }
    spark.stop()
  }
}
