package graft
import org.apache.spark.sql.SparkSession
object X36Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    println("scan partitions: " + docs.rdd.getNumPartitions)
    val t0 = System.nanoTime()
    val bg = docs.select(explode(graft.queries.Extensions.bigramsExpr).as("bg"))
    println("explode count: " + bg.count() + " in " + (System.nanoTime()-t0)/1e9 + "s")
    val t1 = System.nanoTime()
    val cnt = bg.groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bg")).limit(20)
    println("top20: " + cnt.collectAsList().size + " in " + (System.nanoTime()-t1)/1e9 + "s")
    spark.stop()
  }
}
