package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object MhProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def time(n: String)(f: => Long): Unit = {
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        val c = f
        println(f"$n run$r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
      }
    }
    // A: per-row native
    time("native ") {
      docs.select(col("doc_id"),
        graft.functions.MinHashArr.minhashArr(graft.ops.Cols.tokenSet(col("text")), "t:").as("mhs"))
        .filter(col("mhs").isNotNull).count()
    }
    // B: explode + agg
    time("agg    ") {
      docs.select(col("doc_id").as("rep"), explode(graft.ops.Cols.tokenSet(col("text"))).as("tok"))
        .withColumn("h", conv(substring(md5(concat(lit("t:"), col("tok"))), 1, 8), 16, 10).cast("long"))
        .groupBy(col("rep"))
        .agg(graft.functions.MinHashAgg.minhashAgg(col("h"), 16).as("mhs")).count()
    }
    // C: native with repartition first
    time("nat-rep") {
      docs.repartition(col("doc_id")).select(col("doc_id"),
        graft.functions.MinHashArr.minhashArr(graft.ops.Cols.tokenSet(col("text")), "t:").as("mhs"))
        .filter(col("mhs").isNotNull).count()
    }
    spark.stop()
  }
}
