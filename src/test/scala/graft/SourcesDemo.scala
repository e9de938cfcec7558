package graft
import org.apache.spark.sql.types._
object SourcesDemo {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("srcdemo").toString
    val src = Tables.events(spark, "/root/testdata/sf0.001").limit(3)
    Sources.writeCsv(src, dir + "/csv")
    Sources.writeJson(src, dir + "/json")
    println("== raw CSV on disk ==")
    java.nio.file.Files.list(java.nio.file.Path.of(dir + "/csv")).forEach { p =>
      if (p.toString.endsWith(".csv"))
        java.nio.file.Files.readAllLines(p).forEach(l => println(l.take(120)))
    }
    println("== wrong-schema read probe (value as STRING) ==")
    val wrong = StructType(Seq(StructField("event_id", LongType),
      StructField("nope_missing", DoubleType)))
    val back = Sources.readCsv(spark, wrong, dir + "/csv")
    back.show(3)
    spark.stop()
  }
}
