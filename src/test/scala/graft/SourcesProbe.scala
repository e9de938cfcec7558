package graft

object SourcesProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val src = Tables.events(spark, "/root/testdata/sf0.001")
    src.printSchema()
    println(src.schema.map(f => f.name + ":" + f.dataType).mkString(" | "))
    spark.stop()
  }
}
