package graft
object ModProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    // h = 2^32-1 (max base hash), worst-case coefficients i=15
    spark.sql("SELECT (4294967295L * 1000033 + 131130) % 4294967296 AS m").show()
    spark.stop()
  }
}
