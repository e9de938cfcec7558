package graft

import org.apache.spark.sql.SparkSession

/** Dev demo (own JVM): prove the spark.sql.extensions STATIC-conf
  * deployment route — the only code here is configuration. */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql(
      """SELECT quantized_cosine(array(CAST(0.5 AS FLOAT)), array(CAST(0.5 AS FLOAT))) AS c""")
      .show()
    spark.stop()
  }
}
