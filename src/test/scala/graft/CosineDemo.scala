package graft

import graft.functions.QuantizedCosine
import org.apache.spark.sql.functions._

/** Dev demo: drive quantized_cosine through SQL and inspect codegen. */
object CosineDemo {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    QuantizedCosine.register(spark)
    Tables.embeddings(spark, "/root/testdata/sf0.001").createOrReplaceTempView("emb")

    println("== SQL call ==")
    spark.sql("""SELECT a.vec_id, b.vec_id AS other,
                   round(quantized_cosine(a.embedding, b.embedding), 4) AS cos
                 FROM emb a JOIN emb b ON a.vec_id = 0 AND b.vec_id IN (1,2,3)""")
      .show()

    println("== plan (expect WholeStageCodegen around the join+project) ==")
    val df = spark.sql(
      "SELECT quantized_cosine(a.embedding, b.embedding) c FROM emb a, emb b WHERE a.vec_id=0")
    df.explain("formatted")

    println("== type-mismatch probe ==")
    try spark.sql("SELECT quantized_cosine(1, 2)").collect()
    catch { case e: Exception =>
      println("error (expected): " + e.getMessage.linesIterator.next()) }
    spark.stop()
  }
}
