package graft

import graft.functions.{SimHashAgg, SimHashArr}
import graft.ops.Cols
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The per-row fused SimHash must equal the explode → md5 →
  * SimHashAgg aggregate path it replaces (whose 32-column twin the
  * DuckDB oracle replays). */
class SimHashArrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches the aggregate path on real token sets") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val viaAgg = docs
      .select(col("doc_id"), explode(Cols.tokenSet(col("text"))).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
      .groupBy(col("doc_id"))
      .agg(SimHashAgg.simhashAgg(col("h")).as("sh"))
    val viaArr = docs.select(col("doc_id"),
      SimHashArr.simhashArr(Cols.tokenSet(col("text"))).as("sh"))
    assert(viaArr.exceptAll(viaAgg).isEmpty && viaAgg.exceptAll(viaArr).isEmpty)
  }

  test("empty array yields null; single token yields its own bit pattern") {
    val df = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq.empty[String])
    ).toDF("id", "arr")
      .select(col("id"), SimHashArr.simhashArr(col("arr")).as("sh"))
    val got = df.collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(2L).isEmpty, "empty array must yield null")
    assert(got(1L).nonEmpty)
  }
}
