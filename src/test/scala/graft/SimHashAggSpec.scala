package graft

import graft.functions.SimHashAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused single-buffer SimHash aggregate must be bit-identical to
  * the thirty-two-separate-`sum(when)` construction it replaces (the
  * DuckDB oracle replays the latter), including under shuffle merges
  * and null inputs.
  */
class SimHashAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The 32-column formulation x05 used before the fused aggregate. */
  private def viaColumns(th: org.apache.spark.sql.DataFrame) = {
    val bitAggs = (0 until 32).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$b")
    }
    val agg = th.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
    val sim = (0 until 32).map { b =>
      when(col(s"b$b") >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col("doc_id"), sim.as("simhash"))
  }

  test("matches the 32-column sum(when) construction on real tokens") {
    val th = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), explode(graft.ops.Cols.tokenSet(col("text"))).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
      .repartition(7, col("doc_id")) // force partial/merge paths
    val fused = th.groupBy(col("doc_id"))
      .agg(SimHashAgg.simhashAgg(col("h")).as("simhash"))
    val cols = viaColumns(th)
    assert(fused.exceptAll(cols).isEmpty && cols.exceptAll(fused).isEmpty)
  }

  test("null hashes are ignored; all-null group yields the all-ties signature") {
    val df = Seq((1L, Some(5L)), (1L, None), (2L, None)).toDF("doc_id", "h")
    val out = df.groupBy(col("doc_id"))
      .agg(SimHashAgg.simhashAgg(col("h")).as("simhash"))
      .as[(Long, Long)].collect().toMap
    // doc 1: single hash 5 = 0b101 → bits 0 and 2 vote +1, bit 1 votes
    // -1, bits 3..31 vote -1 → signature = 0b101
    assert(out(1L) == 5L)
    // doc 2: zero inputs → every counter is 0, ties resolve to 1
    assert(out(2L) == 0xFFFFFFFFL)
  }
}
