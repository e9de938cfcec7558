package graft

import graft.functions.MinHashAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The single-buffer MinHash aggregate must be bit-identical to the
  * sixteen-separate-min construction it replaces (the oracle replays
  * the latter), including under shuffle merges and null inputs. */
class MinHashAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Mod32 = 4294967296L
  private def mhA(i: Int): Long = 1000003L + 2L * i
  private def mhB(i: Int): Long = 12345L + 7919L * i

  test("matches the 16-column min() construction on real tokens") {
    val toks = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id").as("rep"),
        explode(graft.ops.Cols.tokenSet(col("text"))).as("tok"))
      .withColumn("h",
        conv(substring(md5(concat(lit("t:"), col("tok"))), 1, 8), 16, 10)
          .cast("long"))
      .repartition(7, col("rep")) // force partial/merge paths
    val viaAgg = toks.groupBy(col("rep"))
      .agg(MinHashAgg.minhashAgg(col("h")).as("mhs"))
      .select(col("rep") +: (0 until 16).map(i =>
        element_at(col("mhs"), i + 1).as(s"mh$i")): _*)
    val mins = (0 until 16).map { i =>
      min((col("h") * mhA(i) + mhB(i)) % Mod32).as(s"mh$i")
    }
    val viaMins = toks.groupBy(col("rep")).agg(mins.head, mins.tail: _*)
    assert(viaAgg.exceptAll(viaMins).isEmpty && viaMins.exceptAll(viaAgg).isEmpty)
  }

  test("null hashes are ignored; empty group yields the identity buffer") {
    val df = Seq((1L, Some(42L)), (1L, None), (2L, None))
      .toDF("rep", "h")
    val out = df.groupBy(col("rep"))
      .agg(MinHashAgg.minhashAgg(col("h")).as("mhs"))
      .select(col("rep"), element_at(col("mhs"), 1).as("mh0"))
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == (42L * mhA(0) + mhB(0)) % Mod32)
    assert(out(2L) == Long.MaxValue) // no non-null input
  }
}
