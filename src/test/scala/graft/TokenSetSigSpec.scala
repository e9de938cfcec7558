package graft

import graft.functions.TokenSetSig
import graft.ops.Cols
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused native token-set signature must be bit-identical to the
  * md5/array_join/array_sort/array_distinct/split composition it
  * replaces (which the DuckDB oracles replay). */
class TokenSetSigSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches the HOF composition on the real corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val native = docs.select(col("doc_id"), Cols.tokenSetSig(col("text")).as("sig"))
    val hof = docs.select(col("doc_id"), Cols.tokenSetSigHof(col("text")).as("sig"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("matches on edge fixtures incl. empties, repeats, and non-ASCII order") {
    val rows = Seq(
      "",                        // md5 of empty join
      "one",
      "b a c a b",               // dedup + sort
      "a  b",                    // double space -> empty token sorts first
      " lead", "trail ",
      "z é a 世 b"      // non-ASCII: binary UTF-8 sort order
    ).toDF("text")
    val native = rows.select(col("text"), Cols.tokenSetSig(col("text")).as("sig"))
      .as[(String, String)].collect().toMap
    val hof = rows.select(col("text"), Cols.tokenSetSigHof(col("text")).as("sig"))
      .as[(String, String)].collect().toMap
    assert(native == hof, s"native=$native hof=$hof")
  }
}
