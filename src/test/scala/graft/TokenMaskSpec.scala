package graft

import graft.functions.TokenMask
import graft.queries.Extensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused native token mask must be bit-identical to the
  * aggregate/transform HOF construction it replaces (which the
  * DuckDB oracles replay bit for bit). */
class TokenMaskSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches the HOF construction on the real corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val native = docs.select(col("doc_id"), Extensions.maskExpr.as("mask"))
    val hof = docs.select(col("doc_id"), Extensions.maskHofExpr.as("mask"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("matches on edge fixtures; masks are OR-monotone under token addition") {
    val rows = Seq("", "one", "a b c", "a a a", "a  b", "é 世 a")
      .toDF("text")
    val native = rows.select(col("text"), Extensions.maskExpr.as("mask"))
      .as[(String, Long)].collect().toMap
    val hof = rows.select(col("text"), Extensions.maskHofExpr.as("mask"))
      .as[(String, Long)].collect().toMap
    assert(native == hof, s"native=$native hof=$hof")
    // superset of tokens -> superset of bits
    assert((native("a b c") & native("a a a")) == native("a a a"))
  }
}
