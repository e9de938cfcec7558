package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Semantics pinned for the round-2 operators: pivot zero-fill,
  * continuous-percentile interpolation, window frame bounds, and the
  * BPE-ish pre-tokenizer split. */
class NewOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pivot with explicit values zero-fills missing combinations") {
    val df = Seq((1L, "click"), (1L, "click"), (2L, "view")).toDF("uid", "et")
    val got = df.groupBy($"uid").pivot("et", Seq("click", "view"))
      .agg(count(lit(1)))
      .select($"uid", coalesce($"click", lit(0L)).as("c"),
              coalesce($"view", lit(0L)).as("v"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 0L), (2L, 0L, 1L)))
  }

  test("percentile interpolates continuously: median of {1,2,3,4} is 2.5") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val Array(p50) = df.agg(percentile($"x", lit(0.5))).as[Double].collect()
    assert(p50 == 2.5)
    val Array(p25) = df.agg(percentile($"x", lit(0.25))).as[Double].collect()
    assert(p25 == 1.75) // (n-1)*p = 0.75 -> 1 + 0.75*(2-1)
  }

  test("trailing 3-row frame sums exactly the last <=3 rows") {
    val df = Seq((1L, 1, 10.0), (1L, 2, 20.0), (1L, 3, 30.0), (1L, 4, 40.0))
      .toDF("k", "seq", "v")
    val w = Window.partitionBy($"k").orderBy($"seq").rowsBetween(-2, 0)
    val got = df.withColumn("s", sum($"v").over(w))
      .select($"seq", $"s").as[(Int, Double)].collect().toMap
    assert(got == Map(1 -> 10.0, 2 -> 30.0, 3 -> 60.0, 4 -> 90.0))
  }

  test("BPE-ish pre-tokenizer splits letter/digit/punct runs") {
    val toks = regexp_extract_all(col("t"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"), lit(0))
    val got = Seq("ab12 cd!? 7").toDF("t")
      .select(toks).as[Seq[String]].collect().head
    assert(got == Seq("ab", "12", "cd", "!?", "7"))
  }
}
