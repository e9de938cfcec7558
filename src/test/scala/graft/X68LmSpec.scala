package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Extensions

/** Hand-computed pin of x68's whole-bit surprisal arithmetic,
  * independent of the DuckDB oracle: add-V-smoothed bigram counts,
  * bits = floor(log2((c_w1 + V)/(c_bg + 1))), order-free integer
  * sums, one final IEEE division. */
class X68LmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("whole-bit surprisal on a two-doc corpus matches the hand computation") {
    // d1 "a b a b": bigram occurrences (a b)x2, (b a)x1
    // d2 "a b c":   (a b)x1, (b c)x1
    // c_bg: "a b"=3, "b a"=1, "b c"=1
    // c_w1: a=3 (all "a b"), b=2 ("b a"+"b c"); V = |{a, b}| = 2
    // bits("a b") = floor(log2(5/4))  = 0
    // bits("b a") = floor(log2(4/2))  = 1
    // bits("b c") = floor(log2(4/2))  = 1
    // d1: n_bg=3, bits_sum = 2*0 + 1*1 = 1, avg = 1/3
    // d2: n_bg=2, bits_sum = 0 + 1     = 1, avg = 1/2
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = Extensions.lmSurprisal(docs)
      .select("doc_id", "n_bg", "bits_sum", "avg_bits")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 3L, 1L, 1.0 / 3), (2L, 2L, 1L, 0.5)), got)
  }

  test("a rare continuation of a common context scores high bits") {
    // context 'x' appears 17 times; 16 continue to 'y', 1 to 'z'.
    // Only 'x' ever leads a bigram, so V = 1 and c_w1(x) = 17:
    // bits(x y) = floor(log2(18/17)) = 0 (the common continuation)
    // bits(x z) = floor(log2(18/2))  = 3 (the rare one)
    val docs = ((1L to 16L).map(i => (i, "x y")) :+ (17L, "x z"))
      .toDF("doc_id", "text")
    val got = Extensions.lmSurprisal(docs)
      .select("doc_id", "bits_sum").as[(Long, Long)].collect().toMap
    assert(got(1L) == 0L, got)
    assert(got(17L) == 3L, got)
  }

  test("single-token and empty docs produce no row") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    val got = Extensions.lmSurprisal(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(3L), got)
  }
}
