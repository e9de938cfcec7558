package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Extensions

/** Hand-computed pin of x77's whole-bit PPMI over forward skip-gram
  * pairs at distance 1 and 2: pair extraction, both marginals, and
  * bitlength(N·c_ab·2^20 div (c_a·c_b)) − 21 including a negative-PMI
  * floor. */
class X77PmiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], minCount: Long = 1L) =
    Extensions.ppmiPairs(docs.toDF("doc_id", "text"), minCount)
      .as[(String, String, Long, Long)].collect().toSet

  // corpus: "a b c", "a b", "b c a"
  //   pairs (off 1 + off 2): a b:2, b c:2, a c:1, c a:1, b a:1  (N=7)
  //   left marginals  c_a: a:3, b:3, c:1
  //   right marginals c_b: b:2, c:3, a:2
  private val docs = Seq(1L -> "a b c", 2L -> "a b", 3L -> "b c a")

  test("hand-computed whole-bit PMI, negative floor included") {
    assert(run(docs) == Set(
      // 7*2*2^20 div 6 = 2446677 -> 22 bits -> +1   (log2 14/6 = 1.22)
      ("a", "b", 2L, 1L),
      // 7*2*2^20 div 9 = 1631118 -> 21 bits ->  0   (log2 14/9 = 0.64)
      ("b", "c", 2L, 0L),
      // 7*1*2^20 div 9 =  815559 -> 20 bits -> -1   (log2 7/9 = -0.36)
      ("a", "c", 1L, -1L),
      // 7*1*2^20 div 2 = 3670016 -> 22 bits -> +1   (log2 3.5  = 1.81)
      ("c", "a", 1L, 1L),
      // 7*1*2^20 div 6 = 1223338 -> 21 bits ->  0   (log2 7/6  = 0.22)
      ("b", "a", 1L, 0L)))
  }

  test("minCount filters pair TYPES; marginals still count everything") {
    val got = run(docs, minCount = 2L)
    assert(got == Set(("a", "b", 2L, 1L), ("b", "c", 2L, 0L)))
  }

  test("degenerate docs emit nothing and perturb nothing") {
    val noisy = docs ++ Seq(4L -> "solo", 5L -> "")
    assert(run(noisy) == run(docs))
  }
}
