package graft

import graft.queries.Extensions
import org.scalatest.funsuite.AnyFunSuite

/** x49 BPE merge-training semantics on corpora where every round's
  * winner is known by hand. */
class BpeMergesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def merges(texts: Seq[String], rounds: Int) =
    Extensions.bpeMerges(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), rounds)
      .as[(Long, String, Long)].collect().sortBy(_._1)

  test("round 1 picks the most frequent adjacent pair; round 2 sees rewritten sequences") {
    val got = merges(Seq("a b a b c", "a b x"), rounds = 2)
    // round 1: (a,b) occurs 3x -> merge "ab"
    assert(got(0) == (1L, "ab", 3L))
    // round 2 runs over "ab ab c" / "ab x": (ab,ab), (ab,c), (ab,x)
    // all count 1 -> tie broken to the smallest pair string: ab+ab
    assert(got(1) == (2L, "abab", 1L))
  }

  test("overlapping runs count every adjacency but merge greedily left-to-right") {
    val got = merges(Seq("a a a"), rounds = 2)
    // (a,a) has TWO adjacencies in "a a a"
    assert(got(0) == (1L, "aa", 2L))
    // greedy left-to-right rewrite gives "aa a", not "a aa":
    // round 2's only pair is (aa, a)
    assert(got(1) == (2L, "aaa", 1L))
  }

  test("encode applies the learned merges: known before/after counts") {
    val got = Extensions.bpeEncodeCounts(
      Seq((0L, "a b a b c"), (1L, "a b x")).toDF("doc_id", "text"), rounds = 2)
      .as[(Long, Long, Long)].collect()
      .map { case (id, b, a) => id -> (b, a) }.toMap
    // merges: "ab" then "abab"; doc 0: a b a b c -> ab ab c -> abab c
    assert(got(0L) == (5L, 2L), s"doc 0 must compress 5 -> 2: $got")
    // doc 1: a b x -> ab x (the round-2 merge doesn't occur in it)
    assert(got(1L) == (3L, 2L))
  }

  test("merged symbols are atomic in later rounds") {
    val got = merges(Seq("x y z w", "x y z q"), rounds = 2)
    // round 1: (x,y) and (y,z) both 2 -> tie to smallest: "x<sep>y"
    assert(got(0) == (1L, "xy", 2L))
    // rewritten: "xy z w" / "xy z q" -> (xy,z) wins with 2; the pair
    // (y,z) no longer exists because xy is one symbol now
    assert(got(1) == (2L, "xyz", 2L))
  }
}
