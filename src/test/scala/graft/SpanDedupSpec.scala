package graft

import graft.queries.Extensions
import org.scalatest.funsuite.AnyFunSuite

/** x45 exact duplicated-span semantics, pinned on a hand-built corpus
  * where every shared window is known by construction. */
class SpanDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def counts(docs: Seq[(Long, String)], w: Int) =
    Extensions.spanDedupCounts(docs.toDF("doc_id", "text"), w)
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, d) => id -> (n, d) }.toMap

  test("a window shared verbatim by two docs is duplicated in both") {
    val shared = (1 to 3).map(i => s"s$i").mkString(" ") // one 3-token window
    val got = counts(Seq(
      0L -> s"a b $shared",  // windows: [a b s1] [b s1 s2] [s1 s2 s3]
      1L -> s"$shared x y",  // windows: [s1 s2 s3] [s2 s3 x] [s3 x y]
      2L -> "p q r t u"), w = 3)
    assert(got(0L) == (3L, 1L) && got(1L) == (3L, 1L),
      s"exactly the [s1 s2 s3] window is shared: $got")
    assert(got(2L) == (3L, 0L))
  }

  test("a doc repeating its own span counts it once — self-repeats are not cross-doc dups") {
    val got = counts(Seq(
      0L -> "a b c a b c",   // window [a b c] occurs twice WITHIN doc 0
      1L -> "z z z z"), w = 3)
    // doc 0 windows: abc, bca, cab, abc -> 3 distinct, none shared
    assert(got(0L) == (3L, 0L), s"distinct-per-doc collapse failed: $got")
    // doc 1: all windows are [z z z] -> 1 distinct
    assert(got(1L) == (1L, 0L))
  }

  test("docs shorter than the window report zeros instead of vanishing") {
    val got = counts(Seq(0L -> "a b", 1L -> "a b c d"), w = 3)
    assert(got(0L) == (0L, 0L) && got(1L) == (2L, 0L))
  }

  test("identical docs share every span") {
    val text = "w1 w2 w3 w4 w5"
    val got = counts(Seq(0L -> text, 1L -> text), w = 3)
    assert(got(0L) == (3L, 3L) && got(1L) == (3L, 3L))
  }
}
