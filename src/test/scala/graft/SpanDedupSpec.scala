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

  test("winnow=1 reproduces the exact construction byte-for-byte") {
    val docs = Seq(
      0L -> "a b c d e f g h i j",
      1L -> "c d e f g h unique1 tail one",
      2L -> "short doc")
    val exact = Extensions.spanDedupCounts(docs.toDF("doc_id", "text"), 3)
      .orderBy("doc_id").collect().toSeq
    val w1 = Extensions.spanDedupCounts(docs.toDF("doc_id", "text"), 3, winnow = 1)
      .orderBy("doc_id").collect().toSeq
    assert(w1 == exact)
  }

  test("winnowing is content-defined: offset-shifted copies of a region agree on sampled spans") {
    // the shared region sits at offset 0 in doc 0 and offset 1 in
    // doc 1 — a positional every-k-th stride would sample disjoint
    // window sets; hash-mod sampling keys off window CONTENT, so
    // every surviving span of the region survives in both docs
    val region = (1 to 40).map(i => s"r$i").mkString(" ")
    val k = 4
    val got = Extensions.spanDedupCounts(
      Seq(0L -> region, 1L -> s"pre $region").toDF("doc_id", "text"),
      w = 3, winnow = k)
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, d) => id -> (n, d) }.toMap
    // doc 0: all its sampled spans are region spans, all shared
    val (n0, d0) = got(0L)
    assert(n0 > 0, s"a 38-window region at winnow=$k should keep >=1 span: $got")
    assert(d0 == n0, s"every sampled region span is shared: $got")
    // doc 1 additionally samples (or drops) its 2 pre-boundary spans;
    // its dup count matches doc 0's sampled-span count exactly
    val (n1, d1) = got(1L)
    assert(d1 == n0 && n1 >= d1, s"content-defined agreement failed: $got")
  }

  test("winnowing drops rows roughly k-fold") {
    val text = (1 to 200).map(i => s"t$i").mkString(" ")
    def nSpans(k: Int) = Extensions.spanDedupCounts(
      Seq(0L -> text).toDF("doc_id", "text"), w = 3, winnow = k)
      .as[(Long, Long, Long)].collect().head._2
    val exact = nSpans(1)
    val sampled = nSpans(4)
    assert(exact == 198L)
    assert(sampled > 0 && sampled < exact / 2,
      s"winnow=4 should keep a small fraction of $exact spans, kept $sampled")
  }
}
