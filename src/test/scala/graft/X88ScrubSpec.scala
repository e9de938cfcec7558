package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Extensions

/** Pins x88's repeated-span removal: cross-doc duplicated windows are
  * scrubbed positionally (overlapping duplicated spans merge into one
  * removed region), within-doc repeats alone never trigger, docs
  * shorter than the window pass through untouched, and a fully
  * duplicated doc scrubs to empty. Uses w=3 windows so fixtures stay
  * readable. */
class X88ScrubSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], w: Int = 3) =
    Extensions.spanScrub(rows.toDF("doc_id", "text"), w)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("a shared window is removed from both docs; unique text survives") {
    val got = run(Seq(
      1L -> "u1 u2 a b c v1 v2",
      2L -> "w1 a b c w2 w3 w4"))
    assert(got(1L) == ((7L, 3L, "u1 u2 v1 v2")))
    assert(got(2L) == ((7L, 3L, "w1 w2 w3 w4")))
  }

  test("overlapping duplicated spans merge into one removed region") {
    // 'a b c d' shared: windows (a b c) and (b c d) both duplicate;
    // coverage is positions 0..3 in doc 1 — four tokens, not six
    val got = run(Seq(
      1L -> "a b c d u1 u2 u3",
      2L -> "v1 v2 a b c d v3"))
    assert(got(1L) == ((7L, 4L, "u1 u2 u3")))
    assert(got(2L) == ((7L, 4L, "v1 v2 v3")))
  }

  test("within-doc repetition alone does not scrub") {
    val got = run(Seq(
      1L -> "a b c a b c a b c",
      2L -> "x y z w v u"))
    assert(got(1L) == ((9L, 0L, "a b c a b c a b c")))
  }

  test("scrubAgainst the FULL dup set is bit-identical to spanScrub") {
    val rows = Seq(
      1L -> "u1 u2 a b c v1 v2",
      2L -> "w1 a b c w2 w3 w4",
      3L -> "a b c d u1 u2 u3",
      4L -> "v1 v2 a b c d v3",
      5L -> "s1 s2",
      6L -> "p q r t",
      7L -> "p q r t")
    val docs = rows.toDF("doc_id", "text")
    val batch = Extensions.spanScrub(docs, 3)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    val full = Extensions.topDupSpans(docs, k = 1000, w = 3)
    val against = Extensions.scrubAgainst(docs, full, 3)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(against.sameElements(batch))
  }

  test("docs shorter than the window pass through; exact twins scrub empty") {
    val got = run(Seq(
      1L -> "s1 s2",
      2L -> "p q r t",
      3L -> "p q r t"))
    assert(got(1L) == ((2L, 0L, "s1 s2")))
    assert(got(2L) == ((4L, 4L, "")))
    assert(got(3L) == ((4L, 4L, "")))
  }
}
