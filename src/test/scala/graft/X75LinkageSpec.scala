package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Extensions

/** Pins x75's blocked record linkage: block survival under single
  * interior edits, the both-sides frequency cap, the documented
  * blocking miss (edits at BOTH ends), and the gate-level invariant
  * that every dirty record links back to its own canonical. */
class X75LinkageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "abcdefghijklmnopqrstuvwxyz0123456789ABCD" // 40 chars
  private def del(s: String, i: Int) = s.substring(0, i) + s.substring(i + 1)

  private def run(a: Seq[(Long, String)], b: Seq[(Long, String)],
      cap: Long = 64L): Set[(Long, Long, Long)] =
    Extensions.blockedLinkage(
      a.toDF("a_id", "a_rec"), b.toDF("b_id", "b_rec"), 14, cap, 2)
      .as[(Long, Long, Long)].collect().toSet

  test("a single interior deletion always survives one blocking key") {
    val canon = Seq(1L -> base)
    // deletion at index 1 breaks the prefix-14 key, suffix-14 survives;
    // at index 37 breaks the suffix, prefix survives; at 20 both survive
    for (pos <- Seq(1, 20, 37)) {
      val got = run(canon, Seq(10L -> del(base, pos)))
      assert(got == Set((10L, 1L, 1L)), s"deletion at $pos: $got")
    }
  }

  test("documented blocking miss: edits at BOTH ends break both keys") {
    // dist = 2 from base, but neither the first-14 nor last-14 match
    val twoEnds = "Xbcdefghijklmnopqrstuvwxyz0123456789ABCX"
    assert(run(Seq(1L -> base), Seq(10L -> twoEnds)).isEmpty)
    // sanity: it IS within the distance budget — only blocking missed it
    val d = spark.sql(s"SELECT levenshtein('$base', '$twoEnds')")
      .collect().head.getInt(0)
    assert(d == 2)
  }

  test("distance threshold: dist-3 candidates verify away") {
    // same suffix block (last 14 untouched) but three leading edits
    val three = "XYZdefghijklmnopqrstuvwxyz0123456789ABCD"
    assert(run(Seq(1L -> base), Seq(10L -> three)).isEmpty)
  }

  test("frequency cap drops degenerate blocks on either side") {
    val degenerate = "P" * 40
    val canon = (0L until 70L).map(i => i -> degenerate)
    val dirty = Seq(100L -> ("P" * 39 + "Q"))
    // every canonical shares both blocking keys: 70 > cap=64 on the A
    // side kills the key, so the dist-1 pair is never even a candidate
    assert(run(canon, dirty).isEmpty)
    // raising the cap restores all 70 links
    val wide = run(canon, dirty, cap = 128L)
    assert(wide == (0L until 70L).map(i => (100L, i, 1L)).toSet)
  }

  test("gate invariant on real data: every dirty record links to its canonical at dist 1") {
    val got = SparkEntry.queries("x75_entity_resolution")(
      spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()
    val self = got.filter(r => r._1 == r._2)
    assert(self.length == 500 && self.forall(_._3 == 1L),
      s"${self.length} self-links")
  }
}
