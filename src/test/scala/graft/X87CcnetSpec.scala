package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Extensions

/** Pins x87's CCNet tercile assignment: per-language bucket ORDER
  * (every head doc scores strictly below every middle doc at
  * histogram grain, middle below tail), the cumulative quotas
  * (|head|·3 ≥ n, (|head|+|middle|)·3 ≥ 2n — the bucket-aligned
  * superset rule), the all-identical degenerate (single histogram
  * bucket swallows the corpus into head), and that languages
  * partition independently. */
class X87CcnetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String)]) =
    Extensions.ccnetBuckets(rows.toDF("doc_id", "text", "lang"))
      .as[(Long, String, Long, String)].collect()

  // fluency gradient: repeated bigrams are cheap (high c_bg), novel
  // bigram chains are expensive — doc texts built so surprisal
  // strictly rises from f1 to f9
  private def corpus(lang: String, off: Long): Seq[(Long, String, String)] = {
    val fluent = "a b " * 20
    (1 to 9).map { i =>
      val rare = (1 to i).map(j => s"${lang}r${i}_$j").mkString(" ")
      (off + i, (fluent + rare).trim, lang)
    }
  }

  test("tercile order and quotas hold per language, languages independent") {
    val rows = corpus("en", 0L) ++ corpus("de", 100L)
    val got = run(rows)
    assert(got.length == 18)
    for (lang <- Seq("en", "de")) {
      val g = got.filter(_._2 == lang)
      val n = g.length
      val byB = g.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      val head = byB.getOrElse("head", Array.empty[Long])
      val mid = byB.getOrElse("middle", Array.empty[Long])
      val tail = byB.getOrElse("tail", Array.empty[Long])
      assert(head.nonEmpty)
      assert(head.length * 3 >= n)
      assert((head.length + mid.length) * 3 >= 2 * n)
      if (mid.nonEmpty) assert(head.max / 100 < mid.min / 100)
      if (mid.nonEmpty && tail.nonEmpty) assert(mid.max / 100 < tail.min / 100)
    }
  }

  test("identical-surprisal corpus degenerates to all-head") {
    val rows = (1L to 6L).map(i => (i, "x y x y x y", "en"))
    val got = run(rows)
    assert(got.length == 6 && got.forall(_._4 == "head"))
  }

  test("docs without a bigram are absent from the assignment") {
    val rows = Seq((1L, "solo", "en"), (2L, "a b a b", "en"),
      (3L, "a b c d", "en"), (4L, "a c b d", "en"))
    val got = run(rows)
    assert(got.map(_._1).toSet == Set(2L, 3L, 4L))
  }
}
