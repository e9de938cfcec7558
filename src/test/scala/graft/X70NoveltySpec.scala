package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Extensions

/** Hand-computed pin of x70's first-occurrence novelty: a doc's
  * novel count is the number of its distinct bigrams whose global
  * minimum doc_id is this doc. */
class X70NoveltySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Boolean)] =
    Extensions.noveltyScores(docs.toDF("doc_id", "text"))
      .select("doc_id", "n_bg", "novel", "flagged")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("ownership by min doc_id, recombination flags, degenerate docs drop") {
    val got = run(Seq(
      1L -> "a b c",   // owns "a b", "b c"          -> 2/2
      2L -> "a b d",   // owns "b d"                 -> 1/2
      3L -> "b c a b", // owns "c a" ("b c","a b" taken) -> 1/3
      4L -> "a b c",   // pure recombination         -> 0/2, flagged
      5L -> "solo",    // no bigrams -> no row
      6L -> ""))       // no bigrams -> no row
    assert(got == Map(
      1L -> ((2L, 2L, false)),
      2L -> ((2L, 1L, false)),
      3L -> ((3L, 1L, false)),
      4L -> ((2L, 0L, true))), got)
  }

  test("distinct bigrams count once: internal repetition does not inflate ownership") {
    // "x y x y" has occurrences (x y),(y x),(x y) but DISTINCT
    // bigrams {x y, y x}: n_bg = 2, both owned
    val got = run(Seq(1L -> "x y x y"))
    assert(got == Map(1L -> ((2L, 2L, false))), got)
  }
}
