package graft

import graft.queries.Extensions
import org.scalatest.funsuite.AnyFunSuite

/** x54 domain capping: the salted two-phase top-K must equal the
  * plain per-source ranking for ANY salt count (subset lemma), on a
  * fixture with one hot domain and quality ties. */
class DomainCapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // one hot source (40 docs), two small ones; text crafted so quality
  // scores vary: rich text scores high, "x" scores low
  private def fixture = {
    val rich = "the quick brown fox jumps over a lazy dog and then rests " +
      "of course with ample unique words in this sentence"
    val docs =
      (0L until 40L).map(i => (i, if (i % 3 == 0) rich else "x x x x x x",
        "en", "hot", 1L)) ++
      (100L until 105L).map(i => (i, rich, "en", "small_a", 1L)) ++
      (200L until 202L).map(i => (i, "x", "en", "small_b", 1L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def run(k: Int, salts: Int): Map[Long, Boolean] =
    Extensions.domainCapped(fixture, k, salts)
      .select("doc_id", "kept").as[(Long, Boolean)].collect().toMap

  test("salted two-phase equals the unsalted ranking for every salt count") {
    val plain = run(5, 1) // salts=1 IS the plain ranking
    Seq(2, 3, 4, 7).foreach { s =>
      assert(run(5, s) == plain, s"salts=$s diverged from unsalted")
    }
  }

  test("caps bind per source: hot keeps exactly k, small sources keep all") {
    val got = Extensions.domainCapped(fixture, 5, 4)
      .select("source", "kept").as[(String, Boolean)].collect()
    val keptBySource = got.groupBy(_._1).map { case (s, rows) =>
      s -> rows.count(_._2) }
    assert(keptBySource == Map("hot" -> 5, "small_a" -> 5, "small_b" -> 2))
  }

  test("within the hot source, the highest-quality docs win, ties by doc_id") {
    val kept = Extensions.domainCapped(fixture, 5, 4)
      .filter("source = 'hot' and kept")
      .select("doc_id").as[Long].collect().toSet
    // rich docs (i % 3 == 0) outscore the "x x x..." ones; among the
    // 14 rich docs the 5 smallest ids win the tie-break
    assert(kept == Set(0L, 3L, 6L, 9L, 12L), s"got $kept")
  }
}
