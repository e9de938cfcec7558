package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Extensions
import org.apache.spark.sql.functions.col

/** Pins x89's scrub-effectiveness audit semantics via its components:
  * a dup-free corpus is a fixpoint (before = after), exact twins
  * scrub to zero residual, and partially-duplicated docs lose exactly
  * their shared-region spans. Uses the gate's own building blocks
  * (spanScrub → spanDedupCounts) at w=8, the gate grain. */
class X89AuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def audit(rows: Seq[(Long, String)]) = {
    val docs = rows.toDF("doc_id", "text")
    val before = Extensions.spanDedupCounts(docs)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val clean = Extensions.spanScrub(docs)
      .select(col("doc_id"), col("clean").as("text"))
    val after = Extensions.spanDedupCounts(clean)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    (before, after)
  }

  private def block(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")

  test("a dup-free corpus is a fixpoint of the scrub") {
    val rows = Seq(1L -> block("a", 12), 2L -> block("b", 12))
    val (before, after) = audit(rows)
    assert(before == after)
    assert(before.values.forall(_._2 == 0L))
  }

  test("exact twins: everything duplicated before, nothing left after") {
    val rows = Seq(1L -> block("t", 16), 2L -> block("t", 16))
    val (before, after) = audit(rows)
    assert(before(1L) == ((9L, 9L)) && before(2L) == ((9L, 9L)))
    assert(after(1L) == ((0L, 0L)) && after(2L) == ((0L, 0L)))
  }

  test("partial duplication: shared-region spans vanish, unique text keeps its spans") {
    // docs share an 8-token block; each carries a unique 12-token tail
    val shared = block("s", 8)
    val rows = Seq(
      1L -> (shared + " " + block("u", 12)),
      2L -> (shared + " " + block("v", 12)))
    val (before, after) = audit(rows)
    // before: 13 windows each; windows fully inside the shared block: 1
    assert(before(1L)._1 == 13L && before(1L)._2 == 1L)
    // after: the shared 8 tokens are gone, the 12-token tail has 5 windows,
    // none duplicated
    assert(after(1L) == ((5L, 0L)) && after(2L) == ((5L, 0L)))
  }
}
