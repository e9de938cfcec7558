package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.queries.Extensions

/** Pins x94's iterated scrub: one removal pass can CREATE cross-doc
  * duplication (excising a span butts two previously-separated
  * fragments together — the reason Lee et al. iterate to fixpoint),
  * the residual audit measures it per round, a second round clears
  * it, and the twin-doc case reaches residual 0 in one round. Also
  * pins the convergence-driven library form `spanScrubToFixpoint`
  * (early exit, monotone-to-zero residual log). */
class X94FixpointSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def audit(d: DataFrame): Map[Long, (Long, Long, Long, Long, Long)] =
    Extensions.scrubRoundAudit(d)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  private val U = (1 to 4).map(i => s"u$i").mkString(" ")
  private val V = (1 to 4).map(i => s"v$i").mkString(" ")
  private val S = (1 to 8).map(i => s"s$i").mkString(" ")
  private val T = (1 to 8).map(i => s"t$i").mkString(" ")

  test("round 1's removal creates the duplication round 2 clears") {
    // docs 1/2 share nothing 8-token-contiguous BEFORE scrubbing
    // (their middles differ), but each middle is a full span shared
    // with a standalone doc — removing the middles butts U against V
    // in BOTH docs, an 8-token window that only exists after round 1
    val got = audit(docs(
      1L -> s"$U $S $V", 2L -> s"$U $T $V", 3L -> S, 4L -> T))
    // round 0: doc 1's only cross-doc span is S itself (1 of 9
    // windows); rewrite removes S's 8 tokens; the rebuilt "U V" is
    // then a twin of doc 2's rebuild → dup_r1 = 1; round 2 removes
    // all 8 remaining tokens → dup_r2 = 0
    assert(got(1L) == ((1L, 8L, 1L, 8L, 0L)))
    assert(got(2L) == ((1L, 8L, 1L, 8L, 0L)))
    // the standalone span docs scrub to empty in round 1 and stay put
    assert(got(3L) == ((1L, 8L, 0L, 0L, 0L)))
    assert(got(4L) == ((1L, 8L, 0L, 0L, 0L)))
  }

  test("twin docs reach residual 0 in one round") {
    val text = (1 to 12).map(i => s"w$i").mkString(" ")
    val got = audit(docs(1L -> text, 2L -> text, 3L -> "unrelated words"))
    assert(got(1L) == ((5L, 12L, 0L, 0L, 0L))) // 5 windows, all dup
    assert(got(2L) == ((5L, 12L, 0L, 0L, 0L)))
    assert(got(3L) == ((0L, 0L, 0L, 0L, 0L)))
  }

  test("spanScrubToFixpoint converges with a monotone residual log " +
    "and stops early once clean") {
    val (clean, resid) = Extensions.spanScrubToFixpoint(
      docs(1L -> s"$U $S $V", 2L -> s"$U $T $V", 3L -> S, 4L -> T),
      maxRounds = 5)
    // residual after round 1 is the doc1/doc2 "U V" twin pair (one
    // dup window each); round 2 clears it; the loop exits at 0
    assert(resid == Seq(2L, 0L))
    val out = clean.as[(Long, String)].collect().toMap
    assert(out(1L) == "" && out(2L) == "" && out(3L) == "" && out(4L) == "")
  }

  test("a dup-free corpus is a fixpoint: zero removals, one round") {
    val d = docs(1L -> (1 to 10).map(i => s"a$i").mkString(" "),
      2L -> (1 to 10).map(i => s"b$i").mkString(" "))
    val got = audit(d)
    assert(got(1L) == ((0L, 0L, 0L, 0L, 0L)))
    val (clean, resid) = Extensions.spanScrubToFixpoint(d, maxRounds = 3)
    assert(resid == Seq(0L))
    assert(clean.as[(Long, String)].collect().toMap
      .apply(1L).startsWith("a1 a2"))
  }
}
