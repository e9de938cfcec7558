package graft

import graft.queries.Extensions
import org.scalatest.funsuite.AnyFunSuite

/** x51 triangle counting over the span-sharing graph, on corpora
  * whose cliques are known by construction (span width 4). */
class TriangleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[Long, Long] = {
    val dir = java.nio.file.Files.createTempDirectory("tri").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    Extensions.all.find(_.name == "x51_triangle_count").get
      .fn(spark, dir).as[(Long, Long)].collect().toMap
  }

  test("three docs sharing one window form exactly one triangle") {
    val got = run(Seq(
      0L -> "p q r s tail0",
      1L -> "head1 p q r s",
      2L -> "p q r s tail2",
      3L -> "u v w x only3",   // edge 3-4, no triangle
      4L -> "u v w x only4",
      5L -> "nothing shared here at all"))
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L),
      s"only the 3-clique participates: $got")
  }

  test("a 4-clique holds four triangles, three per node") {
    val got = run((0L to 3L).map(i => i -> s"a b c d tail$i"))
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("two docs sharing two different windows still form ONE edge (no double count)") {
    // share spans "a b c d" and "w x y z" -> one distinct edge; a
    // third doc closes the triangle through only the first span
    val got = run(Seq(
      0L -> "a b c d mid w x y z",
      1L -> "a b c d sep w x y z",
      2L -> "a b c d alone"))
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L),
      s"edge dedup must collapse multi-span pairs: $got")
  }

  test("hub fixture: a star with one closing edge holds exactly one triangle") {
    // doc 100 is a template-family hub: it shares a DISTINCT window
    // with each of 8 spokes (degree 8); spokes share nothing with
    // each other except spokes 0 and 1, which also share a window
    // the hub lacks — the single closing edge. The degree-oriented
    // wedge join must build the hub's wedges at the SPOKES (degree ≤
    // 2), yet still find exactly the {hub, s0, s1} triangle.
    val spokes = (0 until 8).map { i =>
      val w = s"w${i}a w${i}b w${i}c w${i}d" // the hub-shared window
      val closer = if (i <= 1) " z1 z2 z3 z4" else s" u${i}1 u${i}2"
      i.toLong -> s"$w$closer"
    }
    val hubText = (0 until 8).map(i => s"w${i}a w${i}b w${i}c w${i}d sep$i")
      .mkString(" ")
    val got = run(spokes :+ (100L -> hubText))
    assert(got == Map(100L -> 1L, 0L -> 1L, 1L -> 1L),
      s"exactly the {hub, s0, s1} triangle: $got")
  }
}
