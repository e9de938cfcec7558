package graft

import graft.ops.PageRank
import org.scalatest.funsuite.AnyFunSuite

/** Integer PageRank: hand-computed fixed-point values on a path
  * graph, structural invariants (symmetry, hub dominance), and the
  * determinism the x56 oracle relies on. */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.run(edges.toDF("a", "b"), iters)
      .as[(Long, Long)].collect().toMap

  test("path graph 1-2-3: matches the hand-computed recurrence") {
    // r0 = 10^6 each; base = 150000
    // round 1: r(1)=r(3)=150000+floor(10^6*85/200)=575000,
    //          r(2)=150000+2*850000=1850000
    // round 2: r(1)=r(3)=150000+floor(1850000*85/200)=936250,
    //          r(2)=150000+2*floor(575000*85/100)=1127500
    val edges = Seq((1L, 2L), (2L, 3L))
    assert(ranks(edges, 1) == Map(1L -> 575000L, 2L -> 1850000L, 3L -> 575000L))
    assert(ranks(edges, 2) == Map(1L -> 936250L, 2L -> 1127500L, 3L -> 936250L))
  }

  test("star graph: hub outranks leaves; symmetric leaves tie exactly") {
    val edges = (2L to 6L).map(l => (1L, l))
    val r = ranks(edges, 10)
    val leaves = (2L to 6L).map(r)
    assert(leaves.distinct.size == 1, s"asymmetric leaf ranks: $r")
    assert(r(1L) > leaves.head, s"hub not dominant: $r")
  }

  test("two symmetric components rank identically; mass stays bounded") {
    // two disjoint triangles — node sets {1,2,3} and {11,12,13}
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val edges = tri ++ tri.map { case (a, b) => (a + 10, b + 10) }
    val r = ranks(edges, 10)
    assert((1L to 3L).forall(v => r(v) == r(v + 10)))
    // regular graph: every vertex holds exactly the initial mass minus
    // cumulative floor loss — all equal, ≤ S, > damping floor
    assert(r.values.toSet.size == 1)
    assert(r(1L) <= 1000000L && r(1L) >= 850000L)
  }

  test("deterministic across partitionings") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val one = PageRank.run(edges.toDF("a", "b").repartition(1), 5)
      .as[(Long, Long)].collect().toMap
    val many = PageRank.run(edges.toDF("a", "b").repartition(7), 5)
      .as[(Long, Long)].collect().toMap
    assert(one == many)
  }

  test("guards: iters and scale validated at call time") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException](PageRank.run(df, 0))
    intercept[IllegalArgumentException](PageRank.run(df, 1, 10L))
  }
}
