package graft

import graft.ops.KCore
import org.scalatest.funsuite.AnyFunSuite

/** Synchronous fixed-round k-core peeling (ops.KCore): clique
  * survival, pendant/chain removal, cascade across rounds,
  * fixed-round vs converged semantics, partitioning invariance. */
class KCoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], k: Int = 3,
                  rounds: Int = 4): Map[Long, Long] =
    KCore.run(edges.toDF("a", "b"), k, rounds)
      .as[(Long, Long)].collect().toMap

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for { i <- ids.indices; j <- (i + 1) until ids.size }
      yield (ids(i), ids(j))

  test("a clique with pendant fringe: the clique survives at full degree, pendants peel") {
    // K5 plus a pendant chain 4-10-11: chain has degree <= 2
    val edges = clique(0L to 4L) ++ Seq((4L, 10L), (10L, 11L))
    val got = run(edges, k = 3)
    // round 1 removes 10,11; vertex 4 keeps its 4 clique neighbors
    assert(got == (0L to 4L).map(_ -> 4L).toMap, got)
  }

  test("a cascade peels over multiple rounds, not one") {
    // K4 core, path 3-20-21-22 hanging off it at k=2: 22 dies round
    // 1 (deg 1), 21 round 2, 20 round 3 — each round exposes the next
    val edges = clique(0L to 3L) ++ Seq((3L, 20L), (20L, 21L), (21L, 22L))
    assert(run(edges, k = 2, rounds = 1).keySet == Set(0L, 1L, 2L, 3L, 20L, 21L))
    assert(run(edges, k = 2, rounds = 2).keySet == Set(0L, 1L, 2L, 3L, 20L))
    assert(run(edges, k = 2, rounds = 3).keySet == Set(0L, 1L, 2L, 3L))
    assert(run(edges, k = 2, rounds = 3) ==
      Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("triangles are below a 3-core: everything peels") {
    // two triangles sharing vertex 2: max degree 4 but every vertex
    // has only 2 neighbors inside any triangle -> 3-core is empty...
    // except vertex 2 (deg 4) survives round 1 then dies round 2
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L), (3L, 4L), (2L, 4L))
    assert(run(edges, k = 3, rounds = 4).isEmpty)
  }

  test("fixed-round deg may dip below k in the final survivor graph (documented semantics)") {
    // K4 plus vertex 9 attached to 3 clique members: 9 has deg 3 at
    // k=3... all survive every round and the k-core is the whole graph
    val edges = clique(0L to 3L) ++ Seq((0L, 9L), (1L, 9L), (2L, 9L))
    val got = run(edges, k = 3, rounds = 4)
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 9L))
    assert(got(9L) == 3L && got(0L) == 4L && got(3L) == 3L, got)
  }

  test("result is invariant to input partitioning") {
    val edges = clique(0L to 4L) ++ Seq((4L, 10L), (10L, 11L), (11L, 12L))
    val base = run(edges)
    val repart = KCore.run(edges.toDF("a", "b").repartition(7), 3, 4)
      .as[(Long, Long)].collect().toMap
    assert(base == repart)
  }
}
