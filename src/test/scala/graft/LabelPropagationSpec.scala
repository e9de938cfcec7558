package graft

import graft.ops.LabelPropagation
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic synchronous LPA (ops.LabelPropagation): dense cores
  * split across a weak bridge (the property components can't give),
  * clique convergence, deterministic oscillation on fixed rounds,
  * partitioning invariance. */
class LabelPropagationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int = 5): Map[Long, Long] =
    LabelPropagation.run(edges.toDF("a", "b"), iters)
      .as[(Long, Long)].collect().toMap

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for { i <- ids.indices; j <- (i + 1) until ids.size }
      yield (ids(i), ids(j))

  test("two cliques joined by one bridge stay TWO communities (components would merge)") {
    val edges = clique(0L to 3L) ++ clique(10L to 13L) :+ (3L, 10L)
    val got = run(edges)
    assert((0L to 3L).forall(got(_) == 0L), s"clique A: $got")
    assert((10L to 13L).forall(got(_) == 10L), s"clique B: $got")
    // sanity: min-label components WOULD collapse both to 0
    val comp = graft.ops.ConnectedComponents.label(
      (0L to 3L).union(10L to 13L).toDF("id"),
      edges.toDF("src", "dst")).as[(Long, Long)].collect().toMap
    assert(comp.values.toSet == Set(0L), "fixture must be one component")
  }

  test("a clique converges to its minimum label") {
    val got = run(clique(5L to 9L))
    assert(got == (5L to 9L).map(_ -> 5L).toMap)
  }

  test("fixed synchronous rounds make oscillation deterministic (single edge)") {
    // a lone edge swaps labels every round: odd round count leaves
    // them swapped, even leaves them home — pinned, not flaky
    assert(run(Seq((1L, 2L)), iters = 5) == Map(1L -> 2L, 2L -> 1L))
    assert(run(Seq((1L, 2L)), iters = 4) == Map(1L -> 1L, 2L -> 2L))
  }

  test("result is invariant to input partitioning") {
    val edges = clique(0L to 4L) ++ clique(20L to 24L) :+ (4L, 20L)
    val df1 = edges.toDF("a", "b").repartition(1)
    val df7 = edges.toDF("a", "b").repartition(7)
    val a = LabelPropagation.run(df1).as[(Long, Long)].collect().toMap
    val b = LabelPropagation.run(df7).as[(Long, Long)].collect().toMap
    assert(a == b)
  }
}
