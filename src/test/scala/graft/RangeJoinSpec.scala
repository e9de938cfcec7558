package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** [[graft.ops.RangeJoin]]: exactness against the plain theta join
  * (negative domains, overlapping ranges, bucket-boundary values),
  * exactly-once pair emission, and the plan shape (shuffle equi-join
  * on the manufactured bucket key, not a nested loop). */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = {
    // points on both sides of zero and ON bucket boundaries (25.0
    // with width 25 lands exactly on an edge); ranges overlap each
    // other and one spans many buckets
    val pts = Seq(-60.0, -25.0, -0.01, 0.0, 12.5, 25.0, 49.99, 50.0,
      77.3, 120.0, 300.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("pid", "p")
    val rng = Seq(
      (100L, -50.0, 0.0),    // negative domain, hi on boundary
      (101L, -30.0, 30.0),   // straddles zero
      (102L, 0.0, 25.0),     // both ends on boundaries
      (103L, 20.0, 80.0),    // overlaps 101/102
      (104L, 60.0, 60.0),    // empty-interior point range, no hits
      (105L, -100.0, 310.0)) // spans every bucket
      .toDF("rid", "lo", "hi")
    (pts, rng)
  }

  test("bucketed range join equals the theta join, for several widths") {
    val (pts, rng) = fixture
    val expected = pts.join(rng,
        col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "rid").as[(Long, Long)].collect().sorted.toSeq
    for (w <- Seq(7.0, 25.0, 1000.0)) {
      val got = RangeJoin.bucketed(pts, rng, "p", "lo", "hi", w)
        .select("pid", "rid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == expected, s"width $w")
      // exactly-once even where ranges overlap and span many buckets
      assert(got.distinct == got, s"width $w duplicates")
    }
  }

  test("plan: a shuffle equi-join on the bucket key, no nested loop") {
    val (pts, rng) = fixture
    val plan = RangeJoin.bucketed(pts, rng, "p", "lo", "hi", 25.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Join") || plan.contains("join"), plan)
  }
}
