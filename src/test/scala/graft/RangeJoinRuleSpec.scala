package graft

import graft.plans.RangeJoinRule
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The injected optimizer rule: keyless numeric range joins become
  * bucketed equi-joins when (and only when) the bin-size conf is set,
  * with results identical to the nested-loop plan. */
class RangeJoinRuleSpec extends AnyFunSuite {

  private lazy val session: SparkSession = {
    TestSpark.spark // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions().apply(_))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
  }

  private def fixtures(s: SparkSession) = {
    import s.implicits._
    val points = (0L to 400L).map(i => (i, (i * 7) % 100)).toDF("pid", "v")
    val ranges = Seq(
      (1L, 0, 10), (2L, 5, 35), (3L, 90, 99), (4L, 40, 40), (5L, -5, 3))
      .toDF("rid", "lo", "hi")
    (points, ranges)
  }

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("with binSize set: no nested loop, bucketed equi-join, identical rows") {
    val s = session
    val (points, ranges) = fixtures(s)
    val cond = points("v") >= ranges("lo") && points("v") <= ranges("hi")

    s.conf.unset(RangeJoinRule.WidthKey)
    val naive = points.join(ranges, cond)
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    assert(physical(points.join(ranges, cond))
      .contains("BroadcastNestedLoopJoin"),
      "without the conf the keyless join must stay a nested loop")

    s.conf.set(RangeJoinRule.WidthKey, "8")
    val rewritten = points.join(ranges, cond).select("pid", "rid")
    val plan = physical(rewritten)
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"rule must remove the nested loop:\n$plan")
    assert(plan.contains("Generate"), s"range side must explode buckets:\n$plan")
    val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    assert(got == naive, "bucketed rewrite must be row-identical")
    assert(got.nonEmpty && got.size < 401 * 5, "fixture exercises selectivity")
    s.conf.unset(RangeJoinRule.WidthKey)
  }

  test("inclusive bounds and negative values survive the rewrite") {
    val s = session
    import s.implicits._
    val points = Seq((1L, -5), (2L, -4), (3L, 0), (4L, 3), (5L, 4))
      .toDF("pid", "v")
    val ranges = Seq((10L, -5, 3)).toDF("rid", "lo", "hi")
    s.conf.set(RangeJoinRule.WidthKey, "4")
    val got = points.join(ranges,
        points("v") >= ranges("lo") && points("v") <= ranges("hi"))
      .select("pid").as[Long].collect().sorted.toSeq
    // -5 and 3 are exactly on the bounds; 4 is outside
    assert(got == Seq(1L, 2L, 3L, 4L))
    s.conf.unset(RangeJoinRule.WidthKey)
  }

  test("joins with an equi key are left untouched") {
    val s = session
    import s.implicits._
    val a = Seq((1L, 5), (2L, 9)).toDF("k", "x")
    val b = Seq((1L, 0, 10)).toDF("k2", "lo", "hi")
    s.conf.set(RangeJoinRule.WidthKey, "8")
    val joined = a.join(b,
      a("k") === b("k2") && a("x") >= b("lo") && a("x") <= b("hi"))
    val plan = physical(joined)
    assert(!plan.contains("Generate"),
      s"an equi-keyed join must not be rewritten:\n$plan")
    assert(joined.count() == 1)
    s.conf.unset(RangeJoinRule.WidthKey)
  }
}
