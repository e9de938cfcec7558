package graft

import graft.queries.Extensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the LSH candidate join (x04/x14's
  * engine). The 100 TB contract: the band table is proportional to
  * |distinct signatures|, so the self-join must be a plain
  * shuffle-able equi-join — NEVER a forced broadcast (round 2's
  * scale-killer) — and its two identical sides must materialize the
  * upstream minhash aggregation ONCE via exchange reuse.
  */
class LshPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toks = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"),
    (2L, "a"), (2L, "b"), (2L, "c"),
    (3L, "x"), (3L, "y"))
    .toDF("rep", "tok")

  /** Run `body` with broadcast joins disabled (so any
    * BroadcastExchange in the plan can only come from a forced hint)
    * and AQE off (so the static plan, where ReuseExchange runs, is
    * the executed plan). */
  private def withDegradedConf[A](body: => A): A = {
    val conf = spark.conf
    val oldThresh = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.enabled", "false")
    try body finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldThresh)
      conf.set("spark.sql.adaptive.enabled", oldAqe)
    }
  }

  test("candidate join has no forced broadcast and reuses the band exchange") {
    withDegradedConf {
      val cand = Extensions.lshCandidates(Extensions.bandTable(toks, "t:"))
      val plan = cand.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        s"a BroadcastExchange under threshold=-1 means a forced hint:\n$plan")
      assert(plan.contains("ReusedExchange"),
        s"the two identical band-table sides must share one exchange:\n$plan")
      // and the join itself is the shuffle-able kind
      assert(plan.contains("SortMergeJoin"), plan)
    }
  }

  test("degraded-path plan still produces the right candidates") {
    withDegradedConf {
      val cand = Extensions.lshCandidates(Extensions.bandTable(toks, "t:"))
        .as[(Long, Long)].collect().toSet
      // reps 1 and 2 share the exact token set → all four bands agree;
      // rep 3 shares no band with either
      assert(cand == Set((1L, 2L)))
    }
  }

  test("maxBucket drops a hot band bucket wholesale, keeps the rest") {
    // 10 reps share one band bucket (45 pairs); 2 reps share another
    val hot = (1L to 10L).map(r => (r, 0, 10L, 11L, 12L, 13L))
    val cool = Seq((20L, 1, 1L, 2L, 3L, 4L), (21L, 1, 1L, 2L, 3L, 4L))
    val banded = (hot ++ cool).toDF("rep", "band", "k0", "k1", "k2", "k3")
    val capped = Extensions.lshCandidates(banded, maxBucket = 5)
      .as[(Long, Long)].collect().toSet
    assert(capped == Set((20L, 21L)))
    val uncapped = Extensions.lshCandidates(banded).count()
    assert(uncapped == 45 + 1)
  }

  test("x03/x22 pair generation is an equi-join, never a nested-loop cross product") {
    withDegradedConf {
      Seq("x03_dedup_jaccard", "x22_dedup_simhash").foreach { name =>
        val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin") &&
               !plan.contains("CartesianProduct"),
          s"$name pairs must come from an equi-join:\n$plan")
        assert(plan.contains("SortMergeJoin"), s"$name:\n$plan")
        spark.catalog.clearCache() // the queries persist intermediates
      }
    }
  }

  test("size-gated broadcast is still allowed when the table genuinely fits") {
    // default threshold (10 MB) + tiny table: the planner MAY pick a
    // broadcast join — the point is the choice is the OPTIMIZER's
    // (size-gated), not hard-coded. Candidates must be identical.
    val cand = Extensions.lshCandidates(Extensions.bandTable(toks, "t:"))
      .as[(Long, Long)].collect().toSet
    assert(cand == Set((1L, 2L)))
  }
}
