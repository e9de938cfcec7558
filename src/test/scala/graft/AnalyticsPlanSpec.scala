package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the round-7 analytics gates: the scale
  * claims in their scaladocs must be visible in the executed plans,
  * not just asserted in prose. */
class AnalyticsPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("x60 weighted sample: global top-K is TakeOrdered, never a corpus sort+limit") {
    val plan = planOf("x60_weighted_sample")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // the only Sort is ordered()'s final output sort of K rows — the
    // selection itself must not globally sort the corpus
    assert(!plan.contains("GlobalLimit"), s"sort+limit shape leaked:\n$plan")
  }

  test("x59 SCD2: both window passes ride ONE user-keyed shuffle") {
    // AQE's plan string appends an "== Initial Plan ==" duplicate —
    // count only the executed final section
    val plan = planOf("x59_scd2_history").split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning\\(user_id".r
      .findAllIn(plan).length
    assert(exchanges == 1,
      s"expected 1 user_id exchange (lag + lead share it), got $exchanges:\n$plan")
    // and the second window must NOT re-sort: one Sort on (user, ts, id)
    val sorts = "Sort \\[user_id[^\\]]*ts".r.findAllIn(plan).length
    assert(sorts == 1, s"expected the windows to share one sort, got $sorts")
  }

  test("x58 funnel: every join is user-keyed; no event-log window sort") {
    val plan = planOf("x58_funnel")
    assert(!plan.contains("Window"), s"funnel must not window-sort:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("x68 LM surprisal: cached bg-partitioning is reused, scan is pruned") {
    val plan = planOf("x68_lm_surprisal")
    // the tf table is persisted REPARTITION_BY_COL(bg); the c_bg
    // rollup and the bg-keyed join must ride that cached partitioning
    // — any ENSURE_REQUIREMENTS re-exchange on bg means the cache
    // lost its partitioning and every consumer re-shuffles the corpus
    assert(!"Exchange hashpartitioning\\(bg[^\\n]*ENSURE_REQUIREMENTS".r
      .findFirstIn(plan).isDefined,
      s"bg re-exchanged despite cached partitioning:\n$plan")
    assert(plan.contains("REPARTITION_BY_COL"), plan)
    // column pruning: the corpus scan reads only (doc_id, text)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      plan)
    // no all-pairs shape anywhere: the only nested-loop join is the
    // 1-row v_ctx scalar broadcast
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("x74 PQ distortion: the exact side broadcasts; no corpus-cardinality shuffle join") {
    val plan = planOf("x74_pq_distortion")
    // the queries-x-k pair table and the query vectors broadcast; the
    // corpus vector table must never sort-merge against them
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), s"corpus-shuffling join:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("x75 linkage: candidates come from equi-joins only — no all-pairs shape") {
    val plan = planOf("x75_entity_resolution").split("== Initial Plan ==")(0)
    // blocking must never degenerate into a cross product, and there is
    // no 1-row broadcast in this gate to excuse a nested-loop join
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("x76 z-order: bucket assignment is sort-free (no global sort, no window)") {
    val plan = planOf("x76_zorder_layout").split("== Initial Plan ==")(0)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the two scalar aggs ride broadcasts; the only Sort is ordered()'s
    // final output sort of ~64 bucket rows
    val finalSorts = plan.split("\n").count(l => l.trim.startsWith("+- Sort")
      || l.trim.startsWith("Sort") || l.trim.startsWith(":- Sort"))
    assert(finalSorts <= 1, s"extra sorts leaked:\n$plan")
  }

  test("x57 retention: no window sort; aggregates carry partial (map-side) phases") {
    val plan = planOf("x57_retention_cohorts")
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_min") || plan.contains("partial_count") ||
      plan.contains("HashAggregate"), plan)
  }
}
