package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
import org.apache.spark.sql.functions.col
import graft.queries.Extensions
import graft.ops.Cols.tokenSet

/** Pins x86's scale contract in the PLAN, not just the result: the
  * incremental-ingest chain carries NO forced broadcast anywhere —
  * the band probe join and both candidate-restricted verify joins
  * stay plain shuffleable equi-joins (the registry side is every
  * history class a candidate pair touches, unbounded on a dup-dense
  * crawl; size-gated AQE may still pick a broadcast at runtime, but
  * a HINT would force one at any scale) — and no cartesian / nested-
  * loop join appears. */
class X86PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def arrs(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), tokenSet(col("text")).as("arr"))

  private val docA = "alpha beta gamma delta epsilon zeta eta theta"
  private val docB = "one two three four five six seven eight nine ten"

  test("incrementalIngest's analyzed plan carries no broadcast hint") {
    val out = Extensions.incrementalIngest(
      arrs(Seq(1L -> docA, 2L -> docB, 3L -> docA)),
      arrs(Seq(10L -> docA, 11L -> docB)))
    val hints = out.queryExecution.analyzed.collect {
      case h: ResolvedHint => h
    }
    assert(hints.isEmpty,
      s"forced join hints found in the x86 chain: $hints")
    out.count()
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"))
    assert(!physical.contains("BroadcastNestedLoop"))
  }

  test("registry append keeps the hint-free plan") {
    val day1 = arrs(Seq(1L -> docA, 2L -> docB))
    val reg = Extensions.appendRegistry(
      Extensions.classesOf(day1), arrs(Seq(5L -> docA)))
    val out = Extensions.ingestAgainstClasses(reg, arrs(Seq(10L -> docA)))
    val hints = out.queryExecution.analyzed.collect {
      case h: ResolvedHint => h
    }
    assert(hints.isEmpty,
      s"forced join hints found in the appended-registry chain: $hints")
  }
}
