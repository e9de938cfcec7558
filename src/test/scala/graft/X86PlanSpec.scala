package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
import org.apache.spark.sql.functions.col
import graft.queries.Extensions
import graft.ops.Cols.tokenSet

/** Pins x86's scale contract in the PLAN, not just the result: the
  * ingest verify joins carry a broadcast hint ONLY under the
  * measured candidate-class cap (two tiny distinct counts over the
  * persisted candidate table decide) — never unconditionally (the
  * registry side is unbounded on a dup-dense crawl), and with the
  * cap disabled the whole chain is hint-free and shuffleable. Both
  * branches produce bit-identical results; no cartesian /
  * nested-loop join appears; the band probe join is never hinted. */
class X86PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def arrs(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), tokenSet(col("text")).as("arr"))

  private val docA = "alpha beta gamma delta epsilon zeta eta theta"
  private val docB = "one two three four five six seven eight nine ten"

  private def hintsOf(df: DataFrame): Seq[ResolvedHint] =
    df.queryExecution.analyzed.collect { case h: ResolvedHint => h }

  test("cap 0 = the scale fallback: zero hints, plain shuffleable " +
    "verify joins, no cartesian/NLJ") {
    val out = Extensions.ingestAgainstClasses(
      Extensions.classesOf(arrs(Seq(1L -> docA, 2L -> docB, 3L -> docA))),
      arrs(Seq(10L -> docA, 11L -> docB)), bcastClassCap = 0L)
    assert(hintsOf(out).isEmpty,
      s"forced join hints found with the cap disabled")
    out.count()
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"))
    assert(!physical.contains("BroadcastNestedLoop"))
  }

  test("under the measured cap: exactly the two verify sides are " +
    "hinted, the band join never is, and results equal the " +
    "hint-free branch") {
    val reg = arrs(Seq(1L -> docA, 2L -> docB, 3L -> docA))
    val bat = arrs(Seq(10L -> docA, 11L -> docB))
    val gated = Extensions.ingestAgainstClasses(
      Extensions.classesOf(reg), bat)
    assert(hintsOf(gated).size == 2,
      "both verify sides (and only them) must carry the measured hint")
    val free = Extensions.ingestAgainstClasses(
      Extensions.classesOf(reg), bat, bcastClassCap = 0L)
    assert(gated.collect().toSeq.sortBy(_.getLong(0)) ==
      free.collect().toSeq.sortBy(_.getLong(0)))
  }

  test("registry append keeps the measured-gate plan shape") {
    val day1 = arrs(Seq(1L -> docA, 2L -> docB))
    val reg = Extensions.appendRegistry(
      Extensions.classesOf(day1), arrs(Seq(5L -> docA)))
    val out = Extensions.ingestAgainstClasses(reg, arrs(Seq(10L -> docA)),
      bcastClassCap = 0L)
    assert(hintsOf(out).isEmpty)
  }
}
