package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
import graft.queries.Extensions

/** Pins x73's scale contract in the PLAN (the x86 pattern — this was
  * the tree's last unconditional broadcast hint): the calibration
  * verify sides carry a broadcast hint ONLY under the measured
  * candidate-class cap (one tiny count over the persisted candidate
  * id set decides) — on a near-dup-dense corpus with few exact
  * duplicates, candidate reps ≈ classes ≈ corpus, and an
  * unconditional hint force-ships every token array to the driver.
  * Both branches produce bit-identical histograms; the cap-0 branch
  * is hint-free and shuffleable with no cartesian/NLJ. */
class X73PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val Dir = "/root/testdata/sf0.001"

  private def hintsOf(df: DataFrame): Seq[ResolvedHint] =
    df.queryExecution.analyzed.collect { case h: ResolvedHint => h }

  private def rows(df: DataFrame): Seq[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(identity).toSeq

  test("cap 0 = the scale fallback: zero hints, shuffleable verify " +
    "joins, no cartesian/NLJ — and bit-equal to the hinted branch") {
    val free = Extensions.lshCalibration(spark, Dir, bcastClassCap = 0L)
    assert(hintsOf(free).isEmpty,
      "forced join hints found with the cap disabled")
    val freeRows = rows(free)
    val physical = free.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"))
    assert(!physical.contains("BroadcastNestedLoop"))

    val gated = Extensions.lshCalibration(spark, Dir)
    assert(hintsOf(gated).size == 2,
      "both verify sides (and only them) must carry the measured hint")
    assert(rows(gated) == freeRows)
    assert(freeRows.nonEmpty)
  }
}
