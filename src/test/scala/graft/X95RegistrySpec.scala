package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.queries.Extensions
import graft.ops.Cols.tokenSet

/** Pins x95's registry maintenance: appending a day's docs into a
  * frozen class registry (novel sigs insert, existing sigs merge —
  * cnt sums, min_id takes the least) is EXACTLY rebuilding the class
  * table over the union history, so ingest(day2) against the
  * appended registry equals batch incrementalIngest(day0 ∪ day1,
  * day2) row for row. */
class X95RegistrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def arrs(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), tokenSet(col("text")).as("arr"))

  private val docA = "alpha beta gamma delta epsilon zeta eta theta"
  private val docB = "one two three four five six seven eight nine ten"
  private val docC = "red orange yellow green blue indigo violet pink"

  private def collect(df: DataFrame): Set[(Long, Long, Long, Long, Boolean)] =
    df.as[(Long, Long, Long, Long, Boolean)].collect().toSet

  test("ingest over the appended registry equals batch over the union") {
    // day0 and day1 share class A (counts must merge: 2 + 1), day1
    // brings novel class C, and day1's A copy has a SMALLER id than
    // day0's (the min-id merge direction that matters)
    val day0 = Seq(7L -> docA, 8L -> docA, 9L -> docB)
    val day1 = Seq(3L -> docA, 4L -> docC)
    val day2 = Seq(20L -> docA, 21L -> docC, 22L -> "totally novel words")
    val appended = Extensions.appendRegistry(
      Extensions.classesOf(arrs(day0)), arrs(day1))
    val viaAppend = collect(
      Extensions.ingestAgainstClasses(appended, arrs(day2)))
    val viaBatch = collect(
      Extensions.incrementalIngest(arrs(day0 ++ day1), arrs(day2)))
    assert(viaAppend == viaBatch)
    // and the values are the merged ones: 3 copies of A, best = id 3
    assert(viaAppend.contains((20L, 3L, 3L, 1000L, false)))
    assert(viaAppend.contains((21L, 1L, 4L, 1000L, false)))
    assert(viaAppend.contains((22L, 0L, -1L, 0L, true)))
  }

  test("appendRegistry merges classes exactly") {
    val reg = Extensions.appendRegistry(
      Extensions.classesOf(arrs(Seq(7L -> docA, 8L -> docA, 9L -> docB))),
      arrs(Seq(3L -> docA, 4L -> docC)))
    val got = reg.select(col("sig"), col("cnt"), col("min_id"))
      .as[(String, Long, Long)].collect()
      .map(r => (r._2, r._3)).toSet
    // A: cnt 3 (2 + 1), min_id 3; B: untouched (1, 9); C: novel (1, 4)
    assert(got == Set((3L, 3L), (1L, 9L), (1L, 4L)))
    // a second append is idempotent in shape: one row per sig
    val again = Extensions.appendRegistry(reg, arrs(Seq(100L -> docA)))
    assert(again.count() == 3L)
    assert(again.filter(col("min_id") === 3L)
      .select(col("cnt")).as[Long].head() == 4L)
  }
}
