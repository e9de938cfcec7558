package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Extensions

/** Round-15 fusion pin: [[Extensions.spanScrubWithCounts]] must be
  * column-for-column identical to the unfused pair it replaced —
  * spanScrub (rewrite side) plus spanDedupCounts at winnow 1 (the
  * input corpus's span statistics) — including short-doc zero rows,
  * fully-scrubbed docs, and the cross-doc-only trigger rule.
  */
class SpanScrubFusionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // 8-token window (the gate grain) fixtures: a duplicated 8-token
  // run shared by two docs, a doc short of one window, an empty doc,
  // and a within-doc-only repeat that must NOT trigger removal
  private val run = (1 to 8).map(i => s"w$i").mkString(" ")
  private val corpus = docs(
    1L -> s"alpha $run beta",
    2L -> s"$run gamma delta",
    3L -> "too short for any window",
    4L -> "",
    5L -> s"solo $run solo $run", // within-doc repeat + cross-doc dup
    6L -> "unique tokens only here padding one two three four five six")

  test("fused scrub+counts equals spanScrub x spanDedupCounts") {
    val fused = Extensions.spanScrubWithCounts(corpus)
      .orderBy("doc_id").collect()
    val unfused = Extensions.spanScrub(corpus)
      .join(Extensions.spanDedupCounts(corpus), Seq("doc_id"))
      .select(col("doc_id"), col("n_tok"), col("n_removed"), col("clean"),
        col("n_spans"), col("dup_spans"))
      .orderBy("doc_id").collect()
    assert(fused.toSeq == unfused.toSeq)
    spark.catalog.clearCache()
  }

  test("scrubRoundAudit keeps the exact unfused column sequence") {
    val out = Extensions.scrubRoundAudit(corpus, rounds = 2)
    assert(out.columns.toSeq ==
      Seq("doc_id", "dup_r0", "rm_r1", "dup_r1", "rm_r2", "dup_r2"))
    // round-0 dup counts must equal a direct spanDedupCounts run
    val direct = Extensions.spanDedupCounts(corpus)
      .select(col("doc_id"), col("dup_spans").as("dup_r0"))
      .orderBy("doc_id").collect()
    assert(out.select(col("doc_id"), col("dup_r0"))
      .orderBy("doc_id").collect().toSeq == direct.toSeq)
    spark.catalog.clearCache()
  }
}
