package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The native rolling fingerprint ([[graft.functions.RollingFp]])
  * against the HOF formulation it replaces (x10's former engine —
  * which the DuckDB oracle still replays independently, so this
  * equality chains the native pass to the oracle): bit-for-bit on
  * the real corpus plus the edge fixtures the byte-offset rewrite
  * could get wrong on its own. */
class RollingFpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hof(w: Int) = expr(
    s"""array_min(transform(sequence(1, greatest(length(text) - ${w - 1}, 1)),
        i -> md5(substring(text, i, $w))))""")

  private def both(df: org.apache.spark.sql.DataFrame, w: Int) =
    df.select(col("doc_id"),
        graft.functions.RollingFp.rollingFp(col("text"), w).as("native"),
        hof(w).as("hofv"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("native pass equals the HOF form on the real corpus (w=8)") {
    val rows = both(Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")), 8)
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, h) =>
      assert(n == h, s"doc $id: native $n != hof $h") }
  }

  test("edge fixtures: empty, shorter-than-window, exact-window, " +
    "multi-byte characters, repeated text; and other window widths") {
    val fix = Seq(
      (1L, ""),                      // one window over the empty text
      (2L, "abc"),                   // shorter than w: whole text
      (3L, "abcdefgh"),              // exactly one full window
      (4L, "abcdefghi"),             // two windows
      (5L, "café naïve résumé über"), // 2-byte chars
      (6L, "aaaaaaaaaaaaaaaa"),      // all windows identical
      (7L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    Seq(1, 3, 8, 20).foreach { w =>
      both(fix, w).foreach { case (id, n, h) =>
        assert(n == h, s"doc $id w=$w: native $n != hof $h") }
    }
    // pin the degenerate-window convention explicitly: empty text
    // fingerprints as md5("")
    val e = both(fix.filter(col("doc_id") === 1L), 8).head
    assert(e._2 == "d41d8cd98f00b204e9800998ecf8427e")
  }
}
