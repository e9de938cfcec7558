package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The native binary-search OOV counter
  * ([[graft.functions.OovCount]]) against the HOF formulation it
  * replaces (which the x84 DuckDB oracle still replays
  * independently): bit-for-bit on the real corpus with the real
  * trained vocabulary, plus the edge fixtures a search rewrite could
  * get wrong — boundary tokens (below the smallest / above the
  * largest vocab entry), empty tokens, empty text, empty vocab. */
class OovCountSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hof = size(filter(split(col("text"), " "),
    t => not(array_contains(col("varr"), t)))).cast("long")

  private def both(docs: org.apache.spark.sql.DataFrame,
                   voc: org.apache.spark.sql.DataFrame) =
    docs.crossJoin(broadcast(voc))
      .select(col("doc_id"),
        graft.functions.OovCount.oovCount(col("text"), col("varr"))
          .as("native"),
        hof.as("hofv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("native binary search equals the HOF scan on the real corpus " +
    "with the trained vocabulary") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val rows = both(docs, graft.queries.Extensions.oovVocab(docs))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, h) => assert(n == h, s"doc $id: $n != $h") }
    // the corpus vocabulary is only 31 distinct tokens, so any vocab
    // >= 31 makes the check vacuous; an 8-token one leaves real OOV
    // mass
    val rows8 = both(docs, graft.queries.Extensions.oovVocab(docs, 8))
    rows8.foreach { case (id, n, h) => assert(n == h, s"doc $id: $n != $h") }
    assert(rows8.exists(_._2 > 0), "fixture vacuous: nothing OOV")
  }

  test("edge fixtures: boundary tokens, empty tokens, empty text, " +
    "empty vocab") {
    val voc = Seq(Tuple1(Seq("bb", "dd", "ff"))).toDF("varr")
    val docs = Seq(
      (1L, "aa bb cc dd ee ff gg"), // below-min, hits, between, above-max
      (2L, ""),                     // one empty token: OOV
      (3L, "  bb  "),               // empties kept by split
      (4L, "bb bb bb"),             // repeats all in-vocab
      (5L, "zz zz")                 // all above max
    ).toDF("doc_id", "text")
    both(docs, voc).foreach { case (id, n, h) =>
      assert(n == h, s"doc $id: $n != $h") }
    val gotEmptyVoc = both(docs,
      Seq(Tuple1(Seq.empty[String])).toDF("varr"))
    gotEmptyVoc.foreach { case (id, n, h) =>
      assert(n == h, s"empty vocab, doc $id: $n != $h") }
  }
}
