package graft

import graft.queries.Extensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The hashed 64-bit mask folds words onto bits (hash(word) mod 64),
  * so two DIFFERENT token sets can produce the SAME mask. These tests
  * pin the invariant that makes that safe: the dedup CLASS key is the
  * exact token-set signature, never the mask — a deliberately
  * colliding fixture must stay two classes, and both docs must
  * survive the end-to-end x19 keep-list.
  */
class DocMasksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** hex32(md5(w)) % 64 — the mask bit the Spark side assigns to a
    * word, recomputed driver-side to build the colliding fixture. */
  private def bitOf(w: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.take(8), 16) % 64).toInt
  }

  /** Two distinct single words that hash to the same mask bit
    * (pigeonhole over 65 candidates guarantees one exists). */
  private lazy val (w1, w2) = {
    val words = (0 to 64).map(i => s"collide$i")
    val byBit = words.groupBy(bitOf)
    val pair = byBit.values.find(_.size >= 2).get
    (pair(0), pair(1))
  }

  test("fixture is a genuine collision: same mask, different sig") {
    val docs = Seq((1L, w1), (2L, w2)).toDF("doc_id", "text")
    val out = Extensions.docMasksOf(docs)
      .select(col("doc_id"), col("sig"), col("mask"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0)._3 == out(1)._3, "masks must collide for the fixture to bite")
    assert(out(0)._2 != out(1)._2, "sigs must differ — different token sets")
  }

  test("x19 keeps both docs of a mask-colliding pair (classes are sig-keyed)") {
    val dir = java.nio.file.Files.createTempDirectory("docmasks").toString
    Seq((1L, w1, "en", "fixture", w1.length.toLong),
        (2L, w2, "en", "fixture", w2.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val x19 = Extensions.all.find(_.name == "x19_dedup_keep").get
    val keep = x19.fn(spark, dir)
      .select(col("doc_id"), col("keep"))
      .as[(Long, Boolean)].collect().toMap
    assert(keep == Map(1L -> true, 2L -> true),
      s"a mask collision must not drop a non-duplicate; got $keep")
  }

  test("true duplicates still collapse to one keeper") {
    val dir = java.nio.file.Files.createTempDirectory("docmasks2").toString
    Seq((1L, "alpha beta", "en", "fixture", 10L),
        (2L, "beta alpha", "en", "fixture", 10L), // same token SET
        (3L, "gamma delta", "en", "fixture", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val x19 = Extensions.all.find(_.name == "x19_dedup_keep").get
    val keep = x19.fn(spark, dir)
      .select(col("doc_id"), col("keep"))
      .as[(Long, Boolean)].collect().toMap
    assert(keep == Map(1L -> true, 2L -> false, 3L -> true))
  }
}
