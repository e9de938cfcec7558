package graft

import java.security.MessageDigest

import graft.queries.Extensions
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance weighting (x81): the gate's oracle replays the
  * same construction in DuckDB, so this spec is the independent third
  * implementation — a plain-Scala BigInt reference over the collected
  * sf0.001 corpus (md5-hashed unigram buckets, add-1 smoothed
  * whole-bit log-ratio weights, per-doc sums) compared row-for-row —
  * plus the directional property that makes the score DSIR: a doc of
  * target-heavy tokens outscores a doc of offtarget-heavy tokens.
  */
class X81DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val B = 256

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def bucket(tok: String): Int =
    (java.lang.Long.parseLong(md5hex(tok).substring(0, 8), 16) % B).toInt

  /** floor(log2(num/den)) in whole bits, clamped at -20 below 1 —
    * the wholeBitLog2Sql contract. */
  private def wholeBits(num: BigInt, den: BigInt): Long =
    if (num >= den) ((num / den).bitLength - 1).toLong
    else math.max(-20L, -((den - 1) / num).bitLength.toLong)

  test("gate output equals a driver-side BigInt reference at sf0.001") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "lang")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    val toks = docs.flatMap { case (id, text, lang) =>
      text.split(" ", -1).map(t => (id, lang, bucket(t)))
    }
    val qc = toks.groupBy(_._3).map { case (b, xs) => b -> xs.length.toLong }
    val pc = toks.filter(_._2 == "en").groupBy(_._3)
      .map { case (b, xs) => b -> xs.length.toLong }
    val qtok = toks.length.toLong
    val ptok = toks.count(_._2 == "en").toLong
    val w = (0 until B).map { b =>
      b -> wholeBits(
        BigInt(pc.getOrElse(b, 0L) + 1) * (qtok + B),
        BigInt(qc.getOrElse(b, 0L) + 1) * (ptok + B))
    }.toMap

    val expected = docs.map { case (id, text, lang) =>
      val ts = text.split(" ", -1)
      (id, if (lang == "en") 1 else 0, ts.length.toLong,
        ts.map(t => w(bucket(t))).sum)
    }.toSeq.sortBy(identity)

    val got = SparkEntry.queries("x81_dsir_weights")(
        spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(identity)

    assert(got == expected)
  }

  test("directional: target-profile docs outscore offtarget-profile docs") {
    // fixture: target docs share a dedicated vocabulary, offtarget
    // docs another; a probe doc drawn fully from the target vocab
    // must outscore a probe drawn fully from the offtarget vocab.
    val tgtVocab = (0 until 20).map(i => s"tgt$i")
    val offVocab = (0 until 20).map(i => s"off$i")
    val rows =
      (0 until 10).map(i => (i.toLong, tgtVocab.mkString(" "), "en")) ++
      (10 until 20).map(i => (i.toLong, offVocab.mkString(" "), "de")) :+
      (20L, tgtVocab.take(10).mkString(" "), "de") :+ // target-profile probe
      (21L, offVocab.take(10).mkString(" "), "en")    // offtarget-profile probe
    val df = rows.toDF("doc_id", "text", "lang")
    val out = Extensions.dsirWeights(spark, df)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(20L) > out(21L))
    assert(out(0L) > out(10L))
  }
}
