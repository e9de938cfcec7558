package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Extensions
import graft.ops.Cols.tokenSetSig
import org.apache.spark.sql.functions.col

/** Pins x92's quality-aware canonical election via its components:
  * two docs with the SAME token set but different surface shape elect
  * the higher-quality copy, quality ties fall to the min doc_id, and
  * singletons keep themselves. */
class X92KeepBestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) = {
    val docs = rows.toDF("doc_id", "text")
    val scored = Extensions.qualityScored(docs, carry = Seq("text"))
    val t = scored.select(col("doc_id"), col("quality_score"),
      tokenSetSig(col("text")).as("sig"))
    t.as[(Long, Int, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("same token set, different surface quality: the cleaner copy wins") {
    // doc 2 repeats its tokens heavily -> uniq/total ratio collapses,
    // losing the diversity point; both have the identical token SET
    val base = "the quick brown fox jumps over a lazy dog and rests"
    val spam = base + (" the the the the the the the the the the" * 8)
    val got = run(Seq(1L -> spam, 2L -> base))
    val (q1, sig1) = got(1L)
    val (q2, sig2) = got(2L)
    assert(sig1 == sig2, "same token set must share the class key")
    assert(q2 > q1, s"clean copy must outscore the spammy one ($q2 vs $q1)")
    // the gate elects doc 2 despite doc 1's smaller id
    val out = Extensions.qualityScored(
        Seq(1L -> spam, 2L -> base).toDF("doc_id", "text"),
        carry = Seq("text"))
      .select(col("doc_id"), col("quality_score"),
        tokenSetSig(col("text")).as("sig"))
    val best = out.groupBy(col("sig"))
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct(col("quality_score"),
          (-col("doc_id")).as("nid"))).as("b"))
      .select((-col("b.nid")).as("best_id"))
      .as[Long].collect()
    assert(best.toSeq == Seq(2L))
  }

  test("quality ties elect the min doc_id; singletons keep themselves") {
    val a = "alpha beta gamma delta epsilon of the and a zeta"
    val got = run(Seq(5L -> a, 3L -> a, 9L -> "unique solo doc of the a and words here"))
    assert(got(5L)._1 == got(3L)._1 && got(5L)._2 == got(3L)._2)
    // election by (score desc, id asc): 3 beats 5 on the tie
    val out = Seq(5L -> a, 3L -> a).toDF("doc_id", "text")
    val t = Extensions.qualityScored(out, carry = Seq("text"))
      .select(col("doc_id"), col("quality_score"),
        tokenSetSig(col("text")).as("sig"))
    val best = t.groupBy(col("sig"))
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct(col("quality_score"),
          (-col("doc_id")).as("nid"))).as("b"))
      .select((-col("b.nid")).as("best_id")).as[Long].collect()
    assert(best.toSeq == Seq(3L))
  }
}
