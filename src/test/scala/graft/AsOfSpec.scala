package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.ops.AsOf
import CommitFixtures.t

/** As-of join semantics: inclusive match at equal timestamps, latest
  * preceding wins, null when nothing precedes; equivalence against a
  * brute-force scan on random data. */
class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches latest at-or-before right row per key; null when none") {
    val left = Seq(
      (1L, t("2024-01-01T10:00:00Z"), 100L), // after r1/r2 -> r2
      (1L, t("2024-01-01T09:00:00Z"), 101L), // exactly at r2 -> r2 (inclusive)
      (1L, t("2024-01-01T07:00:00Z"), 102L), // before everything -> null
      (2L, t("2024-01-01T10:00:00Z"), 103L)  // other key, no rights -> null
    ).toDF("k", "ts", "l_id")
    val right = Seq(
      (1L, t("2024-01-01T08:00:00Z"), 7L),
      (1L, t("2024-01-01T09:00:00Z"), 8L)
    ).toDF("k", "ts", "r_id")
    val got = AsOf.asOfJoin(left, right, "k", "ts")
      .select($"l_id", $"r_id").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(100L -> Some(8L), 101L -> Some(8L),
                      102L -> None, 103L -> None))
  }

  test("genuinely-NULL right payload carries as NULL, not the previous row's value") {
    val left = Seq(
      (1L, t("2024-01-01T10:00:00Z"), 100L), // -> r@09:00 (payload 7)
      (1L, t("2024-01-01T11:00:00Z"), 101L)  // -> r@10:30 whose payload IS null
    ).toDF("k", "ts", "l_id")
    val right = Seq(
      (1L, t("2024-01-01T09:00:00Z"), Some(7L)),
      (1L, t("2024-01-01T10:30:00Z"), None)
    ).toDF("k", "ts", "r_val")
    val got = AsOf.asOfJoin(left, right, "k", "ts")
      .select($"l_id", $"r_val").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(100L -> Some(7L), 101L -> None))
  }

  test("equivalent to brute-force scan on random data") {
    val rnd = new scala.util.Random(7)
    val rights = Seq.tabulate(60)(i =>
      (rnd.nextInt(5).toLong, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L), i.toLong))
    val lefts = Seq.tabulate(80)(i =>
      (rnd.nextInt(5).toLong, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L), (1000 + i).toLong))
    // enforce the (key, ts) uniqueness contract on the right side
    val rightsU = rights.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val got = AsOf.asOfJoin(
        lefts.toDF("k", "ts", "l_id"), rightsU.toDF("k", "ts", "r_id"), "k", "ts")
      .select($"l_id", $"r_id").as[(Long, Option[Long])].collect().toMap
    val expected = lefts.map { case (k, ts, lid) =>
      val cands = rightsU.filter(r => r._1 == k && !r._2.after(ts))
      lid -> (if (cands.isEmpty) None
              else Some(cands.maxBy(r => (r._2.getTime, r._3))._3))
    }.toMap
    assert(got == expected)
  }
}
