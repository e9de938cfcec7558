package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.IntervalJoin
import java.sql.Timestamp

/** The bucketed interval join must be pair-for-pair identical to the
  * naive key-join + range filter, including inclusive bounds and
  * bucket-boundary rows, for any bucket width. */
class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naive(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame,
                    lo: Long, up: Long) =
    l.join(r.withColumnRenamed("k", "k2"),
      $"k" === $"k2" &&
        $"rts" >= $"lts" + expr(s"INTERVAL $lo SECOND") &&
        $"rts" <= $"lts" + expr(s"INTERVAL $up SECOND"))
      .select($"l_id", $"r_id")

  test("equals naive range join on random data across bucket widths") {
    val rnd = new scala.util.Random(11)
    val base = 1700000000L
    val l = Seq.tabulate(300)(i =>
      (rnd.nextInt(4).toLong, new Timestamp((base + rnd.nextInt(20000)) * 1000L +
        rnd.nextInt(1000)), i.toLong)).toDF("k", "lts", "l_id")
    val r = Seq.tabulate(400)(i =>
      (rnd.nextInt(4).toLong, new Timestamp((base + rnd.nextInt(20000)) * 1000L +
        rnd.nextInt(1000)), (1000 + i).toLong)).toDF("k", "rts", "r_id")
    val expected = naive(l, r, -3600, 1800)
      .as[(Long, Long)].collect().toSet
    for (bucket <- Seq(600L, 5400L, 7200L)) {
      val got = IntervalJoin.bucketed(l, r, "k", "lts", "rts", -3600, 1800, bucket)
        .select($"l_id", $"r_id").as[(Long, Long)].collect().toSeq
      assert(got.toSet == expected, s"bucket=$bucket set mismatch")
      assert(got.size == expected.size, s"bucket=$bucket produced duplicates")
    }
  }

  test("matches the q08-shaped join on real events") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    val a = e.filter($"event_type" === "purchase")
      .select($"user_id".as("k"), $"ts".as("lts"), $"event_id".as("l_id"))
    val b = e.select($"user_id".as("k"), $"ts".as("rts"), $"event_id".as("r_id"))
    val expected = naive(a, b, -3600, 1800).as[(Long, Long)].collect().toSet
    val got = IntervalJoin.bucketed(a, b, "k", "lts", "rts", -3600, 1800, 5400)
      .select($"l_id", $"r_id").as[(Long, Long)].collect()
    assert(got.toSet == expected && got.length == expected.size)
  }
}
