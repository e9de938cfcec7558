package graft

import graft.ops.BloomSemiJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Bloom-pruned semi-join: no false negatives ever, real pruning at
  * the documented sizing, partition-independent bitset, and exact
  * semi-join equality end to end. */
class BloomSemiJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("membership has no false negatives: every true key passes the bloom") {
    val keys = (1L to 500L).map(_ * 7).toDF("k")
    val survivors = keys
      .crossJoin(broadcast(BloomSemiJoin.bloomOf(keys, "k")))
      .filter(BloomSemiJoin.mightContain($"k", $"bloom"))
      .count()
    assert(survivors == 500L, "a bloom filter must never drop a member")
  }

  test("pruning: most non-members are dropped map-side at 1024 words / 3 hashes") {
    val keys = (1L to 1000L).toDF("k")
    val probes = (100001L to 110000L).toDF("k") // 10k guaranteed non-members
    val fp = probes
      .crossJoin(broadcast(BloomSemiJoin.bloomOf(keys, "k")))
      .filter(BloomSemiJoin.mightContain($"k", $"bloom"))
      .count()
    // m/n ≈ 65, 3 hashes -> theoretical FP ~1e-4; allow generous slack
    assert(fp < 100, s"false-positive rate too high: $fp / 10000 passed")
  }

  test("the bitset is identical however the key side is partitioned") {
    val keys = (1L to 300L).map(_ * 13)
    val a = BloomSemiJoin.bloomOf(keys.toDF("k").repartition(1), "k")
      .as[Seq[Long]].collect().head
    val b = BloomSemiJoin.bloomOf(keys.toDF("k").repartition(11), "k")
      .as[Seq[Long]].collect().head
    assert(a == b, "bit_or construction must be partition-order independent")
  }

  test("end to end: bloom-pruned semi-join equals the plain semi-join") {
    val rnd = new Random(3)
    val big = (1 to 5000).map(_ => (rnd.nextLong(20000), rnd.nextInt(100)))
      .toDF("k", "v")
    val keys = (1 to 700).map(_ => rnd.nextLong(20000)).distinct.toDF("key")
    val got = BloomSemiJoin.semiJoin(big, "k", keys, "key")
      .as[(Long, Int)].collect().sorted.toSeq
    val want = big.join(keys.select($"key".as("k")), Seq("k"), "left_semi")
      .as[(Long, Int)].collect().sorted.toSeq
    assert(got == want)
  }

  test("null big-side keys never match, exactly like a semi-join") {
    val big = Seq(Some(1L), None, Some(2L), Some(99L)).toDF("k")
    val keys = Seq(1L, 2L).toDF("key")
    val got = BloomSemiJoin.semiJoin(big, "k", keys, "key")
      .as[Option[Long]].collect().flatten.sorted.toSeq
    assert(got == Seq(1L, 2L))
  }
}
