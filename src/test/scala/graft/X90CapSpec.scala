package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.queries.Extensions

/** Pins the FpBandCap discipline on the fingerprint substrate
  * (x90/x91's `hashClassNearDup`, the streaming `fingerprintMatch`):
  * a 16-bit band chunk of a PERCEPTUAL hash clusters hard on real
  * media, so (band, k) buckets are pre-counted, hot buckets sub-split
  * by the next band's chunk, and still-hot sub-buckets dropped —
  * candidates per bucket are HARD-bounded at C(cap, 2). The spec
  * drives a deliberately saturating fixture (many distinct hashes
  * sharing one band chunk — the near-flat-image shape), proves the
  * bound, the sub-split rescue, the documented bounded miss, and
  * replays the whole semantics against an independent driver-side
  * reference. */
class X90CapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def chunk(ah: Long, b: Int): Long = (ah >> (16 * b)) & 0xFFFFL

  /** Independent driver-side replay of the two-stage capped banded
    * Hamming near-dup: per (doc_id, ah) row → (n_near, rep). */
  private def reference(rows: Seq[(Long, Long)], hamT: Int,
      cap: Int): Map[(Long, Long), (Long, Long)] = {
    val classes = rows.groupBy(_._2).map { case (ah, rs) =>
      ah -> ((rs.size.toLong, rs.map(_._1).min)) }
    val banded = for { ah <- classes.keys.toSeq; b <- 0 until 4 }
      yield (b, chunk(ah, b), ah)
    val bdf = banded.groupBy(t => (t._1, t._2)).view.mapValues(_.size).toMap
    val sub = banded.map { case (b, k, ah) =>
      val k2 = if (bdf((b, k)) > cap) chunk(ah, (b + 1) % 4) else 0L
      (b, k, k2, ah)
    }
    val bdf2 = sub.groupBy(t => (t._1, t._2, t._3)).view.mapValues(_.size).toMap
    val keep = sub.filter(t => bdf2((t._1, t._2, t._3)) <= cap)
    val pairs: Set[(Long, Long)] =
      keep.groupBy(t => (t._1, t._2, t._3)).values.toSeq.flatMap { g =>
        for (a <- g; b <- g if a._4 != b._4) yield (a._4, b._4)
      }.toSet.filter(p => java.lang.Long.bitCount(p._1 ^ p._2) <= hamT)
    val near: Map[Long, (Long, Long)] =
      pairs.groupBy(_._1).map { case (ah, ps) =>
        ah -> ((ps.toSeq.map(p => classes(p._2)._1).sum,
          ps.toSeq.map(p => classes(p._2)._2).min))
      }
    rows.map { case (id, ah) =>
      val (cnt, cmin) = classes(ah)
      val (ncnt, nmin) = near.getOrElse(ah, (0L, Long.MaxValue))
      (id, ah) -> ((cnt - 1 + ncnt, math.min(cmin, nmin)))
    }.toMap
  }

  private def run(rows: Seq[(Long, Long)], hamT: Int,
      cap: Int): Map[(Long, Long), (Long, Long)] =
    Extensions.hashClassNearDup(rows.toDF("doc_id", "ah"), hamT, cap)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  // the hand fixture, cap = 2 so three classes saturate a bucket:
  //  h1/h2: Hamming 3 (1 bit in band 2, 2 bits in band 3), agreeing
  //  on band-0 and band-1 chunks; BOTH those buckets are made hot,
  //  band 1's sub-split key (the band-2 chunk) differs, band 0's
  //  sub-split key (the band-1 chunk) agrees — so the pair survives
  //  ONLY through band 0's sub-split.
  private val h1 = 0x0001_000A_00FF_1234L
  private val h2 = h1 ^ (1L << 33) ^ (3L << 48)
  // band-0 bucket fillers (chunk0 = 0x1234, everything else far away)
  private val f1 = 0x1111_2222_3333_1234L
  private val f2 = 0x5A5A_4444_6666_1234L
  // band-1 bucket filler (chunk1 = 0x00FF)
  private val g1 = 0x7070_6F6F_00FF_9876L
  private val hand = Seq(1L -> h1, 2L -> h2, 3L -> f1, 4L -> f2, 5L -> g1)

  test("fixture is what it claims: hot buckets, far fillers") {
    assert(java.lang.Long.bitCount(h1 ^ h2) == 3)
    assert(chunk(h1, 0) == chunk(h2, 0) && chunk(h1, 1) == chunk(h2, 1))
    assert(chunk(h1, 2) != chunk(h2, 2) && chunk(h1, 3) != chunk(h2, 3))
    // every filler is Hamming-far from everything
    for (a <- Seq(f1, f2, g1); b <- Seq(h1, h2, f1, f2, g1) if a != b)
      assert(java.lang.Long.bitCount(a ^ b) > 3)
    // band-0 bucket: 4 classes > cap 2; band-1 bucket: 3 classes > 2
    assert(hand.map(_._2).count(chunk(_, 0) == chunk(h1, 0)) == 4)
    assert(hand.map(_._2).count(chunk(_, 1) == chunk(h1, 1)) == 3)
  }

  test("a near pair in a hot bucket is rescued by the sub-split") {
    val got = run(hand, hamT = 3, cap = 2)
    assert(got((1L, h1)) == ((1L, 1L))) // h2's class, rep = min id 1
    assert(got((2L, h2)) == ((1L, 1L)))
    assert(got((3L, f1)) == ((0L, 3L)))
  }

  test("a pair agreeing ONLY on a hot band with differing sub-split " +
    "chunk is the documented bounded miss") {
    // h3/h4: 3 bits spread over bands 1..3 → agree on band 0 only;
    // band 0 hot, sub-split key (band-1 chunk) differs → dropped
    val h3 = 0x0100_0B00_FF00_4321L
    val h4 = h3 ^ (1L << 17) ^ (1L << 34) ^ (1L << 50)
    val miss = Seq(1L -> h3, 2L -> h4, 3L -> (0x2222_3333_4444_0000L | chunk(h3, 0)),
      4L -> (0x6666_0F77_5888_0000L | chunk(h3, 0)))
    assert(java.lang.Long.bitCount(h3 ^ h4) == 3)
    val capped = run(miss, hamT = 3, cap = 2)
    assert(capped((1L, h3)) == ((0L, 1L))) // missed under the cap
    val uncapped = run(miss, hamT = 3, cap = 1000)
    assert(uncapped((1L, h3)) == ((1L, 1L))) // found without it
  }

  test("saturating fixture: engine equals the independent reference " +
    "and every kept bucket respects the hard bound") {
    // 90 distinct hashes all sharing the band-0 chunk (near-flat
    // images): LCG-generated high bits, plus a handful of true near
    // pairs salted in
    var s = 0x9E3779B97F4A7C15L
    def nxt(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    val flat = (0 until 90).map { i =>
      (100L + i) -> ((nxt() << 16) | 0x00FEL)
    }
    val pairs = flat.take(6).zipWithIndex.map { case ((_, ah), i) =>
      (300L + i) -> (ah ^ (1L << (20 + i)))
    }
    val rows = flat ++ pairs ++ hand.map { case (id, ah) => (id + 500L) -> ah }
    val cap = 8
    assert(run(rows, hamT = 3, cap = cap) == reference(rows, 3, cap))
    // the bound: replay the keep set and check every bucket ≤ cap
    val classes = rows.map(_._2).distinct
    val banded = for { ah <- classes; b <- 0 until 4 } yield (b, chunk(ah, b), ah)
    val bdf = banded.groupBy(t => (t._1, t._2)).view.mapValues(_.size).toMap
    assert(bdf.values.max > cap, "fixture must actually saturate")
    val sub = banded.map { case (b, k, ah) =>
      (b, k, if (bdf((b, k)) > cap) chunk(ah, (b + 1) % 4) else 0L, ah) }
    val kept = sub.groupBy(t => (t._1, t._2, t._3)).view.mapValues(_.size)
      .filter(_._2 <= cap)
    assert(kept.values.max <= cap)
  }

  test("fingerprintMatch applies the same cap with the survival-mask " +
    "dedupe: sub-split rescue hits, capped-away pair misses") {
    val registry = Extensions.fingerprintClasses(
      Seq(1L -> h1, 3L -> f1, 4L -> f2, 5L -> g1).toDF("doc_id", "ah"))
    val arrivals = Seq(99L -> h2).toDF("id", "ah")
    val got = Extensions.fingerprintMatch(arrivals, registry, 3, cap = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((99L, h1, 1L, 1L, 3L)))
    // the bounded-miss shape: agree only on a hot band, sub-split
    // chunk differs → no match under the cap, match without it
    val h3 = 0x0100_0B00_FF00_4321L
    val h4 = h3 ^ (1L << 17) ^ (1L << 34) ^ (1L << 50)
    val reg2 = Extensions.fingerprintClasses(
      Seq(1L -> h3, 3L -> (0x2222_3333_4444_0000L | chunk(h3, 0)),
        4L -> (0x6666_0F77_5888_0000L | chunk(h3, 0))).toDF("doc_id", "ah"))
    val arr2 = Seq(99L -> h4).toDF("id", "ah")
    assert(Extensions.fingerprintMatch(arr2, reg2, 3, cap = 2).count() == 0L)
    assert(Extensions.fingerprintMatch(arr2, reg2, 3, cap = 1000).count() == 1L)
  }

  test("a match never emits twice even when several bands agree") {
    val base = 0x0123_4567_89AB_CDEFL
    val nb = base ^ (1L << 5) // agree on bands 1,2,3
    val registry = Extensions.fingerprintClasses(
      Seq(1L -> base).toDF("doc_id", "ah"))
    val got = Extensions.fingerprintMatch(
      Seq(9L -> nb).toDF("id", "ah"), registry, 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((9L, base, 1L, 1L, 1L)))
  }
}
