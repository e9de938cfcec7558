package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Extensions

/** Pins x85's prototypicality pruning (SSL-prototypes): the per-label
  * quantile-BUCKET threshold — prune the smallest bucket-aligned
  * superset of the n·pm/1000 quota, most-prototypical (highest
  * cosine-to-centroid) first — against an independent driver-side
  * replay of the rule, plus the hand-checkable edges: a quota of 0
  * prunes nothing, a single-bucket label prunes entirely (the
  * documented over-prune of bucket granularity), and the threshold
  * property that every pruned row's bucket ≥ every kept row's only
  * fails across the threshold bucket itself. */
class X85ProtoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Int, Seq[Long])], pm: Long = 250L) =
    Extensions.protoPrune(rows.toDF("vec_id", "label", "qv"), pm)
      .as[(Long, Int, Long, Boolean)].collect().toSet

  /** Independent replay: sum centroid, JVM-double cosine in
    * LongCosine's exact op order (long dot / (sqrt·sqrt)), bucket =
    * floor(cos·64), threshold = first bucket from the top whose
    * cumulative count reaches the quota. */
  private def reference(rows: Seq[(Long, Int, Seq[Long])],
      pm: Long): Set[(Long, Int, Long, Boolean)] =
    rows.groupBy(_._2).flatMap { case (lbl, rs) =>
      val dim = rs.head._3.length
      val cent = Array.tabulate(dim)(i => rs.map(_._3(i)).sum)
      def cos(a: Seq[Long]): Double = {
        var dot = 0L; var na = 0L; var nb = 0L
        for (i <- 0 until dim) {
          dot += a(i) * cent(i); na += a(i) * a(i); nb += cent(i) * cent(i)
        }
        dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
      }
      val bk = rs.map(r => (r._1, math.floor(cos(r._3) * 64).toLong))
      val quota = rs.size * pm / 1000
      val hist = bk.groupBy(_._2).view.mapValues(_.size).toMap
      var cum = 0L
      var thr = Option.empty[Long]
      for (b <- hist.keys.toSeq.sorted(Ordering[Long].reverse)) {
        cum += hist(b)
        if (thr.isEmpty && quota > 0 && cum >= quota) thr = Some(b)
      }
      bk.map { case (id, b) => (id, lbl, b, thr.exists(b >= _)) }
    }.toSet

  test("matches the independent replay on a mixed two-label fixture") {
    val rows = Seq[(Long, Int, Seq[Long])](
      (1L, 0, Seq(1000L, 0L, 0L)), (2L, 0, Seq(900L, 300L, 0L)),
      (3L, 0, Seq(800L, 500L, 100L)), (4L, 0, Seq(100L, 900L, 400L)),
      (5L, 0, Seq(0L, 0L, 1000L)), (6L, 0, Seq(500L, 500L, 500L)),
      (7L, 0, Seq(-400L, 800L, 200L)), (8L, 0, Seq(300L, -200L, 900L)),
      (9L, 1, Seq(10L, 20L, 30L)), (10L, 1, Seq(30L, 20L, 10L)),
      (11L, 1, Seq(-10L, 40L, 25L)), (12L, 1, Seq(15L, 15L, 70L)))
    assert(run(rows) == reference(rows, 250L))
  }

  test("quota 0 (label smaller than 1000/pm) prunes nothing") {
    val rows = Seq[(Long, Int, Seq[Long])](
      (1L, 0, Seq(1000L, 0L)), (2L, 0, Seq(0L, 1000L)),
      (3L, 0, Seq(700L, 700L)))
    assert(run(rows, pm = 250L).forall(!_._4)) // 3·250/1000 = 0
  }

  test("single-bucket label prunes entirely: bucket granularity is the floor") {
    // four at (1000,0), four at (0,1000): centroid (4000,4000), every
    // cosine is 1/sqrt(2) → one bucket (45) holds all 8; quota 2 ≤ 8,
    // so the whole bucket — all rows — is pruned
    val rows = (1L to 4L).map(i => (i, 0, Seq(1000L, 0L))) ++
      (5L to 8L).map(i => (i, 0, Seq(0L, 1000L)))
    val got = run(rows)
    assert(got.size == 8 && got.forall(_._3 == 45L) && got.forall(_._4))
  }

  test("threshold property: pruned buckets dominate kept buckets per label") {
    val rows = (1L to 20L).map(i =>
      (i, (i % 2).toInt, Seq(i * 37 % 11 * 100L - 300L, i * 53 % 7 * 100L,
        (i * 29 % 13) * 50L)))
    val got = run(rows)
    assert(got == reference(rows, 250L))
    for (lbl <- Seq(0, 1)) {
      val g = got.filter(_._2 == lbl)
      val quota = g.size * 250 / 1000
      val pruned = g.filter(_._4)
      if (quota > 0) {
        assert(pruned.size >= quota)
        val minPruned = pruned.map(_._3).min
        assert(g.filter(!_._4).forall(_._3 < minPruned))
      }
    }
  }
}
