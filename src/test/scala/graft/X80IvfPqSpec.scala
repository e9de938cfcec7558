package graft

import org.scalatest.funsuite.AnyFunSuite

/** IVF-PQ (x80): the gate's oracle replays the same construction in
  * DuckDB, so a shared formula bug would stay green. This spec is the
  * third implementation: a plain-Scala driver-side IVFADC over the
  * collected sf0.001 vectors — one Lloyd round on the coarse
  * quantizer (floor-div integer means over the seed assignment),
  * residual PQ encode against a one-Lloyd-round codebook, 6-cell
  * probe, ADC shortlist R = max(3k, n/10), exact re-rank to top-5 —
  * compared row-for-row to the DataFrame result. Any divergence in
  * tie-breaking, mean flooring, residual arithmetic, code layout or
  * probe selection between the three implementations fails here.
  */
class X80IvfPqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val Cells = 8
  private val Probe = 6
  private val M = 16
  private val Sub = 4
  private val K = 16
  private val Dim = M * Sub
  private val NumQueries = 10
  private val TopK = 5

  private def l2sq(a: Array[Long], b: Array[Long]): Long = {
    var d = 0L; var i = 0
    while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }
    d
  }

  /** argmin-L2² index into `cents`, tie -> smallest index. */
  private def argmin(v: Array[Long], cents: IndexedSeq[Array[Long]]): Int = {
    var best = -1; var bestd = Long.MaxValue; var c = 0
    while (c < cents.length) {
      val d = l2sq(v, cents(c))
      if (d < bestd) { bestd = d; best = c }
      c += 1
    }
    best
  }

  /** One Lloyd update: per cluster, the exact floor-div integer mean
    * of its members; an empty cluster keeps its seed. */
  private def lloydRound(vs: Seq[Array[Long]], seeds: IndexedSeq[Array[Long]])
      : IndexedSeq[Array[Long]] = {
    val asg = vs.map(v => argmin(v, seeds))
    seeds.indices.map { c =>
      val members = vs.zip(asg).collect { case (v, a) if a == c => v }
      if (members.isEmpty) seeds(c)
      else Array.tabulate(seeds(c).length) { i =>
        math.floor(members.map(_(i)).sum.toDouble / members.size).toLong
      }
    }
  }

  test("gate output equals a driver-side trained-IVFADC reference at sf0.001") {
    val raw = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(floor(x * 1000) AS LONG)) AS qv")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    assert(raw.length >= K && raw.head._2.length == Dim)
    val n = raw.length
    val byId = raw.toMap

    // coarse quantizer: first-Cells seeds, ONE Lloyd round
    val cents = lloydRound(raw.map(_._2),
      (0 until Cells).map(c => byId(c.toLong)))
    val cellOf = raw.map { case (id, v) => id -> argmin(v, cents) }.toMap
    def residOf(id: Long): Array[Long] = {
      val v = byId(id); val cv = cents(cellOf(id))
      Array.tabulate(Dim)(i => v(i) - cv(i))
    }

    // residual codebook: first-K residual slices per sub, ONE Lloyd
    // round per subspace
    val cb = Array.tabulate(M) { s =>
      val subs = raw.map { case (id, _) =>
        residOf(id).slice(s * Sub, s * Sub + Sub) }
      lloydRound(subs, (0 until K).map(c =>
        residOf(c.toLong).slice(s * Sub, s * Sub + Sub)))
    }
    def encode(r: Array[Long]): Array[Int] = Array.tabulate(M) { s =>
      argmin(r.slice(s * Sub, s * Sub + Sub), cb(s))
    }
    val codesOf = raw.map { case (id, _) => id -> encode(residOf(id)) }.toMap

    // probes + ADC shortlist (R scales with the corpus), exact re-rank
    val RerankR = math.max(3L * TopK, n.toLong / 10).toInt
    val adcRanked = (0L until NumQueries.toLong).map { qid =>
      val qq = byId(qid)
      val probed = cents.zipWithIndex.map { case (cv, cid) =>
        (l2sq(qq, cv), cid) }.sorted.take(Probe).map(_._2)
      val scored = probed.flatMap { cid =>
        val cv = cents(cid)
        val qr = Array.tabulate(Dim)(i => qq(i) - cv(i))
        raw.iterator
          .filter { case (id, _) => cellOf(id) == cid && id != qid }
          .map { case (id, _) =>
            val codes = codesOf(id)
            val adist = (0 until M).map { s =>
              l2sq(qr.slice(s * Sub, s * Sub + Sub), cb(s)(codes(s)))
            }.sum
            (id, adist)
          }
      }
      qid -> scored.sortBy { case (id, d) => (d, id) }.take(RerankR)
    }.toMap
    val expected = (0L until NumQueries.toLong).flatMap { qid =>
      val qq = byId(qid)
      adcRanked(qid)
        .map { case (id, adist) => (id, adist, l2sq(qq, byId(id))) }
        .sortBy { case (id, _, el2) => (el2, id) }.take(TopK)
        .zipWithIndex
        .map { case ((id, adist, el2), i) => (qid, id, i + 1, adist, el2) }
    }.sortBy(identity)

    val got = SparkEntry.queries("x80_knn_ivfpq")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4)))
      .toSeq.sortBy(identity)

    assert(got == expected)

    // x83 recall audit against the same reference: exact-L2² truth
    // top-K per query; hits for BOTH the re-ranked answer and the
    // ADC-only cut, integer basis points
    val truth = (0L until NumQueries.toLong).map { qid =>
      val qq = byId(qid)
      qid -> raw.iterator.filter(_._1 != qid)
        .map { case (id, v) => (l2sq(qq, v), id) }
        .toSeq.sorted.take(TopK).map(_._2).toSet
    }.toMap
    val rerankIds = expected.groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).toSet }
    val adcIds = adcRanked.map { case (q, xs) =>
      q -> xs.take(TopK).map(_._1).toSet }
    val wantRecall = (0L until NumQueries.toLong).map { qid =>
      val h = rerankIds.getOrElse(qid, Set.empty).count(truth(qid)).toLong
      val ha = adcIds.getOrElse(qid, Set.empty).count(truth(qid)).toLong
      (qid, h, ha, h * 10000L / TopK, ha * 10000L / TopK)
    }.toSeq
    val gotRecall = SparkEntry.queries("x83_ivfpq_recall")(
        spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq.sortBy(_._1)
    assert(gotRecall == wantRecall)

    // re-ranking within a candidate superset of the ADC answer can
    // only help: per query, re-ranked hits >= ADC-only hits
    wantRecall.foreach { case (_, h, ha, _, _) => assert(h >= ha) }
  }
}
