package graft

import org.scalatest.funsuite.AnyFunSuite

/** IVF-PQ (x80): the gate's oracle replays the same construction in
  * DuckDB, so a shared formula bug would stay green. This spec is the
  * third implementation: a plain-Scala driver-side IVFADC over the
  * collected sf0.001 vectors — coarse argmin-L2² assignment, residual
  * PQ encode against the first-16-residuals codebook, 2-cell probe,
  * ADC top-5 — compared row-for-row to the DataFrame result. Any
  * divergence in tie-breaking, residual arithmetic, code layout or
  * probe selection between the three implementations fails here.
  */
class X80IvfPqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val Cells = 8
  private val Probe = 2
  private val M = 4
  private val Sub = 16
  private val K = 16
  private val Dim = M * Sub
  private val NumQueries = 10
  private val TopK = 5

  private def l2sq(a: Array[Long], b: Array[Long]): Long = {
    var d = 0L; var i = 0
    while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }
    d
  }

  test("gate output equals a driver-side IVFADC reference at sf0.001") {
    val raw = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(floor(x * 1000) AS LONG)) AS qv")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    assert(raw.length >= K && raw.head._2.length == Dim)

    val byId = raw.toMap
    val cents = (0 until Cells).map(c => c.toLong -> byId(c.toLong))

    // coarse assignment: argmin L2², tie -> smallest cid
    def assign(v: Array[Long]): Int = {
      var best = -1; var bestd = Long.MaxValue
      cents.foreach { case (cid, cv) =>
        val d = l2sq(v, cv)
        if (d < bestd) { bestd = d; best = cid.toInt }
      }
      best
    }
    val cellOf = raw.map { case (id, v) => id -> assign(v) }.toMap
    def residOf(id: Long): Array[Long] = {
      val v = byId(id); val cv = byId(cellOf(id).toLong)
      Array.tabulate(Dim)(i => v(i) - cv(i))
    }

    // residual codebook: (sub, code) -> slice of residual of vec code
    val cb = Array.tabulate(M, K) { (s, c) =>
      residOf(c.toLong).slice(s * Sub, s * Sub + Sub)
    }
    def encode(r: Array[Long]): Array[Int] = Array.tabulate(M) { s =>
      val sl = r.slice(s * Sub, s * Sub + Sub)
      var best = -1; var bestd = Long.MaxValue
      var c = 0
      while (c < K) {
        val d = l2sq(sl, cb(s)(c))
        if (d < bestd) { bestd = d; best = c }
        c += 1
      }
      best
    }
    val codesOf = raw.map { case (id, _) => id -> encode(residOf(id)) }.toMap

    // probes + ADC top-R, then the exact re-rank to top-k
    val RerankR = 3 * TopK
    val adcRanked = (0L until NumQueries.toLong).map { qid =>
      val qq = byId(qid)
      val probed = cents.map { case (cid, cv) => (l2sq(qq, cv), cid.toInt) }
        .sorted.take(Probe).map(_._2)
      val scored = probed.flatMap { cid =>
        val cv = byId(cid.toLong)
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
