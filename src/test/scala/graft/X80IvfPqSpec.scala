package graft

import org.scalatest.funsuite.AnyFunSuite

/** IVF-PQ (x80/x83/x98): the gates' oracles replay the same
  * construction in DuckDB, so a shared formula bug would stay green.
  * This spec is the third implementation: a plain-Scala driver-side
  * IVFADC over the collected sf0.001 vectors — ⌊√n⌋ Lloyd-trained
  * coarse cells (floor-div integer means over the seed assignment),
  * residual PQ encode against a one-Lloyd-round codebook,
  * ⌈√cells⌉-cell probe, ADC shortlist (fixed R = 8k by default, the
  * corpus-scaled fixture knob for x80/x83), exact re-rank to top-5 —
  * compared row-for-row to the DataFrame results. Any divergence in
  * tie-breaking, mean flooring, residual arithmetic, code layout or
  * probe selection between the three implementations fails here.
  *
  * Beyond replay-equality, this spec asserts the RECALL FLOORS the
  * hash gates cannot see (a quantizer regression that both engines
  * replay identically stays hash-green): mean recall@5 ≥ 90% for the
  * PRODUCTION default (fixed R) on the clustered corpus (x98), and a
  * ≥ 80% regression floor for the isotropic gate corpus (x83,
  * measured 94% at sf0.001 / 92% at sf0.01 / 96% at sf0.1).
  */
class X80IvfPqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val MinCells = 8
  private val MinProbe = 6
  private val M = 16
  private val Sub = 4
  private val K = 16
  private val Dim = M * Sub
  private val NumQueries = 10
  private val TopK = 5
  private val RerankFixed = 8 * TopK

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

  /** The driver-side IVFADC reference over (vec_id, qv) rows:
    * (topK rows (qid, vec_id, rn, adist, el2),
    *  recall rows (qid, hits, hits_adc, recall_bp, recall_adc_bp)). */
  private def reference(raw: Array[(Long, Array[Long])],
                        corpusScaledR: Boolean)
      : (Seq[(Long, Long, Int, Long, Long)],
         Seq[(Long, Long, Long, Long, Long)]) = {
    val n = raw.length
    val byId = raw.toMap
    val Cells = math.max(MinCells, math.floor(math.sqrt(n.toDouble)).toInt)
    val Probe = math.max(MinProbe,
      math.ceil(math.sqrt(Cells.toDouble)).toInt)

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

    // probes + ADC shortlist, exact re-rank
    val RerankR =
      if (corpusScaledR) math.max(3L * TopK, n.toLong / 10).toInt
      else RerankFixed
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
    val topK = (0L until NumQueries.toLong).flatMap { qid =>
      val qq = byId(qid)
      adcRanked(qid)
        .map { case (id, adist) => (id, adist, l2sq(qq, byId(id))) }
        .sortBy { case (id, _, el2) => (el2, id) }.take(TopK)
        .zipWithIndex
        .map { case ((id, adist, el2), i) => (qid, id, i + 1, adist, el2) }
    }.sortBy(identity)

    // recall audit: exact-L2² truth top-K per query; hits for BOTH
    // the re-ranked answer and the ADC-only cut, integer basis points
    val truth = (0L until NumQueries.toLong).map { qid =>
      val qq = byId(qid)
      qid -> raw.iterator.filter(_._1 != qid)
        .map { case (id, v) => (l2sq(qq, v), id) }
        .toSeq.sorted.take(TopK).map(_._2).toSet
    }.toMap
    val rerankIds = topK.groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).toSet }
    val adcIds = adcRanked.map { case (q, xs) =>
      q -> xs.take(TopK).map(_._1).toSet }
    val recall = (0L until NumQueries.toLong).map { qid =>
      val h = rerankIds.getOrElse(qid, Set.empty).count(truth(qid)).toLong
      val ha = adcIds.getOrElse(qid, Set.empty).count(truth(qid)).toLong
      (qid, h, ha, h * 10000L / TopK, ha * 10000L / TopK)
    }.toSeq
    (topK, recall)
  }

  private def collectRaw(df: org.apache.spark.sql.DataFrame)
      : Array[(Long, Array[Long])] =
    df.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)

  test("x80/x83 equal a driver-side trained-IVFADC reference at sf0.001") {
    val raw = collectRaw(Tables.embeddings(spark, "/root/testdata/sf0.001")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(floor(x * 1000) AS LONG)) AS qv"))
    assert(raw.length >= K && raw.head._2.length == Dim)
    // x80/x83 run the fixture knob (corpus-scaled R): the gate
    // corpus is the isotropic adversarial fixture
    val (expected, wantRecall) = reference(raw, corpusScaledR = true)

    val got = SparkEntry.queries("x80_knn_ivfpq")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4)))
      .toSeq.sortBy(identity)
    assert(got == expected)

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

    // REGRESSION FLOOR on the isotropic gate corpus: measured mean
    // recall@5 = 94% at sf0.001 (92%/96% at sf0.01/sf0.1) — a
    // quantizer regression (the pre-round-11 construction read
    // 20-46%) fails here even though its oracle replay stays green
    val meanBp = gotRecall.map(_._4).sum / gotRecall.length
    assert(meanBp >= 8000,
      s"x83 mean recall@5 regressed: $meanBp bp < 8000")
  }

  test("x98's PRODUCTION default (fixed R) holds recall@5 >= 90% on " +
      "the clustered corpus at sf0.001") {
    import org.apache.spark.sql.functions.col
    val raw = collectRaw(queries.Extensions.x98ClusteredCorpus(
      spark, "/root/testdata/sf0.001").select(col("vec_id"), col("qv")))
    assert(raw.length >= K && raw.head._2.length == Dim)
    // the production default: fixed R = 8k, no corpus-scaled knob
    val (_, wantRecall) = reference(raw, corpusScaledR = false)

    val gotRecall = SparkEntry.queries("x98_ivfpq_clustered")(
        spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq.sortBy(_._1)
    assert(gotRecall == wantRecall)

    // THE floor the round-11 verdict asked for: the fixed-R default
    // holds mean recall@5 >= 90% on clustered embeddings (measured
    // 100% at sf0.001/sf0.01, 98% at sf0.1)
    val meanBp = gotRecall.map(_._4).sum / gotRecall.length
    assert(meanBp >= 9000,
      s"x98 clustered mean recall@5 below the 90% floor: $meanBp bp")
  }
}
