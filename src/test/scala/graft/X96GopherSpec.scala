package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.queries.Extensions
import graft.streaming.DocStreams

/** Pins x96's Gopher repetition panel (Rae et al. Table A1): top-n-
  * gram character coverage for n ∈ {2,3,4}, duplicated-n-gram
  * character coverage for n ∈ {5..10}, both as positional UNIONS (no
  * double counting), integer permille of token characters; ties for
  * the top gram break to the smallest gram hash; and the stateless
  * per-row streaming twin is bit-identical to the batch engine. */
class X96GopherSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit lazy val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private type Row11 =
    (Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)

  /** `winnow = 1` = the exact full run (the coverage-semantics
    * fixtures below pin THAT); the shipped gate default is the
    * mod-[[Extensions.GopherDupWinnow]] dup-side winnow, pinned
    * against the full run in its own test. */
  private def run(d: DataFrame, winnow: Int = 1): Map[Long, Row11] =
    Extensions.gopherRepetition(d, dupWinnow = winnow).as[Row11].collect()
      .map(r => r._1 -> r).toMap

  test("an alternating doc is fully covered by its top 2-gram") {
    // "a b a b a b": 2-grams 'a b'@{0,2,4} (cnt 3), 'b a'@{1,3} —
    // the top gram's occurrences cover every position
    val got = run(docs(1L -> "a b a b a b"))(1L)
    assert(got._2 == 6L)     // n_chars
    assert(got._3 == 1000L)  // rep_2
    assert(got._6 == 0L)     // rep_5: no duplicated 5-gram
  }

  test("duplicate 5-gram coverage is a positional union") {
    // x1..x5 q x1..x5: the repeated 5-gram covers 10 of 11 tokens,
    // 20 of 21 chars -> 952 permille
    val got = run(docs(1L -> "x1 x2 x3 x4 x5 q x1 x2 x3 x4 x5"))(1L)
    assert(got._2 == 21L)
    assert(got._6 == 20L * 1000 / 21) // rep_5 = 952
    // overlapping duplicated grams never double-count: rep_5 <= 1000
    assert(got._6 <= 1000L)
    assert(got._7 == 0L) // no duplicated 6-gram (q breaks every one)
  }

  test("all-unique grams: top coverage is one gram's span, dup is 0") {
    // "a b c d": every 2-gram cnt 1; the top is the smallest md5 —
    // whichever wins, coverage is exactly 2 tokens = 500 permille
    val got = run(docs(1L -> "a b c d"))(1L)
    assert(got._3 == 500L)  // top 2-gram: 2 of 4 chars
    assert(got._4 == 750L)  // top 3-gram: 3 of 4 chars
    assert(got._5 == 1000L) // top 4-gram: the whole doc
    assert((6 to 11).forall(i => got.productElement(i - 1) == 0L)) // rep_5..rep_10
  }

  test("top-gram tie breaks to the smallest gram hash (batch == stream " +
    "== hand md5)") {
    val text = "a b c d"
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val grams = Seq("a b", "b c", "c d")
    val winner = grams.minBy(md5hex)
    val start = grams.indexOf(winner) // covers tokens start, start+1
    val got = run(docs(1L -> text))(1L)
    assert(got._3 == 500L)
    // the streaming twin picks the same winner
    val in = MemoryStream[(Long, String)]
    val q = DocStreams.gopherRepetitionStream(
        in.toDF().toDF("doc_id", "text"))
      .drop("truncated")
      .writeStream.format("memory").queryName("gop1").outputMode("append")
      .start()
    in.addData((1L, text))
    q.processAllAvailable()
    val s = spark.table("gop1").as[Row11].collect().head
    assert(s == got)
    q.stop()
    assert(start >= 0) // premise: winner is one of the grams
  }

  test("streaming twin equals batch on the real corpus") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    // both sides at the GATE setting (the winnowed dup side) — the
    // twins must replay the same mod-k gram-identity sample; the
    // public default on both sides is exact (Knobs)
    val expected = run(d, Extensions.GopherDupWinnow)
    val rows = d.as[(Long, String)].collect()
    val in = MemoryStream[(Long, String)]
    val stream = DocStreams.gopherRepetitionStream(
      in.toDF().toDF("doc_id", "text"),
      dupWinnow = Extensions.GopherDupWinnow)
    val q = stream.drop("truncated")
      .writeStream.format("memory").queryName("gop2").outputMode("append")
      .start()
    in.addData(rows.take(250).toIndexedSeq: _*)
    q.processAllAvailable()
    in.addData(rows.drop(250).toIndexedSeq: _*)
    q.processAllAvailable()
    val got = spark.table("gop2").as[Row11].collect()
      .map(r => r._1 -> r).toMap
    assert(got == expected)
    q.stop()
    // no real-corpus doc is anywhere near the ingest cap
    val in2 = MemoryStream[(Long, String)]
    val q2 = DocStreams.gopherRepetitionStream(
        in2.toDF().toDF("doc_id", "text"))
      .filter(org.apache.spark.sql.functions.col("truncated"))
      .writeStream.format("memory").queryName("gop2t").outputMode("append")
      .start()
    in2.addData(rows.toIndexedSeq: _*)
    q2.processAllAvailable()
    assert(spark.table("gop2t").count() == 0)
    q2.stop()
  }

  test("ingest cap: an adversarial long doc is scored on its prefix " +
    "and flagged, never scanned whole") {
    // a pathological document far over the cap — with maxTokens = 64
    // the per-row work is bounded at 64² gram compares regardless of
    // the document's true length
    val longText = (0 until 20000).map(i => s"t${i % 7}").mkString(" ")
    val cap = 64
    val prefix = longText.split(" ").take(cap).mkString(" ")
    // like-for-like: both sides at the gate's winnow setting
    val expected = run(docs(1L -> prefix, 2L -> "a b a b"),
      Extensions.GopherDupWinnow)
    val in = MemoryStream[(Long, String)]
    val q = DocStreams.gopherRepetitionStream(
        in.toDF().toDF("doc_id", "text"), maxTokens = cap,
        dupWinnow = Extensions.GopherDupWinnow)
      .writeStream.format("memory").queryName("gopCap").outputMode("append")
      .start()
    in.addData((1L, longText), (2L, "a b a b"))
    q.processAllAvailable()
    val got = spark.table("gopCap")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long,
        Long, Boolean)].collect().map(r => r._1 -> r).toMap
    q.stop()
    // the long doc: flagged, and its signals are EXACTLY the batch
    // engine's answer for the capped prefix (truncate-and-flag, not
    // truncate-and-guess)
    assert(got(1L)._12, "over-cap doc must be flagged truncated")
    val wantPrefix = expected(1L)
    assert((2 to 11).forall(i =>
      got(1L).productElement(i - 1) == wantPrefix.productElement(i - 1)),
      s"capped signals must equal batch-on-prefix: ${got(1L)} vs $wantPrefix")
    // the normal doc: unflagged, untouched
    assert(!got(2L)._12)
    assert((2 to 11).forall(i =>
      got(2L).productElement(i - 1) == expected(2L).productElement(i - 1)))
  }

  test("short docs: no grams of a given n report 0, never error") {
    val got = run(docs(1L -> "solo", 2L -> "two words"))
    assert(got(1L)._3 == 0L && got(1L)._6 == 0L)
    assert(got(2L)._3 == 1000L) // the single 2-gram is its own top
    assert(got(2L)._8 == 0L)
  }

  test("dup-side winnow vs the full run: top side untouched, dup side " +
    "a monotone lower bound, Gopher flags agree on the real corpus") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val full = run(d, winnow = 1)
    val win = run(d, Extensions.GopherDupWinnow)
    assert(win.keySet == full.keySet)
    // a duplicated gram's hash is shared by all its occurrences, so
    // the winnow keeps or drops whole gram identities: kept starts ⊆
    // all dup starts, and the positional union is monotone — the
    // winnowed coverage NEVER exceeds the full one, and the top side
    // (argmax, never winnowed) is bit-identical
    full.keys.foreach { id =>
      val (f, w) = (full(id), win(id))
      assert(w._2 == f._2) // n_chars
      assert((3 to 5).forall(i =>     // rep_2..rep_4
        w.productElement(i - 1) == f.productElement(i - 1)))
      (6 to 11).foreach { i =>        // rep_5..rep_10
        val (fw, ww) = (f.productElement(i - 1).asInstanceOf[Long],
          w.productElement(i - 1).asInstanceOf[Long])
        assert(ww <= fw, s"doc $id rep index $i: winnowed $ww > full $fw")
      }
    }
    // the Gopher Table A1 quality FLAGS (permille thresholds: top
    // 2/3/4-gram > 200/180/160, dup 5..10-gram > 150/140/130/120/
    // 110/100) agree between the winnowed run and the full run on
    // this corpus — the downstream filter decision is winnow-stable
    val thresholds = Seq(200L, 180L, 160L, 150L, 140L, 130L, 120L, 110L, 100L)
    def flags(r: Row11): Seq[Boolean] =
      (3 to 11).map(i => r.productElement(i - 1).asInstanceOf[Long] >
        thresholds(i - 3))
    val flips = full.keys.filter(id => flags(full(id)) != flags(win(id)))
    assert(flips.isEmpty,
      s"winnow flipped Gopher flags for docs: ${flips.toSeq.sorted.take(5)}")
  }

  test("near-threshold adversarial fixture: flags at/below a Table A1 " +
    "threshold are FLIP-PROOF, above-threshold slack is the documented " +
    "identity-sample retention, and the rejected POSITIONAL winnow " +
    "fails where the shipped content-keyed one holds") {
    // ---- doc AT the rep_5 threshold (150 permille), EXACTLY --------
    // two copies of a 5-token segment (20 covered chars) in a 133-char
    // doc: 20000 div 133 = 150 — at the threshold, so NOT flagged
    // (strict >). The winnow only LOWERS dup coverage (monotone
    // identity sample), so a clean-at-threshold doc can NEVER flip to
    // flagged: agreement below/at every threshold is structural, not
    // empirical.
    val seg5 = "da db dc dd de"
    val fillA1 = (1 to 14).map(i => f"u$i%03d").mkString(" ")  // 14x4
    val fillA2 = (15 to 28).map(i => f"u$i%03d").mkString(" ") // 14x4
    val atDoc = s"$seg5 $fillA1 $seg5 $fillA2 z"               // +1 char
    // ---- doc ABOVE the thresholds with a LONG duplicated run -------
    // two copies of a 60-token segment; copy offsets differ by 1 mod 4
    // (copy1 at token 0, copy2 at token 73), so a POSITIONAL mod-4
    // start winnow never keeps both occurrences of any 5-gram — its
    // duplicate detection collapses to zero on exactly the doc shape
    // (repeated span at shifted offsets) the panel exists to catch.
    val seg60 = (1 to 60).map(i => f"d$i%02d").mkString(" ")
    val fillB1 = (1 to 13).map(i => f"v$i%03d").mkString(" ")   // 13 toks
    val fillB2 = (14 to 140).map(i => f"v$i%03d").mkString(" ") // 127 toks
    val aboveDoc = s"$seg60 $fillB1 $seg60 $fillB2"
    val d = docs((1L, atDoc), (2L, aboveDoc))
    val full = run(d, winnow = 1)
    val win = run(d, Extensions.GopherDupWinnow)
    val thresholds = Seq(200L, 180L, 160L, 150L, 140L, 130L, 120L, 110L, 100L)
    def flags(r: Row11): Seq[Boolean] =
      (3 to 11).map(i => r.productElement(i - 1).asInstanceOf[Long] >
        thresholds(i - 3))
    // fixture premises: doc 1 sits EXACTLY at the rep_5 threshold;
    // doc 2 is flagged on the dup side with wide margin
    assert(full(1L)._6 == 150L,
      s"fixture drifted: full rep_5 of the at-threshold doc = ${full(1L)._6}")
    assert(full(2L)._6 > 250L, s"fixture premise: ${full(2L)._6}")
    // (1) at/below threshold: agreement, guaranteed by monotonicity
    assert(flags(full(1L)) == flags(win(1L)),
      "a clean at-threshold doc flipped under the winnow")
    assert(win(1L)._6 <= 150L)
    // (2) above threshold: the shipped content-keyed winnow keeps the
    // flag, and the slack matches the documented identity-sample
    // retention (a kept identity covers its interval in BOTH copies;
    // expected coverage ~= 1 - (3/4)^5 ~= 76% of the full run — pin
    // the deterministic measured value within the documented band)
    assert(flags(full(2L)) == flags(win(2L)),
      "the long-run above-threshold doc lost its flag under the winnow")
    assert(win(2L)._6 * 2 >= full(2L)._6,
      s"winnow retention fell out of the documented band: " +
        s"${win(2L)._6} vs full ${full(2L)._6}")
    // (3) the teeth: the REJECTED positional winnow (keep starts with
    // i % 4 == 0 — a stride sample instead of a content-keyed identity
    // sample), brute-forced over the same doc: copies at offsets
    // differing mod 4 never keep both occurrences of an identity, so
    // dup detection collapses and the flag FLIPS — the fixture
    // distinguishes the designs, and the shipped one is the survivor
    def positionalRep5(text: String): Long = {
      val tk = text.split(" ")
      val kept = (0 to tk.length - 5).filter(_ % 4 == 0)
      val gram = (i: Int) => tk.slice(i, i + 5).mkString(" ")
      val dupKept = kept.groupBy(gram).filter(_._2.length >= 2)
        .values.flatten.toSet
      val covered = dupKept.flatMap(i => i to i + 4)
      val chars = tk.zipWithIndex
        .collect { case (t, p) if covered(p) => t.length.toLong }.sum
      chars * 1000 / tk.map(_.length.toLong).sum
    }
    val biased = positionalRep5(aboveDoc)
    assert(biased <= 150L && biased < win(2L)._6,
      s"the positional winnow should fail this fixture: rep_5=$biased")
  }
}
