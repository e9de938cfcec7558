package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Extensions

/** Lemma soundness for the bipartite containment join (x69): the
  * containment-form prefix filter must be LOSSLESS — every pair with
  * C(A→B) = |A∩B|/|A| >= t survives candidate generation — across
  * thresholds, on small-vocab fixtures built to force the hard
  * cases: heavy token collisions (every prefix token is high-df),
  * benchmark tokens absent from the corpus (the df-0 prefix path),
  * and pairs sitting exactly ON the threshold boundary. Brute force
  * is the spec's oracle; the gate's DuckDB oracle re-states the same
  * all-pairs truth at corpus scale. */
class X69ContainmentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(bench: Seq[(Long, Seq[String])],
                  corp: Seq[(Long, Seq[String])],
                  thr: Double): Set[(Long, Long)] = {
    val b = bench.toDF("bench_id", "toks_a")
    val c = corp.toDF("rep", "toks_b")
    Extensions.containmentJoin(b, c, thr)
      .select("bench_id", "rep_b").as[(Long, Long)].collect().toSet
  }

  private def brute(bench: Seq[(Long, Seq[String])],
                    corp: Seq[(Long, Seq[String])],
                    thr: Double): Set[(Long, Long)] =
    (for {
      (aid, at) <- bench
      (bid, bt) <- corp
      inter = at.toSet.intersect(bt.toSet).size
      if inter.toDouble / at.toSet.size >= thr
    } yield (aid, bid)).toSet

  test("fuzz: prefix filter is lossless on collision-heavy small vocabularies, all thresholds") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 8).map(i => s"w$i")
    for (round <- 0 until 5; thr <- Seq(0.5, 0.55, 0.8, 0.9, 1.0)) {
      val corp = (0L until 40L).map { i =>
        i -> rnd.shuffle(vocab).take(1 + rnd.nextInt(6)).toSeq
      }
      val bench = (100L until 112L).map { i =>
        i -> rnd.shuffle(vocab).take(1 + rnd.nextInt(6)).toSeq
      }
      val got = run(bench, corp, thr)
      val want = brute(bench, corp, thr)
      assert(got == want,
        s"round $round thr $thr: missed ${want -- got}, extra ${got -- want}")
    }
  }

  test("benchmark tokens absent from the corpus: df-0 prefix stays lossless") {
    val corp = Seq(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("a", "b", "x", "y", "z"))
    val bench = Seq(
      // 4 of 5 tokens in corp doc 1 -> C = 0.8; 'qq' is corpus-absent
      10L -> Seq("a", "b", "c", "d", "qq"),
      // entirely corpus-absent: no B can qualify at any t
      11L -> Seq("qq", "rr", "ss"))
    for (thr <- Seq(0.5, 0.8, 0.9)) {
      val got = run(bench, corp, thr)
      assert(got == brute(bench, corp, thr), s"thr $thr: $got")
    }
    assert(run(bench, corp, 0.8) contains ((10L, 1L)))
    assert(!run(bench, corp, 0.9).exists(_._1 == 11L))
  }

  test("float-ceil epsilon: a threshold whose n*t product floats above an exact integer keeps the full prefix") {
    // 100 * 0.55 evaluates to 55.00000000000001; an epsilon-less
    // ceil gives 56, shortening the prefix to 45 tokens — and A's 45
    // corpus-absent tokens fill exactly that prefix, so the single
    // qualifying pair (C = 55/100 = 0.55) would silently vanish
    assert(100 * 0.55 > 55.0, "fixture relies on this float artifact")
    val bTok = (1 to 55).map(i => f"s$i%02d")
    val aTok = (1 to 45).map(i => f"u$i%02d") ++ bTok
    val got = run(Seq(5L -> aTok), Seq(7L -> bTok), 0.55)
    assert(got == Set((5L, 7L)), got)
  }

  test("exact boundary: C precisely at the threshold is included") {
    // |A| = 10, inter = 9 -> C = 0.9 exactly
    val a = (0 until 10).map(i => s"t$i")
    val bBig = (0 until 9).map(i => s"t$i") ++ Seq("other1", "other2")
    val got = run(Seq(5L -> a), Seq(7L -> bBig.toSeq), 0.9)
    assert(got == Set((5L, 7L)), got)
  }

  test("asymmetry: the small set is contained, the large container is not") {
    val small = Seq("a", "b", "c")
    val large = ('a' to 'z').map(_.toString)
    // small → large: C = 1.0; large → small: C = 3/26
    assert(run(Seq(1L -> small), Seq(2L -> large.toSeq), 0.9) == Set((1L, 2L)))
    assert(run(Seq(1L -> large.toSeq), Seq(2L -> small), 0.9).isEmpty)
  }
}
