package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.streaming.{Cep, EventPattern}
import scala.math.Ordering.Implicits.seqOrdering

/** FlinkCEP quantifier modifiers — `followedByAny`, `timesOrMore(n)`,
  * `consecutive()`, `allowCombinations()` — hand-pinned cases plus
  * brute-force fuzz against independent reference models. All fuzz
  * generators use DISTINCT timestamps: equal-timestamp tie-breaking is
  * engine-defined (documented on [[Cep.step]]) and not what these
  * properties are about. */
class CepModifiersSpec extends AnyFunSuite {

  private case class Ev(kind: String, ts: Long)

  private def check(name: String, p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, s"$name: $res")
  }

  private val W = 100L

  /** Distinct-timestamp event lists over a small alphabet. */
  private val genEvents: Gen[List[Ev]] = for {
    n <- Gen.choose(0, 14)
    ts <- Gen.pick(n, 0L until 300L)
    kinds <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "noise"))
  } yield ts.sorted.zip(kinds).map { case (t, k) => Ev(k, t) }.toList

  /** One batch through the pure NFA; `flush` closes every window. */
  private def run(pattern: EventPattern[Ev], evs: Seq[Ev],
      flush: Boolean = false): Vector[Map[String, Seq[Ev]]] = {
    val (p1, m1, _) = Cep.step(pattern.steps, pattern.withinMs,
      (e: Ev) => e.ts, Nil, evs, Long.MinValue, pattern.skip,
      pattern.maximalOnly)
    if (!flush) m1
    else {
      val (_, m2, _) = Cep.step(pattern.steps, pattern.withinMs,
        (e: Ev) => e.ts, p1, Nil, Long.MaxValue / 4, pattern.skip,
        pattern.maximalOnly)
      m1 ++ m2
    }
  }

  private def ev(k: String, t: Long) = Ev(k, t)

  // ------------------------------------------------------ followedByAny

  test("followedByAny matches every qualifying B, followedBy only the first") {
    val evs = Seq(ev("a", 1), ev("b", 5), ev("b", 9), ev("b", 200))
    val any = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedByAny("B").where(_.kind == "b")
      .within(java.time.Duration.ofMillis(W))
    val got = run(any, evs).map(m => (m("A").head.ts, m("B").head.ts))
    assert(got.sorted == Vector((1L, 5L), (1L, 9L))) // 200 out of window
    val det = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b")
      .within(java.time.Duration.ofMillis(W))
    assert(run(det, evs).map(m => (m("A").head.ts, m("B").head.ts))
      == Vector((1L, 5L)))
  }

  test("followedByAny fuzz: emits exactly the in-window (a, b) pairs") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedByAny("B").where(_.kind == "b")
      .within(java.time.Duration.ofMillis(W))
    check("any-vs-brute", Prop.forAll(genEvents) { evs =>
      val got = run(pat, evs)
        .map(m => (m("A").head.ts, m("B").head.ts)).sorted
      val want = (for {
        a <- evs if a.kind == "a"
        b <- evs if b.kind == "b" && b.ts >= a.ts && b.ts <= a.ts + W
      } yield (a.ts, b.ts)).sorted
      got == want
    })
  }

  // ------------------------------------------------------- timesOrMore

  test("timesOrMore(2): every prefix with >= 2 B's is its own match (FlinkCEP parity)") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b").timesOrMore(2)
      .within(java.time.Duration.ofMillis(W))
    // one b only -> no match
    assert(run(pat, Seq(ev("a", 1), ev("b", 5)), flush = true).isEmpty)
    // three b's -> a match per prefix of length >= 2, emitted as the
    // b's arrive (the flush adds nothing)
    val evs = Seq(ev("a", 1), ev("b", 5), ev("noise", 6), ev("b", 9), ev("b", 12))
    val got = run(pat, evs)
    assert(got.map(m => (m("A").head.ts, m("B").map(_.ts))) ==
      Vector((1L, Seq(5L, 9L)), (1L, Seq(5L, 9L, 12L))))
    assert(run(pat, evs, flush = true) == got, "window close adds nothing")
    // emitMaximalOnly: one maximal match, at the window close
    assert(run(pat.emitMaximalOnly, evs).isEmpty)
    assert(run(pat.emitMaximalOnly, evs, flush = true)
      .map(m => (m("A").head.ts, m("B").map(_.ts))) ==
      Vector((1L, Seq(5L, 9L, 12L))))
  }

  test("timesOrMore(1) behaves exactly like oneOrMore") {
    val viaTom = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b").timesOrMore(1)
      .within(java.time.Duration.ofMillis(W))
    val viaOom = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b").oneOrMore
      .within(java.time.Duration.ofMillis(W))
    check("tom1-eq-oom", Prop.forAll(genEvents) { evs =>
      val key = (v: Vector[Map[String, Seq[Ev]]]) =>
        v.map(m => (m("A").head.ts, m("B").map(_.ts))).sorted
      key(run(viaTom, evs, flush = true)) ==
        key(run(viaOom, evs, flush = true))
    })
  }

  test("timesOrMore(2) fuzz: per A, every b-run prefix of length >= 2; maximal-only the full run") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b").timesOrMore(2)
      .within(java.time.Duration.ofMillis(W))
    check("tom-vs-brute", Prop.forAll(genEvents) { evs =>
      val got = run(pat, evs, flush = true)
        .map(m => (m("A").head.ts, m("B").map(_.ts))).sorted
      // FlinkCEP parity: one match per prefix of the in-window run
      // with at least 2 elements
      val want = (for {
        a <- evs if a.kind == "a"
        bs = evs.filter(e => e.kind == "b" && e.ts >= a.ts && e.ts <= a.ts + W)
          .map(_.ts).sorted
        k <- 2 to bs.size
      } yield (a.ts, bs.take(k))).sorted
      got == want
    })
    check("tom-maximal-vs-brute", Prop.forAll(genEvents) { evs =>
      val got = run(pat.emitMaximalOnly, evs, flush = true)
        .map(m => (m("A").head.ts, m("B").map(_.ts))).sorted
      val want = (for {
        a <- evs if a.kind == "a"
        bs = evs.filter(e => e.kind == "b" && e.ts >= a.ts && e.ts <= a.ts + W)
          .map(_.ts).sorted
        if bs.size >= 2
      } yield (a.ts, bs)).sorted
      got == want
    })
  }

  // ------------------------------------------------------- consecutive

  test("times(3).consecutive demands adjacent repetitions") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b").times(3).consecutive
      .followedBy("C").where(_.kind == "c")
      .within(java.time.Duration.ofMillis(W))
    // adjacent b b b -> match (gap before the FIRST b stays relaxed)
    val hit = run(pat, Seq(ev("a", 1), ev("noise", 2), ev("b", 3),
      ev("b", 4), ev("b", 5), ev("c", 9)))
    assert(hit.map(m => m("B").map(_.ts)) == Vector(Seq(3L, 4L, 5L)))
    // noise inside the run kills it
    val miss = run(pat, Seq(ev("a", 1), ev("b", 3), ev("noise", 4),
      ev("b", 5), ev("b", 6), ev("c", 9)))
    assert(miss.isEmpty)
  }

  test("oneOrMore.consecutive freezes the run at the first gap") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b").oneOrMore.consecutive
      .followedBy("C").where(_.kind == "c")
      .within(java.time.Duration.ofMillis(W))
    // b's after the noise gap are NOT part of the run; c still matches
    val got = run(pat, Seq(ev("a", 1), ev("b", 3), ev("b", 4),
      ev("noise", 5), ev("b", 6), ev("c", 9)))
    assert(got.map(m => (m("B").map(_.ts), m("C").head.ts)) ==
      Vector((Seq(3L, 4L), 9L)))
    // the plain (relaxed) oneOrMore would absorb the post-gap b too
    val relaxed = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b").oneOrMore
      .followedBy("C").where(_.kind == "c")
      .within(java.time.Duration.ofMillis(W))
    assert(run(relaxed, Seq(ev("a", 1), ev("b", 3), ev("b", 4),
      ev("noise", 5), ev("b", 6), ev("c", 9)))
      .map(m => m("B").map(_.ts)) == Vector(Seq(3L, 4L, 6L)))
  }

  test("timesOrMore(2).consecutive: the whole repetition group is adjacent") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b").timesOrMore(2).consecutive
      .within(java.time.Duration.ofMillis(W))
    // b noise b: gap between FIRST and SECOND repetition element kills
    assert(run(pat, Seq(ev("a", 1), ev("b", 3), ev("noise", 4),
      ev("b", 5), ev("b", 6)), flush = true).isEmpty)
    // b b noise b: run is the adjacent prefix
    val got = run(pat, Seq(ev("a", 1), ev("b", 3), ev("b", 4),
      ev("noise", 5), ev("b", 6)), flush = true)
    assert(got.map(m => m("B").map(_.ts)) == Vector(Seq(3L, 4L)))
  }

  test("oneOrMore.consecutive fuzz vs a maximal-adjacent-run reference") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b").oneOrMore.consecutive
      .followedBy("C").where(_.kind == "c")
      .within(java.time.Duration.ofMillis(W))
    def brute(evs: Seq[Ev]): Seq[(Long, Seq[Long], Long)] = {
      val sorted = evs.sortBy(_.ts)
      for {
        (a, ai) <- sorted.zipWithIndex if a.kind == "a"
        inWin = (e: Ev) => e.ts <= a.ts + W
        // first b after a (relaxed gap), then the adjacent b run
        bi = sorted.indexWhere(e => e.kind == "b" && inWin(e), ai + 1)
        if bi >= 0
        run = sorted.drop(bi).takeWhile(e => e.kind == "b" && inWin(e))
        // first in-window c at or after the event that broke the run
        c <- sorted.drop(bi + run.length)
          .find(e => e.kind == "c" && inWin(e))
      } yield (a.ts, run.map(_.ts), c.ts)
    }
    check("consecutive-vs-brute", Prop.forAll(genEvents) { evs =>
      val got = run(pat, evs)
        .map(m => (m("A").head.ts, m("B").map(_.ts), m("C").head.ts)).sorted
      got == brute(evs).sorted
    })
  }

  // ------------------------------------------------- allowCombinations

  test("oneOrMore.allowCombinations enumerates every nonempty subsequence") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b").oneOrMore.allowCombinations
      .within(java.time.Duration.ofMillis(W))
    val got = run(pat, Seq(ev("a", 1), ev("b", 3), ev("noise", 4),
      ev("b", 5), ev("b", 7)), flush = true)
      .map(m => m("B").map(_.ts)).sortBy(v => (v.length, v.mkString(",")))
    assert(got == Vector(Seq(3L), Seq(5L), Seq(7L), Seq(3L, 5L),
      Seq(3L, 7L), Seq(5L, 7L), Seq(3L, 5L, 7L))
      .sortBy(v => (v.length, v.mkString(","))))
  }

  test("times(2).allowCombinations picks every ordered pair, not the first two") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b").times(2).allowCombinations
      .within(java.time.Duration.ofMillis(W))
    val got = run(pat, Seq(ev("a", 1), ev("b", 3), ev("b", 5), ev("b", 7)))
      .map(m => m("B").map(_.ts)).sorted
    assert(got == Vector(Seq(3L, 5L), Seq(3L, 7L), Seq(5L, 7L)).sorted)
    // plain times(2) takes the greedy first two only
    val greedy = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b").times(2)
      .within(java.time.Duration.ofMillis(W))
    assert(run(greedy, Seq(ev("a", 1), ev("b", 3), ev("b", 5), ev("b", 7)))
      .map(m => m("B").map(_.ts)) == Vector(Seq(3L, 5L)))
  }

  test("allowCombinations fuzz: subsequence enumeration per A") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b").oneOrMore.allowCombinations
      .within(java.time.Duration.ofMillis(W))
    val gen = genEvents.map(_.take(9)) // 2^n match count: keep n small
    check("combinations-vs-brute", Prop.forAll(gen) { evs =>
      val got = run(pat, evs, flush = true)
        .map(m => (m("A").head.ts, m("B").map(_.ts))).sorted
      val want = (for {
        a <- evs if a.kind == "a"
        bs = evs.filter(e => e.kind == "b" && e.ts >= a.ts && e.ts <= a.ts + W)
          .map(_.ts).sorted
        sub <- bs.toSet.subsets.toSeq if sub.nonEmpty
      } yield (a.ts, sub.toSeq.sorted)).sorted
      got == want
    })
  }

  // ------------------------------------- range-stage modifier corners

  test("times(from, to).consecutive: required clones strict, the " +
    "optional tail freezes at the first gap") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b").times(2, 4).consecutive
      .followedBy("C").where(_.kind == "c")
      .within(java.time.Duration.ofMillis(W))
    // b b [gap] b: the count freezes at 2; the post-gap b is NOT
    // absorbed, c completes the frozen count
    val got = run(pat, Seq(ev("a", 0), ev("b", 1), ev("b", 2),
      ev("noise", 3), ev("b", 4), ev("c", 5)))
    assert(got.map(m => (m("B").map(_.ts), m("C").head.ts)) ==
      Vector((Seq(1L, 2L), 5L)))
    // the plain range would absorb the post-gap b too
    val plain = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b").times(2, 4)
      .followedBy("C").where(_.kind == "c")
      .within(java.time.Duration.ofMillis(W))
    assert(run(plain, Seq(ev("a", 0), ev("b", 1), ev("b", 2),
      ev("noise", 3), ev("b", 4), ev("c", 5)))
      .map(m => m("B").map(_.ts)) == Vector(Seq(1L, 2L, 4L)))
    // a gap INSIDE the required minimum kills (strict clones)
    assert(run(pat, Seq(ev("a", 0), ev("b", 1), ev("noise", 2),
      ev("b", 3), ev("b", 4), ev("c", 5))).isEmpty)
    // a full adjacent run absorbs up to `to`, then c completes
    assert(run(pat, Seq(ev("a", 0), ev("b", 1), ev("b", 2), ev("b", 3),
      ev("b", 4), ev("b", 5), ev("c", 6)))
      .map(m => m("B").map(_.ts)) == Vector(Seq(1L, 2L, 3L, 4L)))
  }

  test("terminal times(from, to).consecutive: prefixes emit until the " +
    "gap fixes the count; emitMaximalOnly emits the frozen run once") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b").times(2, 3).consecutive
      .within(java.time.Duration.ofMillis(W))
    val evs = Seq(ev("a", 0), ev("b", 1), ev("b", 2), ev("noise", 3),
      ev("b", 4))
    assert(run(pat, evs, flush = true)
      .map(m => m("B").map(_.ts)) == Vector(Seq(1L, 2L)))
    assert(run(pat.emitMaximalOnly, evs, flush = true)
      .map(m => m("B").map(_.ts)) == Vector(Seq(1L, 2L)))
    // unbroken: per-prefix default emits count 2 then count 3
    val full = Seq(ev("a", 0), ev("b", 1), ev("b", 2), ev("b", 3))
    assert(run(pat, full, flush = true)
      .map(m => m("B").map(_.ts)) ==
      Vector(Seq(1L, 2L), Seq(1L, 2L, 3L)))
  }

  test("times(from, to).allowCombinations: every subsequence with a " +
    "length in [from, to]") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b").times(2, 3).allowCombinations
      .within(java.time.Duration.ofMillis(W))
    val got = run(pat, Seq(ev("a", 0), ev("b", 1), ev("b", 2), ev("b", 3)),
      flush = true)
      .map(m => m("B").map(_.ts)).sortBy(v => (v.length, v.mkString(",")))
    assert(got == Vector(Seq(1L, 2L), Seq(1L, 3L), Seq(2L, 3L),
      Seq(1L, 2L, 3L)).sortBy(v => (v.length, v.mkString(","))))
  }

  test("fuzz: times(from, to).consecutive equals the adjacent-run " +
    "reference (freeze at gap, absorb to cap, first c completes)") {
    val (from, to) = (2, 4)
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b").times(from, to).consecutive
      .followedBy("C").where(_.kind == "c")
      .within(java.time.Duration.ofMillis(W))
    check("range-consecutive-vs-brute", Prop.forAll(genEvents) { evs =>
      val got = run(pat, evs, flush = true)
        .map(m => (m("A").head.ts, m("B").map(_.ts), m("C").head.ts))
        .sorted
      val want = (for {
        a <- evs if a.kind == "a"
        win = (e: Ev) => e.ts >= a.ts && e.ts <= a.ts + W
        after = evs.filter(_.ts > a.ts)
        i0 = after.indexWhere(e => e.kind == "b" && win(e))
        if i0 >= 0
        // maximal adjacent in-window b-run from the first b
        bRun = after.drop(i0).takeWhile(e => e.kind == "b" && win(e))
        if bRun.length >= from // strict required clones
        n = math.min(bRun.length, to)
        // the first in-window c at/after the freeze (or cap) point
        c <- after.drop(i0 + n).find(_.kind == "c").filter(win).toSeq
      } yield (a.ts, bRun.take(n).map(_.ts), c.ts)).sorted
      got == want
    })
  }

  test("fuzz: times(from, to).allowCombinations equals in-range " +
    "subsequence enumeration per A") {
    val (from, to) = (2, 3)
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b").times(from, to).allowCombinations
      .within(java.time.Duration.ofMillis(W))
    val gen = genEvents.map(_.take(9)) // combinatorial match count
    check("range-combinations-vs-brute", Prop.forAll(gen) { evs =>
      val got = run(pat, evs, flush = true)
        .map(m => (m("A").head.ts, m("B").map(_.ts))).sorted
      val want = (for {
        a <- evs if a.kind == "a"
        bs = evs.filter(e => e.kind == "b" && e.ts > a.ts &&
          e.ts <= a.ts + W).map(_.ts).sorted
        sub <- bs.toSet.subsets.toSeq
        if sub.size >= from && sub.size <= to
      } yield (a.ts, sub.toSeq.sorted)).sorted
      got == want
    })
  }

  // --------------------------------------------------------- notNext

  test("notNext forbids only the IMMEDIATE event; notFollowedBy the whole gap") {
    // a, noise, b, c: the event right after a is noise (not b) — the
    // notNext constraint resolves, the later b is irrelevant, c matches
    val evs = Seq(ev("a", 1), ev("noise", 2), ev("b", 3), ev("c", 4))
    val nn = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .notNext("N").where(_.kind == "b")
      .followedBy("C").where(_.kind == "c")
      .within(java.time.Duration.ofMillis(W))
    assert(run(nn, evs).map(m => (m("A").head.ts, m("C").head.ts))
      == Vector((1L, 4L)))
    val nf = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .notFollowedBy("N").where(_.kind == "b")
      .followedBy("C").where(_.kind == "c")
      .within(java.time.Duration.ofMillis(W))
    assert(run(nf, evs).isEmpty) // absence over the whole gap: b kills
  }

  test("notNext kills on an immediate forbidden event") {
    val evs = Seq(ev("a", 1), ev("b", 2), ev("c", 3))
    val nn = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .notNext("N").where(_.kind == "b")
      .followedBy("C").where(_.kind == "c")
      .within(java.time.Duration.ofMillis(W))
    assert(run(nn, evs).isEmpty)
  }

  test("notNext: the checking event itself can satisfy the next stage") {
    val evs = Seq(ev("a", 1), ev("c", 2))
    val nn = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .notNext("N").where(_.kind == "b")
      .followedBy("C").where(_.kind == "c")
      .within(java.time.Duration.ofMillis(W))
    assert(run(nn, evs).map(m => (m("A").head.ts, m("C").head.ts))
      == Vector((1L, 2L)))
  }

  test("notNext then next: the immediate event must match C and not B") {
    val nn = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .notNext("N").where(_.kind == "b")
      .next("C").where(_.kind == "c")
      .within(java.time.Duration.ofMillis(W))
    assert(run(nn, Seq(ev("a", 1), ev("c", 2)))
      .map(m => (m("A").head.ts, m("C").head.ts)) == Vector((1L, 2L)))
    assert(run(nn, Seq(ev("a", 1), ev("noise", 2), ev("c", 3))).isEmpty)
    assert(run(nn, Seq(ev("a", 1), ev("b", 2), ev("c", 3))).isEmpty)
  }

  test("notNext is kill-first when the forbidden and next guards overlap") {
    // FlinkCEP's notNext compiles to a NOT-condition on the proceed
    // edge: an event matching both B and C fails the NOT — no match
    val nn = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .notNext("N").where(_.kind == "c")
      .followedBy("C").where(_.kind == "c")
      .within(java.time.Duration.ofMillis(W))
    assert(run(nn, Seq(ev("a", 1), ev("c", 2))).isEmpty)
  }

  test("notNext fuzz: brute-force parity and batching invariance") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .notNext("N").where(_.kind == "b")
      .followedBy("C").where(_.kind == "c")
      .within(java.time.Duration.ofMillis(W))
    check("notnext-vs-brute", Prop.forAll(genEvents) { evs =>
      val got = run(pat, evs)
        .map(m => (m("A").head.ts, m("C").head.ts)).sorted
      val want = (for {
        (a, i) <- evs.zipWithIndex if a.kind == "a"
        e1 <- evs.drop(i + 1).headOption.toSeq
        if e1.ts <= a.ts + W && e1.kind != "b"
        c <- evs.drop(i + 1).find(x => x.kind == "c" && x.ts <= a.ts + W).toSeq
      } yield (a.ts, c.ts)).sorted
      got == want
    })
    check("notnext-batching", Prop.forAll(genEvents,
        Gen.choose(0, 14)) { (evs, k) =>
      val (l, r) = evs.splitAt(math.min(k, evs.length))
      val (p1, m1, _) = Cep.step(pat.steps, pat.withinMs,
        (e: Ev) => e.ts, Nil, l, Long.MinValue)
      val (_, m2, _) = Cep.step(pat.steps, pat.withinMs,
        (e: Ev) => e.ts, p1, r, Long.MinValue)
      (m1 ++ m2) == run(pat, evs)
    })
  }

  // ----------------------------------------------------------- greedy

  // An AMBIGUOUS event is one matching both the quantifier's guard
  // and the following stage's ("x" below is a b AND a c). Flink's
  // default-reluctant selection forks both interpretations; greedy()
  // commits the event to the quantifier — maximal munch.

  test("oneOrMore: an ambiguous event forks by default, greedy() " +
    "commits it to the run") {
    def pat(g: Boolean) = {
      val p = EventPattern.begin[Ev]("A").where(_.kind == "a")
        .followedBy("B").where(e => e.kind == "b" || e.kind == "x")
        .oneOrMore
      (if (g) p.greedy else p)
        .followedBy("C").where(e => e.kind == "c" || e.kind == "x")
        .within(java.time.Duration.ofMillis(W))
    }
    val evs = Seq(ev("a", 0), ev("b", 1), ev("x", 2), ev("c", 3))
    val def_ = run(pat(false), evs)
      .map(m => (m("B").map(_.ts), m("C").head.ts)).sorted
    // fork: x either extends the run (then c completes it) or IS the C
    assert(def_ == Vector((Seq(1L), 2L), (Seq(1L, 2L), 3L)))
    val grd = run(pat(true), evs)
      .map(m => (m("B").map(_.ts), m("C").head.ts))
    assert(grd == Vector((Seq(1L, 2L), 3L))) // maximal munch only
  }

  test("times(from, to): an ambiguous event forks at the optional " +
    "clones, greedy() absorbs to the max") {
    def pat(g: Boolean) = {
      val p = EventPattern.begin[Ev]("A").where(_.kind == "a")
        .followedBy("B").where(e => e.kind == "b" || e.kind == "x")
        .times(1, 2)
      (if (g) p.greedy else p)
        .followedBy("C").where(e => e.kind == "c" || e.kind == "x")
        .within(java.time.Duration.ofMillis(W))
    }
    val evs = Seq(ev("a", 0), ev("b", 1), ev("x", 2), ev("c", 3))
    val def_ = run(pat(false), evs)
      .map(m => (m("B").map(_.ts), m("C").head.ts)).sorted
    assert(def_ == Vector((Seq(1L), 2L), (Seq(1L, 2L), 3L)))
    val grd = run(pat(true), evs)
      .map(m => (m("B").map(_.ts), m("C").head.ts))
    assert(grd == Vector((Seq(1L, 2L), 3L)))
  }

  test("fuzz: greedy() is a no-op when the quantifier and the next " +
    "stage have disjoint guards") {
    def mk(g: Boolean, range: Boolean) = {
      val b = EventPattern.begin[Ev]("A").where(_.kind == "a")
        .followedBy("B").where(_.kind == "b")
      val q = if (range) b.times(1, 3) else b.oneOrMore
      (if (g) q.greedy else q)
        .followedBy("C").where(_.kind == "c")
        .within(java.time.Duration.ofMillis(W))
    }
    for (range <- Seq(false, true))
      check(s"greedy-noop-range=$range", Prop.forAll(genEvents) { evs =>
        val d = run(mk(g = false, range), evs, flush = true)
          .map(m => (m("B").map(_.ts), m.get("C").map(_.map(_.ts))))
        val g = run(mk(g = true, range), evs, flush = true)
          .map(m => (m("B").map(_.ts), m.get("C").map(_.map(_.ts))))
        d == g
      })
  }

  test("fuzz: with overlapping guards, greedy() emits exactly the " +
    "maximal-munch subset of the default's matches") {
    // guard overlap via "x" ∈ B ∩ C; every greedy match must appear
    // among the default's forked alternatives, and per (A, C) match
    // key the greedy run is the longest offered
    val genX: Gen[List[Ev]] = for {
      n <- Gen.choose(0, 12)
      ts <- Gen.pick(n, 0L until 300L)
      kinds <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "x", "noise"))
    } yield ts.sorted.zip(kinds).map { case (t, k) => Ev(k, t) }.toList
    def mk(g: Boolean) = {
      val q = EventPattern.begin[Ev]("A").where(_.kind == "a")
        .followedBy("B").where(e => e.kind == "b" || e.kind == "x")
        .oneOrMore
      (if (g) q.greedy else q)
        .followedBy("C").where(e => e.kind == "c" || e.kind == "x")
        .within(java.time.Duration.ofMillis(W))
    }
    check("greedy-subset", Prop.forAll(genX) { evs =>
      def sig(ms: Vector[Map[String, Seq[Ev]]]) =
        ms.map(m => (m("A").head.ts, m("B").map(_.ts), m("C").head.ts))
      val d = sig(run(mk(false), evs, flush = true))
      val g = sig(run(mk(true), evs, flush = true))
      g.toSet.subsetOf(d.toSet) &&
        g.forall { case (a, bs, _) =>
          d.filter(x => x._1 == a).forall(_._2.length <= bs.length) }
    })
  }

  // ---------------------------------------------------------- guards

  test("modifier misuse is rejected at build time") {
    val base = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b")
    intercept[IllegalArgumentException](base.consecutive)
    intercept[IllegalArgumentException](base.allowCombinations)
    intercept[IllegalArgumentException](
      base.oneOrMore.consecutive.allowCombinations)
    intercept[IllegalArgumentException](
      base.oneOrMore.allowCombinations.consecutive)
    intercept[IllegalArgumentException](base.timesOrMore(0))
    intercept[IllegalArgumentException](
      base.notFollowedBy("N").notNext("M"))
    intercept[IllegalArgumentException](
      base.notNext("N").notFollowedBy("M"))
    // greedy on an unquantified stage / after allowCombinations
    intercept[IllegalArgumentException](base.greedy)
    intercept[IllegalArgumentException](
      base.oneOrMore.allowCombinations.greedy)
  }
}
