package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.streaming.{Cep, EventPattern}
import scala.math.Ordering.Implicits.seqOrdering

/** FlinkCEP GROUP patterns (`Pattern.begin(sub)` / `followedBy(sub)` /
  * `next(sub)` / repeated groups): the sub-pattern's stages inline
  * into the outer pattern, repetitions merge events under the inner
  * stage names. Hand cases plus a fuzz against the greedy in-order
  * scan the deterministic NFA is defined to perform. */
class CepGroupSpec extends AnyFunSuite {

  private case class Ev(kind: String, ts: Long)

  private def check(name: String, p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, s"$name: $res")
  }

  private val W = 100L
  private val genEvents: Gen[List[Ev]] = for {
    n <- Gen.choose(0, 14)
    ts <- Gen.pick(n, 0L until 300L)
    kinds <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "noise"))
  } yield ts.sorted.zip(kinds).map { case (t, k) => Ev(k, t) }.toList

  private def run(pattern: EventPattern[Ev],
      evs: Seq[Ev]): Vector[Map[String, Seq[Ev]]] = {
    val (_, m, _) = Cep.step(pattern.steps, pattern.withinMs,
      (e: Ev) => e.ts, Nil, evs, Long.MinValue)
    m
  }

  private def ev(k: String, t: Long) = Ev(k, t)

  private def bc = EventPattern.begin[Ev]("B").where(_.kind == "b")
    .followedBy("C").where(_.kind == "c")

  test("followedBy(group) inlines the sub-pattern's stages") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy(bc)
      .within(java.time.Duration.ofMillis(W))
    val got = run(pat, Seq(ev("a", 1), ev("noise", 2), ev("b", 3),
      ev("noise", 4), ev("c", 5)))
    assert(got.map(m =>
      (m("A").head.ts, m("B").head.ts, m("C").head.ts)) ==
      Vector((1L, 3L, 5L)))
  }

  test("next(group) demands the group start immediately") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .next(bc)
      .within(java.time.Duration.ofMillis(W))
    // noise between a and b kills (strict into the group head)
    assert(run(pat, Seq(ev("a", 1), ev("noise", 2), ev("b", 3),
      ev("c", 5))).isEmpty)
    assert(run(pat, Seq(ev("a", 1), ev("b", 2), ev("noise", 3),
      ev("c", 5))).map(m => m("C").head.ts) == Vector(5L))
  }

  test("repeated group merges every repetition under the inner names") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedByTimes(bc, 2)
      .within(java.time.Duration.ofMillis(W))
    val got = run(pat, Seq(ev("a", 1), ev("b", 2), ev("c", 3),
      ev("noise", 4), ev("b", 5), ev("c", 6)))
    assert(got.map(m => (m("B").map(_.ts), m("C").map(_.ts))) ==
      Vector((Seq(2L, 5L), Seq(3L, 6L))))
    // only one full (b, c) repetition -> no match
    assert(run(pat, Seq(ev("a", 1), ev("b", 2), ev("c", 3),
      ev("b", 5))).isEmpty)
  }

  test("begin(group) starts the pattern from the sub-pattern") {
    val pat = EventPattern.begin(bc)
      .followedBy("D").where(_.kind == "a")
      .within(java.time.Duration.ofMillis(W))
    val got = run(pat, Seq(ev("b", 1), ev("c", 2), ev("a", 3)))
    assert(got.map(m =>
      (m("B").head.ts, m("C").head.ts, m("D").head.ts)) ==
      Vector((1L, 2L, 3L)))
  }

  test("within() on a group scopes the window to the group's own span") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy(bc.within(java.time.Duration.ofMillis(5)))
      .within(java.time.Duration.ofMillis(W))
    // group span b->c = 4 <= 5: match
    assert(run(pat, Seq(ev("a", 0), ev("b", 10), ev("c", 14)))
      .map(m => (m("B").head.ts, m("C").head.ts)) == Vector((10L, 14L)))
    // group span 6 > 5: c cannot join, no match
    assert(run(pat, Seq(ev("a", 0), ev("b", 10), ev("c", 16))).isEmpty)
    // the gap BEFORE the group is unconstrained by the group window
    assert(run(pat, Seq(ev("a", 0), ev("b", 50), ev("c", 54)))
      .map(m => m("C").head.ts) == Vector(54L))
    // the outer within still bounds the whole match
    assert(run(pat, Seq(ev("a", 0), ev("b", 98), ev("c", 101))).isEmpty)
  }

  test("a group-expired partial prunes at the watermark and surfaces " +
    "as a timeout with what it DID match") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy(bc.within(java.time.Duration.ofMillis(5)))
      .within(java.time.Duration.ofMillis(W))
    // b at 10 opens the group; no c arrives within 5 — once the
    // watermark passes 15 the partial can never complete
    val (kept, matches, timeouts) = Cep.step(pat.steps, pat.withinMs,
      (e: Ev) => e.ts, Nil, Seq(ev("a", 0), ev("b", 10)), 50L)
    assert(matches.isEmpty)
    assert(kept.isEmpty, "group-expired partial must not linger")
    assert(timeouts.map(m => (m("A").map(_.ts), m("B").map(_.ts))) ==
      Vector((Seq(0L), Seq(10L))))
    // the same feed with the watermark still below the group deadline
    // keeps the partial open
    val (kept2, _, _) = Cep.step(pat.steps, pat.withinMs,
      (e: Ev) => e.ts, Nil, Seq(ev("a", 0), ev("b", 10)), 12L)
    assert(kept2.nonEmpty)
  }

  test("each repetition of a windowed repeated group gets its own window") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedByTimes(bc.within(java.time.Duration.ofMillis(5)), 2)
      .within(java.time.Duration.ofMillis(W))
    // both repetitions tight: match (the 17ms gap BETWEEN repetitions
    // is unconstrained)
    assert(run(pat, Seq(ev("a", 0), ev("b", 1), ev("c", 3),
      ev("b", 20), ev("c", 24)))
      .map(m => (m("B").map(_.ts), m("C").map(_.ts))) ==
      Vector((Seq(1L, 20L), Seq(3L, 24L))))
    // second repetition over ITS window: no match
    assert(run(pat, Seq(ev("a", 0), ev("b", 1), ev("c", 3),
      ev("b", 20), ev("c", 26))).isEmpty)
  }

  test("begin(group) with a within() bounds the leading stages") {
    val pat = EventPattern.begin(bc.within(java.time.Duration.ofMillis(5)))
      .followedBy("D").where(_.kind == "a")
      .within(java.time.Duration.ofMillis(W))
    assert(run(pat, Seq(ev("b", 0), ev("c", 4), ev("a", 60)))
      .map(m => m("D").head.ts) == Vector(60L))
    assert(run(pat, Seq(ev("b", 0), ev("c", 6), ev("a", 60))).isEmpty)
  }

  test("looping group: every repetition count >= 1 matches, merged " +
    "under the inner names") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedByOneOrMore(bc)
      .followedBy("D").where(_.kind == "d")
      .within(java.time.Duration.ofMillis(W))
    val got = run(pat, Seq(ev("a", 0), ev("b", 1), ev("c", 2),
      ev("b", 3), ev("c", 4), ev("d", 5)))
      .map(m => (m("B").map(_.ts), m("C").map(_.ts), m("D").head.ts))
      .sortBy(_._1.length)
    // one match per completed repetition count: 1 rep and 2 reps
    assert(got == Vector(
      (Seq(1L), Seq(2L), 5L),
      (Seq(1L, 3L), Seq(2L, 4L), 5L)))
    // zero repetitions never match (one-or-more needs its one)
    assert(run(pat, Seq(ev("a", 0), ev("d", 5))).isEmpty)
    // an INCOMPLETE second repetition adds no match
    val partial = run(pat, Seq(ev("a", 0), ev("b", 1), ev("c", 2),
      ev("b", 3), ev("d", 5)))
      .map(m => (m("B").map(_.ts), m("C").map(_.ts)))
    assert(partial == Vector((Seq(1L), Seq(2L))))
  }

  test("terminal looping group emits a match per completed repetition") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedByOneOrMore(bc)
      .within(java.time.Duration.ofMillis(W))
    val got = run(pat, Seq(ev("a", 0), ev("b", 1), ev("c", 2),
      ev("b", 3), ev("c", 4)))
      .map(m => (m("B").map(_.ts), m("C").map(_.ts)))
    assert(got == Vector(
      (Seq(1L), Seq(2L)),
      (Seq(1L, 3L), Seq(2L, 4L))))
  }

  test("a looping partial's timeout reports every matched repetition") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedByOneOrMore(bc)
      .followedBy("D").where(_.kind == "d")
      .within(java.time.Duration.ofMillis(20))
    val (kept, matches, timeouts) = Cep.step(pat.steps, pat.withinMs,
      (e: Ev) => e.ts, Nil,
      Seq(ev("a", 0), ev("b", 1), ev("c", 2), ev("b", 3), ev("c", 4)), 99L)
    assert(matches.isEmpty && kept.isEmpty)
    // the richest timed-out sibling carries both repetitions
    assert(timeouts.map(m => (m("B").map(_.ts), m("C").map(_.ts)))
      .contains((Seq(1L, 3L), Seq(2L, 4L))))
  }

  test("looping-group misuse is rejected at build time") {
    val outer = EventPattern.begin[Ev]("A").where(_.kind == "a")
    intercept[IllegalArgumentException](
      outer.followedByOneOrMore(EventPattern.begin[Ev]("B")
        .where(_.kind == "b").oneOrMore
        .until(_ => true))) // quantified stage inside
  }

  test("windowed looping group: each repetition anchors its own window") {
    // inner within 5ms: rep 1 = b(1) c(4) (span 3), rep 2 = b(10) c(12)
    // (span 2 — but 11ms from rep 1's first event, so the pre-fix
    // anchoring at repetition 1 would wrongly reject it)
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedByOneOrMore(bc.within(java.time.Duration.ofMillis(5)))
      .followedBy("D").where(_.kind == "d")
      .within(java.time.Duration.ofMillis(W))
    val got = run(pat, Seq(ev("a", 0), ev("b", 1), ev("c", 4),
      ev("b", 10), ev("c", 12), ev("d", 20)))
      .map(m => (m("B").map(_.ts), m("C").map(_.ts), m("D").head.ts))
      .sortBy(_._1.length)
    assert(got == Vector(
      (Seq(1L), Seq(4L), 20L),
      (Seq(1L, 10L), Seq(4L, 12L), 20L)))
    // a repetition that OVERRUNS its own window never completes: only
    // the 1-repetition count survives
    val slow = run(pat, Seq(ev("a", 0), ev("b", 1), ev("c", 4),
      ev("b", 10), ev("c", 17), ev("d", 20)))
      .map(m => (m("B").map(_.ts), m("C").map(_.ts)))
    assert(slow == Vector((Seq(1L), Seq(4L))))
  }

  test("windowed range-counted group: the loop copy's window is " +
    "per-completion too") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedByTimes(bc.within(java.time.Duration.ofMillis(5)), 1, 2)
      .followedBy("D").where(_.kind == "d")
      .within(java.time.Duration.ofMillis(W))
    val got = run(pat, Seq(ev("a", 0), ev("b", 1), ev("c", 4),
      ev("b", 10), ev("c", 12), ev("d", 20)))
      .map(m => (m("B").map(_.ts), m("C").map(_.ts), m("D").head.ts))
      .sortBy(_._1.length)
    assert(got == Vector(
      (Seq(1L), Seq(4L), 20L),
      (Seq(1L, 10L), Seq(4L, 12L), 20L)))
  }

  test("a nested windowed group inside a looping group re-anchors per " +
    "repetition") {
    // loop body = [B C (windowed 5ms), E]: the nested bc window must
    // re-anchor at each repetition's own b, and the E stage (outside
    // the nested group, inside the loop) must not pollute the scan
    val sub = EventPattern.begin(
        bc.within(java.time.Duration.ofMillis(5)))
      .followedBy("E").where(_.kind == "e")
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedByOneOrMore(sub)
      .followedBy("F").where(_.kind == "f")
      .within(java.time.Duration.ofMillis(W))
    val got = run(pat, Seq(ev("a", 0), ev("b", 1), ev("c", 4),
      ev("e", 8), ev("b", 10), ev("c", 12), ev("e", 15), ev("f", 20)))
      .map(m => (m("B").map(_.ts), m("C").map(_.ts), m("E").map(_.ts)))
      .sortBy(_._1.length)
    assert(got == Vector(
      (Seq(1L), Seq(4L), Seq(8L)),
      (Seq(1L, 10L), Seq(4L, 12L), Seq(8L, 15L))))
    // rep 2's c beyond ITS OWN 5ms window: rep 2 never completes
    val slow = run(pat, Seq(ev("a", 0), ev("b", 1), ev("c", 4),
      ev("e", 8), ev("b", 10), ev("c", 17), ev("e", 18), ev("f", 20)))
      .map(m => m("B").map(_.ts))
    assert(slow == Vector(Seq(1L)))
  }

  test("group misuse is rejected at build time") {
    val outer = EventPattern.begin[Ev]("A").where(_.kind == "a")
    // a windowed group may not nest another windowed group
    intercept[IllegalArgumentException](
      outer.followedBy(
        EventPattern.begin(bc.within(java.time.Duration.ofMillis(5)))
          .followedBy("D").where(_.kind == "d")
          .within(java.time.Duration.ofMillis(9))))
    intercept[IllegalArgumentException](
      outer.followedBy(EventPattern.begin[Ev]("A"))) // name collision
    intercept[IllegalArgumentException](
      outer.followedByTimes(EventPattern.begin[Ev]("B").oneOrMore
        .until(_ => true), 2)) // quantified stage inside a repeated group
  }

  test("one-group-window-per-stage limit: the FlinkCEP parity pin — " +
    "the rejected stacked shape exceeds FlinkCEP, and both legal " +
    "decompositions run") {
    // The rejected shape wants TWO scoped windows on one stage:
    // [[B C].within(5) D].within(9). FlinkCEP cannot express it —
    // every Flink within() folds into ONE global window (the NFA
    // compiler takes the min across stages), so no FlinkCEP program
    // produces stacked scoped windows; nothing expressible in
    // FlinkCEP is rejected by this builder. The message names the
    // decomposition:
    val err = intercept[IllegalArgumentException](
      EventPattern.begin[Ev]("A").where(_.kind == "a")
        .followedBy(
          EventPattern.begin(bc.within(java.time.Duration.ofMillis(5)))
            .followedBy("D").where(_.kind == "d")
            .within(java.time.Duration.ofMillis(9)))
        .within(java.time.Duration.ofMillis(W)))
    assert(err.getMessage.contains("one group window per stage") &&
      err.getMessage.contains("FlinkCEP"))

    // Decomposition 1 (strictly MORE expressive than Flink's fold):
    // keep the inner group window scoped, express the outer group's
    // bound as the whole-pattern within — legal here, inexpressible
    // in FlinkCEP (which would fold 5 into the global window).
    val scoped = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy(EventPattern.begin(
          bc.within(java.time.Duration.ofMillis(5)))
        .followedBy("D").where(_.kind == "d"))
      .within(java.time.Duration.ofMillis(9))
    // Decomposition 2 (the exact FlinkCEP semantics of the stacked
    // declaration): one global window = min(9, 5).
    val flinkFold = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b")
      .followedBy("C").where(_.kind == "c")
      .followedBy("D").where(_.kind == "d")
      .within(java.time.Duration.ofMillis(5))
    // a@0 b@2 c@6 d@8: B→C spans 4 ≤ 5 (inner window holds), whole
    // match spans 8 ≤ 9 — the scoped form matches; Flink's folded
    // global-5 window kills it at c@6. The scoped builder loses
    // nothing FlinkCEP could express and gains the scoped shape.
    val evs = Seq(ev("a", 0), ev("b", 2), ev("c", 6), ev("d", 8))
    assert(run(scoped, evs).map(m => m("D").head.ts) == Vector(8L))
    assert(run(flinkFold, evs).isEmpty)
    // and on a tight trace both agree
    val tight = Seq(ev("a", 0), ev("b", 1), ev("c", 2), ev("d", 3))
    assert(run(scoped, tight).nonEmpty && run(flinkFold, tight).nonEmpty)
  }

  test("range-counted group: one match per repetition count in [from, to]") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedByTimes(bc, 1, 2)
      .followedBy("D").where(_.kind == "d")
      .within(java.time.Duration.ofMillis(W))
    val got = run(pat, Seq(ev("a", 0), ev("b", 1), ev("c", 2),
      ev("b", 3), ev("c", 4), ev("d", 5)))
      .map(m => (m("B").map(_.ts), m("C").map(_.ts), m("D").head.ts))
      .sortBy(_._1.length)
    assert(got == Vector(
      (Seq(1L), Seq(2L), 5L),
      (Seq(1L, 3L), Seq(2L, 4L), 5L)))
    // zero repetitions never match (from = 1)
    assert(run(pat, Seq(ev("a", 0), ev("d", 5))).isEmpty)
  }

  test("range-counted group caps the repetitions at `to`") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedByTimes(bc, 2, 3)
      .followedBy("D").where(_.kind == "d")
      .within(java.time.Duration.ofMillis(W))
    // four full repetitions available: only counts 2 and 3 match
    val evs = Seq(ev("a", 0)) ++ (0 until 4).flatMap(i =>
      Seq(ev("b", 1 + 2 * i), ev("c", 2 + 2 * i))) :+ ev("d", 20)
    val got = run(pat, evs)
      .map(m => (m("B").map(_.ts), m("C").map(_.ts)))
      .sortBy(_._1.length)
    assert(got == Vector(
      (Seq(1L, 3L), Seq(2L, 4L)),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L))))
    // only one full repetition: below the minimum, no match
    assert(run(pat, Seq(ev("a", 0), ev("b", 1), ev("c", 2),
      ev("d", 5))).isEmpty)
  }

  test("terminal range-counted group emits a match per completed in-range count") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedByTimes(bc, 1, 2)
      .within(java.time.Duration.ofMillis(W))
    val got = run(pat, Seq(ev("a", 0), ev("b", 1), ev("c", 2),
      ev("b", 3), ev("c", 4), ev("b", 5), ev("c", 6)))
      .map(m => (m("B").map(_.ts), m("C").map(_.ts)))
    // the third repetition is beyond `to` and never consumed
    assert(got == Vector(
      (Seq(1L), Seq(2L)),
      (Seq(1L, 3L), Seq(2L, 4L))))
  }

  test("followedByTimes(sub, n, n) is exactly followedByTimes(sub, n)") {
    val range = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedByTimes(bc, 2, 2)
      .within(java.time.Duration.ofMillis(W))
    val exact = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedByTimes(bc, 2)
      .within(java.time.Duration.ofMillis(W))
    check("range-eq-exact", Prop.forAll(genEvents) { evs =>
      run(range, evs) == run(exact, evs)
    })
  }

  test("range-counted group misuse is rejected at build time") {
    val outer = EventPattern.begin[Ev]("A").where(_.kind == "a")
    intercept[IllegalArgumentException](
      outer.followedByTimes(bc, 0, 2)) // from < 1
    intercept[IllegalArgumentException](
      outer.followedByTimes(bc, 3, 2)) // to < from
    intercept[IllegalArgumentException](
      outer.followedByTimes(EventPattern.begin[Ev]("B")
        .where(_.kind == "b").oneOrMore
        .until(_ => true), 1, 2)) // quantified stage inside
    // one group window per stage: a windowed sub cannot ALSO nest a
    // windowed group (each stage carries a single (start, bound) pair)
    intercept[IllegalArgumentException](
      outer.followedByTimes(EventPattern.begin(
        bc.within(java.time.Duration.ofMillis(5)))
        .followedBy("D").where(_.kind == "d")
        .within(java.time.Duration.ofMillis(9)), 1, 2))
  }

  test("fuzz: range-group matches equal the greedy scan at every count in range") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedByTimes(bc, 1, 2)
      .followedBy("D").where(_.kind == "d")
      .within(java.time.Duration.ofMillis(W))
    val genWithD: Gen[List[Ev]] = for {
      n <- Gen.choose(0, 14)
      ts <- Gen.pick(n, 0L until 300L)
      kinds <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "noise"))
    } yield ts.sorted.zip(kinds).map { case (t, k) => Ev(k, t) }.toList
    // reference: from each `a`, for each count k in [1, 2], greedily
    // walk k (b, c) pairs then the first d — each viable count is its
    // own match (the reluctant group-quantifier multiplicity)
    def brute(evs: Seq[Ev]): Seq[(Long, Seq[Long], Seq[Long], Long)] = {
      val sorted = evs.sortBy(_.ts)
      sorted.zipWithIndex.filter(_._1.kind == "a").flatMap { case (a, ai) =>
        def walk(kinds: List[String], from: Int,
            acc: List[Long]): Option[List[Long]] = kinds match {
          case Nil => Some(acc.reverse)
          case k :: rest =>
            val j = sorted.indexWhere(e =>
              e.kind == k && e.ts <= a.ts + W, from + 1)
            if (j < 0) None else walk(rest, j, sorted(j).ts :: acc)
        }
        (1 to 2).flatMap { k =>
          val kinds = List.fill(k)(List("b", "c")).flatten :+ "d"
          walk(kinds, ai, Nil).map { ts =>
            val reps = ts.init
            val bs = reps.zipWithIndex.collect { case (t, i) if i % 2 == 0 => t }
            val cs = reps.zipWithIndex.collect { case (t, i) if i % 2 == 1 => t }
            (a.ts, bs, cs, ts.last)
          }
        }
      }
    }
    check("range-group-vs-greedy", Prop.forAll(genWithD) { evs =>
      val got = run(pat, evs).map(m =>
        (m("A").head.ts, m("B").map(_.ts), m("C").map(_.ts),
          m("D").head.ts)).sorted
      got == brute(evs).sorted
    })
  }

  test("group close does NOT expire a partial whose remaining group " +
    "stages are all skippable (optional tail, required post-group stage)") {
    // times(1, 2).within(5): after the required b matched, the
    // remaining group stage is the OPTIONAL clone — the group needs no
    // further event, so the watermark passing the group deadline must
    // not kill the viable b-then-d match (the outcome must not depend
    // on whether d arrives before or after the watermark does)
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy(EventPattern.begin[Ev]("B").where(_.kind == "b")
        .times(1, 2).within(java.time.Duration.ofMillis(5)))
      .followedBy("D").where(_.kind == "d")
      .within(java.time.Duration.ofMillis(W))
    // batch 1: a, b; watermark advances PAST the group close (15)
    val (kept, m1, _) = Cep.step(pat.steps, pat.withinMs,
      (e: Ev) => e.ts, Nil, Seq(ev("a", 0), ev("b", 10)), 50L)
    assert(m1.isEmpty)
    assert(kept.nonEmpty,
      "the partial needs no further group event — it must survive the group close")
    // batch 2: d arrives after the group closed — the match completes
    // with the single-b group (the optional clone can no longer take)
    val (_, m2, _) = Cep.step(pat.steps, pat.withinMs,
      (e: Ev) => e.ts, kept, Seq(ev("d", 60)), 50L)
    assert(m2.map(m => (m("B").map(_.ts), m("D").head.ts)) ==
      Vector((Seq(10L), 60L)))
    // contrast: a group whose REQUIRED stage is still pending expires
    // at the group close exactly as before (the existing timeout test)
    val req = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy(bc.within(java.time.Duration.ofMillis(5)))
      .followedBy("D").where(_.kind == "d")
      .within(java.time.Duration.ofMillis(W))
    val (kept2, _, _) = Cep.step(req.steps, req.withinMs,
      (e: Ev) => e.ts, Nil, Seq(ev("a", 0), ev("b", 10)), 50L)
    assert(kept2.isEmpty, "a pending required group stage still expires")
  }

  test("fuzz: repeated-group matches equal the greedy in-order scan") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedByTimes(bc, 2)
      .within(java.time.Duration.ofMillis(W))
    // deterministic reference: from each `a`, greedily take the next
    // b, c, b, c (in-window, relaxed gaps) — the defined semantics of
    // a chain of plain relaxed stages
    def brute(evs: Seq[Ev]): Seq[(Long, Seq[Long], Seq[Long])] = {
      val sorted = evs.sortBy(_.ts)
      sorted.zipWithIndex.filter(_._1.kind == "a").flatMap { case (a, ai) =>
        def walk(kinds: List[String], from: Int,
            acc: List[Long]): Option[List[Long]] = kinds match {
          case Nil => Some(acc.reverse)
          case k :: rest =>
            val j = sorted.indexWhere(e =>
              e.kind == k && e.ts <= a.ts + W, from + 1)
            if (j < 0) None else walk(rest, j, sorted(j).ts :: acc)
        }
        walk(List("b", "c", "b", "c"), ai, Nil).map(ts =>
          (a.ts, Seq(ts(0), ts(2)), Seq(ts(1), ts(3))))
      }
    }
    check("group-vs-greedy", Prop.forAll(genEvents) { evs =>
      val got = run(pat, evs).map(m =>
        (m("A").head.ts, m("B").map(_.ts), m("C").map(_.ts))).sorted
      got == brute(evs).sorted
    })
  }
}
