package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.streaming.{Cep, EventPattern, SkipStrategy}
import scala.math.Ordering.Implicits.seqOrdering

/** Fuzzes the pure NFA batch step ([[Cep.step]]) that
  * [[Cep.detect]] executes per key per micro-batch:
  *
  *  - a two-stage A→B pattern against an independent brute-force
  *    reference (time-ordered sweep: B consumes every open in-window
  *    A — the semantics of the previously hardcoded added→removed
  *    machine);
  *  - batching invariance: splitting an in-order event sequence into
  *    arbitrary micro-batches (watermark = max event time seen, i.e.
  *    the 0s-delay watermark) must not change the emitted matches;
  *  - structural invariants on a three-stage pattern: matches are
  *    event-time-ordered subsequences, step guards hold, first→last
  *    within the window.
  */
class CepPropertiesSpec extends AnyFunSuite {

  private case class Ev(kind: String, ts: Long)

  private def check(name: String, p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, s"$name: $res")
  }

  private val W = 100L
  private val genEvents: Gen[List[Ev]] = Gen.listOf(for {
    k <- Gen.oneOf("a", "b", "c", "noise")
    t <- Gen.choose(0L, 400L)
  } yield Ev(k, t))

  private def ab = EventPattern.begin[Ev]("A").where(_.kind == "a")
    .followedBy("B").where(_.kind == "b")
    .within(java.time.Duration.ofMillis(W))

  private def run(pattern: EventPattern[Ev], batches: Seq[Seq[Ev]])
      : Vector[Map[String, Seq[Ev]]] = {
    var partials = List.empty[Cep.Partial[Ev]]
    var wm = Long.MinValue
    val out = Vector.newBuilder[Map[String, Seq[Ev]]]
    batches.foreach { batch =>
      val (p2, matches, _) = Cep.step(pattern.steps, pattern.withinMs,
        (e: Ev) => e.ts, partials, batch, wm, pattern.skip,
        pattern.maximalOnly)
      partials = p2
      out ++= matches
      if (batch.nonEmpty) wm = math.max(wm, batch.map(_.ts).max)
    }
    out.result()
  }

  /** Independent A→B reference: time-ordered sweep, each B consumes
    * every open A with ts_b in [ts_a, ts_a + W]. */
  private def bruteForceAB(events: Seq[Ev]): Vector[(Long, Long)] = {
    var open = List.empty[Long]
    val out = Vector.newBuilder[(Long, Long)]
    events.sortBy(_.ts).foreach {
      case Ev("a", t) => open = t :: open
      case Ev("b", t) =>
        val (hit, keep) = open.partition(a => t >= a && t <= a + W)
        // emission order within one closing event is open-list order
        hit.foreach(a => out += ((a, t)))
        open = keep
      case _ => ()
    }
    out.result()
  }

  test("A->B matches equal the brute-force reference (multiset)") {
    check("ab-vs-brute", Prop.forAll(genEvents) { evs =>
      val got = run(ab, Seq(evs))
        .map(m => (m("A").head.ts, m("B").head.ts)).sorted
      got == bruteForceAB(evs).sorted
    })
  }

  test("iterative B guard (ts > matched A's ts + gap) equals the filtered brute force") {
    // whereIterative conditions B on the PREFIX (its partial's matched
    // A), so the brute force is the plain sweep with the same
    // per-partial predicate applied at consumption time
    val gap = 10L
    val abIter = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b")
      .whereIterative((e, ctx) => e.ts > ctx.eventsFor("A").head.ts + gap)
      .within(java.time.Duration.ofMillis(W))
    def brute(events: Seq[Ev]): Vector[(Long, Long)] = {
      var open = List.empty[Long]
      val out = Vector.newBuilder[(Long, Long)]
      events.sortBy(_.ts).foreach {
        case Ev("a", t) => open = t :: open
        case Ev("b", t) =>
          val (hit, keep) = open.partition(a =>
            t >= a && t <= a + W && t > a + gap)
          hit.foreach(a => out += ((a, t)))
          open = keep
        case _ => ()
      }
      out.result()
    }
    check("ab-iterative-vs-brute", Prop.forAll(genEvents) { evs =>
      val got = run(abIter, Seq(evs))
        .map(m => (m("A").head.ts, m("B").head.ts)).sorted
      got == brute(evs).sorted
    })
  }

  test("micro-batch boundaries never change the matches (in-order feed)") {
    val genSplit = for {
      evs <- genEvents
      sorted = evs.sortBy(_.ts)
      cuts <- Gen.listOfN(3, Gen.choose(0, math.max(0, sorted.length)))
    } yield (sorted, cuts.sorted)
    check("batching-invariance", Prop.forAll(genSplit) { case (sorted, cuts) =>
      val bounds = (0 +: cuts :+ sorted.length).distinct.sorted
      val batches = bounds.zip(bounds.tail).map { case (i, j) => sorted.slice(i, j) }
      val whole = run(ab, Seq(sorted)).map(m => (m("A").head.ts, m("B").head.ts)).sorted
      val split = run(ab, batches).map(m => (m("A").head.ts, m("B").head.ts)).sorted
      whole == split
    })
  }

  test("AFTER_MATCH skip strategies emit a sub-multiset of noSkip") {
    val strategies = Seq[SkipStrategy](SkipStrategy.SkipPastLastEvent,
      SkipStrategy.SkipToFirst("B"), SkipStrategy.SkipToLast("B"),
      SkipStrategy.SkipToNext)
    check("skip-subset", Prop.forAll(genEvents) { evs =>
      val all = run(ab, Seq(evs)).map(m => (m("A").head.ts, m("B").head.ts))
      strategies.forall { s =>
        val got = run(ab.afterMatchSkip(s), Seq(evs))
          .map(m => (m("A").head.ts, m("B").head.ts))
        // every skipped-mode match must be one of the noSkip matches,
        // with multiplicity (remove each found element once)
        val remaining = got.foldLeft(all.toList) { (acc, x) =>
          val i = acc.indexOf(x)
          if (i >= 0) acc.patch(i, Nil, 1) else acc
        }
        remaining.length == all.length - got.length
      }
    })
  }

  test("micro-batch boundaries never change skipPastLastEvent matches either") {
    val pat = ab.afterMatchSkip(SkipStrategy.SkipPastLastEvent)
    val genSplit = for {
      evs <- genEvents
      sorted = evs.sortBy(_.ts)
      cuts <- Gen.listOfN(3, Gen.choose(0, math.max(0, sorted.length)))
    } yield (sorted, cuts.sorted)
    check("skip-batching-invariance", Prop.forAll(genSplit) {
      case (sorted, cuts) =>
        val bounds = (0 +: cuts :+ sorted.length).distinct.sorted
        val batches = bounds.zip(bounds.tail).map { case (i, j) =>
          sorted.slice(i, j) }
        val whole = run(pat, Seq(sorted))
          .map(m => (m("A").head.ts, m("B").head.ts)).sorted
        val split = run(pat, batches)
          .map(m => (m("A").head.ts, m("B").head.ts)).sorted
        whole == split
    })
  }

  test("terminal-quantifier per-prefix emission is batching-invariant") {
    // per-prefix matches emit at absorption time, so micro-batch
    // boundaries (with the 0s-delay watermark advancing between them)
    // must not change the emitted prefix set
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b").oneOrMore
      .within(java.time.Duration.ofMillis(W))
    val genSplit = for {
      evs <- genEvents
      sorted = evs.sortBy(_.ts)
      cuts <- Gen.listOfN(3, Gen.choose(0, math.max(0, sorted.length)))
    } yield (sorted, cuts.sorted)
    check("prefix-batching-invariance", Prop.forAll(genSplit) {
      case (sorted, cuts) =>
        val bounds = (0 +: cuts :+ sorted.length).distinct.sorted
        val batches = bounds.zip(bounds.tail).map { case (i, j) =>
          sorted.slice(i, j) }
        def key(v: Vector[Map[String, Seq[Ev]]]) =
          v.map(m => (m("A").head.ts, m("B").map(_.ts))).sorted
        key(run(pat, Seq(sorted))) == key(run(pat, batches))
    })
  }

  test("times(1,2) range matches hold 1..2 guarded B's between A and C, in window") {
    val pat = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b").times(1, 2)
      .followedBy("C").where(_.kind == "c")
      .within(java.time.Duration.ofMillis(W))
    check("range-invariants", Prop.forAll(genEvents) { evs =>
      run(pat, Seq(evs)).forall { m =>
        val (a, bs, c) = (m("A").head, m("B"), m("C").head)
        val seq = (a.ts +: bs.map(_.ts)) :+ c.ts
        bs.size >= 1 && bs.size <= 2 &&
          a.kind == "a" && bs.forall(_.kind == "b") && c.kind == "c" &&
          seq == seq.sorted && c.ts - a.ts <= W
      }
    })
  }

  test("or() is exactly guard disjunction: where(a).or(b) == where(a || b)") {
    // both arms on both stages, so the property exercises or-guards
    // opening partials, advancing them, and conjunction after or
    val viaOr = EventPattern.begin[Ev]("A")
      .where(_.kind == "a").or(_.kind == "c")
      .followedBy("B").where(_.kind == "b").or(_.kind == "noise")
      .where(_.ts % 2 == 0) // (b || noise) && even
      .within(java.time.Duration.ofMillis(W))
    val viaLambda = EventPattern.begin[Ev]("A")
      .where(e => e.kind == "a" || e.kind == "c")
      .followedBy("B")
      .where(e => (e.kind == "b" || e.kind == "noise") && e.ts % 2 == 0)
      .within(java.time.Duration.ofMillis(W))
    check("or-equivalence", Prop.forAll(genEvents) { evs =>
      val key = (m: Map[String, Seq[Ev]]) => (m("A").head, m("B").head)
      run(viaOr, Seq(evs)).map(key) == run(viaLambda, Seq(evs)).map(key)
    })
  }

  test("or-guard matches satisfy the disjunction and batching invariance holds") {
    val pat = EventPattern.begin[Ev]("A")
      .where(_.kind == "a").or(_.kind == "c")
      .followedBy("B").where(_.kind == "b")
      .within(java.time.Duration.ofMillis(W))
    val genSplit = for {
      evs <- genEvents
      sorted = evs.sortBy(_.ts)
      cuts <- Gen.listOfN(3, Gen.choose(0, math.max(0, sorted.length)))
    } yield (sorted, cuts.sorted)
    check("or-batching-invariance", Prop.forAll(genSplit) {
      case (sorted, cuts) =>
        val bounds = (0 +: cuts :+ sorted.length).distinct.sorted
        val batches = bounds.zip(bounds.tail).map { case (i, j) =>
          sorted.slice(i, j) }
        val whole = run(pat, Seq(sorted))
        val split = run(pat, batches)
        whole.forall(m => Set("a", "c")(m("A").head.kind)) &&
          whole.map(m => (m("A").head.ts, m("B").head.ts)).sorted ==
            split.map(m => (m("A").head.ts, m("B").head.ts)).sorted
    })
  }

  test("three-stage matches are in-order, guard-satisfying, in-window subsequences") {
    val abc = EventPattern.begin[Ev]("A").where(_.kind == "a")
      .followedBy("B").where(_.kind == "b")
      .followedBy("C").where(_.kind == "c")
      .within(java.time.Duration.ofMillis(W))
    check("abc-invariants", Prop.forAll(genEvents) { evs =>
      run(abc, Seq(evs)).forall { m =>
        val (a, b, c) = (m("A").head, m("B").head, m("C").head)
        a.kind == "a" && b.kind == "b" && c.kind == "c" &&
          a.ts <= b.ts && b.ts <= c.ts && c.ts - a.ts <= W
      }
    })
  }
}
