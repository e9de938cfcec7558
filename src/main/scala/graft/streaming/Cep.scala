package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Contiguity/polarity of a pattern stage. */
sealed trait StepKind
object StepKind {
  /** Relaxed contiguity (`followedBy`): non-matching events are
    * skipped, the partial stays open. */
  case object Relaxed extends StepKind
  /** Strict contiguity (`next`): the very next event of the key must
    * match, anything else kills the partial. */
  case object Strict extends StepKind
  /** Absence (`notFollowedBy`): an event matching this guard kills
    * the partial; the stage is satisfied by the NEXT stage's match
    * (or, if terminal, by the window closing unviolated). */
  case object Negative extends StepKind
  /** Strict absence (`notNext`): the key's IMMEDIATELY-next event
    * must not match the guard — if it does (or the window has
    * already passed), the partial dies; any other event resolves the
    * constraint and is at once offered to the following stage under
    * that stage's own contiguity. Consumes no event itself. */
  case object NegativeStrict extends StepKind
  /** One-or-more (`oneOrMore` on a relaxed stage): the stage absorbs
    * every guard-matching event (absorb forks with advancing when an
    * event matches both this and the next stage's guard; `greedy()`
    * commits to absorbing); the run ends when an event matches the
    * next stage but not this one. A TERMINAL one-or-more emits one
    * match per prefix as events are absorbed (FlinkCEP's reluctant
    * multiplicity) — or the maximal run at window close under
    * `emitMaximalOnly` — and requires `within` as the state bound. */
  case object Repeated extends StepKind
  /** Zero-or-one (`optional` on a relaxed stage): taken greedily if
    * an event matches its guard before the next stage matches;
    * skipped when the next stage's guard matches first. Consecutive
    * optional stages (the `times(from, to)` expansion) resolve by a
    * forward scan: an event that matches none of them may satisfy the
    * first following stage whose guard accepts it. */
  case object Optional extends StepKind
}

/** FlinkCEP AFTER_MATCH_SKIP strategy: which OTHER open partials are
  * discarded when a match emits. All boundaries are the starting
  * event time of the pruned partial, measured against the emitted
  * match's span — the emitting partial itself is always consumed. */
sealed trait SkipStrategy
object SkipStrategy {
  /** Keep every open partial — every possible match still emits
    * (the engine's historical behavior, and the default). */
  case object NoSkip extends SkipStrategy
  /** Discard partials that started after the match's first event and
    * no later than its LAST event: matching resumes past the match. */
  case object SkipPastLastEvent extends SkipStrategy
  /** Discard partials that started after the match's first event and
    * strictly before the FIRST event matched to stage `name`. */
  final case class SkipToFirst(name: String) extends SkipStrategy
  /** Discard partials that started after the match's first event and
    * strictly before the LAST event matched to stage `name`. */
  final case class SkipToLast(name: String) extends SkipStrategy
  /** FlinkCEP AFTER_MATCH_SKIP_TO_NEXT: discard every OTHER partial
    * that started at the match's own start event — matching resumes
    * at the next distinct start, so at most one match emits per start
    * event (`b+` over b1 b2 b3 emits exactly b1, b2, b3). Under this
    * engine's time-keyed pruning "same start event" means the same
    * start TIMESTAMP (see the equal-timestamp caveat on the skip
    * predicate); within one timestamp the earliest-staged match
    * wins deterministically. */
  case object SkipToNext extends SkipStrategy
}

/** Read-only view of a partial match's already-accepted events — the
  * argument FlinkCEP's `IterativeCondition.Context` hands a guard
  * (`ctx.getEventsForPattern`), so a stage can be conditioned on the
  * MATCHED PREFIX ("next price above the mean of the matched run").
  * Backed by the partial's own event list: no extra state, no copy —
  * a view allocated per guard evaluation. */
final class MatchedPrefix[E] private[streaming] (
    steps: Vector[PatternStep[E]], accRev: List[(Int, E)]) {

  /** Events already matched to stage `name`, match order (oldest
    * first) — Flink's `ctx.getEventsForPattern(name)`. A quantified
    * stage's guard sees the run absorbed SO FAR under its own name. */
  def eventsFor(name: String): Seq[E] = {
    val idx = steps.zipWithIndex.collect {
      case (st, i) if st.name == name => i }.toSet
    accRev.reverse.collect { case (i, e) if idx(i) => e }
  }

  /** Every already-matched event across all stages, match order. */
  def all: Seq[E] = accRev.reverse.map(_._2)

  def isEmpty: Boolean = accRev.isEmpty
}

/** One pattern stage: a name (for match selection), its guard (over
  * the event AND the matched prefix — plain `where` guards ignore
  * the prefix), its contiguity kind, and — for a one-or-more stage —
  * an optional `until` stop condition that terminates the run.
  *
  * Modifier flags (FlinkCEP quantifier modifiers):
  *  - `any`: non-deterministic relaxed stage (`followedByAny`, and
  *    the per-clone form of `times(n).allowCombinations()`): a
  *    matching event advances a COPY of the partial while the
  *    original stays open for later alternatives;
  *  - `consecutive`: strict contiguity INSIDE a one-or-more run — a
  *    non-matching event freezes the run instead of being skipped;
  *  - `combinations`: non-deterministic one-or-more — every matching
  *    event forks absorb/skip, enumerating every subsequence;
  *  - `greedy`: maximal-munch AMBIGUITY resolution (Flink
  *    `.greedy()`): an event that matches both this quantified stage
  *    and the following stage's guard is COMMITTED to the quantifier;
  *    without it the engine forks both interpretations (Flink's
  *    default-reluctant alternative selection). Only observable when
  *    the two guards overlap.
  *
  * Group-window fields (Flink `within` on a GroupPattern):
  * `groupStart` is the index of the group's first inlined stage and
  * `groupWithinMs` bounds the time from the group's FIRST matched
  * event to any later event consumed by a group stage; MaxValue = no
  * group window.
  *
  * `loopStart` (Flink `followedBy(Pattern).oneOrMore()`): set on a
  * LOOPING group's last stage only — completing it also forks a
  * sibling partial back at `loopStart` awaiting another repetition,
  * so the pattern matches 1, 2, 3… repetitions (one match per count,
  * Flink's reluctant multiplicity); -1 = no loop. `loopMax` caps the
  * number of times the looped stage may complete (a RANGE-counted
  * group `followedByTimes(sub, from, to)` loops its last copy up to
  * `to - from + 1` completions); MaxValue = unbounded (oneOrMore). */
final case class PatternStep[E](
    name: String, pred: (E, MatchedPrefix[E]) => Boolean,
    kind: StepKind = StepKind.Relaxed,
    until: Option[(E, MatchedPrefix[E]) => Boolean] = None,
    any: Boolean = false,
    consecutive: Boolean = false,
    combinations: Boolean = false,
    greedy: Boolean = false,
    groupStart: Int = -1,
    groupWithinMs: Long = Long.MaxValue,
    loopStart: Int = -1,
    loopMax: Int = Int.MaxValue)

/** Flink-CEP-style sequential event pattern
  * (`Pattern.begin(...).where(...).followedBy(...).within(...)`,
  * reference `/root/reference/src/main/scala/FlinkAssignment.scala:332-336`),
  * declared as data and executed by [[Cep.detect]].
  *
  * Semantics (matching Flink's defaults for this chain shape):
  *  - `followedBy` is RELAXED contiguity — events that match no step
  *    are skipped, they never kill a partial match;
  *  - `next` is STRICT contiguity — the key's immediately-next event
  *    (event-time order) must match or the partial dies;
  *  - `notFollowedBy` is ABSENCE — any event matching the forbidden
  *    guard kills the partial before the next stage matches; a
  *    TERMINAL `notFollowedBy` requires `within` and emits its match
  *    when the window closes unviolated (as in FlinkCEP). An event
  *    that matches both the forbidden guard and the following
  *    stage's guard ADVANCES (advance-first, deterministic);
  *  - `within(d)` bounds first-to-last event time inclusively; a
  *    partial whose window has passed can never complete and is
  *    pruned by the watermark;
  *  - first-match skip: an event that completes a partial match
  *    consumes it — the same partial cannot match again — but one
  *    event may complete MANY pending partials (every open 'added'
  *    matches one 'removed', exactly the reference NFA's behavior).
  */
final case class EventPattern[E] private (
    steps: Vector[PatternStep[E]], withinMs: Long,
    skip: SkipStrategy = SkipStrategy.NoSkip,
    maximalOnly: Boolean = false) {

  /** Opt OUT of FlinkCEP's per-prefix multiplicity for a TERMINAL
    * quantifier (oneOrMore / timesOrMore / times(from, to) tail): by
    * default the engine matches FlinkCEP — every viable prefix of the
    * run is its own match, emitted as soon as its last event is
    * absorbed. With `emitMaximalOnly` the engine instead emits ONE
    * match per run — the maximal absorption — when the window closes
    * (or the `until` stop fires): fewer output rows, the right choice
    * when downstream only wants the longest run. No effect on
    * non-terminal quantifiers (their run length is decided by the
    * following stage either way). */
  def emitMaximalOnly: EventPattern[E] = copy(maximalOnly = true)

  /** Conjoin a guard onto the most recent LOGICAL step (Flink
    * `.where`): after [[times]], every clone of the repeated stage
    * shares its name, and the guard applies to all of them. */
  def where(p: E => Boolean): EventPattern[E] =
    whereIterative((e, _) => p(e))

  /** Conjoin an ITERATIVE guard (FlinkCEP `IterativeCondition`): the
    * guard also sees the partial's [[MatchedPrefix]] — the events
    * every earlier stage (and a quantified current stage) has already
    * accepted — so conditions like "next value above the mean of the
    * matched run" are expressible. Applies to every clone of a
    * [[times]]-expanded stage, like [[where]]. */
  def whereIterative(p: (E, MatchedPrefix[E]) => Boolean): EventPattern[E] = {
    val nm = steps.last.name
    copy(steps = steps.map { st =>
      if (st.name != nm) st
      else { val prev = st.pred
             st.copy(pred = (e, ctx) => prev(e, ctx) && p(e, ctx)) }
    })
  }

  /** Disjoin a guard onto the most recent logical step (Flink
    * `.where(a).or(b)` → `a || b`): the new guard ORs against the
    * stage's ENTIRE accumulated condition, exactly FlinkCEP's
    * `OrCondition(prev, p)` — so `.where(a).or(b).where(c)` reads
    * `(a || b) && c`. Applies to every clone of a [[times]]-expanded
    * stage, like [[where]]. */
  def or(p: E => Boolean): EventPattern[E] =
    orIterative((e, _) => p(e))

  /** Disjoin an iterative guard — [[or]] with [[MatchedPrefix]]
    * access, FlinkCEP's `or(IterativeCondition)`. */
  def orIterative(p: (E, MatchedPrefix[E]) => Boolean): EventPattern[E] = {
    val nm = steps.last.name
    copy(steps = steps.map { st =>
      if (st.name != nm) st
      else { val prev = st.pred
             st.copy(pred = (e, ctx) => prev(e, ctx) || p(e, ctx)) }
    })
  }

  /** Narrow the most recent stage to events of runtime subtype `T`
    * (Flink `.subtype(classOf[T])`): events that are not a `T` do
    * not match the stage — for a relaxed stage they are skipped, for
    * a strict stage they kill the partial, exactly as any other
    * guard failure. Conjoined like [[where]], so later `.where` /
    * `.or` guards still see the declared `E`; use [[whereSubtype]]
    * to write the guard against `T` directly. */
  def subtype[T <: E](implicit ct: scala.reflect.ClassTag[T]): EventPattern[E] =
    where(e => ct.runtimeClass.isInstance(e))

  /** [[subtype]] + a guard typed on the subtype (the one-call form of
    * Flink's `.subtype(classOf[T]).where(t => ...)`): matches events
    * that are a `T` AND satisfy `p` on the downcast value. */
  def whereSubtype[T <: E](p: T => Boolean)(
      implicit ct: scala.reflect.ClassTag[T]): EventPattern[E] =
    where(e => ct.runtimeClass.isInstance(e) && p(e.asInstanceOf[T]))

  /** Repeat the most recent stage exactly `n` times (Flink
    * `.times(n)`): the stage must match n events before the pattern
    * advances, with the stage's OWN contiguity between repetitions —
    * `followedBy(...).times(3)` finds 3 occurrences skipping noise,
    * `next(...).times(3)` demands 3 consecutive events (Flink's
    * `times(n).consecutive()`). Compiled by EXPANSION into n clones
    * sharing the stage name; the match exposes all n events under
    * that one name, and the NFA core is unchanged — a clone is just
    * a stage. */
  def times(n: Int): EventPattern[E] = {
    require(n >= 1, "times(n) needs n >= 1")
    val last = steps.last
    require(last.kind == StepKind.Relaxed || last.kind == StepKind.Strict,
      "times() applies to plain followedBy/next stages only")
    copy(steps = steps ++ Vector.fill(n - 1)(last))
  }

  /** Repeat the most recent stage between `from` and `to` times
    * (Flink `.times(from, to)`), GREEDILY: the stage absorbs up to
    * `to` guard-matching events; after `from` of them the pattern can
    * advance when a later stage's guard matches instead. Compiled by
    * expansion into `from` required clones plus `to - from` OPTIONAL
    * clones, all sharing the stage name — the match exposes every
    * absorbed event under that one name. A TERMINAL range stage
    * requires `within()`: its maximal absorption is only known when
    * the window closes, which is when the match emits (same contract
    * as a terminal `oneOrMore`). */
  def times(from: Int, to: Int): EventPattern[E] = {
    require(from >= 1 && to >= from,
      s"times(from, to) needs 1 <= from <= to, got ($from, $to)")
    val last = steps.last
    require(last.kind == StepKind.Relaxed,
      "times(from, to) applies to a relaxed (begin/followedBy) stage " +
        "only — a strict range would need consecutive() semantics")
    copy(steps = steps ++ Vector.fill(from - 1)(last) ++
      Vector.fill(to - from)(last.copy(kind = StepKind.Optional)))
  }

  /** Stop condition for the most recent `oneOrMore` stage (Flink
    * `.until`): an event matching `p` TERMINATES the run — it is not
    * absorbed into the loop (nor offered to later stages). A stopped
    * terminal loop emits its run immediately (no need to wait for the
    * window to close); a stopped non-terminal loop advances to await
    * the next stage. A stop arriving before the run's first event
    * kills the partial (one-or-more needs at least one). An event
    * matching both the loop guard and `p` stops — the stop condition
    * wins, as in FlinkCEP. */
  def until(p: E => Boolean): EventPattern[E] =
    untilIterative((e, _) => p(e))

  /** Iterative stop condition — [[until]] with [[MatchedPrefix]]
    * access (FlinkCEP's `until(IterativeCondition)`): the stop can
    * read the run absorbed so far, e.g. "stop once the sum of the
    * matched run exceeds a budget". */
  def untilIterative(p: (E, MatchedPrefix[E]) => Boolean): EventPattern[E] = {
    require(steps.last.kind == StepKind.Repeated,
      "until() applies to a oneOrMore stage")
    copy(steps = steps.init :+ steps.last.copy(until = Some(p)))
  }

  /** Set the AFTER_MATCH skip strategy (Flink
    * `Pattern.begin(name, AfterMatchSkipStrategy...)`): controls
    * which other open partials are discarded when a match emits —
    * [[SkipStrategy.NoSkip]] (default: every possible match emits),
    * [[SkipStrategy.SkipToNext]], [[SkipStrategy.SkipPastLastEvent]],
    * [[SkipStrategy.SkipToFirst]], [[SkipStrategy.SkipToLast]]. */
  def afterMatchSkip(s: SkipStrategy): EventPattern[E] = {
    s match {
      case SkipStrategy.SkipToFirst(nm) =>
        require(steps.exists(_.name == nm), s"unknown stage name: $nm")
      case SkipStrategy.SkipToLast(nm) =>
        require(steps.exists(_.name == nm), s"unknown stage name: $nm")
      case _ => ()
    }
    copy(skip = s)
  }

  /** Quantify the most recent stage as one-or-more (Flink
    * `.oneOrMore()`): the stage absorbs a GREEDY MAXIMAL run of
    * guard-matching events (relaxed internal contiguity — non-
    * matching events are skipped); the run ends when an event
    * matches the FOLLOWING stage's guard but not this one. The match
    * exposes the whole run under the stage's name. A terminal
    * one-or-more requires `within` and emits its maximal run when
    * the window closes. */
  def oneOrMore: EventPattern[E] = requantify(StepKind.Repeated)

  /** Quantify the most recent stage as zero-or-one (Flink
    * `.optional()`): taken greedily if its guard matches first,
    * skipped when the following stage's guard matches first; the
    * match exposes the stage's name with one or zero events. */
  def optional: EventPattern[E] = requantify(StepKind.Optional)

  private def requantify(kind: StepKind): EventPattern[E] = {
    require(steps.last.kind == StepKind.Relaxed,
      s"$kind quantifies a relaxed (begin/followedBy) stage only")
    copy(steps = steps.init :+ steps.last.copy(kind = kind))
  }

  /** Repeat the most recent stage `n` OR MORE times (Flink
    * `.timesOrMore(n)`): compiled as `n − 1` required clones plus a
    * terminal one-or-more clone, all sharing the stage name — so the
    * run carries at least n events and the match exposes all of them
    * under the one name. `timesOrMore(1)` is exactly [[oneOrMore]];
    * the same terminal contract applies (a terminal n-or-more needs
    * `within()` or `until()`). */
  def timesOrMore(n: Int): EventPattern[E] = {
    require(n >= 1, "timesOrMore(n) needs n >= 1")
    val last = steps.last
    require(last.kind == StepKind.Relaxed,
      "timesOrMore() applies to a relaxed (begin/followedBy) stage only")
    copy(steps = steps.init ++ Vector.fill(n - 1)(last) :+
      last.copy(kind = StepKind.Repeated))
  }

  /** The trailing run of stages sharing the last stage's name — the
    * clones of one logical quantified stage. */
  private def lastGroup: (Vector[PatternStep[E]], Vector[PatternStep[E]]) = {
    val nm = steps.last.name
    val i = steps.lastIndexWhere(_.name != nm) + 1
    (steps.take(i), steps.drop(i))
  }

  /** Impose STRICT contiguity between the repetitions of the most
    * recent quantified stage (Flink `times(n).consecutive()` /
    * `oneOrMore().consecutive()` / `timesOrMore(n).consecutive()`):
    * the repetition's matching events must be adjacent in the key's
    * event-time order — a non-matching event between them kills (for
    * exact counts) or freezes (for a one-or-more run, or a
    * `times(from, to)` range past its required minimum) the
    * repetition. The gap BEFORE the first repetition element keeps
    * the stage's own relaxed contiguity, as in FlinkCEP. On a range,
    * the required clones become strict and the optional tail freezes
    * on the first gap: the absorption count is fixed there and the
    * partial awaits the next stage (or, terminal, emits under
    * [[emitMaximalOnly]] / has already emitted its prefixes). */
  def consecutive: EventPattern[E] = {
    val (pre, grp) = lastGroup
    require(grp.forall(!_.combinations),
      "consecutive() and allowCombinations() are mutually exclusive")
    require(grp.last.kind == StepKind.Repeated || grp.length > 1,
      "consecutive() applies to a times(n)/times(from,to)/timesOrMore/" +
        "oneOrMore stage")
    val rewritten = grp.zipWithIndex.map { case (st, i) =>
      if (st.kind == StepKind.Repeated) st.copy(consecutive = true)
      else if (st.kind == StepKind.Optional) st.copy(consecutive = true)
      else if (i == 0) st // first element is found with relaxed contiguity
      else st.copy(kind = StepKind.Strict)
    }
    copy(steps = pre ++ rewritten)
  }

  /** Relax the most recent quantified stage to NON-DETERMINISTIC
    * contiguity (Flink `times(n).allowCombinations()` /
    * `oneOrMore().allowCombinations()`): the repetition matches every
    * SUBSEQUENCE of qualifying events, not just the greedy run —
    * `b+ allowCombinations` on b1 b2 b3 yields {b1}, {b1 b2},
    * {b1 b3}, {b1 b2 b3}, … Match multiplicity is exponential in the
    * run length (exactly as in FlinkCEP) — bound the window with
    * `within()` and treat this as an explicit opt-in. */
  def allowCombinations: EventPattern[E] = {
    val (pre, grp) = lastGroup
    require(grp.forall(st =>
      st.kind == StepKind.Relaxed || st.kind == StepKind.Repeated ||
        st.kind == StepKind.Optional),
      "allowCombinations() applies to a times(n)/times(from,to)/" +
        "timesOrMore/oneOrMore quantifier on relaxed stages")
    require(grp.forall(!_.consecutive),
      "consecutive() and allowCombinations() are mutually exclusive")
    require(grp.forall(!_.greedy),
      "greedy() and allowCombinations() are mutually exclusive — " +
        "combinations already enumerates every alternative")
    require(grp.last.kind == StepKind.Repeated || grp.length > 1,
      "allowCombinations() needs a quantified stage (times/oneOrMore)")
    val rewritten = grp.map { st =>
      if (st.kind == StepKind.Repeated || st.kind == StepKind.Optional)
        st.copy(combinations = true)
      else st.copy(any = true)
    }
    copy(steps = pre ++ rewritten)
  }

  /** Resolve quantifier AMBIGUITY by maximal munch (Flink
    * `.greedy()` on `times(from, to)` / `oneOrMore` / `timesOrMore`):
    * an event whose guard match is ambiguous — it satisfies both the
    * quantified stage and the FOLLOWING stage — is committed to the
    * quantifier, so only the longest-absorption alternative survives.
    * Without `greedy` the engine forks both interpretations (Flink's
    * default-reluctant alternative selection), emitting a match per
    * viable absorption length. The modifier is observable only when
    * the two guards overlap; on disjoint guards (the common case)
    * default and greedy are identical, which CepModifiersSpec pins as
    * a property. On a TERMINAL quantifier greedy has no effect (as in
    * FlinkCEP, where greedy is unsupported on the last element): the
    * default emits one match per prefix as events are absorbed;
    * [[emitMaximalOnly]] collapses that to the maximal run at window
    * close in both modes. */
  def greedy: EventPattern[E] = {
    val (pre, grp) = lastGroup
    require(grp.last.kind == StepKind.Repeated ||
      grp.exists(_.kind == StepKind.Optional),
      "greedy() applies to a times(from, to)/oneOrMore/timesOrMore stage")
    require(grp.forall(!_.combinations),
      "greedy() and allowCombinations() are mutually exclusive — " +
        "combinations already enumerates every alternative")
    val rewritten = grp.map { st =>
      if (st.kind == StepKind.Repeated || st.kind == StepKind.Optional)
        st.copy(greedy = true)
      else st
    }
    copy(steps = pre ++ rewritten)
  }

  private def append(name: String, kind: StepKind): EventPattern[E] = {
    require(!steps.exists(_.name == name), s"duplicate step name: $name")
    copy(steps = steps :+ PatternStep[E](name, (_, _) => true, kind))
  }

  /** Append a relaxed-contiguity stage (Flink `.followedBy`). */
  def followedBy(name: String): EventPattern[E] =
    append(name, StepKind.Relaxed)

  /** Append a relaxed NON-DETERMINISTIC stage (Flink
    * `.followedByAny`): EVERY qualifying event matches the stage in
    * its own alternative partial, not just the first one — `a
    * followedByAny b` on a1 b1 b2 yields {a1 b1} AND {a1 b2}. The
    * deterministic [[followedBy]] would yield {a1 b1} only. */
  def followedByAny(name: String): EventPattern[E] = {
    require(!steps.exists(_.name == name), s"duplicate step name: $name")
    copy(steps = steps :+ PatternStep[E](name, (_, _) => true,
      StepKind.Relaxed, any = true))
  }

  /** Append a strict-contiguity stage (Flink `.next`): the key's
    * immediately-next event must match or the partial is killed. */
  def next(name: String): EventPattern[E] =
    append(name, StepKind.Strict)

  /** Inline a group sub-pattern's stages at offset `base`. A
    * `within()` on the sub-pattern becomes a GROUP WINDOW (Flink's
    * GroupPattern-scoped within): every inlined stage is tagged with
    * the group's first stage index and the bound, and the NFA then
    * requires any event a group stage consumes to fall within
    * groupWithinMs of the group's FIRST matched event. Already-
    * windowed inner groups shift with the offset; a windowed group
    * may not nest another windowed group (one group window per
    * stage). */
  private def groupSteps(sub: EventPattern[E],
      base: Int): Vector[PatternStep[E]] = {
    require(sub.skip == SkipStrategy.NoSkip,
      "a group sub-pattern cannot carry a skip strategy")
    require(sub.steps.nonEmpty && sub.steps.head.kind == StepKind.Relaxed,
      "a group sub-pattern must start with a plain begin stage")
    val shifted = sub.steps.map { st =>
      if (st.groupStart < 0) st else st.copy(groupStart = st.groupStart + base)
    }
    if (sub.withinMs == Long.MaxValue) shifted
    else {
      require(sub.steps.forall(_.groupWithinMs == Long.MaxValue),
        "a windowed group cannot nest another windowed group — one " +
          "group window per stage. FlinkCEP cannot express this shape " +
          "either: every Flink within() folds into ONE global window " +
          "(the min across stages), so any FlinkCEP program maps onto " +
          "this builder. Decompose: keep the INNER group window and " +
          "move the outer bound to the whole-pattern within() " +
          "(CepGroupSpec's parity cases run both decompositions)")
      shifted.map(_.copy(groupStart = base, groupWithinMs = sub.withinMs))
    }
  }

  /** Append a GROUP sub-pattern with relaxed contiguity (Flink
    * `followedBy(Pattern)`, the GroupPattern nesting): the
    * sub-pattern's stage sequence is inlined — matching proceeds
    * through its stages exactly as if they were declared on the outer
    * pattern, and the match exposes each inner stage under its own
    * name. A `within()` on the sub-pattern becomes a GROUP-scoped
    * window (first group event → any group event); the outer
    * pattern's own `within` still bounds the whole match. Stage names
    * must not collide with the outer ones. */
  def followedBy(sub: EventPattern[E]): EventPattern[E] = {
    val gs = groupSteps(sub, steps.length)
    gs.map(_.name).distinct.foreach { nm =>
      require(!steps.exists(_.name == nm), s"duplicate step name: $nm") }
    copy(steps = steps ++ gs)
  }

  /** Append a group sub-pattern with STRICT contiguity into its first
    * stage (Flink `next(Pattern)`): the sub-pattern's first event must
    * be the key's immediately-next event. A sub-pattern `within()`
    * becomes the group's window, as in [[followedBy]]. */
  def next(sub: EventPattern[E]): EventPattern[E] = {
    val gs = groupSteps(sub, steps.length)
    gs.map(_.name).distinct.foreach { nm =>
      require(!steps.exists(_.name == nm), s"duplicate step name: $nm") }
    copy(steps = steps ++
      (gs.head.copy(kind = StepKind.Strict) +: gs.tail))
  }

  /** Append a group sub-pattern repeated exactly `n` times (Flink
    * `followedBy(Pattern).times(n)`): the whole inner sequence must
    * complete n times in order, with relaxed contiguity between
    * repetitions. Compiled by expansion — the n copies share the
    * inner stage names, so the match merges every repetition's events
    * under those names, exactly FlinkCEP's GroupPattern exposure. A
    * sub-pattern `within()` bounds EACH REPETITION separately (every
    * copy is its own group instance). For unbounded counts use
    * [[followedByOneOrMore]] (the loop-back fork); for bounded ranges
    * use `followedByTimes(sub, from, to)`. */
  def followedByTimes(sub: EventPattern[E], n: Int): EventPattern[E] = {
    require(n >= 1, "followedByTimes(sub, n) needs n >= 1")
    require(sub.steps.forall(st => st.kind == StepKind.Relaxed ||
      st.kind == StepKind.Strict),
      "a repeated group may contain plain followedBy/next stages only")
    sub.steps.map(_.name).distinct.foreach { nm =>
      require(!steps.exists(_.name == nm), s"duplicate step name: $nm") }
    val copies = (0 until n).flatMap { i =>
      groupSteps(sub, steps.length + i * sub.steps.length) }
    copy(steps = steps ++ copies)
  }

  /** Append a group sub-pattern repeated a RANGE of times (Flink
    * `followedBy(Pattern).times(from, to)`): the inner sequence must
    * complete at least `from` and at most `to` times, relaxed
    * contiguity between repetitions. Compiled as `from` inlined
    * copies whose LAST copy loops back on itself (the
    * [[followedByOneOrMore]] fork) capped at `to − from` extra
    * completions — so each count in `[from, to]` advances its own
    * partial past the group, one match per count (Flink's reluctant
    * quantifier multiplicity), with every repetition's events merged
    * under the inner stage names. This sidesteps the optional-SEQUENCE
    * skipping problem a clone expansion would have: a repetition is
    * all-or-nothing by construction — only a COMPLETED copy forks the
    * next one. Like a looping group, the sub-pattern may contain
    * plain followedBy/next stages only. A sub-pattern `within()`
    * becomes a PER-REPETITION group window: each copy — and each
    * loop-back completion of the last copy — anchors the bound at
    * its OWN first matched event (the instance-aware groupT0 stops
    * its scan at the previous completion's boundary, so the index
    * reuse no longer leaks repetition 1's anchor into later ones);
    * still bound the whole match with the outer `within()` (the
    * state bound). */
  def followedByTimes(sub: EventPattern[E], from: Int, to: Int): EventPattern[E] = {
    require(from >= 1 && to >= from,
      s"followedByTimes(sub, from, to) needs 1 <= from <= to, got ($from, $to)")
    if (from == to) followedByTimes(sub, from)
    else {
      require(sub.steps.forall(st => st.kind == StepKind.Relaxed ||
        st.kind == StepKind.Strict),
        "a range-counted group may contain plain followedBy/next stages only")
      sub.steps.map(_.name).distinct.foreach { nm =>
        require(!steps.exists(_.name == nm), s"duplicate step name: $nm") }
      val copies = (0 until from).flatMap { i =>
        groupSteps(sub, steps.length + i * sub.steps.length) }
      val loopHead = steps.length + (from - 1) * sub.steps.length
      copy(steps = steps ++ copies.init :+
        copies.last.copy(loopStart = loopHead, loopMax = to - from + 1))
    }
  }

  /** Append a LOOPING group sub-pattern (Flink
    * `followedBy(Pattern).oneOrMore()`): the inner sequence must
    * complete at least once; each completion ALSO forks a sibling
    * awaiting another repetition, so the pattern matches every
    * repetition count ≥ 1 — one match per count, merged under the
    * inner stage names (Flink's reluctant quantifier multiplicity;
    * there is no greedy form — every count is a distinct match).
    * Relaxed contiguity between repetitions. The sub-pattern may
    * contain plain followedBy/next stages only. A sub-pattern
    * `within()` becomes a PER-REPETITION group window: each
    * completion anchors the bound at the repetition's OWN first
    * matched event (the instance-aware groupT0 scan stops at the
    * previous completion's boundary — "the group's first event" no
    * longer spans repetitions) — an in-progress repetition that
    * outlives its window expires, while the completed-count sibling
    * survives on the outer bound. Still declare the OUTER within:
    * it is the state bound (without it an open loop lingers forever,
    * as in FlinkCEP). */
  def followedByOneOrMore(sub: EventPattern[E]): EventPattern[E] = {
    require(sub.steps.forall(st => st.kind == StepKind.Relaxed ||
      st.kind == StepKind.Strict),
      "a looping group may contain plain followedBy/next stages only")
    sub.steps.map(_.name).distinct.foreach { nm =>
      require(!steps.exists(_.name == nm), s"duplicate step name: $nm") }
    val start = steps.length
    val gs = groupSteps(sub, start)
    copy(steps = steps ++ gs.init :+ gs.last.copy(loopStart = start))
  }

  /** Append an absence stage (Flink `.notFollowedBy`): an event
    * matching the guard kills the partial. Non-terminal: satisfied
    * when the FOLLOWING stage matches. Terminal: requires `within`;
    * the match emits when the window closes unviolated. */
  def notFollowedBy(name: String): EventPattern[E] = {
    require(steps.last.kind != StepKind.Negative &&
      steps.last.kind != StepKind.NegativeStrict,
      "consecutive absence stages are not supported")
    append(name, StepKind.Negative)
  }

  /** Append a strict-absence stage (Flink `.notNext`): the event
    * IMMEDIATELY following the previous stage's match must NOT match
    * the guard — if it does, the partial dies. The checking event is
    * then itself considered for the following stage (so
    * `a.notNext(b).next(c)` demands the event right after `a` match
    * `c` and not `b`; `a.notNext(b).followedBy(c)` forbids only the
    * one immediate event, later events need not avoid `b`). Cannot
    * start or end a pattern (as in FlinkCEP). */
  def notNext(name: String): EventPattern[E] = {
    require(steps.last.kind != StepKind.Negative &&
      steps.last.kind != StepKind.NegativeStrict,
      "consecutive absence stages are not supported")
    append(name, StepKind.NegativeStrict)
  }

  /** Bound the whole match window (Flink `.within`). */
  def within(d: java.time.Duration): EventPattern[E] =
    copy(withinMs = d.toMillis)
}

object EventPattern {
  /** Start a pattern with its first stage (Flink `Pattern.begin`).
    * No `within` means unbounded state, as in Flink. */
  def begin[E](name: String): EventPattern[E] =
    EventPattern(Vector(PatternStep[E](name, (_, _) => true)), Long.MaxValue)

  /** Start a pattern from a GROUP sub-pattern (Flink
    * `Pattern.begin(Pattern)`): the sub-pattern's stages become the
    * outer pattern's prefix — declare guards inside the sub-pattern,
    * then chain `followedBy`/`within`/... on the result. A
    * sub-pattern `within()` becomes a GROUP window scoped to the
    * leading stages (the outer `within` is still declared on the
    * result). */
  def begin[E](sub: EventPattern[E]): EventPattern[E] = {
    require(sub.skip == SkipStrategy.NoSkip,
      "a group sub-pattern cannot carry a skip strategy")
    if (sub.withinMs == Long.MaxValue) sub
    else {
      require(sub.steps.forall(_.groupWithinMs == Long.MaxValue),
        "a windowed group cannot nest another windowed group — one " +
          "group window per stage (see followedBy(sub): FlinkCEP " +
          "cannot express stacked scoped windows either; decompose " +
          "via the whole-pattern within())")
      EventPattern(sub.steps.map(
        _.copy(groupStart = 0, groupWithinMs = sub.withinMs)), Long.MaxValue)
    }
  }
}

/** Generic CEP runtime: compiles an [[EventPattern]] to a keyed NFA
  * over `flatMapGroupsWithState` (the same execution shape as the
  * previously hardcoded added→removed machine, which now routes
  * through here — [[CommitStreams.addedThenRemoved]]).
  *
  * State per key = open partial matches `(nextStage, firstTsMs,
  * matchedEventsReversed)`. Each input batch is processed in event-time
  * order; an event first tries to advance every open partial (stage
  * guard + window check), then tries to open a new partial at stage 0.
  * Event-time timeout fires once every open window has passed, so an
  * idle key's state is dropped instead of lingering forever — at
  * 100 TB the state store holds only in-horizon partials per key.
  * The timeout firing also runs the pruning pass, which is where a
  * terminal `notFollowedBy` emits its window-closed-unviolated match.
  */
object Cep {

  /** Open partial match: index of the next unsatisfied stage, first
    * event's time, matched events newest-first — each tagged with the
    * stage index it matched (a quantified stage owns several). */
  type Partial[E] = (Int, Long, List[(Int, E)])

  private def deadline(withinMs: Long, t0: Long): Long =
    if (withinMs == Long.MaxValue) Long.MaxValue else t0 + withinMs

  /** First matched event time of the CURRENT INSTANCE of the group
    * stage `idx` belongs to (MaxValue when that instance hasn't
    * matched anything yet).
    *
    * Instance-aware for LOOPING groups (`followedByOneOrMore` /
    * `followedByTimes(sub, from, to)`, whose loop-back reuses the
    * group's stage indices): consuming the group's LAST stage
    * completes a repetition, so the current instance's events are
    * exactly the acc entries (newest-first) tagged with a group
    * stage index and NEWER than the most recent last-stage entry —
    * the walk stops at that boundary, anchoring each repetition's
    * window to its OWN first event instead of repetition 1's. For a
    * non-looping group the boundary entry cannot coexist with a
    * stage pointer still inside the group, so the walk sees every
    * group entry — the original semantics. Entries PAST the group's
    * last index (outer stages a loop body ran through in an earlier
    * repetition) are excluded for the same reason. */
  private def groupT0[E](steps: Vector[PatternStep[E]],
      eventTimeMs: E => Long, idx: Int, acc: List[(Int, E)]): Long = {
    val gs = steps(idx).groupStart
    val gw = steps(idx).groupWithinMs
    // the group's extent: the contiguous block sharing (gs, gw)
    var lastIdx = idx
    while (lastIdx + 1 < steps.length &&
           steps(lastIdx + 1).groupStart == gs &&
           steps(lastIdx + 1).groupWithinMs == gw) lastIdx += 1
    var g0 = Long.MaxValue
    var rest = acc
    var stop = false
    while (!stop && rest.nonEmpty) {
      val (i, ev) = rest.head
      if (i == lastIdx) stop = true // previous repetition's completion
      else {
        if (i >= gs && i < lastIdx) {
          val ts = eventTimeMs(ev); if (ts < g0) g0 = ts
        }
        rest = rest.tail
      }
    }
    g0
  }

  /** A partial's effective deadline: the outer window, tightened by
    * an in-progress group window (first group event + groupWithinMs).
    * MaxValue = never expires.
    *
    * The group window bounds only events CONSUMED by group stages —
    * so it tightens the deadline only while the group still NEEDS an
    * event. A partial sitting on an Optional/Negative group stage
    * whose remaining group stages are all skippable (e.g. the
    * `times(1, 2).within(...)` expansion after its required element
    * matched) stays viable past the group close: the in-event
    * forward scan already skips the closed optionals to the
    * post-group stage, and expiring it here would drop a match whose
    * completion never needed another group event (the outcome would
    * then depend on watermark timing, not data). Exception: when the
    * group's skippable tail IS the pattern's tail, the group close is
    * the emission trigger (terminal notFollowedBy / optional-tail /
    * one-or-more emissions fire at expiry), so the group deadline
    * stands. */
  private def partialDeadline[E](steps: Vector[PatternStep[E]],
      withinMs: Long, eventTimeMs: E => Long)(p: Partial[E]): Long = {
    val (stage, t0, acc) = p
    val base = deadline(withinMs, t0)
    val st = steps(stage)
    if (st.groupWithinMs == Long.MaxValue) base
    else {
      val g0 = groupT0(steps, eventTimeMs, stage, acc)
      if (g0 == Long.MaxValue) base
      else {
        val gs = st.groupStart
        var i = stage
        var needsEvent = false
        while (i < steps.length && steps(i).groupStart == gs &&
               steps(i).groupWithinMs != Long.MaxValue) {
          steps(i).kind match {
            case StepKind.Optional | StepKind.Negative |
                 StepKind.NegativeStrict => ()
            case StepKind.Repeated =>
              // a one-or-more with a non-empty run can resolve on the
              // next stage's match; an empty run still needs its one
              if (!(i == stage && acc.exists(_._1 == i))) needsEvent = true
            case _ => needsEvent = true
          }
          i += 1
        }
        val groupIsTail = i >= steps.length
        if (!needsEvent && !groupIsTail) base
        else math.min(base, g0 + st.groupWithinMs)
      }
    }
  }

  /** One per-key micro-batch of the NFA, PURE (CepPropertiesSpec
    * fuzzes it against a brute-force reference): processes `events`
    * in event-time order against the open `partials0`, returns the
    * surviving partials (watermark-pruned) and the completed matches
    * (step name → matched events; a negative step maps to Seq.empty)
    * in emission order. */
  private[graft] def step[E](
      steps: Vector[PatternStep[E]], withinMs: Long,
      eventTimeMs: E => Long,
      partials0: List[Partial[E]], events: Seq[E],
      watermarkMs: Long,
      skip: SkipStrategy = SkipStrategy.NoSkip,
      maximalOnly: Boolean = false
  ): (List[Partial[E]], Vector[Map[String, Seq[E]]],
      Vector[Map[String, Seq[E]]]) = {
    // group the tagged events under their stage's name, match order;
    // stages cloned by times(n) share a name and merge naturally, a
    // quantified stage contributes its whole run, a negative (or an
    // untaken optional) contributes an empty seq
    def emitSteps(upTo: Int,
                  evsRev: List[(Int, E)]): Map[String, Seq[E]] = {
      val byStage = evsRev.reverse.groupBy(_._1)
      steps.take(upTo).zipWithIndex
        .foldLeft(Map.empty[String, Seq[E]]) { case (m, (st, i)) =>
          val cur = m.getOrElse(st.name, Seq.empty[E])
          m.updated(st.name, cur ++ byStage.getOrElse(i, Nil).map(_._2))
        }
    }
    def emit(evsRev: List[(Int, E)]): Map[String, Seq[E]] =
      emitSteps(steps.length, evsRev)
    var partials = partials0
    val out = Vector.newBuilder[Map[String, Seq[E]]]
    // completions found while processing one event (or one expiry
    // pass) are STAGED, then emitted in match-start order so the
    // AFTER_MATCH skip can suppress later-started siblings that
    // completed on the very same event (FlinkCEP's b+ c example:
    // SKIP_PAST_LAST_EVENT emits only the b1..bn run, not suffixes)
    var staged = List.empty[(Long, List[(Int, E)])]
    // advance `p` by consuming `e` into stage `into`, landing on
    // `into + 1` (or staging a completion if that ends the pattern);
    // completing a LOOPING group's last stage also forks a sibling
    // back at the group head, awaiting another repetition (capped at
    // loopMax completions for a range-counted group)
    def consume(kept: scala.collection.mutable.Builder[Partial[E], List[Partial[E]]],
                t0: Long, acc: List[(Int, E)], into: Int, e: E): Unit = {
      val nacc = (into, e) :: acc
      if (into + 1 == steps.length) staged ::= ((t0, nacc))
      else {
        kept += ((into + 1, t0, nacc))
        // FlinkCEP per-prefix multiplicity: landing where every
        // remaining stage is Optional (the times(from, to) tail after
        // its required minimum) means the pattern is ALREADY satisfied
        // — the prefix is its own match, emitted now, while the
        // partial keeps absorbing toward longer ones
        if (!maximalOnly && (into + 1 until steps.length).forall(i =>
          steps(i).kind == StepKind.Optional))
          staged ::= ((t0, nacc))
      }
      val ls = steps(into).loopStart
      if (ls >= 0 && nacc.count(_._1 == into) < steps(into).loopMax)
        kept += ((ls, t0, nacc))
    }
    /** The emitted match's skip span as a drop-predicate over other
      * partials'/candidates' start times.
      *
      * Equal-timestamp caveat: the predicate is keyed on start TIME
      * alone (`t0 > t0m && …`), so a partial whose start event shares
      * the emitted match's start timestamp is never pruned — it is
      * not "later-started" under time ordering — and ties among
      * staged completions resolve by the stable fold order, not event
      * identity. FlinkCEP prunes by SharedBuffer entry identity, so
      * when distinct events carry the SAME timestamp the two engines
      * can keep different siblings. Within this engine the outcome is
      * deterministic (events at one timestamp process in input
      * order); the divergence is observable only on colliding
      * timestamps, which the event-time NFA already treats as
      * simultaneous everywhere else. */
    def skipDrop(t0m: Long, accFull: List[(Int, E)]): Long => Boolean = {
      def mappedTimes(nm: String): Seq[Long] = {
        val idx = steps.zipWithIndex.collect {
          case (st, i) if st.name == nm => i }.toSet
        accFull.collect { case (i, e) if idx(i) => eventTimeMs(e) }
      }
      skip match {
        case SkipStrategy.NoSkip => _ => false
        case SkipStrategy.SkipToNext =>
          // same start as the emitted match (the emitting partial is
          // already off the open list, so only true siblings die)
          t0 => t0 == t0m
        case SkipStrategy.SkipPastLastEvent =>
          val tLast = eventTimeMs(accFull.head._2)
          t0 => t0 > t0m && t0 <= tLast
        case SkipStrategy.SkipToFirst(nm) =>
          val ts = mappedTimes(nm)
          if (ts.isEmpty) _ => false else t0 => t0 > t0m && t0 < ts.min
        case SkipStrategy.SkipToLast(nm) =>
          val ts = mappedTimes(nm)
          if (ts.isEmpty) _ => false else t0 => t0 > t0m && t0 < ts.max
      }
    }
    /** Emit the staged completions in start order; each emission
      * prunes both the not-yet-emitted siblings and the open set. */
    def emitStaged(open0: List[Partial[E]]): List[Partial[E]] = {
      var open = open0
      var rest = staged.reverse.sortBy(_._1) // stable: fold order on ties
      staged = Nil
      while (rest.nonEmpty) {
        val (t0m, accFull) = rest.head
        rest = rest.tail
        out += emit(accFull)
        if (skip != SkipStrategy.NoSkip) {
          val drop = skipDrop(t0m, accFull)
          open = open.filterNot { case (_, t0, _) => drop(t0) }
          rest = rest.filterNot { case (t0, _) => drop(t0) }
        }
      }
      open
    }
    events.sortBy(eventTimeMs).foreach { e =>
      val t = eventTimeMs(e)
      val kept = List.newBuilder[Partial[E]]
      partials.foreach { case p @ (stage, t0, acc) =>
        val inWindow = t >= t0 && t <= deadline(withinMs, t0)
        // group-scoped within: consuming into stage `idx` must also
        // fall inside that stage's group window (first group event +
        // groupWithinMs; an empty group starts with this very event)
        def groupOk(idx: Int): Boolean = {
          val gw = steps(idx).groupWithinMs
          gw == Long.MaxValue || {
            val g0 = groupT0(steps, eventTimeMs, idx, acc)
            g0 == Long.MaxValue || t <= g0 + gw
          }
        }
        // iterative-condition context: the partial's matched prefix
        val ctx = new MatchedPrefix(steps, acc)
        steps(stage).kind match {
          case StepKind.Relaxed =>
            if (inWindow && steps(stage).pred(e, ctx) && groupOk(stage)) {
              consume(kept, t0, acc, stage, e)
              // non-deterministic (`followedByAny` / the clone form of
              // allowCombinations): the original stays open so every
              // later qualifying event is an alternative too
              if (steps(stage).any) kept += p
            }
            else kept += p // relaxed contiguity: partial stays open
          case StepKind.Strict =>
            // the key's next event either matches or kills; an
            // out-of-window event can't match and kills too
            if (inWindow && steps(stage).pred(e, ctx) && groupOk(stage))
              consume(kept, t0, acc, stage, e)
            // else: drop p
          case StepKind.Negative =>
            // advance-first: satisfying the NEXT stage wins over the
            // forbidden guard when an event matches both
            val advances = stage + 1 < steps.length && inWindow &&
              steps(stage + 1).pred(e, ctx) && groupOk(stage + 1)
            if (advances) consume(kept, t0, acc, stage + 1, e)
            else if (inWindow && steps(stage).pred(e, ctx)) {
              // forbidden event observed: kill (drop p)
            } else kept += p
          case StepKind.NegativeStrict =>
            // notNext: the key's IMMEDIATELY-next event decides — a
            // forbidden (or out-of-window) event kills the partial;
            // anything else resolves the constraint for good and is
            // itself offered to the following stage (builder
            // guarantees one exists and is Relaxed or Strict)
            if (!inWindow || steps(stage).pred(e, ctx)) {
              // kill (drop p)
            } else {
              val nxt = stage + 1
              if (steps(nxt).pred(e, ctx) && groupOk(nxt)) {
                consume(kept, t0, acc, nxt, e)
                if (steps(nxt).any) kept += ((nxt, t0, acc))
              }
              else if (steps(nxt).kind == StepKind.Relaxed)
                kept += ((nxt, t0, acc))
              // else Strict: the immediate event had to match — kill
            }
          case StepKind.Repeated =>
            // stop condition first (until beats the loop guard, as in
            // FlinkCEP): a non-empty run ends — terminal emits NOW,
            // non-terminal awaits the next stage; an empty run dies
            val st = steps(stage)
            val hasRun = acc.exists(_._1 == stage)
            val stopped = st.until.exists(u => inWindow && u(e, ctx))
            val matchesLoop = inWindow && st.pred(e, ctx) && groupOk(stage)
            val matchesNext = stage + 1 < steps.length && inWindow &&
              steps(stage + 1).pred(e, ctx) && groupOk(stage + 1)
            // a TERMINAL quantifier emits per-prefix (FlinkCEP's
            // reluctant multiplicity): every absorption completes a
            // match of its own, emitted immediately, while the partial
            // keeps absorbing — so the window close / until stop /
            // consecutive freeze below have nothing left to emit.
            // emitMaximalOnly restores the one-maximal-run-per-close
            // behavior.
            val terminalHere = stage + 1 == steps.length
            if (stopped) {
              if (hasRun) {
                if (terminalHere) { if (maximalOnly) staged ::= ((t0, acc)) }
                else kept += ((stage + 1, t0, acc))
              } // else: drop p (one-or-more never got its one)
            }
            else if (st.combinations) {
              // non-deterministic (`allowCombinations`): fork every
              // applicable option — absorb, advance, and skip all
              // coexist, enumerating the run's subsequences
              if (matchesLoop) {
                val nacc = (stage, e) :: acc
                kept += ((stage, t0, nacc))
                if (terminalHere && !maximalOnly) staged ::= ((t0, nacc))
              }
              if (hasRun && matchesNext) consume(kept, t0, acc, stage + 1, e)
              kept += p // skip fork: absorb later events instead
            }
            else if (matchesLoop) {
              val nacc = (stage, e) :: acc
              kept += ((stage, t0, nacc))
              if (terminalHere && !maximalOnly) staged ::= ((t0, nacc))
              // AMBIGUOUS event (matches the loop AND the next
              // stage): the default is Flink's reluctant fork — a
              // sibling advances with the run as-is; greedy() commits
              // to the loop (maximal munch). On disjoint guards the
              // fork never fires and both modes are identical.
              if (!st.greedy && hasRun && matchesNext)
                consume(kept, t0, acc, stage + 1, e)
            }
            // the run ends on an event that matches the NEXT stage
            // but not this one
            else if (hasRun && matchesNext)
              consume(kept, t0, acc, stage + 1, e)
            else if (st.consecutive) {
              if (hasRun) {
                // `consecutive()`: a non-matching event FREEZES the
                // run — non-terminal awaits the next stage; a frozen
                // TERMINAL run already emitted its prefixes (or, under
                // emitMaximalOnly, emits its maximal run now)
                if (terminalHere) { if (maximalOnly) staged ::= ((t0, acc)) }
                else kept += ((stage + 1, t0, acc))
              } else if (stage > 0 && steps(stage - 1).name == st.name) {
                // strict gap INSIDE a timesOrMore repetition group:
                // the previous clone's event was a repetition element,
                // so a non-matching event here kills the partial
              } else kept += p // relaxed gap before the first element
            }
            else kept += p // relaxed: skip the non-matching event
          case StepKind.Optional =>
            // taken if its guard matches first…
            if (inWindow && steps(stage).pred(e, ctx) && groupOk(stage)) {
              consume(kept, t0, acc, stage, e)
              // non-deterministic range (`times(from, to)
              // .allowCombinations()`): fork the SKIP alternative too
              // — the original stays at this clone so any LATER
              // qualifying event is an alternative absorption,
              // enumerating the tail's subsequences
              if (steps(stage).combinations) kept += p
              // AMBIGUOUS event: it may instead resolve this
              // quantifier short and satisfy a later stage — the
              // default forks that interpretation too (skipping this
              // quantifier's remaining same-name clones, whose take
              // would duplicate this one); greedy() commits to the
              // quantifier
              if (!steps(stage).greedy) {
                var j = stage + 1
                while (j < steps.length &&
                  steps(j).kind == StepKind.Optional &&
                  (steps(j).name == steps(stage).name ||
                    !(steps(j).pred(e, ctx) && groupOk(j)))) j += 1
                if (j < steps.length && steps(j).name != steps(stage).name &&
                  steps(j).pred(e, ctx) && groupOk(j))
                  consume(kept, t0, acc, j, e)
              }
            }
            else {
              // …skipped when a later stage's guard matches first:
              // scan past consecutive untaken optional stages (the
              // times(from, to) expansion) to the first stage that
              // accepts the event
              var j = stage + 1
              while (j < steps.length && steps(j).kind == StepKind.Optional &&
                !(steps(j).pred(e, ctx) && groupOk(j))) j += 1
              if (j < steps.length && inWindow && steps(j).pred(e, ctx) &&
                groupOk(j))
                consume(kept, t0, acc, j, e)
              else if (steps(stage).consecutive) {
                // `times(from, to).consecutive()`: the adjacency gap
                // is broken — the absorption count FREEZES here for
                // good: skip past the remaining optional clones to
                // await the next stage under its own contiguity; a
                // frozen TERMINAL tail already emitted its prefixes
                // (or, under emitMaximalOnly, emits its fixed
                // absorption now)
                var k = stage
                while (k < steps.length &&
                  steps(k).kind == StepKind.Optional) k += 1
                if (k < steps.length) kept += ((k, t0, acc))
                else if (maximalOnly) staged ::= ((t0, acc))
              }
              else kept += p
            }
        }
      }
      partials = kept.result()
      if (steps.head.pred(e, new MatchedPrefix(steps, Nil))) { // an event may also open a new partial
        steps.head.kind match {
          case StepKind.Repeated =>
            // a head run OPENS on its first event and stays on stage 0
            // to absorb the rest (one partial per run start — Flink's
            // no-skip multiplicity, suffix runs open their own); a
            // single-stage pattern (terminal head quantifier) emits
            // the 1-run now under per-prefix multiplicity
            val nacc = List((0, e))
            partials = (0, t, nacc) :: partials
            if (steps.length == 1 && !maximalOnly) staged ::= ((t, nacc))
          case _ =>
            if (steps.length == 1) staged ::= ((t, List((0, e))))
            else partials = (1, t, List((0, e))) :: partials
        }
      }
      // emit this event's completions (start-ordered) and let the
      // skip strategy prune the open set before the next event
      partials = emitStaged(partials)
    }
    // expired partials can never complete (events behind the
    // watermark are dropped upstream of this operator) — except a
    // TERMINAL notFollowedBy (match DEFINED by the window closing
    // unviolated) and a TERMINAL one-or-more with a non-empty run
    // (the maximal run is only known once the window closes): both
    // emit here, at expiry
    var kept = List.empty[Partial[E]]
    val expired = List.newBuilder[Partial[E]]
    partials.foreach { p =>
      // the effective deadline folds in an in-progress group window,
      // so a partial stuck inside an expired GROUP prunes (and its
      // terminal special-emissions fire) at the group close
      if (partialDeadline(steps, withinMs, eventTimeMs)(p) >= watermarkMs)
        kept ::= p
      else expired += p
    }
    kept = kept.reverse
    val timedOut = Vector.newBuilder[Map[String, Seq[E]]]
    expired.result().reverse.foreach { case (stage, t0, acc) =>
      val terminal = stage == steps.length - 1
      val kind = steps(stage).kind
      // an all-optional TAIL (times(from, to) expansion) means every
      // required stage is satisfied: the window closing fixes the
      // greedy-maximal absorption, so this emits as a MATCH
      val optionalTail = kind == StepKind.Optional &&
        (stage until steps.length).forall(i => steps(i).kind == StepKind.Optional)
      if (terminal && kind == StepKind.Negative) staged ::= ((t0, acc))
      else if (terminal && kind == StepKind.Repeated &&
        acc.exists(_._1 == stage)) {
        // per-prefix multiplicity already emitted every prefix of the
        // run (including the maximal) as it was absorbed — the close
        // emits only under emitMaximalOnly
        if (maximalOnly) staged ::= ((t0, acc))
      }
      else if (optionalTail) {
        if (maximalOnly) staged ::= ((t0, acc))
      }
      else {
        // a timed-out partial reports what it DID match: satisfied
        // stages only — include a repeated stage's partial run, and
        // for a LOOPING group partial (whose stage pointer sits back
        // at the group head while the acc holds completed
        // repetitions) every stage that actually matched events
        val upTo0 =
          if (kind == StepKind.Repeated && acc.exists(_._1 == stage)) stage + 1
          else stage
        val upTo = acc.foldLeft(upTo0)((m, t) => math.max(m, t._1 + 1))
        timedOut += emitSteps(upTo, acc)
      }
    }
    // window-close emissions (start-ordered) prune the survivors too
    kept = emitStaged(kept)
    (kept, out.result(), timedOut.result())
  }

  /** Run `pattern` over `events` keyed by `keyFn`, event time from
    * `eventTimeMs` (the stream must carry a watermark on that time).
    * `select` maps a complete match (step name → matched events, one
    * per positive step; empty for a negative step) to an output row.
    *
    * WATERMARK-STALL caveat: the NFA's `within` expiries (and the
    * timeout side output) fire off the stream watermark, which Spark
    * derives from rows OBSERVED at the watermark node — an upstream
    * filter whose predicate ignores the event-time column is pushed
    * below that node, so a fully-filtered stretch of input freezes
    * the clock and every open partial lingers (the windowed-agg
    * stall, manifest in the NFA). Compose with
    * [[WatermarkTicks.filterTicked]] BEFORE `withWatermark`: dropped
    * rows become sentinel-keyed heartbeats that advance the clock,
    * then enter the NFA under their own key where they match no
    * guard, open no partial, and leave no state — no
    * [[WatermarkTicks.dropTicks]] pass needed (CepSpec pins the
    * stall and its closure). */
  def detect[E, K, O](
      events: Dataset[E],
      keyFn: E => K,
      eventTimeMs: E => Long,
      pattern: EventPattern[E])(
      select: Map[String, Seq[E]] => O)(
      implicit kEnc: Encoder[K],
      sEnc: Encoder[List[(Int, Long, List[(Int, E)])]],
      oEnc: Encoder[O]): Dataset[O] =
    detectWithTimeouts(events, keyFn, eventTimeMs, pattern)(select, null)

  /** [[detect]] plus FlinkCEP's timed-out-match SIDE OUTPUT
    * (`PatternStream.select(timeoutTag, timeoutFn, selectFn)`): a
    * partial whose window passes before completing is handed to
    * `timeoutSelect` with what it DID match (satisfied positive
    * stages only — never-reached stage names are absent from the
    * map). Pass `timeoutSelect = null` to drop timeouts (= detect).
    * Both outputs ride one append-mode stream; tell them apart in
    * `O` (e.g. an Either or a flag column). Timeouts surface when
    * the watermark passes the partial's deadline — same trigger
    * that prunes its state, so the side output costs no extra
    * state. */
  def detectWithTimeouts[E, K, O](
      events: Dataset[E],
      keyFn: E => K,
      eventTimeMs: E => Long,
      pattern: EventPattern[E])(
      select: Map[String, Seq[E]] => O,
      timeoutSelect: Map[String, Seq[E]] => O)(
      implicit kEnc: Encoder[K],
      sEnc: Encoder[List[(Int, Long, List[(Int, E)])]],
      oEnc: Encoder[O]): Dataset[O] = {
    val steps = pattern.steps
    require(steps.nonEmpty, "pattern needs at least one step")
    require(steps.head.kind != StepKind.Negative &&
      steps.head.kind != StepKind.NegativeStrict,
      "a pattern cannot START with notFollowedBy/notNext")
    require(steps.last.kind != StepKind.Negative ||
      pattern.withinMs != Long.MaxValue ||
      steps.last.groupWithinMs != Long.MaxValue,
      "a terminal notFollowedBy requires within() — its match is " +
        "emitted when the window closes unviolated")
    require(steps.last.kind != StepKind.NegativeStrict,
      "a pattern cannot END with notNext (as in FlinkCEP)")
    require(steps.head.kind != StepKind.Optional,
      "a pattern cannot START with an optional stage")
    require(steps.last.kind != StepKind.Optional ||
      pattern.withinMs != Long.MaxValue ||
      steps.last.groupWithinMs != Long.MaxValue,
      "a terminal optional stage (times(from, to) range) requires " +
        "within() — the window bounds the open run's state and " +
        "triggers emitMaximalOnly's close emission")
    require(steps.last.kind != StepKind.Repeated ||
      pattern.withinMs != Long.MaxValue ||
      steps.last.groupWithinMs != Long.MaxValue ||
      steps.last.until.isDefined,
      "a terminal oneOrMore requires within() or until() — the " +
        "window (or stop) bounds the open run's state and triggers " +
        "emitMaximalOnly's close emission")
    steps.sliding(2).foreach {
      case Vector(a, b) if a.kind == StepKind.Negative ||
        a.kind == StepKind.NegativeStrict ||
        a.kind == StepKind.Repeated =>
        require(b.kind == StepKind.Relaxed || b.kind == StepKind.Strict,
          s"stage '${b.name}' after '${a.name}' (${a.kind}) must be a " +
            "plain followedBy/next stage — its guard decides when the " +
            s"${a.kind} stage resolves")
      case Vector(a, b) if a.kind == StepKind.Optional =>
        require(b.kind != StepKind.Negative && b.kind != StepKind.Repeated,
          s"stage '${b.name}' after optional '${a.name}' must be a " +
            "plain or optional stage — the forward scan resolves " +
            "consecutive optionals")
      case _ => ()
    }
    val withinMs = pattern.withinMs
    val skip = pattern.skip
    val maximalOnly = pattern.maximalOnly

    events.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: K, in: Iterator[E], state: GroupState[List[Partial[E]]]) =>
          // the timeout firing (empty `in`, watermark advanced past
          // every deadline) runs the same pruning pass — that is
          // where terminal-notFollowedBy matches emit
          val (partials, matches, timeouts) = step(steps, withinMs, eventTimeMs,
            state.getOption.getOrElse(Nil), in.toVector,
            state.getCurrentWatermarkMs(), skip, maximalOnly)
          if (partials.isEmpty) state.remove()
          else {
            state.update(partials)
            // group windows expire partials even when the pattern has
            // no outer within — fold both into the wakeup deadline
            val dls = partials
              .map(partialDeadline(steps, withinMs, eventTimeMs))
              .filter(_ != Long.MaxValue)
            if (dls.nonEmpty) {
              // a kept partial's deadline can equal the watermark
              // exactly; Spark rejects a timeout <= watermark
              state.setTimeoutTimestamp(
                math.max(dls.max, state.getCurrentWatermarkMs() + 1))
            }
          }
          val timedOut =
            if (timeoutSelect == null) Iterator.empty
            else timeouts.iterator.map(timeoutSelect)
          matches.iterator.map(select) ++ timedOut
      }
  }
}
