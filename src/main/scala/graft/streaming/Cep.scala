package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One pattern stage: a name (for match selection) and its guard. */
final case class PatternStep[E](name: String, pred: E => Boolean)

/** Flink-CEP-style sequential event pattern
  * (`Pattern.begin(...).where(...).followedBy(...).within(...)`,
  * reference `/root/reference/src/main/scala/FlinkAssignment.scala:332-336`),
  * declared as data and executed by [[Cep.detect]].
  *
  * Semantics (matching Flink's defaults for this chain shape):
  *  - `followedBy` is RELAXED contiguity — events that match no step
  *    are skipped, they never kill a partial match;
  *  - `within(d)` bounds first-to-last event time inclusively; a
  *    partial whose window has passed can never complete and is
  *    pruned by the watermark;
  *  - first-match skip: an event that completes a partial match
  *    consumes it — the same partial cannot match again — but one
  *    event may complete MANY pending partials (every open 'added'
  *    matches one 'removed', exactly the reference NFA's behavior).
  */
final case class EventPattern[E] private (
    steps: Vector[PatternStep[E]], withinMs: Long) {

  /** Conjoin a guard onto the most recent step (Flink `.where`). */
  def where(p: E => Boolean): EventPattern[E] = {
    val last = steps.last
    val prev = last.pred
    copy(steps = steps.init :+ last.copy(pred = e => prev(e) && p(e)))
  }

  /** Append a relaxed-contiguity stage (Flink `.followedBy`). */
  def followedBy(name: String): EventPattern[E] = {
    require(!steps.exists(_.name == name), s"duplicate step name: $name")
    copy(steps = steps :+ PatternStep[E](name, _ => true))
  }

  /** Bound the whole match window (Flink `.within`). */
  def within(d: java.time.Duration): EventPattern[E] =
    copy(withinMs = d.toMillis)
}

object EventPattern {
  /** Start a pattern with its first stage (Flink `Pattern.begin`).
    * No `within` means unbounded state, as in Flink. */
  def begin[E](name: String): EventPattern[E] =
    EventPattern(Vector(PatternStep[E](name, _ => true)), Long.MaxValue)
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
  */
object Cep {

  /** Open partial match: stages matched so far, first event's time,
    * matched events newest-first. */
  type Partial[E] = (Int, Long, List[E])

  private def deadline(withinMs: Long, t0: Long): Long =
    if (withinMs == Long.MaxValue) Long.MaxValue else t0 + withinMs

  /** One per-key micro-batch of the NFA, PURE (CepPropertiesSpec
    * fuzzes it against a brute-force reference): processes `events`
    * in event-time order against the open `partials0`, returns the
    * surviving partials (watermark-pruned) and the completed matches
    * (step name → matched event) in emission order. */
  private[graft] def step[E](
      steps: Vector[PatternStep[E]], withinMs: Long,
      eventTimeMs: E => Long,
      partials0: List[Partial[E]], events: Seq[E],
      watermarkMs: Long): (List[Partial[E]], Vector[Map[String, Seq[E]]]) = {
    val names = steps.map(_.name)
    def emit(evsRev: List[E]): Map[String, Seq[E]] =
      names.zip(evsRev.reverse.map(Seq(_))).toMap
    var partials = partials0
    val out = Vector.newBuilder[Map[String, Seq[E]]]
    events.sortBy(eventTimeMs).foreach { e =>
      val t = eventTimeMs(e)
      val kept = List.newBuilder[Partial[E]]
      partials.foreach { case p @ (stage, t0, acc) =>
        if (t >= t0 && t <= deadline(withinMs, t0) && steps(stage).pred(e)) {
          if (stage + 1 == steps.length) out += emit(e :: acc)
          else kept += ((stage + 1, t0, e :: acc))
        } else kept += p // relaxed contiguity: partial stays open
      }
      partials = kept.result()
      if (steps.head.pred(e)) { // an event may also open a new partial
        if (steps.length == 1) out += emit(List(e))
        else partials = (1, t, List(e)) :: partials
      }
    }
    // expired partials can never complete (events behind the
    // watermark are dropped upstream of this operator)
    (partials.filter { case (_, t0, _) =>
      deadline(withinMs, t0) >= watermarkMs
    }, out.result())
  }

  /** Run `pattern` over `events` keyed by `keyFn`, event time from
    * `eventTimeMs` (the stream must carry a watermark on that time).
    * `select` maps a complete match (step name → matched events, one
    * per step for this chain shape) to an output row. */
  def detect[E, K, O](
      events: Dataset[E],
      keyFn: E => K,
      eventTimeMs: E => Long,
      pattern: EventPattern[E])(
      select: Map[String, Seq[E]] => O)(
      implicit kEnc: Encoder[K],
      sEnc: Encoder[List[(Int, Long, List[E])]],
      oEnc: Encoder[O]): Dataset[O] = {
    val steps = pattern.steps
    require(steps.nonEmpty, "pattern needs at least one step")
    val withinMs = pattern.withinMs

    events.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: K, in: Iterator[E], state: GroupState[List[Partial[E]]]) =>
          if (in.isEmpty && state.hasTimedOut) { // every window passed
            state.remove(); Iterator.empty
          } else {
            val (partials, matches) = step(steps, withinMs, eventTimeMs,
              state.getOption.getOrElse(Nil), in.toVector,
              state.getCurrentWatermarkMs())
            if (partials.isEmpty) state.remove()
            else {
              state.update(partials)
              if (withinMs != Long.MaxValue) {
                // a kept partial's deadline can equal the watermark
                // exactly; Spark rejects a timeout <= watermark
                val dl = partials.map { case (_, t0, _) =>
                  deadline(withinMs, t0) }.max
                state.setTimeoutTimestamp(
                  math.max(dl, state.getCurrentWatermarkMs() + 1))
              }
            }
            matches.iterator.map(select)
          }
      }
  }
}
