package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Buffered-until-watermark ordered fold — the reusable core under
  * [[EventStreams.funnelStream]], [[EventStreams.retentionStream]]
  * and [[EventStreams.scd2Stream]], exposed as a first-class
  * operator: any per-key computation whose transitions must be
  * emitted in EVENT-TIME order from an out-of-order append stream,
  * retraction-free.
  *
  * Why buffering: a fold over raw arrival order is order-sensitive —
  * a late-arriving earlier event can retroactively change what an
  * already-seen event should have contributed (the funnel's
  * discarded click, the cohort re-base, the split interval). So
  * events buffer in per-key state until the watermark passes them,
  * then fold through the user's `step` function in
  * (event-time, tiebreak-id) order: `step` only ever sees FINALIZED
  * prefixes, so everything it emits is final.
  *
  * Mechanics the caller gets for free:
  *  - ripeness boundary: an event folds once its time is strictly
  *    before the watermark millisecond (a same-ms sub-ms-earlier
  *    arrival could otherwise still appear);
  *  - drain: ripe events leave the buffer every trigger via the
  *    key's own data or an event-time timeout re-armed while
  *    anything is buffered;
  *  - state hygiene: state is dropped when `retain(state)` is false
  *    and the buffer is empty (a no-progress key is indistinguishable
  *    from a fresh one); the buffer alone is dropped once
  *    `bufferDone(state)` (no further event can ever produce output —
  *    e.g. a completed funnel, which must REMEMBER completion so a
  *    later event cannot restart it).
  *
  * Contract inherited from Spark: input must carry a watermark
  * (`withWatermark` upstream); stateful ops drop rows with
  * ts <= watermark, so exact event-time ties straddling triggers
  * need a nonzero lateness budget (see funnelStream's scaladoc;
  * StreamFoldPropertiesSpec fuzzes the tie paths at 1 s lateness).
  *
  * @param ds      watermarked input
  * @param keyFn   grouping key
  * @param tsFn    event time (the watermark column's value)
  * @param tieFn   deterministic tiebreak for equal times (event id)
  * @param init    initial per-key state
  * @param step    (state, finalized event) => (state', emissions) —
  *                invoked in event-time order, exactly once per
  *                finalized event
  * @param retain  keep the state when the buffer is empty?
  * @param bufferDone stop buffering (no further output possible)?
  */
object BufferedFold {
  def run[K, E, S, O](
      ds: Dataset[E], keyFn: E => K, tsFn: E => Timestamp,
      tieFn: E => Long, init: S,
      step: (S, E) => (S, List[O]),
      retain: S => Boolean,
      bufferDone: S => Boolean = (_: S) => false)(
      implicit ek: Encoder[K], est: Encoder[(S, List[E])],
      eo: Encoder[O]): Dataset[O] =
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (_: K, in: Iterator[E], state: GroupState[(S, List[E])]) =>
          val wm = state.getCurrentWatermarkMs()
          var (s, buf) = state.getOption.getOrElse((init, Nil: List[E]))
          buf = buf ++ in
          val (ripe, rest) = buf.partition(e => tsFn(e).getTime < wm)
          val out = List.newBuilder[O]
          ripe.sortBy(e => (tsFn(e).getTime, tsFn(e).getNanos, tieFn(e)))
            .foreach { e =>
              val (s2, os) = step(s, e)
              s = s2; out ++= os
            }
          val keepBuf = if (bufferDone(s)) Nil else rest
          if (!retain(s) && keepBuf.isEmpty) state.remove()
          else {
            state.update((s, keepBuf))
            if (keepBuf.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(keepBuf.map(tsFn(_).getTime).min, wm + 1))
          }
          out.result().iterator
      }
}
