package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Flink's lateness surface, Spark-first. The reference assumes
  * strictly in-order streams (`README.md:114` — ascending timestamps),
  * so nothing is lost for parity; this closes the FlinkCEP-adjacent
  * API gap (`allowedLateness`, `sideOutputLateData`) for out-of-order
  * producers.
  *
  * The two halves map onto Spark differently:
  *
  *  - **allowedLateness(d)** — Flink keeps a window's state d past the
  *    watermark and re-fires on late updates. Structured Streaming's
  *    native equivalent is `withWatermark(delay + d)` with
  *    update-mode sinks: the watermark delay IS the lateness
  *    allowance, refinements flow as update rows. Use that; no
  *    custom operator needed (documented here because the mapping is
  *    the API answer, and [[CommitStreams]]' windowed aggregations
  *    all take their allowance through the watermark delay).
  *
  *  - **sideOutputLateData(tag)** — Spark DROPS rows behind the
  *    watermark at every stateful operator, silently (only the
  *    `numRowsDroppedByWatermark` metric remains). There is no
  *    side-output hook, and a `flatMapGroupsWithState` downstream of
  *    `withWatermark` never even SEES late rows (they are filtered
  *    upstream of the operator). [[tagLate]] therefore runs on the
  *    raw un-watermarked stream and tracks the bounded-out-of-
  *    orderness watermark ITSELF, per shuffle bucket: watermark =
  *    max event time seen − delay, an event is late iff its time is
  *    behind the bucket's watermark at arrival — exactly Flink's
  *    `BoundedOutOfOrdernessWatermarks` + `sideOutputLateData` fused
  *    into one keyed operator. Per-bucket watermarks mirror Flink's
  *    per-source-split watermarks BEFORE alignment: a bucket only
  *    declares late what ITS OWN history proves late, so tagging is
  *    deterministic for a deterministic bucket assignment and never
  *    over-tags vs the aligned global watermark (min over buckets).
  *
  * Downstream, route the two branches with `filter` on the tag: the
  * on-time branch gets `withWatermark(delay)` and behaves exactly as
  * if the tagger were absent (its rows are by construction within
  * the allowance); the late branch is the side output — audit it,
  * dead-letter it, or merge-correct offline.
  */
object LateData {

  /** State per bucket: max event-time milliseconds seen so far. */
  private type MaxTs = Long

  /** One [[allowedLatenessAgg]] emission: the window's aggregate as
    * of this fire, tagged with the fire kind — `"first"` (the
    * watermark passed the window end; Flink's on-time firing) or
    * `"refinement"` (late data inside the allowance re-fired the
    * window) — and a per-window fire sequence number (0 = first). */
  final case class WindowFire[K, A](key: K, windowStart: java.sql.Timestamp,
                                    windowEnd: java.sql.Timestamp,
                                    agg: A, kind: String, seq: Int)

  /** Flink `allowedLateness(d)` as a FIRST-CLASS operator: a keyed
    * tumbling event-time aggregation that fires once when the
    * (allowance-shifted) watermark passes the window end, then
    * RE-FIRES a tagged refinement for each micro-batch of late
    * arrivals inside the allowance, and purges the window's state
    * once the allowance is exhausted — the refinement-tagged form of
    * the `withWatermark(delay + allowance)` + update-mode mapping
    * documented above (LateDataSpec pins the update-row sequence that
    * mapping produces; this operator makes the first-fire /
    * refinement distinction a column instead of sink-side diffing).
    *
    * Contract: `ds` must carry `withWatermark(delay + allowance)` on
    * the `tsFn` column — the widened watermark is what lets Spark
    * hand this operator the late-but-in-allowance rows at all (rows
    * at or behind the full watermark are dropped upstream, exactly
    * the rows Flink drops after the allowance). Internally the
    * operator adds the allowance back, so the FIRST fire happens when
    * Flink's would: effective watermark (wm + allowance) ≥ window
    * end. With `allowance = 0` it degenerates to plain append-mode
    * windows (one "first" fire per window).
    *
    * Granularity divergence from Flink (inherent to micro-batching):
    * Flink re-fires per late ELEMENT; this re-fires per micro-batch
    * of late elements — same final aggregate, coarser refinement
    * cadence.
    *
    * Scale: state is one (A, fires) pair per open (key, window) —
    * windows live `allowance` past their end, so state is bounded by
    * keys × windows-per-allowance, hash-distributed; the event-time
    * timeout both drives data-free first fires and garbage-collects
    * expired windows. */
  def allowedLatenessAgg[E, K, A](
      ds: Dataset[E], keyFn: E => K, tsFn: E => java.sql.Timestamp,
      window: java.time.Duration, allowance: java.time.Duration,
      zero: A, fold: (A, E) => A)(
      implicit kEnc: Encoder[(K, Long)], sEnc: Encoder[(A, Int)],
      oEnc: Encoder[WindowFire[K, A]]): Dataset[WindowFire[K, A]] = {
    val wMs = window.toMillis
    val aMs = allowance.toMillis
    require(wMs > 0, s"window must be positive, got ${wMs}ms")
    require(aMs >= 0, s"allowance must be >= 0, got ${aMs}ms")
    ds.groupByKey(e =>
        (keyFn(e), Math.floorDiv(tsFn(e).getTime, wMs) * wMs))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (key: (K, Long), in: Iterator[E], state: GroupState[(A, Int)]) =>
          val (k, start) = key
          val end = start + wMs
          val wm = state.getCurrentWatermarkMs()
          val evs = in.toVector
          var (agg, fires) = state.getOption.getOrElse((zero, 0))
          evs.foreach { e => agg = fold(agg, e) }
          val out = Vector.newBuilder[WindowFire[K, A]]
          def fire(kind: String): Unit = {
            out += WindowFire(k, new java.sql.Timestamp(start),
              new java.sql.Timestamp(end), agg, kind, fires)
            fires += 1
          }
          // Flink's on-time firing: the allowance-corrected watermark
          // passes the window end. Later batches with data are late
          // arrivals inside the allowance: one refinement per batch.
          if (fires == 0 && wm + aMs >= end) fire("first")
          else if (fires > 0 && evs.nonEmpty) fire("refinement")
          if (wm >= end) state.remove() // allowance exhausted
          else {
            state.update((agg, fires))
            // next boundary this window cares about: its first fire
            // (end − allowance) or its purge (end); clamp above the
            // current watermark as Spark requires
            val boundary = if (fires == 0) end - aMs else end
            state.setTimeoutTimestamp(math.max(boundary, wm + 1))
          }
          out.result().iterator
      }
  }

  /** Tag every event with whether it is LATE under a bounded-out-of-
    * orderness watermark of `delayMs`, tracked per `buckets`-way
    * shuffle group (Flink: per-split watermark + sideOutputLateData).
    *
    * @param ds        raw stream — do NOT pre-apply `withWatermark`
    *                  (Spark would silently drop the late rows this
    *                  operator exists to surface)
    * @param eventTimeMs event-time extractor (epoch millis)
    * @param delayMs   the out-of-orderness bound: an event older than
    *                  `maxSeen - delayMs` is late
    * @param bucketOf  deterministic bucket id for an event; defaults
    *                  to a single global bucket (= Flink's aligned
    *                  watermark; shard for throughput once per-split
    *                  semantics are acceptable)
    * @return the input events, each paired with `isLate` */
  def tagLate[E](
      ds: Dataset[E],
      eventTimeMs: E => Long,
      delayMs: Long,
      bucketOf: E => Int = (_: E) => 0)(
      implicit iEnc: Encoder[Int],
      oEnc: Encoder[(E, Boolean)],
      sEnc: Encoder[MaxTs]): Dataset[(E, Boolean)] = {
    require(delayMs >= 0, s"delayMs must be >= 0, got $delayMs")
    ds.groupByKey(bucketOf)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, in: Iterator[E], state: GroupState[MaxTs]) =>
          var maxTs = state.getOption.getOrElse(Long.MinValue)
          // event-time order within the batch: a batch is an arrival
          // unit, so its events judge against the watermark as of the
          // batch START (all of them "arrived together"), exactly how
          // Flink's periodic watermark generator sees a burst — then
          // the batch advances the watermark once, at the end
          val watermark =
            if (maxTs == Long.MinValue) Long.MinValue else maxTs - delayMs
          val out = in.map { e =>
            val t = eventTimeMs(e)
            if (t > maxTs) maxTs = t
            (e, t < watermark)
          }.toVector
          state.update(maxTs)
          out.iterator
      }
  }

  /** [[tagLate]] split into its two branches: `(onTime, late)` —
    * the on-time stream is safe to `withWatermark(delayMs)` + window
    * downstream (every row is within the allowance by construction);
    * the late stream is Flink's side output.
    *
    * Cost note: the branches are two filters over ONE tagLate
    * Dataset, but if each branch is started as its own streaming
    * query, Structured Streaming runs the stateful tagger once PER
    * QUERY with independent (deterministic, identical) state — same
    * tags, double the state and compute. When both branches are
    * consumed, prefer writing the single tagged stream ([[tagLate]])
    * to one sink and filtering on the `late` flag downstream, or use
    * `foreachBatch` to fan out both branches from one query. */
  def split[E](
      ds: Dataset[E],
      eventTimeMs: E => Long,
      delayMs: Long,
      bucketOf: E => Int = (_: E) => 0)(
      implicit iEnc: Encoder[Int],
      eEnc: Encoder[E],
      oEnc: Encoder[(E, Boolean)],
      sEnc: Encoder[MaxTs]): (Dataset[E], Dataset[E]) = {
    val tagged = tagLate(ds, eventTimeMs, delayMs, bucketOf)
    (tagged.filter(!_._2).map(_._1), tagged.filter(_._2).map(_._1))
  }
}
