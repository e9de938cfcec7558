package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermark-stall mitigation: event-time TICK passthrough for
  * filtering streams.
  *
  * Flink propagates watermarks through filters as control events, so
  * a stream whose every record is filtered still closes downstream
  * windows. Spark derives the watermark from event ROWS observed at
  * the watermark node after plan optimization — a predicate (or an
  * explode that drops empty arrays) upstream of, or pushed below, the
  * watermark node means a fully-filtered stretch of input advances
  * nothing, and every downstream window, stream-stream join and
  * stateful timeout stalls until a surviving row happens by
  * (documented on [[CommitStreams.weeklyContinentChanges]]).
  *
  * The fix is structural, not positional: FILTER WITHOUT A FILTER
  * NODE. The predicate moves inside a projection (an array-`filter`
  * HOF over the nested collection), and an input row whose every
  * element is dropped emits ONE zero-payload HEARTBEAT row — null
  * element, and therefore null join/grouping keys — that flows
  * through the watermark node (advancing the event clock exactly as
  * the dropped records would have) but equi-joins and key-matches to
  * NOTHING downstream (SQL null never equals anything). Because no
  * `Filter` operator exists above the watermark node, no pushdown
  * rule can reorder the drop below it.
  *
  * At 100 TB the cost is one row per fully-filtered input row —
  * bounded by the input rate, carrying two columns — against the
  * alternative of unbounded state retention in every downstream
  * stateful operator while a selective filter starves the clock. */
object WatermarkTicks {

  /** Explode `arrCol`, keeping only elements satisfying `keep`, WITHOUT
    * losing the row's event-time signal: a row with no surviving
    * elements emits one heartbeat row whose `as` column is null.
    * Other columns pass through unchanged — derive join/grouping keys
    * from `as` (null on heartbeats) so heartbeats match nothing, or
    * null them explicitly with [[payload]]. Declare the watermark ON
    * THE RESULT (or upstream): every input row contributes at least
    * one row to the clock. */
  def explodeFiltered(df: DataFrame, arrCol: String, as: String,
                      keep: Column => Column): DataFrame = {
    val kept = filter(col(arrCol), keep)
    df.withColumn(as,
        explode_outer(when(size(kept) > 0, kept)))
      .drop(arrCol)
  }

  /** A column that is null on heartbeat rows (where `elem` is null)
    * and `c` otherwise — the zero-payload discipline for VALUE
    * columns (aggregated measures, payload fields). Do NOT use it for
    * an equi-JOIN key: see [[keyed]]. */
  def payload(elem: Column, c: Column): Column =
    when(elem.isNotNull, c)

  /** The heartbeat value [[keyed]] writes into equi-join key columns.
    * NUL-framed, so no natural key domain emits it; a stream whose
    * keys could contain arbitrary binary must pick its own sentinel. */
  val Tick: String = "\u0000\u22a5tick\u0000"

  /** A join-key column that is `c` on real rows and the non-null
    * [[Tick]] sentinel on heartbeats. A NULL key would be the natural
    * zero payload, but an inner equi-join INFERS `isnotnull(key)` on
    * its inputs and predicate pushdown moves that filter below the
    * watermark node (it does not reference the event-time column) —
    * measured: null-keyed heartbeats were dropped before the clock
    * saw them and the watermark re-froze. The sentinel survives the
    * inferred filter, advances the clock, and equi-matches nothing
    * (the other side never carries it).
    *
    * `c` must be STRING-typed: the sentinel is a string, and on any
    * other key type Spark's when/otherwise coercion silently widens
    * the column to string (or fails under ANSI), changing the output
    * schema and downstream join-key comparison semantics.
    * [[filterTicked]] asserts this from the schema; this Column-level
    * form cannot, so the caller owns the check (cast the key, or
    * build a same-type sentinel by hand for numeric/binary keys). */
  def keyed(elem: Column, c: Column): Column =
    when(elem.isNotNull, c).otherwise(lit(Tick))

  /** SCALAR filter-without-a-Filter-node (the non-exploding sibling
    * of [[explodeFiltered]]): rows failing `keep` become heartbeats —
    * `keyCols` take the [[Tick]] sentinel, every other non-event
    * column nulls, the event-time column passes through untouched.
    * Declare the watermark on the result, then remove the heartbeats
    * with [[dropTicks]] (a bare `filter` would be pushed below the
    * watermark node and re-freeze the clock — measured).
    *
    * `keyCols` must be STRING-typed (asserted from the schema): the
    * [[Tick]] sentinel is a string, and on any other key type the
    * when/otherwise coercion would silently widen the column to
    * string (or fail under ANSI), changing the output schema and the
    * downstream join-key comparison semantics. Non-string keys: cast
    * them to string first, or pick a same-type sentinel by hand (see
    * [[keyed]]'s scaladoc — binary keys have the same caveat). */
  def filterTicked(df: DataFrame, keep: Column, eventCol: String,
                   keyCols: Seq[String]): DataFrame = {
    keyCols.foreach { k =>
      val f = df.schema.fields.find(_.name == k).getOrElse(
        throw new IllegalArgumentException(
          s"filterTicked: key column '$k' not in ${df.columns.mkString(",")}"))
      require(f.dataType == org.apache.spark.sql.types.StringType,
        s"filterTicked: key column '$k' is ${f.dataType.simpleString}, " +
          "but the Tick sentinel is a string — when/otherwise would " +
          "silently widen the column (cast the key or use a same-type " +
          "sentinel)")
    }
    df.select(df.columns.toIndexedSeq.map { c =>
      if (c == eventCol) col(c)
      else if (keyCols.contains(c)) when(keep, col(c)).otherwise(lit(Tick)).as(c)
      else when(keep, col(c)).as(c)
    }: _*)
  }

  /** Drop heartbeat rows AFTER the watermark node. A plain
    * `filter(key =!= Tick)` is pushed below the watermark node by
    * predicate pushdown (it does not reference the event-time column)
    * and kills the heartbeats before the clock sees them — measured:
    * even a post-AGGREGATION sentinel drop was pushed through the
    * aggregate and the watermark, re-freezing the clock. Disjoining
    * an event-time null check pins the filter above the watermark
    * node (pushdown keeps predicates that reference the watermark
    * column) and is semantically a no-op: a watermarked event-time
    * column is non-null on every real row. `keyCol` must be a real
    * (non-null) key on live rows — [[filterTicked]] guarantees it. */
  def dropTicks(df: DataFrame, keyCol: String, eventCol: String): DataFrame =
    df.filter(col(keyCol) =!= Tick || col(eventCol).isNull)
}
