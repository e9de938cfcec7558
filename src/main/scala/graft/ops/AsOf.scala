package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark's DataFrame API
  * lacks. For every left row, attach the right row with the greatest
  * `ts` at or before the left row's `ts`, per key.
  *
  * Composition instead of a custom physical operator: tag both
  * sides, union, and carry the latest right payload forward with
  * `last(_, ignoreNulls).over(key ORDER BY ts, side ROWS UNBOUNDED
  * PRECEDING)`. Right rows sort before left rows at equal
  * timestamps, giving inclusive (`<=`) semantics.
  *
  * Scale: ONE hash shuffle on the key plus an in-partition sort —
  * the same cost Flink/kdb pay for temporal joins — versus a range
  * join's O(|left|·|right-per-key|) pair blowup. The window never
  * buffers more than the running frame, and whole-stage codegen
  * covers the projection; at 100 TB this is a sort-merge-shaped plan
  * that AQE can skew-split on the key.
  *
  * Contract: `right` must be unique per (key, ts) — pre-aggregate if
  * not (the caller chooses the tie-break, keeping the composition
  * deterministic).
  */
object AsOf {

  /** @return left rows (all columns) plus each right non-key/ts
    *         column, as-of matched; null where no right row precedes. */
  def asOfJoin(left: DataFrame, right: DataFrame,
               key: String, ts: String): DataFrame = {
    val leftPayload = left.columns.filterNot(c => c == key || c == ts).toSeq
    val rightPayload = right.columns.filterNot(c => c == key || c == ts).toSeq
    require(leftPayload.intersect(rightPayload).isEmpty,
      s"overlapping payload columns: ${leftPayload.intersect(rightPayload).mkString(",")}")

    def side(df: DataFrame, tag: Int, own: Seq[String], other: Seq[String]): DataFrame =
      df.select(
        (col(key) +: col(ts) +: lit(tag).as("__side") +:
          (own.map(col) ++ other.map(c => lit(null).as(c)))): _*)

    val unioned = side(right, 0, rightPayload, leftPayload)
      .unionByName(side(left, 1, leftPayload, rightPayload))
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightPayload.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__side")
  }
}
