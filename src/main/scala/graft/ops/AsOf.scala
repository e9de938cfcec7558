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
  * The carried value is ONE struct wrapping all right payload
  * columns — the struct is non-null whenever a right row exists,
  * even if every payload field in it is NULL, so a genuinely-NULL
  * right value is carried as NULL rather than being skipped by
  * `ignoreNulls` (which would wrongly surface the previous older
  * row's value). It also makes the carry a single window expression
  * instead of one per payload column.
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
    require(!(left.columns ++ right.columns).exists(Set("__side", "__r")),
      "__side/__r are reserved column names")
    if (rightPayload.isEmpty) return left

    val rStructType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c)))
    val rightSide = right.select(col(key), col(ts), lit(0).as("__side"),
      struct(rightPayload.map(col): _*).as("__r"))
    val leftSide = left.select(col(key) +: col(ts) +: lit(1).as("__side") +:
      lit(null).cast(rStructType).as("__r") +: leftPayload.map(col): _*)

    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightSide.unionByName(leftSide, allowMissingColumns = true)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((col(key) +: col(ts) +: leftPayload.map(col)) ++
        rightPayload.map(c => col("__r").getField(c).as(c)): _*)
  }
}
