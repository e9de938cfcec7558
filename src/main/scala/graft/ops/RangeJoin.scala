package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed numeric range join: the cluster-scale rewrite of
  * `points ⋈ ranges ON p ∈ [lo, hi]` with NO equi key.
  *
  * Spark has no range-join optimization: an inequality-only join
  * plans as a nested-loop over the smaller side — fine when the
  * ranges table is KBs (broadcast + filter), quadratic death when it
  * is large (IP-geolocation tables, genomic intervals, histogram
  * band tables with millions of rows). Discretizing the domain into
  * fixed-width buckets manufactures the missing equi key: each point
  * owns exactly ONE bucket (`floor(p / w)`), each range explodes to
  * the buckets it touches (`floor(lo/w) .. floor(hi/w)`), the join
  * runs as a shuffle equi-join on the bucket id, and the residual
  * `lo <= p <= hi` restores exact semantics. Every true pair appears
  * exactly once — the point side owns a single bucket — so no dedup
  * pass. The same construction as [[IntervalJoin]], minus the key
  * and the timestamp arithmetic.
  *
  * Pick `bucketWidth` ≈ the typical range span: each range then
  * explodes to one-to-few buckets and false pairs stay local to the
  * range's boundary buckets. A range spanning the whole domain
  * explodes to every bucket (the hot-range analogue of a hot LSH
  * bucket) — split such outliers upstream or raise the width.
  */
object RangeJoin {

  /** Inclusive-bounds range join. `points` owns `pointCol`; `ranges`
    * owns `loCol`/`hiCol` (all numeric, castable to double). Output:
    * every (point row × range row) pair with
    * `lo <= point <= hi`, both sides' columns. */
  def bucketed(points: DataFrame, ranges: DataFrame, pointCol: String,
               loCol: String, hiCol: String,
               bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val rb = ranges.withColumn("__bucket", explode(sequence(
      floor(col(loCol) / bucketWidth).cast("long"),
      floor(col(hiCol) / bucketWidth).cast("long"))))
    pb.join(rb,
        pb("__bucket") === rb("__bucket") &&
          col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
