package graft.ops

import org.apache.spark.sql.DataFrame

/** Bucketed-table co-location — the shuffle-free path for the
  * recurring big⋈big equi-join (lineitem⋈orders at 100 TB).
  *
  * A table written with `bucketBy(n, key)` is hash-partitioned into
  * `n` files per partition by `key` AT WRITE TIME; two tables
  * bucketed the same way join bucket-to-bucket with NO exchange on
  * either side — the per-query shuffle is paid once, at ingest.
  * `sortBy` additionally pre-sorts each bucket so the sort-merge
  * join can skip its sort when files-per-bucket is 1.
  *
  * This is the batch analogue of the reference's `keyBy` pre-
  * partitioning (FlinkAssignment.scala:275-276, where both streams
  * are keyed on sha before the interval join) — state co-location by
  * key, amortized across every downstream query.
  */
object Bucketing {

  /** Write `df` as a bucketed + per-bucket-sorted managed parquet
    * table. Joins between tables bucketed with the same `buckets`
    * count on their join keys read co-located and skip the exchange
    * (asserted in BucketingSpec). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
