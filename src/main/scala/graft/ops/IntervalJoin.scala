package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-bucketed interval join: the cluster-scale rewrite of
  * `a ⋈ b ON a.key = b.key AND b.ts ∈ [a.ts + lower, a.ts + upper]`.
  *
  * The naive plan hash-joins on the key alone and filters the range —
  * every (a, b) pair under the same key is materialized first, which
  * for a key with n·m rows over a long horizon is the quadratic term
  * that kills 100 TB runs. Bucketing by time makes the join key
  * (key, bucket): each right row lands in exactly one bucket of width
  * `bucketSeconds`; each left row explodes to the few buckets its
  * interval can touch. Pairs produced per left row are then bounded
  * by the right rows inside interval ± one bucket instead of the
  * whole key history, and the residual range filter restores exact
  * semantics. Each true pair appears exactly once because the right
  * row owns one bucket — no dedup pass.
  *
  * Pick `bucketSeconds` ≈ the interval span: one-to-few buckets per
  * left row, minimal false pairs.
  */
object IntervalJoin {

  /** Inclusive-bounds interval equi-join (lower/upper in seconds,
    * lower may be negative). Left/right must share only `key`;
    * both need a timestamp column named by lts/rts. */
  def bucketed(left: DataFrame, right: DataFrame, key: String,
               lts: String, rts: String,
               lowerSeconds: Long, upperSeconds: Long,
               bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0 && upperSeconds >= lowerSeconds)
    val lb = floor((unix_timestamp(col(lts)) + lowerSeconds) / bucketSeconds).cast("long")
    val ub = floor((unix_timestamp(col(lts)) + upperSeconds) / bucketSeconds).cast("long")
    val leftB = left.withColumn("__bucket", explode(sequence(lb, ub)))
    val rightB = right.withColumn("__bucket",
      floor(unix_timestamp(col(rts)) / bucketSeconds).cast("long"))
    leftB.join(rightB,
        leftB(key) === rightB(key) && leftB("__bucket") === rightB("__bucket") &&
          col(rts) >= col(lts) + expr(s"INTERVAL $lowerSeconds SECOND") &&
          col(rts) <= col(lts) + expr(s"INTERVAL $upperSeconds SECOND"))
      .drop(rightB(key)).drop("__bucket")
  }
}
