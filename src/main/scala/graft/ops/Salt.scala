package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for algebraic aggregations: split each hot key
  * across `buckets` salted sub-keys, pre-aggregate, then combine.
  *
  * AQE's skew handling covers joins; aggregation skew (one key owning
  * a large fraction of rows) still serializes the final merge for
  * that key on one task. Salting bounds any task's input to
  * ~|key| / buckets at the cost of a second (tiny) shuffle over
  * |keys| · buckets rows. The salt is derived deterministically from
  * a caller-chosen discriminator column, keeping results and tests
  * reproducible.
  *
  * Only algebraic aggregates compose this way (sum/count/min/max —
  * partial and final merge are the same function); that is enforced
  * by construction since the caller supplies both phases.
  */
object Salt {

  /** Two-phase salted aggregation.
    * @param partial per-(key, salt) aggregates, e.g. `sum(x).as("s")`
    * @param merge   combining aggregates over the partials, e.g. `sum("s").as("s")`
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], discriminator: Column,
                      buckets: Int, partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    require(buckets > 0)
    val salted = df.withColumn("__salt", pmod(hash(discriminator), lit(buckets)))
    val pre = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    pre.groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }
}
