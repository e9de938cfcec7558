package graft.ops

import graft.functions.QuantizedCosine.quantizedCosine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF layout for vector search at rest: assign every vector to its
  * nearest centroid's cell, then WRITE the corpus partitioned by
  * cell id. A probe that ranks only its nearest cells then prunes to
  * those cells' directories at the parquet-scan level
  * (PartitionFilters — asserted in IvfPartitionSpec), instead of
  * filtering after a full scan. This is the storage-side half of the
  * x07 query's cell-probe plan: x07 prunes logically (join on cid);
  * this prunes physically (directory layout), which is what survives
  * a 100 TB corpus.
  */
object Ivf {

  /** Nearest-centroid cell per vector under the same quantized
    * cosine as the kNN queries; deterministic tie-break on cid.
    * @param v     (vec_id, embedding)
    * @param cents (cid, cv) — small, broadcast. */
  def assignCells(v: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    v.crossJoin(broadcast(cents))
      .withColumn("ccos", quantizedCosine(col("embedding"), col("cv")))
      .withColumn("crn", row_number().over(w))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid").as("cell"))
  }

  /** Materialize the cell-partitioned layout (one directory per
    * cell). Hive-style partition paths carry the cell id, so a probe
    * filter on `cell` never opens other cells' files. */
  def writeCellPartitioned(assigned: DataFrame, path: String): Unit =
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)
}
