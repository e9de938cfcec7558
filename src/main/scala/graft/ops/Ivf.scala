package graft.ops

import graft.functions.QuantizedCosine.quantizedCosine
import org.apache.spark.sql.DataFrame
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
    * cosine as the kNN queries; deterministic tie-break on cid
    * (max of struct(cos, -cid) = ORDER BY cos DESC, cid ASC rn=1).
    * The centroid table collapses to ONE broadcast model row and the
    * assignment is a per-row argmax — ZERO corpus shuffles (the
    * previous row_number formulation shuffled corpus×cells rows,
    * which stops being free once cells scales with the corpus).
    * @param v     (vec_id, embedding)
    * @param cents (cid, cv) — small, collapsed to one model row. */
  def assignCells(v: DataFrame, cents: DataFrame): DataFrame = {
    val cmodel = cents
      .agg(sort_array(collect_list(struct(col("cid"), col("cv")))).as("cm"))
    v.crossJoin(broadcast(cmodel))
      .withColumn("best", array_max(transform(col("cm"),
        c => struct(quantizedCosine(col("embedding"), c("cv")).as("ccos"),
          (-c("cid")).as("ncid")))))
      .select(col("vec_id"), col("embedding"),
        (-col("best")("ncid")).as("cell"))
  }

  /** Materialize the cell-partitioned layout (one directory per
    * cell). Hive-style partition paths carry the cell id, so a probe
    * filter on `cell` never opens other cells' files. */
  def writeCellPartitioned(assigned: DataFrame, path: String): Unit =
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)
}
