package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Connected components by minimum-label propagation — the transitive
  * closure of a near-duplicate pair graph into dedup CLUSTERS, the
  * step a training pipeline runs after LSH pair generation (a greedy
  * one-level merge like x19 under-merges chains: a~b, b~c must
  * collapse {a,b,c} even when a~c was never emitted as a pair).
  *
  * Algorithm: every node starts labeled with its own id; each round,
  * a node's label becomes the min of its own and its neighbors'
  * labels; stop when a round changes nothing. The fixpoint — min
  * reachable id per node — is unique regardless of execution
  * schedule, so the result is deterministic on any cluster size and
  * oracle-checkable (DuckDB replays it as a recursive CTE).
  *
  * Scale design (100 TB): each round is two equi-join shuffles — the
  * edge list against the label table (neighbor minimum), then the
  * label table against itself (POINTER JUMPING: lbl ← lbl[lbl], which
  * doubles the distance a label has travelled every round). With the
  * jump, rounds are O(log diameter) — a 1e6-node path needs ~20
  * rounds, not 1e6 — the same doubling argument as Hash-to-Min /
  * pointer-jumping PRAM CC. Label state is one (id, label) pair per
  * node — node count here is |distinct signatures|, already collapsed
  * far below corpus size. The driver loop only orchestrates: per
  * round it runs one distributed action and reads back a single
  * count; no row data ever reaches the driver.
  *
  * Iterative-plan hygiene: each round's label table is re-rooted on a
  * locally-checkpointed RDD — the logical plan of round N otherwise
  * embeds round N-1's plan TWICE (once per union arm), so lineage
  * grows 2^rounds and planning alone explodes (observed: a 2 GB plan
  * string before the checkpoint was added). Re-rooting truncates the
  * lineage to the materialized blocks each round, the standard fix
  * for iterative DataFrame algorithms.
  *
  * ONE action per round: the changed-row count is tallied by a
  * LongAccumulator inside the same map that strips the change flag,
  * so the count materializes DURING the checkpointing action instead
  * of as a second job over the blocks (in a driver-roundtrip-bound
  * loop the extra job per round was ~half the round latency). The
  * accumulator is only inspected for ==0, which task retries cannot
  * fake: a retry can over-count changed rows, never invent zero.
  */
object ConnectedComponents {

  /** @param nodes one column `id` — every vertex, including isolated
    *              ones (they come out as their own singleton cluster)
    * @param edges columns `src`, `dst` — UNDIRECTED pairs (each pair
    *              listed once in either direction)
    * @param maxRounds safety bound on propagation rounds
    * @return (id, component) — component = min node id reachable */
  def label(nodes: DataFrame, edges: DataFrame,
            maxRounds: Int = 50): DataFrame = {
    // symmetrize once: propagation must flow both ways along a pair
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    sym.count()

    val spark = nodes.sparkSession
    val lblType = nodes.schema("id").dataType
    val labelSchema = StructType(Seq(
      StructField("id", lblType), StructField("lbl", lblType)))
    // re-root on a checkpointed RDD: truncate lineage every round
    // (see scaladoc), tallying changed rows in the same pass
    def materialize(flagged: DataFrame, prev: Option[RDD[Row]],
                    acc: org.apache.spark.util.LongAccumulator): RDD[Row] = {
      val rdd = flagged.rdd.mapPartitions(_.map { r =>
        if (!r.getBoolean(2)) () else acc.add(1L)
        Row(r.get(0), r.get(1))
      })
      rdd.localCheckpoint()
      rdd.count() // the ONE action: materializes blocks + fills acc
      prev.foreach(_.unpersist(blocking = false))
      rdd
    }

    var labelsRdd = materialize(
      nodes.select(col("id"), col("id").as("lbl"), lit(false).as("ch")),
      None, spark.sparkContext.longAccumulator("cc-init"))
    var labels = spark.createDataFrame(labelsRdd, labelSchema)
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      // the previous label rides the union as `old` (null on the
      // edge arm; every id has exactly one labels-arm row, so
      // max(old) recovers it through the aggregation) — the
      // convergence check then needs no extra join or job
      val viaEdge = sym
        .join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"),
          lit(null).cast(lblType).as("old"))
      val mins = labels
        .select(col("id"), col("lbl"), col("lbl").as("old"))
        .union(viaEdge)
        .groupBy(col("id"))
        .agg(min(col("lbl")).as("lbl"), max(col("old")).as("old"))
      // pointer jump: follow the label one more hop (labels always
      // point at node ids, so the inner self-join is total) — this
      // doubles propagation distance per round, making rounds
      // logarithmic in the diameter instead of linear.
      // null-safe change flag: an edge endpoint missing from `nodes`
      // surfaces with old=null in its first round — `=!=` would read
      // that as "unchanged" and could stop the loop too early
      val jumped = mins
        .join(mins.select(col("id").as("lbl"), col("lbl").as("lbl2")), "lbl")
        .select(col("id"), col("lbl2").as("lbl"),
          (!(col("lbl2") <=> col("old"))).as("ch"))
      val acc = spark.sparkContext.longAccumulator(s"cc-round-$round")
      labelsRdd = materialize(jumped, Some(labelsRdd), acc)
      labels = spark.createDataFrame(labelsRdd, labelSchema)
      changed = acc.value
      round += 1
    }
    sym.unpersist()
    labels.select(col("id"), col("lbl").as("component"))
  }
}
