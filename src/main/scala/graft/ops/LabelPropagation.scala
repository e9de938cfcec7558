package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (LPA) over an undirected edge list —
  * community detection, the fourth member of the dedup-graph
  * diagnostic suite: [[ConnectedComponents]] answers "which docs are
  * transitively connected", the x51 triangle count "how dense is the
  * neighborhood", [[PageRank]] "who is central" — LPA answers "which
  * docs cluster into one template FAMILY", splitting a weakly-bridged
  * component into its dense cores (two boilerplate families joined by
  * one chance collision stay two communities; min-label components
  * would merge them).
  *
  * DETERMINISTIC variant (plain LPA is notoriously order-dependent):
  * synchronous rounds, new label = the most frequent label among the
  * node's NEIGHBORS at the previous round, ties broken by SMALLEST
  * label — an integer recurrence with a total order, so the result is
  * identical on any cluster size/partitioning and a SQL oracle can
  * replay the rounds exactly (gate x67 unrolls them as DuckDB CTEs,
  * the x56 pattern). Fixed `iters` rounds, no convergence action: LPA
  * oscillates on bipartite-ish structures, so fixed-round synchronous
  * semantics are both the deterministic AND the standard choice.
  *
  * Scale design (100 TB): per round ONE equi-join of the directed
  * edge list against the label table (vertex-sized) and TWO
  * vertex-keyed aggregations ((dst, lbl) count, then per-dst argmax
  * via max_by — map-side partials, no per-node sort). The edge list
  * is persisted PRE-PARTITIONED on src ([[ConnectedComponents]]'
  * cached-partitioning move), so rounds never re-shuffle it; rounds
  * chain lazily into one job (linear lineage, like [[PageRank]]).
  */
object LabelPropagation {

  val DefaultIters = 5

  /** @param edges two columns `a`, `b` — undirected (a < b) pairs;
    *   vertices = edge endpoints (an isolated doc has no neighbors to
    *   vote, and is the caller's concern).
    * @return (id, community) after `iters` synchronous rounds.
    *
    * Cache lifetime: the directed edge list is persisted here; the
    * caller owns its release (same contract as [[PageRank.run]]). */
  def run(edges: DataFrame, iters: Int = DefaultIters): DataFrame = {
    require(iters >= 1, s"lpa: iters must be >= 1, got $iters")
    val dir = GraphEdges.directedCached(edges)
    var labels = dir.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("lbl"))
    for (_ <- 1 to iters) {
      labels = dir
        .join(labels.withColumnRenamed("v", "src"), Seq("src"))
        .groupBy(col("dst"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        // lexicographic max over (count, -label): most frequent
        // neighbor label, smallest label on ties — the total order
        // that makes synchronous LPA deterministic
        .agg(max_by(col("lbl"), struct(col("c"), -col("lbl"))).as("lbl"))
        .select(col("dst").as("v"), col("lbl"))
    }
    labels.select(col("v").as("id"), col("lbl").as("community"))
  }
}
