package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous k-core peeling over an undirected edge list — the
  * fifth member of the dedup-graph diagnostic suite
  * ([[ConnectedComponents]] reachability, x51 density, [[PageRank]]
  * centrality, [[LabelPropagation]] communities): the k-core is the
  * maximal subgraph where every vertex keeps >= k neighbors, the
  * standard "dense nucleus" extractor — a template family's core
  * survives peeling while chance-collision fringe vertices fall away.
  *
  * DETERMINISTIC fixed-round variant (the x56/x67 stance): round r
  * keeps vertices with >= k neighbors inside the round-(r−1)
  * survivor-induced subgraph — an integer recurrence a SQL oracle
  * unrolls exactly (gate x71). With enough rounds this converges to
  * the true k-core (peeling is monotone); fixed rounds keep the
  * result a pure function of (graph, k, rounds) with no driver-side
  * convergence action.
  *
  * Scale design (100 TB): the directed edge list is persisted
  * PRE-PARTITIONED on src ([[ConnectedComponents]]' cached-
  * partitioning move) and never re-shuffles; per round ONE
  * survivor-filtered degree count (two vertex-sized semi-join
  * filters + a src-keyed agg); the alive table is vertex-sized and
  * lineage-truncated per round via lazy localCheckpoint — the plan
  * stays linear and everything materializes in the single final job.
  */
object KCore {

  /** @param edges two columns `a`, `b` — undirected (a < b) pairs.
    * @return (id, deg): vertices of the subgraph after `rounds`
    *   synchronous peels, with their degree inside the final
    *   survivor-induced subgraph (a vertex that lost neighbors in
    *   the LAST round may report deg < k — fixed-round semantics).
    *
    * Cache lifetime: the directed edge list is persisted here; the
    * caller owns its release (same contract as [[PageRank.run]]). */
  def run(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"kcore: k must be >= 1, got $k")
    require(rounds >= 1, s"kcore: rounds must be >= 1, got $rounds")
    val dir = GraphEdges.directedCached(edges)
    var alive = dir.select(col("src").as("v")).distinct()
      .localCheckpoint(false)
    for (_ <- 1 to rounds) {
      alive = dir
        .join(alive.withColumnRenamed("v", "src"), Seq("src"))
        .join(alive.withColumnRenamed("v", "dst"), Seq("dst"))
        .groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("src").as("v"))
        .localCheckpoint(false)
    }
    dir
      .join(alive.withColumnRenamed("v", "src"), Seq("src"))
      .join(alive.withColumnRenamed("v", "dst"), Seq("dst"))
      .groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("id"), col("deg"))
  }
}
