package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev A/B probe: the accumulator-fused CC loop vs the previous
  * two-action (localCheckpoint + count) loop, on a graph shaped like
  * x30's real input at sf0.1 (~4k nodes, ~120k edges: dense near-dup
  * cliques plus a chain to force pointer-jump rounds). */
object CcAbProbe {
  /** The round-5 implementation, verbatim semantics. */
  private def labelOld(nodes: DataFrame, edges: DataFrame,
                       maxRounds: Int = 50): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    sym.count()
    var labels = nodes.select(col("id"), col("id").as("lbl"))
      .localCheckpoint(true)
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      val viaEdge = sym
        .join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"),
          lit(null).cast(labels.schema("lbl").dataType).as("old"))
      val mins = labels
        .select(col("id"), col("lbl"), col("lbl").as("old"))
        .union(viaEdge)
        .groupBy(col("id"))
        .agg(min(col("lbl")).as("lbl"), max(col("old")).as("old"))
      val jumped = mins
        .join(mins.select(col("id").as("lbl"), col("lbl").as("lbl2")), "lbl")
        .select(col("id"), col("lbl2").as("lbl"), col("old"))
        .localCheckpoint(true)
      changed = jumped.filter(!(col("lbl") <=> col("old"))).count()
      labels = jumped.select(col("id"), col("lbl"))
      round += 1
    }
    sym.unpersist()
    labels.select(col("id"), col("lbl").as("component"))
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val nodes = (1L to 4000L).toDF("id")
    // 30 cliques of 80 → ~95k edges, plus a 500-node chain
    val cliques = (0 until 30).flatMap { c =>
      val base = c * 100L + 1
      for (i <- 0 until 80; j <- i + 1 until 80)
        yield (base + i, base + j)
    }
    val chain = (3000L to 3500L).map(i => (i, i + 1))
    val edges = (cliques ++ chain).toDF("src", "dst")
    println(s"edges: ${edges.count()}")
    for (r <- 1 to 3) {
      var t0 = System.nanoTime()
      val nNew = graft.ops.ConnectedComponents.label(nodes, edges).count()
      val tNew = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val nOld = labelOld(nodes, edges).count()
      val tOld = (System.nanoTime() - t0) / 1e9
      println(f"run$r: new=$tNew%.2f s ($nNew rows)  old=$tOld%.2f s ($nOld rows)")
    }
    spark.stop()
  }
}
