package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev A/B probe for [[graft.ops.ConnectedComponents]] variants:
  *
  *   - `delta1` — delta-iteration frontier, lazy-checkpoint single
  *     action per round (the current implementation)
  *   - `full1`  — full-label edge join, lazy-checkpoint single action
  *   - `old2`   — round-5 verbatim: full-label edge join, EAGER
  *     checkpoint + separate convergence count (two actions/round)
  *
  * Run with no args → the synthetic clique+chain fixture (~4k nodes,
  * ~95k edges). Run with an SF dir arg (e.g. /root/testdata/sf0.1 or
  * /tmp/sf1) → x30's REAL graph (distinct-signature reps + verified
  * MinHash pairs via [[graft.queries.Extensions.x30Input]]), which is
  * what the bench measures. Variants are interleaved across
  * PROFILE_RUNS sweeps (default 4) and the min per variant printed —
  * sandbox timing noise is ~3x, so only min-of-N interleaved is
  * trustworthy. */
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

    val (nodes, edges) = args.headOption match {
      case Some(dir) =>
        val (n, e) = graft.queries.Extensions.x30Input(spark, dir)
        val np = n.persist(); val ep = e.persist()
        println(s"real input $dir: nodes=${np.count()} edges=${ep.count()}")
        (np, ep)
      case None =>
        val n = (1L to 4000L).toDF("id")
        // 30 cliques of 80 → ~95k edges, plus a 500-node chain
        val cliques = (0 until 30).flatMap { c =>
          val base = c * 100L + 1
          for (i <- 0 until 80; j <- i + 1 until 80)
            yield (base + i, base + j)
        }
        val chain = (3000L to 3500L).map(i => (i, i + 1))
        val e = (cliques ++ chain).toDF("src", "dst")
        println(s"synthetic input: edges=${e.count()}")
        (n, e)
    }

    // delta frontier WITHOUT the pointer-jump self-join: one less
    // exchange per round, potentially more rounds (propagation walks
    // one hop per round instead of doubling)
    def labelNoJump(nodes: DataFrame, edges: DataFrame): DataFrame = {
      val sym = edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        .persist()
      sym.count()
      val lblType = nodes.schema("id").dataType
      var labels = nodes.select(col("id"), col("id").as("lbl"))
        .localCheckpoint(true)
      var front = labels
      var changed = 1L
      var round = 0
      while (changed > 0 && round < 99) {
        val viaEdge = sym
          .join(front, sym("src") === front("id"))
          .select(col("dst").as("id"), col("lbl"),
            lit(null).cast(lblType).as("old"))
        val mins = labels
          .select(col("id"), col("lbl"), col("lbl").as("old"))
          .union(viaEdge)
          .groupBy(col("id"))
          .agg(min(col("lbl")).as("lbl"), max(col("old")).as("old"))
          .localCheckpoint(false)
        val changedRows = mins.filter(!(col("lbl") <=> col("old")))
        changed = changedRows.count()
        labels = mins.select(col("id"), col("lbl"))
        front = changedRows.select(col("id"), col("lbl"))
        round += 1
      }
      println(s"    nojump rounds=$round")
      sym.unpersist()
      labels.select(col("id"), col("lbl").as("component"))
    }

    val variants: Seq[(String, () => Long)] = Seq(
      "delta1" -> (() => graft.ops.ConnectedComponents
        .label(nodes, edges, delta = true, checkEvery = 1).count()),
      "check2" -> (() => graft.ops.ConnectedComponents
        .label(nodes, edges, delta = true, checkEvery = 2).count()),
      "check3" -> (() => graft.ops.ConnectedComponents
        .label(nodes, edges, delta = true, checkEvery = 3).count()),
      "nojump" -> (() => labelNoJump(nodes, edges).count()),
      "old2" -> (() => labelOld(nodes, edges).count()))

    val runs = sys.env.get("PROFILE_RUNS").map(_.toInt).getOrElse(4)
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (r <- 1 to runs; (name, f) <- variants) {
      val t0 = System.nanoTime()
      val rows = f()
      val t = (System.nanoTime() - t0) / 1e9
      times(name) = t :: times(name)
      println(f"run$r $name%-6s $t%6.2f s  ($rows rows)")
    }
    for ((name, _) <- variants)
      println(f"MIN $name%-6s ${times(name).min}%6.2f s  (all: ${
        times(name).reverse.map(t => f"$t%.2f").mkString(", ")})")
    spark.stop()
  }
}
