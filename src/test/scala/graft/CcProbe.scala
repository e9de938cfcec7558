package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev probe: ConnectedComponents round cost under AQE on/off over a
  * chain-heavy synthetic graph (~10 pointer-jumped rounds). Finding:
  * AQE ON is ~2.5x faster warm (3.99 s vs 10.6 s) — runtime partition
  * coalescing collapses the 32-way tiny-table shuffles to 1, beating
  * its own re-planning overhead. The loop therefore keeps the
  * session's AQE untouched. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // synthetic graph shaped like the sf0.1 near-dup graph: a few
    // hundred nodes, one big cluster + singletons
    val nodes = (1L to 4000L).toDF("id")
    val edges = ((1L to 600L).map(i => (i, i + 1)) ++
      (1000L to 1400L by 2).map(i => (i, i + 1))).toDF("src", "dst")
    for (aqe <- Seq("true", "false")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      for (r <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = graft.ops.ConnectedComponents.label(nodes, edges).count()
        println(s"aqe=$aqe run$r: ${(System.nanoTime()-t0)/1e9}%.2f".replace("%.2f","") + s" s, $n rows")
      }
    }
    spark.stop()
  }
}
