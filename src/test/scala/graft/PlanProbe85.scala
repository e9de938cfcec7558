package graft
import org.apache.spark.sql.SparkSession

/** Dev probe (PlanAudit's sibling) for the round-9 additions: x85
  * must be broadcast-only (centroids, thresholds — no corpus-sized
  * join side), x86's band equi-join must stay a shuffleable join (no
  * forced broadcast — the registry is corpus-scale at 100 TB), and
  * neither may contain a cartesian/nested-loop. Facts recorded in
  * SURVEY.md §8 / PERF.md. */
object PlanProbe85 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tune(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    Seq("x85_proto_prune", "x86_incremental_ingest", "x87_ccnet_buckets",
        "x88_span_scrub", "x89_scrub_audit", "x90_image_phash",
        "x91_audio_fingerprint").foreach { n =>
      val df = SparkEntry.queries(n)(spark, sf)
      df.count()
      val p = df.queryExecution.executedPlan.toString
      println(s"== $n")
      println("  BroadcastHashJoin: " + "BroadcastHashJoin".r.findAllIn(p).length)
      println("  SortMergeJoin: " + "SortMergeJoin".r.findAllIn(p).length)
      println("  ShuffledHashJoin: " + "ShuffledHashJoin".r.findAllIn(p).length)
      println("  Exchanges: " + "Exchange".r.findAllIn(p).length)
      println("  CartesianProduct: " + p.contains("CartesianProduct"))
      println("  BroadcastNestedLoop: " + p.contains("BroadcastNestedLoop"))
    }
    spark.stop()
  }
}
