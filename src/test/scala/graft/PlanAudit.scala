package graft
import org.apache.spark.sql.SparkSession

/** Dev probe: print load-bearing physical-plan facts for the
  * trainer-facing queries (is top-K a TakeOrderedAndProject, does the
  * vocab join broadcast, how many exchanges, any cartesian). The
  * pass/fail versions of these assertions live in CorpusPrepOpsSpec;
  * this prints the facts for PERF.md bookkeeping. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tune(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    Seq("x31_vocab_topk", "x33_token_ids", "x34_chunk_overlap").foreach { n =>
      val df = SparkEntry.queries(n)(spark, sf)
      df.count()
      val p = df.queryExecution.executedPlan.toString
      println(s"== $n")
      println("  TakeOrdered: " + p.contains("TakeOrderedAndProject"))
      println("  BroadcastHashJoin: " + p.contains("BroadcastHashJoin"))
      println("  Exchanges: " + "Exchange".r.findAllIn(p).length)
      println("  CartesianProduct: " + p.contains("CartesianProduct"))
    }
    spark.stop()
  }
}
