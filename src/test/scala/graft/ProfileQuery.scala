package graft

import org.apache.spark.sql.SparkSession

/** Dev profiler: run one gate query N times, print per-run wall time
  * and the formatted plan. Usage: ProfileQuery <name> [sfDir]. */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Print any stage that takes >500ms wall, to localize stalls.
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L)
        if (ms > 500)
          println(f"    [stage ${i.stageId}%4d] ${ms / 1e3}%6.2f s  ${i.numTasks}%4d tasks  ${i.name.takeWhile(_ != '\n').take(80)}")
      }
    })
    val fn = SparkEntry.queries(name)
    val runs = sys.env.getOrElse("PROFILE_RUNS", "3").toInt
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"== run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
