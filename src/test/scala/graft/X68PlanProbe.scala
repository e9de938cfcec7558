package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (own JVM): print x68's executed plan to inspect the
  * cached bg-partitioning reuse. Not a spec; see AnalyticsPlanSpec. */
object X68PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tune(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries("x68_lm_surprisal")(spark, "/root/testdata/sf0.001")
    df.collect()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
