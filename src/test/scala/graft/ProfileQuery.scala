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
    val fn = SparkEntry.queries(name)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"== run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
