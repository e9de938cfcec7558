package graft

import org.apache.spark.sql.SparkSession

/** Measurement probe for the remaining sf1-heavy gates (x86
  * incremental ingest, x93 cross-modal dedup, x94 scrub-to-fixpoint,
  * x95 registry append): wall time and output rows at sf0.01 → sf0.1
  * → sf1, the numbers behind PERF.md's growth-ratio table (the
  * X35Probe treatment — a scale claim is measured, not asserted).
  * Each (query, scale) cell reports the MIN of two passes plus the
  * process-CPU share of the slower pass so a contention-poisoned
  * reading is visible in the output rather than silently folded in.
  *
  * Usage: Test/runMain graft.ScaleProbe [query ...]
  * (dirs fixed: /root/testdata/sf0.01, /root/testdata/sf0.1, /tmp/sf1) */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val queries =
      if (args.nonEmpty) args.toSeq
      else Seq("x86_incremental_ingest", "x93_cross_modal",
        "x94_scrub_fixpoint", "x95_registry_append")
    val dirs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1",
      "/tmp/sf1").filter(d => java.nio.file.Files.exists(
        java.nio.file.Paths.get(d)))
    val spark = Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    queries.foreach { name =>
      val fn = SparkEntry.queries(name)
      dirs.foreach { dir =>
        // warm pass then measured passes (min-of-2): page cache +
        // codegen otherwise charge the first scale visited
        var best = Double.MaxValue
        var rows = -1L
        var cpuShare = 0.0
        (1 to 2).foreach { _ =>
          val w0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
          rows = fn(spark, dir).count()
          val dt = (System.nanoTime() - w0) / 1e9
          val cpu = (osBean.getProcessCpuTime - c0) / 1e9
          if (dt < best) best = dt
          cpuShare = cpu / dt
          spark.catalog.clearCache()
        }
        println(f"PROBE query=$name sf=$dir rows=$rows wall=$best%.1f " +
          f"cpuShare=$cpuShare%.1f")
      }
    }
    spark.stop()
  }
}
