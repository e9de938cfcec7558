package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Extensions
import graft.ops.Cols.tokenSet

/** Measurement probe for the LSH hot-bucket cap (`lshCandidates
  * maxBucket`): candidate count, verified-pair recall, and band-bucket
  * size distribution at each cap setting — the numbers PERF.md's
  * "hot-bucket cap" table reports so the 100 TB knob has a measured
  * setting instead of a guess. */
object CapProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sigs = Extensions.docMasksOf(Tables.documents(spark, sfDir))
      .groupBy(col("sig"), col("mask"))
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("cnt")).persist()
    sigs.count()
    val docArrs = Tables.documents(spark, sfDir)
      .repartition(col("doc_id"))
      .select(col("doc_id"), tokenSet(col("text")).as("arr"))
    val repArrs = sigs.join(docArrs, col("rep") === col("doc_id"))
      .select(col("rep"), col("arr"))
    val banded = Extensions.bandTableArr(repArrs, "t:").persist()
    banded.count()

    // band-bucket size distribution (what the cap actually cuts)
    val buckets = banded.groupBy("band", "k0", "k1", "k2", "k3")
      .agg(count(lit(1)).as("n")).persist()
    val dist = buckets.agg(max(col("n")).as("max"),
      expr("percentile(n, 0.999)").as("p999"),
      expr("percentile(n, 0.99)").as("p99"),
      count(lit(1)).as("buckets")).collect()(0)
    println(s"BUCKETS max=${dist.get(0)} p999=${dist.get(1)} p99=${dist.get(2)} n=${dist.get(3)}")

    def verified(cand: DataFrame): Long = {
      val ma = broadcast(sigs.select(col("rep").as("rep_a"), col("mask").as("mask_a")))
      val mb = broadcast(sigs.select(col("rep").as("rep_b"), col("mask").as("mask_b")))
      cand.join(ma, "rep_a").join(mb, "rep_b")
        .filter(bit_count(col("mask_a").bitwiseAND(col("mask_b"))).cast("double") /
          bit_count(col("mask_a").bitwiseOR(col("mask_b"))) >= 0.9)
        .count()
    }

    val base = Extensions.lshCandidates(banded).persist()
    val baseCand = base.count()
    val basePairs = verified(base)
    println(s"CAP=none candidates=$baseCand verified=$basePairs recall=1.000")
    base.unpersist()

    Seq(2000, 1000, 500, 200, 100, 50).foreach { cap =>
      val c = Extensions.lshCandidates(banded, maxBucket = cap).persist()
      val n = c.count()
      val v = verified(c)
      println(f"CAP=$cap candidates=$n verified=$v recall=${v.toDouble / basePairs}%.3f")
      c.unpersist()
    }
    spark.stop()
  }
}
