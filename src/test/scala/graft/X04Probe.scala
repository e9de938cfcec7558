package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Extensions
import graft.ops.Cols.{tokenSet, tokenSetSig}

/** One-off probe: does AQE runtime stage reuse actually dedupe the
  * band-table subtree in x04's self-join, or does the minhash
  * aggregation compute once per join side? Compares the shipped shape
  * (reuse-reliant) against an eager persist of the band table. */
object X04Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def sigs(): DataFrame = {
      val m = Extensions.docMasksOf(Tables.documents(spark, sfDir))
        .groupBy(col("sig"), col("mask"))
        .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("cnt")).persist()
      m.count(); m
    }
    def repToks(s: DataFrame): DataFrame = s
      .join(Tables.documents(spark, sfDir), col("rep") === col("doc_id"))
      .select(col("rep"), explode(tokenSet(col("text"))).as("tok"))
    def verify(s: DataFrame, cand: DataFrame): DataFrame = {
      val ma = broadcast(s.select(col("rep").as("rep_a"), col("mask").as("mask_a")))
      val mb = broadcast(s.select(col("rep").as("rep_b"), col("mask").as("mask_b")))
      cand.join(ma, "rep_a").join(mb, "rep_b")
        .withColumn("jac",
          bit_count(col("mask_a").bitwiseAND(col("mask_b"))).cast("double") /
            bit_count(col("mask_a").bitwiseOR(col("mask_b"))))
        .filter(col("jac") >= 0.9)
    }

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
      spark.catalog.clearCache()
    }

    for (_ <- 1 to 3) {
      time("shipped") {
        val s = sigs()
        verify(s, Extensions.lshCandidates(Extensions.bandTable(repToks(s), "t:"))).count()
      }
      time("persisted-band") {
        val s = sigs()
        val banded = Extensions.bandTable(repToks(s), "t:").persist()
        banded.count()
        verify(s, Extensions.lshCandidates(banded)).count()
      }
    }
    spark.stop()
  }
}
