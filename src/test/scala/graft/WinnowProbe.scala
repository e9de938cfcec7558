package graft

import graft.queries.Extensions
import org.apache.spark.sql.functions._

/** Dev probe: measured row-count / recall delta of span-table
  * winnowing (spanDedupCounts' `winnow` param) at a given SF — the
  * PERF.md numbers. Row count = Σ n_spans (the exploded (doc_id,
  * hash) table the shuffle carries); recall = fraction of the exact
  * run's dup-flagged docs (dup_spans > 0) still flagged at winnow=k. */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.documents(spark, d)
    // wall = full pipeline to completion (count of the result), best
    // of 2 — the winnow>1 sf1 bench row the round-6 verdict asked for
    def wall(k: Int): Double = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      Extensions.spanDedupCounts(docs, winnow = k).count()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }.min
    val tExact = wall(1)
    val exact = Extensions.spanDedupCounts(docs).persist()
    val exactRows = exact.agg(sum("n_spans")).head.getLong(0)
    val exactDup = exact.filter(col("dup_spans") > 0)
      .select("doc_id").persist()
    val nExactDup = exactDup.count()
    println(f"winnow=1 rows=$exactRows%d dup_docs=$nExactDup%d recall=1.000 wallS=$tExact%.2f")
    Seq(2, 4, 8).foreach { k =>
      val tK = wall(k)
      val w = Extensions.spanDedupCounts(docs, winnow = k).persist()
      val rows = w.agg(sum("n_spans")).head.getLong(0)
      val flagged = w.filter(col("dup_spans") > 0).select("doc_id")
      val kept = flagged.join(exactDup, "doc_id").count()
      val recall = kept.toDouble / nExactDup
      println(f"winnow=$k%d rows=$rows%d dup_docs=${flagged.count()}%d " +
        f"recall=$recall%.3f rows_ratio=${rows.toDouble / exactRows}%.3f wallS=$tK%.2f")
      w.unpersist()
    }
    spark.stop()
  }
}
