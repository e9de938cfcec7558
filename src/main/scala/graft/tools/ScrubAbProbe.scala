package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-session A/B for the round-15 scrub-fusion hypothesis
  * (contention-proof: variants alternate within one session, min of k
  * passes each).
  *
  * A = the SHIPPED x94 chain (`Extensions.scrubRoundAudit`:
  * spanDedupCounts + spanScrub per round — the count side rides the
  * NATIVE per-row-distinct SpanHashes pass).
  * B = the rejected FUSION (inlined below): one positional span table
  * per round serving both the rewrite and the per-doc statistics.
  *
  * Measured at sf0.1 (min of 4): A = 6.35 s, B = 13.29 s — the
  * fusion's shared per-doc-distinct table costs a corpus-wide
  * distinct + two extra joins on the bigger positional table, which
  * loses to the "redundant" native count pass it removed. Guide §1.1:
  * the ideal-plan rewrite lost to the measured one; B stays out of
  * the tree and this probe is the evidence.
  *
  * Usage: runMain graft.tools.ScrubAbProbe <sfDir> [passes]
  */
object ScrubAbProbe {
  private val W = 8 // ScrubW / SpanW — the gate grain

  /** The REJECTED fused engine: scrub + input-side span counts from
    * one positional pass. Output (doc_id, n_tok, n_removed, clean,
    * n_spans, dup_spans); bit-equal to the unfused pair (that part
    * was never the problem — the cost was). */
  private def fusedScrubWithCounts(docs: DataFrame): DataFrame = {
    val w = W
    val tkd = docs
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("tk"))
      .persist()
    tkd.count()
    val ps = tkd.select(col("doc_id"),
        explode(graft.functions.GramHashes.gramHashes(col("text"), w, w))
          .as("e"))
      .select(col("doc_id"), col("e")("i").as("i"), col("e")("g").as("sh"))
      .persist()
    ps.count()
    val psd = ps.select(col("doc_id"), col("sh")).distinct().persist()
    psd.count()
    val perSpan = psd.groupBy(col("sh")).agg(count(lit(1)).as("n_docs"))
      .persist()
    perSpan.count()
    val counts = psd.join(perSpan, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("n_docs") >= 2, lit(1L)).otherwise(lit(0L)))
          .as("dup_spans"))
    val dup = perSpan.filter(col("n_docs") >= 2).select(col("sh"))
    val starts = ps.join(dup, "sh")
      .groupBy(col("doc_id")).agg(collect_set(col("i")).as("starts"))
    tkd.join(starts, Seq("doc_id"), "left")
      .join(counts, Seq("doc_id"), "left")
      .withColumn("st", coalesce(col("starts"), array().cast("array<int>")))
      .withColumn("kept", filter(col("tk"), (t, p) =>
        not(exists(col("st"), s => s <= p && p <= s + (w - 1)))))
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n_tok"),
        (size(col("tk")) - size(col("kept"))).cast("long").as("n_removed"),
        concat_ws(" ", col("kept")).as("clean"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_spans"), lit(0L)).as("dup_spans"))
  }

  /** x94's audit composed over the fused engine (the rejected form). */
  private def fusedAudit(docs0: DataFrame): DataFrame = {
    var cur = docs0.select(col("doc_id"), col("text"))
    var outp: DataFrame = null
    for (r <- 1 to 2) {
      val sc = fusedScrubWithCounts(cur).persist()
      sc.count()
      val step = sc.select(col("doc_id"),
        col("dup_spans").as(s"dup_r${r - 1}"),
        col("n_removed").as(s"rm_r$r"))
      outp = if (outp == null) step else outp.join(step, "doc_id")
      cur = sc.select(col("doc_id"), col("clean").as("text"))
    }
    val last = graft.queries.Extensions.spanDedupCounts(cur)
      .select(col("doc_id"), col("dup_spans").as("dup_r2"))
    val res = outp.join(last, "doc_id")
    res.orderBy(res.columns.map(col): _*)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val passes = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val E = graft.queries.Extensions
    val docs = () => graft.Tables.documents(spark, sfDir)
    def time(f: () => DataFrame): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(() => E.scrubRoundAudit(docs())) // warm
    time(() => fusedAudit(docs()))
    var bestA = Double.MaxValue; var bestB = Double.MaxValue
    for (p <- 1 to passes) {
      val a = time(() => E.scrubRoundAudit(docs()))
      val b = time(() => fusedAudit(docs()))
      println(f"pass $p: shipped=$a%.3f fused=$b%.3f")
      bestA = math.min(bestA, a); bestB = math.min(bestB, b)
    }
    println(f"MIN shipped=$bestA%.3f fused=$bestB%.3f")
    spark.stop()
  }
}
