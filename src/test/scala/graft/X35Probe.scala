package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.Extensions
import graft.ops.Cols.{tokenSet, tokenSetSig}

/** Measurement probe for x35's PPJoin position filter: candidate count
  * and wall time with/without, plus a lossless check (the verified
  * pair set must be identical) — the numbers behind PERF.md's SSJoin
  * vs PPJoin row. */
object X35Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = 0.9

    val reps = Tables.documents(spark, sfDir)
      .groupBy(tokenSetSig(col("text")).as("sig"))
      .agg(min(col("doc_id")).as("rep"))
      .join(Tables.documents(spark, sfDir), col("rep") === col("doc_id"))
      .select(col("rep"), tokenSet(col("text")).as("toks"))
      .persist()
    reps.count()
    val dfTab = reps.select(col("rep"), explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val otab = reps.select(col("rep"), explode(col("toks")).as("tok"))
      .join(dfTab, "tok")
      .groupBy(col("rep"))
      .agg(transform(
        array_sort(collect_list(struct(col("df"), col("tok")))),
        e => e.getField("tok")).as("otoks"))
      .withColumn("n", size(col("otoks")).cast("long"))
      .withColumn("plen", (col("n") - ceil(col("n") * lit(t)) + 1).cast("int"))
      .persist()
    otab.count()

    def verified(candDf: org.apache.spark.sql.DataFrame): Long = {
      val ta = reps.select(col("rep").as("rep_a"), col("toks").as("toks_a"))
      val tb = reps.select(col("rep").as("rep_b"), col("toks").as("toks_b"))
      val inter = size(array_intersect(col("toks_a"), col("toks_b")))
      val jac = inter.cast("double") /
        (size(col("toks_a")) + size(col("toks_b")) - inter)
      candDf.join(ta, "rep_a").join(tb, "rep_b")
        .filter(jac >= t).count()
    }

    // corpus shape stats: how adversarial is the prefix-token df curve
    val nSets = otab.count()
    val prefStats = otab
      .select(posexplode(expr("slice(otoks, 1, plen)")).as(Seq("pos", "tok")))
      .join(dfTab, "tok")
      .agg(count(lit(1)).as("pref_toks"),
        expr("percentile(df, 0.5)").as("df_p50"),
        expr("percentile(df, 0.9)").as("df_p90"),
        max(col("df")).as("df_max"))
      .collect()(0)
    println(s"SETS=$nSets PREF_TOKS=${prefStats.get(0)} " +
      s"PREF_DF_P50=${prefStats.get(1)} PREF_DF_P90=${prefStats.get(2)} " +
      s"PREF_DF_MAX=${prefStats.get(3)}")

    Seq(false, true).foreach { positional =>
      val t0 = System.nanoTime()
      val cand = Extensions.ssjoinCandidates(otab, positional).persist()
      val n = cand.count()
      val candMs = (System.nanoTime() - t0) / 1e6
      val t1 = System.nanoTime()
      val v = verified(cand)
      val verMs = (System.nanoTime() - t1) / 1e6
      println(f"POSITIONAL=$positional candidates=$n verified=$v candMs=$candMs%.0f verifyMs=$verMs%.0f")
      cand.unpersist()
    }
    // the SHIPPED k=2 pair-prefix stage (the x35 gate's form)
    locally {
      val t0 = System.nanoTime()
      val cand = Extensions.ssjoinCandidates2(otab).persist()
      val n = cand.count()
      val candMs = (System.nanoTime() - t0) / 1e6
      val t1 = System.nanoTime()
      val v = verified(cand)
      val verMs = (System.nanoTime() - t1) / 1e6
      println(f"PAIRK2 candidates=$n verified=$v candMs=$candMs%.0f verifyMs=$verMs%.0f")
      cand.unpersist()
    }
    spark.stop()
  }
}
