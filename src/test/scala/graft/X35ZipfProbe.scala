package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Extensions

/** Measures the round-6 verdict's open claim about x35: that its
  * 8.8-10× sf0.1→sf1 scaling is a property of the SYNTHETIC gate
  * corpus (a ~40-token/copy vocabulary keeping every prefix token
  * high-df and prefix-pair co-occurrence dense), and that on a
  * zipfian crawl-like vocabulary the classic SSJoin prefix bound
  * applies. This generates a corpus with the SAME shape as sf1's
  * distinct-set table (39,350 sets, ~40 tokens each) but a zipfian
  * token distribution (s=1.07, crawl-like, 200k-type vocabulary),
  * runs both candidate stages (k=1 prefix and the k=2 pair-prefix
  * x35 ships) plus the exact verify, and prints candidate counts and
  * wall times side by side with the same pipeline re-run on the real
  * sf1 uniform fixture. Deterministic: seeded per-doc RNG.
  *
  * Usage: X35ZipfProbe [nDocs] [sf1Dir] — run the zipf corpus, then
  * (if sf1Dir exists) the uniform comparison. */
object X35ZipfProbe {
  private val T = 0.9 // x35's PfJaccard

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 39350
    val sf1 = if (args.length > 1) Some(args(1)) else Some("/tmp/sf1")
    val spark = Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // zipf(s=1.07) over 200k types via inverse-CDF on precomputed
    // cumulative weights; ~40 distinct tokens per doc (sf1's shape)
    val V = 200000
    val s = 1.07
    val cum = new Array[Double](V)
    var acc = 0.0
    var i = 0
    while (i < V) { acc += 1.0 / math.pow(i + 1, s); cum(i) = acc; i += 1 }
    val total = cum(V - 1)
    def sample(u: Double): Int = {
      val x = u * total
      var lo = 0; var hi = V - 1
      while (lo < hi) {
        val mid = (lo + hi) / 2
        if (cum(mid) < x) lo = mid + 1 else hi = mid
      }
      lo
    }
    val docs = (0 until nDocs).map { d =>
      val rng = new scala.util.Random(d * 2654435761L + 12345L)
      val toks = scala.collection.mutable.LinkedHashSet[Int]()
      while (toks.size < 40) toks += sample(rng.nextDouble())
      (d.toLong, toks.map(t => s"t$t").mkString(" "))
    }.toDF("doc_id", "text")

    def run(label: String, documents: DataFrame): Unit = {
      val reps = documents
        .groupBy(graft.ops.Cols.tokenSetSig(col("text")).as("sig"))
        .agg(min(col("doc_id")).as("rep"))
        .join(documents, col("rep") === col("doc_id"))
        .select(col("rep"), graft.ops.Cols.tokenSet(col("text")).as("toks"))
        .persist()
      val nSets = reps.count()
      val dfTab = reps.select(col("rep"), explode(col("toks")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val medianDf = dfTab.stat.approxQuantile("df", Array(0.5), 0.01)(0)
      val otab = reps.select(col("rep"), explode(col("toks")).as("tok"))
        .join(dfTab, "tok")
        .groupBy(col("rep"))
        .agg(transform(
          array_sort(collect_list(struct(col("df"), col("tok")))),
          e => e.getField("tok")).as("otoks"))
        .withColumn("n", size(col("otoks")).cast("long"))
        .withColumn("plen", (col("n") - ceil(col("n") * lit(T)) + 1).cast("int"))
        .persist()
      otab.count()
      val prefixDf = otab
        .select(explode(expr("slice(otoks, 1, plen)")).as("tok"))
        .join(dfTab, "tok").stat.approxQuantile("df", Array(0.5), 0.01)(0)
      for ((ck, cand) <- Seq(
          "k1" -> (() => Extensions.ssjoinCandidates(otab)),
          "k2" -> (() => Extensions.ssjoinCandidates2(otab)))) {
        val t0 = System.nanoTime()
        val c = cand().persist()
        val nCand = c.count()
        val candS = (System.nanoTime() - t0) / 1e9
        val ta = reps.select(col("rep").as("rep_a"), col("toks").as("toks_a"))
        val tb = reps.select(col("rep").as("rep_b"), col("toks").as("toks_b"))
        val inter = size(array_intersect(col("toks_a"), col("toks_b")))
        val jac = inter.cast("double") /
          (size(col("toks_a")) + size(col("toks_b")) - inter)
        val t1 = System.nanoTime()
        val nTrue = c.join(ta, "rep_a").join(tb, "rep_b")
          .filter(jac >= T).count()
        val verS = (System.nanoTime() - t1) / 1e9
        println(f"[$label/$ck] sets=$nSets medianTokDf=$medianDf%.0f " +
          f"medianPrefixTokDf=$prefixDf%.0f candidates=$nCand " +
          f"truePairs=$nTrue candS=$candS%.1f verifyS=$verS%.1f")
        c.unpersist()
      }
      reps.unpersist(); otab.unpersist()
    }

    run("zipf", docs)
    sf1.filter(d => new java.io.File(d).isDirectory).foreach { d =>
      run("uniform-sf1", Tables.documents(spark, d))
    }
    spark.stop()
  }
}
