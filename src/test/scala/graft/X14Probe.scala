package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage cardinalities and timings of the x14
  * bigram-LSH pipeline at a given SF, to find where the time goes. */
object X14Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Tables.documents(spark, sfDir)
    println(s"docs: ${docs.count()}")

    val bigramsExpr = expr(
      """array_distinct(zip_with(
           slice(split(text, ' '), 1, size(split(text, ' ')) - 1),
           slice(split(text, ' '), 2, size(split(text, ' ')) - 1),
           (a, b) -> concat(a, ' ', b)))""")
    val sigs = docs.groupBy(md5(array_join(array_sort(array_distinct(split(col("text"), " "))), " ")).as("sig"))
      .agg(min(col("doc_id")).as("rep"))
    val reps = timed("reps build+persist") {
      val r = sigs.join(docs, col("rep") === col("doc_id"))
        .select(col("rep"), bigramsExpr.as("bgs")).persist()
      println(s"  reps: ${r.count()}")
      r
    }
    println("avg bigrams/rep: " + reps.select(avg(size(col("bgs")))).head.getDouble(0))

    val toks = reps.select(col("rep"), explode(col("bgs")).as("tok"))
    println(s"exploded bigram rows: ${toks.count()}")

    // minhash + banding, mirroring Extensions
    def mhA(i: Int): Long = 1000003L + 2L * i
    def mhB(i: Int): Long = 12345L + 7919L * i
    val Mod32 = 4294967296L
    val h = toks.withColumn("h",
      conv(substring(md5(concat(lit("b:"), col("tok"))), 1, 8), 16, 10).cast("long"))
    val mhAggs = (0 until 16).map(i => min((col("h") * mhA(i) + mhB(i)) % Mod32).as(s"mh$i"))
    val mh = timed("minhash agg")(h.groupBy(col("rep")).agg(mhAggs.head, mhAggs.tail: _*).persist())
    mh.count()

    val bandStructs = (0 until 4).map { b =>
      struct((0 until 4).map(j => col(s"mh${4 * b + j}").as(s"k$j")): _*)
    }
    val banded = mh.select(col("rep"),
      posexplode(array(bandStructs: _*)).as(Seq("band", "ks")))
      .select(col("rep") +: col("band") +: (0 until 4).map(j => col(s"ks.k$j").as(s"k$j")): _*)
      .persist()
    println(s"band rows: ${banded.count()}")
    println("largest band buckets:")
    banded.groupBy(col("band"), col("k0"), col("k1"), col("k2"), col("k3"))
      .count().orderBy(desc("count")).show(10)
    val bucketPairs = banded.groupBy(col("band"), col("k0"), col("k1"), col("k2"), col("k3"))
      .agg(count(lit(1)).as("n")).select(expr("sum(n * (n - 1)) div 2")).head.get(0)
    println(s"raw collision pairs (pre-distinct): $bucketPairs")

    val joinCond = col("a.band") === col("b.band") &&
      (0 until 4).map(j => col(s"a.k$j") === col(s"b.k$j")).reduce(_ && _) &&
      col("a.rep") < col("b.rep")
    val cand = timed("candidate join+distinct") {
      val c = banded.as("a").join(broadcast(banded.as("b")), joinCond)
        .select(col("a.rep").as("rep_a"), col("b.rep").as("rep_b")).distinct().persist()
      println(s"  distinct candidate pairs: ${c.count()}")
      c
    }
    val candIds = timed("candIds") {
      val c = cand.select(col("rep_a").as("rep"))
        .union(cand.select(col("rep_b").as("rep"))).distinct().persist()
      println(s"  candIds: ${c.count()}"); c
    }
    val candReps = timed("candReps") {
      val c = reps.join(candIds, "rep").persist()
      println(s"  candReps: ${c.count()}"); c
    }
    def side(n: String) = broadcast(
      candReps.select(col("rep").as(s"rep_$n"), col("bgs").as(s"bgs_$n")))
    val inter = size(array_intersect(col("bgs_a"), col("bgs_b")))
    val jac = inter.cast("double") / (size(col("bgs_a")) + size(col("bgs_b")) - inter)
    val fin = cand.join(side("a"), "rep_a").join(side("b"), "rep_b")
      .withColumn("jac", jac).filter(col("jac") >= 0.8)
    timed("final verify join")(println("  survivors: " + fin.count()))
    fin.explain("formatted")
  }
}
