package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-session A/Bs for the round-15 lifecycle-gate changes
  * (alternating variants, min of k passes each — the ScrubAbProbe
  * discipline; absolute walls on this host are contention-noisy, the
  * A−B gap within one session is the signal).
  *
  *  1. classesOf: the SHIPPED agg + dropDuplicates + join form vs
  *     the rejected one-agg (first(arr)) rewrite, driven through the
  *     full x86 ingest chain — the rewrite looked like "3 exchanges
  *     → 1" on the plan and measured ~1 s SLOWER (5.16 vs 4.24 min).
  *  2. the x80 ADC pipeline's coarse assignment: recomputed (shipped)
  *     vs persisted — caching the wide output measured slower than
  *     re-running the per-row native encode (3.38 vs 3.17 min).
  *  3. generation staging (RegistryStore.stageGeneration): persisted
  *     staging (shipped) vs the pre-round-15 triple evaluation —
  *     persist wins (1.18 vs 1.34 min) and drops the duplicate
  *     classesOf shuffles + MinHash sampling pass.
  *
  * Usage: runMain graft.tools.LifecycleAbProbe <sfDir> [passes]
  */
object LifecycleAbProbe {

  /** The REJECTED one-aggregation classesOf ("3 exchanges → 1" on
    * paper): first(arr) over an array column cannot ride the
    * fixed-width HashAggregate fast path, and the form measured
    * SLOWER than the shipped agg + dropDuplicates + join through the
    * full ingest chain. Kept here as the reproducible B side. */
  private def oneAggClassesOf(docs: DataFrame): DataFrame =
    docs.withColumn("sig", md5(array_join(col("arr"), " ")))
      .groupBy(col("sig"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("min_id"),
        first(col("arr")).as("arr"))

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

    def docArrs() = graft.Tables.documents(spark, sfDir)
      .repartition(col("doc_id"))
      .select(col("doc_id"), graft.ops.Cols.tokenSet(col("text")).as("arr"))
    def ingestWith(classes: DataFrame => DataFrame): DataFrame = {
      val da = docArrs().persist(); da.count()
      E.ingestAgainstClasses(
        classes(da.filter(col("doc_id") % 4 =!= 0)),
        da.filter(col("doc_id") % 4 === 0))
    }
    def vecs() = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), x => floor(x * lit(1000)).cast("long"))
          .as("qv")).persist()

    /** pre-round-15 ADC pipeline: assignment NOT persisted. */
    def adcOld(): DataFrame = {
      val v = vecs(); v.count()
      val cents = E.ivfPqCentModel(v).persist(); cents.count()
      val assigned = E.ivfPqAssign(v, cents)
      val rcb = E.ivfPqCodebook(assigned).persist(); rcb.count()
      val enc = E.ivfPqEncodeDf(assigned, rcb)
      E.ivfPqRerank(v, E.ivfPqAdcRankedWith(v, cents, enc,
        corpusScaledR = true))
    }
    def adcNew(): DataFrame = {
      val v = vecs(); v.count()
      E.ivfPqTopK(v, corpusScaledR = true)
    }

    def time(f: () => DataFrame): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println("== classesOf through the x86 ingest chain ==")
    time(() => ingestWith(E.classesOf)) // warm
    time(() => ingestWith(oneAggClassesOf))
    var bn = Double.MaxValue; var bo = Double.MaxValue
    for (p <- 1 to passes) {
      val n = time(() => ingestWith(E.classesOf))
      val o = time(() => ingestWith(oneAggClassesOf))
      println(f"pass $p: shipped-join=$n%.3f one-agg=$o%.3f")
      bn = math.min(bn, n); bo = math.min(bo, o)
    }
    println(f"MIN shipped-join=$bn%.3f one-agg=$bo%.3f")
    println("== ivfPq ADC pipeline: persisted vs recomputed assignment ==")
    time(() => adcNew()); time(() => adcOld())
    var an = Double.MaxValue; var ao = Double.MaxValue
    for (p <- 1 to passes) {
      val n = time(() => adcNew())
      val o = time(() => adcOld())
      println(f"pass $p: persisted=$n%.3f recomputed=$o%.3f")
      an = math.min(an, n); ao = math.min(ao, o)
    }
    println(f"MIN persisted=$an%.3f recomputed=$ao%.3f")

    // 3. generation staging: the pre-round-15 form evaluated the
    // input classes THREE times (classes write + repartitionByRange's
    // sampling pass + the band shuffle); the shipped stageGeneration
    // persists the classes projection and the band table across the
    // staging window.
    println("== generation staging: persisted vs triple-evaluated ==")
    def freshDir(): String = {
      val p = java.nio.file.Files.createTempDirectory("graft_ab_stage")
      p.toFile.deleteOnExit(); p.toString
    }
    def classesDay0() = E.classesOf(docArrs()
      .filter(col("doc_id") % 4 === 1 || col("doc_id") % 4 === 2))
    def stageOld(): DataFrame = {
      val dir = freshDir()
      val classes = classesDay0()
      classes.select(col("sig"), col("cnt"), col("min_id"), col("arr"))
        .write.parquet(s"$dir/classes")
      E.bandTableArr(classes.select(col("sig").as("rep"), col("arr")), "t:")
        .withColumnRenamed("rep", "sig")
        .repartitionByRange(E.NumBands, col("band"), col("k0"))
        .sortWithinPartitions(col("band"), col("k0"))
        .write.partitionBy("band").parquet(s"$dir/bands")
      spark.read.parquet(s"$dir/classes").limit(1)
    }
    def stageNew(): DataFrame = {
      val dir = freshDir()
      val staged = classesDay0()
        .select(col("sig"), col("cnt"), col("min_id"), col("arr")).persist()
      try {
        staged.write.parquet(s"$dir/classes")
        val bt = E.bandTableArr(
            staged.select(col("sig").as("rep"), col("arr")), "t:")
          .withColumnRenamed("rep", "sig").persist()
        try {
          bt.repartitionByRange(E.NumBands, col("band"), col("k0"))
            .sortWithinPartitions(col("band"), col("k0"))
            .write.partitionBy("band").parquet(s"$dir/bands")
        } finally bt.unpersist()
      } finally staged.unpersist()
      spark.read.parquet(s"$dir/classes").limit(1)
    }
    time(() => stageNew()); time(() => stageOld())
    var sn = Double.MaxValue; var so = Double.MaxValue
    for (p <- 1 to passes) {
      val n = time(() => stageNew())
      val o = time(() => stageOld())
      println(f"pass $p: staged-persist=$n%.3f triple-eval=$o%.3f")
      sn = math.min(sn, n); so = math.min(so, o)
    }
    println(f"MIN staged-persist=$sn%.3f triple-eval=$so%.3f")
    spark.stop()
  }
}
