package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-session A/Bs for the round-16 optimization candidates
  * (alternating variants, min of k passes each — the ScrubAbProbe /
  * LifecycleAbProbe discipline; absolute walls on this host are
  * contention-noisy, the A−B gap within one session is the signal).
  *
  *  1. x35 candidate stage: SHIPPED persisted pair-prefix table vs
  *     the round-15 unpersisted form whose double posexplode chain
  *     evaluated once per self-join side (AQE stage reuse does not
  *     fire across InMemoryTableScan-rooted subtrees).
  *  2. x73 calibration: SHIPPED 2-action chain vs the round-15
  *     5-count chain (same work, more driver round-trips).
  *  3. x86 ingest: SHIPPED single-action ingestAgainstClasses vs the
  *     round-15 form with 4 extra eager counts + a batMembers persist.
  *  4. x68/x87 LM scoring: the REJECTED per-bigram bits rewrite
  *     (lost at sf0.1 and sf1 — see [[lmDocBitsBgBits]]) vs the
  *     SHIPPED per-(doc,bigram) scorer.
  *  5. generation staging: SHIPPED concurrent classes/bands sinks
  *     (materialize once, overlap the two writes) vs the round-15
  *     sequential persisted form (neutral at sf0.1 — kept for the
  *     overlap of the two corpus-scale writes at deployment scale,
  *     the §2.6 pattern compact already proved).
  *
  * Usage: runMain graft.tools.R16AbProbe <sfDir> [passes] [sel]
  *   sel: comma list of x35,x73,x86,lm,stage (default all)
  */
object R16AbProbe {
  private val E = graft.queries.Extensions

  // ---------------------------------------------------- old variants
  /** round-15 x35 candidate stage: pair table NOT persisted. */
  private def ssjoinCandidates2Old(otab: DataFrame): DataFrame = {
    val t = 0.9 // PfJaccard
    val ext = otab.select(col("rep"), col("n"),
      expr("slice(otoks, 1, plen + 1)").as("ptoks"))
    val first = ext
      .select(col("rep"), col("n"), col("ptoks"),
        posexplode(col("ptoks")).as(Seq("i1", "t1")))
    val pairs = first
      .select(col("rep"), col("n"), col("t1"), col("i1"),
        posexplode(expr("slice(ptoks, i1 + 2, size(ptoks))"))
          .as(Seq("j0", "t2")))
      .withColumn("i2", col("i1") + lit(1) + col("j0"))
      .select(col("rep"), col("n"), col("t1"), col("t2"), col("i2"))
    val lenOk =
      col("b.n") >= ceil(col("a.n") * lit(t)) &&
        col("a.n") >= ceil(col("b.n") * lit(t))
    val posOk =
      lit(2) + least(col("a.n") - col("a.i2") - 1,
                     col("b.n") - col("b.i2") - 1) >=
        ceil((col("a.n") + col("b.n")) * lit(t / (1 + t)) - lit(1e-9))
    pairs.as("a").join(pairs.as("b"),
        col("a.t1") === col("b.t1") && col("a.t2") === col("b.t2") &&
          col("a.rep") < col("b.rep") && lenOk && posOk)
      .select(col("a.rep").as("rep_a"), col("b.rep").as("rep_b"))
      .distinct()
  }

  private def x35With(spark: SparkSession, sfDir: String,
                      candOf: DataFrame => DataFrame): DataFrame = {
    val t = 0.9 // PfJaccard
    val reps = E.tokenSetReps(graft.Tables.documents(spark, sfDir))
    val otab = E.orderedSetTable(reps, t).persist()
    otab.count()
    val cand = candOf(otab)
    val ta = reps.select(col("rep").as("rep_a"), col("toks").as("toks_a"))
    val tb = reps.select(col("rep").as("rep_b"), col("toks").as("toks_b"))
    val inter = size(array_intersect(col("toks_a"), col("toks_b")))
    val jac = inter.cast("double") /
      (size(col("toks_a")) + size(col("toks_b")) - inter)
    cand.join(ta, "rep_a").join(tb, "rep_b")
      .withColumn("jac", jac)
      .filter(col("jac") >= t)
      .select(col("rep_a"), col("rep_b"), col("jac"))
      .orderBy(col("rep_a"), col("rep_b"), col("jac"))
  }

  /** round-15 x73: the 5-count action chain. */
  private def lshCalibrationOld(s: SparkSession, d: String): DataFrame = {
    val sigs = E.sigTable(s, d).persist()
    sigs.count()
    val docArrs = graft.Tables.documents(s, d)
      .repartition(col("doc_id"))
      .select(col("doc_id"), graft.ops.Cols.tokenSet(col("text")).as("arr"))
    val repTab = sigs.join(docArrs, col("rep") === col("doc_id"))
      .select(col("rep"), col("arr"),
        graft.functions.MinHashArr.minhashArr(col("arr"), "t:").as("mhs"))
      .filter(col("mhs").isNotNull)
      .persist()
    repTab.count()
    val banded = E.bandsOf(repTab.select(col("rep"), col("mhs"))).persist()
    banded.count()
    val cand = E.lshCandidates(banded)
      .filter((conv(substring(md5(concat_ws(":", col("rep_a"), col("rep_b"))), 1, 8), 16, 10).cast("long")
        % 4) === 0)
      .persist()
    cand.count()
    val candIds = cand.select(col("rep_a").as("rep"))
      .union(cand.select(col("rep_b").as("rep"))).distinct().persist()
    val nCandClasses = candIds.count()
    val candTab = repTab.join(candIds, "rep")
    def gated(side: DataFrame): DataFrame =
      if (nCandClasses <= graft.Knobs.IngestBcastClassCapDefault)
        broadcast(side)
      else side
    val ta = gated(candTab.select(col("rep").as("rep_a"),
      col("arr").as("arr_a"), col("mhs").as("mhs_a")))
    val tb = gated(candTab.select(col("rep").as("rep_b"),
      col("arr").as("arr_b"), col("mhs").as("mhs_b")))
    val inter = size(array_intersect(col("arr_a"), col("arr_b")))
    val uni = size(col("arr_a")) + size(col("arr_b")) - inter
    cand.join(ta, "rep_a").join(tb, "rep_b")
      .withColumn("matches",
        size(filter(zip_with(col("mhs_a"), col("mhs_b"),
          (x, y) => x === y), v => v)).cast("long"))
      .withColumn("inter", inter.cast("long"))
      .withColumn("uni", uni.cast("long"))
      .withColumn("jac_bucket", expr("(inter * 20) div uni"))
      .groupBy(col("matches"), col("jac_bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("matches"), col("jac_bucket"), col("cnt"))
      .orderBy(col("matches"), col("jac_bucket"), col("cnt"))
  }

  /** round-15 ingestAgainstClasses: eager counts + batMembers persist. */
  private def ingestOld(regClasses: DataFrame, bat: DataFrame): DataFrame = {
    val jacThresholdPct = 90L
    val bcastClassCap = graft.Knobs.IngestBcastClassCapDefault
    val sigOf = md5(array_join(col("arr"), " "))
    val regC = regClasses.persist()
    regC.count()
    val batMembers = bat.withColumn("sig", sigOf)
      .select(col("doc_id"), col("sig")).persist()
    batMembers.count()
    val batC = bat.withColumn("sig", sigOf).select(col("sig"), col("arr"))
      .dropDuplicates("sig").persist()
    batC.count()
    val regB = E.bandTableArr(regC.select(col("sig").as("rep"), col("arr")), "t:")
    val batB = E.bandTableArr(batC.select(col("sig").as("rep"), col("arr")), "t:")
    val joinCond = col("a.band") === col("b.band") &&
      (0 until E.BandRows).map(j => col(s"a.k$j") === col(s"b.k$j")).reduce(_ && _)
    val cand = batB.as("a").join(regB.as("b"), joinCond)
      .select(col("a.rep").as("bsig"), col("b.rep").as("rsig"))
      .distinct().persist()
    cand.count()
    val sigCounts = cand.agg(
      countDistinct(col("bsig")).as("na"),
      countDistinct(col("rsig")).as("nb")).head()
    val aSigs = cand.select(col("bsig").as("sig")).distinct()
    val bSigs = cand.select(col("rsig").as("sig")).distinct()
    def gated(side: DataFrame, classes: Long): DataFrame =
      if (classes <= bcastClassCap) broadcast(side) else side
    val aArr = gated(batC.join(aSigs, "sig")
      .select(col("sig").as("bsig"), col("arr").as("arr_a")),
      sigCounts.getLong(0))
    val bArr = gated(regC.join(bSigs, "sig")
      .select(col("sig").as("rsig"), col("arr").as("arr_b"),
        col("cnt"), col("min_id")), sigCounts.getLong(1))
    val inter = size(array_intersect(col("arr_a"), col("arr_b"))).cast("long")
    val uni = (size(col("arr_a")) + size(col("arr_b"))).cast("long") - inter
    val dups = cand.join(aArr, "bsig").join(bArr, "rsig")
      .withColumn("inter", inter).withColumn("uni", uni)
      .filter(col("inter") * 100 >= col("uni") * jacThresholdPct)
      .withColumn("jac_pm", expr("inter * 1000 div uni"))
    val summary = dups.groupBy(col("bsig"))
      .agg(sum(col("cnt")).as("n_dups"),
        max(struct(col("jac_pm"), (-col("min_id")).as("nreg"))).as("best"))
      .select(col("bsig").as("sig"), col("n_dups"),
        (-col("best.nreg")).as("best_reg"), col("best.jac_pm").as("best_jac_pm"))
    batMembers
      .join(summary, Seq("sig"), "left")
      .select(col("doc_id").as("new_id"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        coalesce(col("best_reg"), lit(-1L)).as("best_reg"),
        coalesce(col("best_jac_pm"), lit(0L)).as("best_jac_pm"))
      .withColumn("novel", col("n_dups") === 0L)
      .orderBy(col("new_id"))
  }

  /** The REJECTED round-16 lmDocBits rewrite ("score per distinct
    * bigram, attach with one bg join" — the lmBigramBits shape): lost
    * its A/B at sf0.1 AND sf1 — on this corpus distinct bigrams ≈
    * (doc,bigram) rows, so the per-bigram saving is nil while the
    * bits table's w1 exchange is additive. Kept as the reproducible
    * B side; the shipped per-row form is [[E.lmDocBits]]. */
  private def lmDocBitsBgBits(docs: DataFrame): DataFrame = {
    val tk = docs
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
    val pos = tk.select(col("doc_id"),
      explode(zip_with(
        slice(col("tk"), lit(1), size(col("tk")) - 1),
        slice(col("tk"), lit(2), size(col("tk")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
    val docBg = pos.groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("tf"))
      .repartition(col("bg"))
      .persist()
    docBg.count()
    val cBg = docBg.groupBy(col("bg")).agg(sum(col("tf")).as("c_bg"))
    val cW1 = docBg
      .select(split(col("bg"), " ").getItem(0).as("w1"), col("tf"))
      .groupBy(col("w1")).agg(sum(col("tf")).as("c_w1"))
    val vCtx = cW1.agg(count(lit(1)).as("v_ctx"))
    val bgBits = cBg
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .join(cW1, "w1")
      .crossJoin(broadcast(vCtx))
      .select(col("bg"), expr(E.wholeBitLog2Sql(
        "cast(c_w1 as decimal(38,0)) + v_ctx",
        "cast(c_bg as decimal(38,0)) + 1")).as("bits"))
    docBg.join(bgBits, "bg")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bg"),
        sum(col("tf") * col("bits")).as("bits_sum"))
  }

  private def lmWith(core: DataFrame => DataFrame,
                     docs: DataFrame): DataFrame =
    core(docs)
      .select(col("doc_id"), col("n_bg"), col("bits_sum"),
        (col("bits_sum").cast("double") / col("n_bg")).as("avg_bits"))
      .orderBy(col("doc_id"))

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val passes = if (args.length > 1) args(1).toInt else 3
    val sel: Set[String] =
      if (args.length > 2) args(2).split(",").toSet
      else Set("x35", "x73", "x86", "lm", "stage")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: () => DataFrame): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def ab(label: String, newF: () => DataFrame, oldF: () => DataFrame): Unit = {
      println(s"== $label ==")
      time(newF); time(oldF) // warm both
      var bn = Double.MaxValue; var bo = Double.MaxValue
      for (p <- 1 to passes) {
        val n = time(newF)
        val o = time(oldF)
        println(f"pass $p: new=$n%.3f old=$o%.3f")
        bn = math.min(bn, n); bo = math.min(bo, o)
      }
      println(f"MIN $label: new=$bn%.3f old=$bo%.3f ratio=${bn / bo}%.3f")
    }

    if (sel("x35"))
      ab("x35 candidate pair table: persisted (new) vs recomputed (old)",
        () => x35With(spark, sfDir, E.ssjoinCandidates2(_)),
        () => x35With(spark, sfDir, ssjoinCandidates2Old))

    if (sel("x73"))
      ab("x73 calibration: 2-action (new) vs 5-count (old)",
        () => E.lshCalibration(spark, sfDir),
        () => lshCalibrationOld(spark, sfDir))

    if (sel("x86")) {
      def docArrs() = graft.Tables.documents(spark, sfDir)
        .repartition(col("doc_id"))
        .select(col("doc_id"), graft.ops.Cols.tokenSet(col("text")).as("arr"))
      def ingestWith(f: (DataFrame, DataFrame) => DataFrame): DataFrame = {
        val da = docArrs().persist(); da.count()
        f(E.classesOf(da.filter(col("doc_id") % 4 =!= 0)),
          da.filter(col("doc_id") % 4 === 0))
      }
      ab("x86 ingest: single-action (new) vs eager-counts (old)",
        () => ingestWith((r, b) => E.ingestAgainstClasses(r, b)),
        () => ingestWith(ingestOld))
    }

    if (sel("lm"))
      ab("lmDocBits: per-bigram bits (REJECTED, new) vs shipped per-row (old)",
        () => lmWith(lmDocBitsBgBits, graft.Tables.documents(spark, sfDir)),
        () => lmWith(E.lmDocBits, graft.Tables.documents(spark, sfDir)))

    if (sel("stage")) {
      // generation staging: concurrent sinks (new) vs sequential (old)
      def freshDir(): String = {
        val p = java.nio.file.Files.createTempDirectory("graft_r16_stage")
        p.toFile.deleteOnExit(); p.toString
      }
      def classesDay0() = E.classesOf(graft.Tables.documents(spark, sfDir)
        .repartition(col("doc_id"))
        .select(col("doc_id"), graft.ops.Cols.tokenSet(col("text")).as("arr"))
        .filter(col("doc_id") % 4 === 1 || col("doc_id") % 4 === 2))
      def bandsOfStaged(staged: DataFrame) = E.bandTableArr(
          staged.select(col("sig").as("rep"), col("arr")), "t:")
        .withColumnRenamed("rep", "sig")
      def stageSeq(): DataFrame = {
        val dir = freshDir()
        val staged = classesDay0()
          .select(col("sig"), col("cnt"), col("min_id"), col("arr")).persist()
        try {
          staged.write.parquet(s"$dir/classes")
          val bt = bandsOfStaged(staged).persist()
          try {
            bt.repartitionByRange(E.NumBands, col("band"), col("k0"))
              .sortWithinPartitions(col("band"), col("k0"))
              .write.partitionBy("band").parquet(s"$dir/bands")
          } finally bt.unpersist()
        } finally staged.unpersist()
        spark.read.parquet(s"$dir/classes").limit(1)
      }
      def stageConc(): DataFrame = {
        val dir = freshDir()
        val staged = classesDay0()
          .select(col("sig"), col("cnt"), col("min_id"), col("arr")).persist()
        try {
          staged.count()
          val bt = bandsOfStaged(staged).persist()
          try {
            val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
            implicit val ec: scala.concurrent.ExecutionContext =
              scala.concurrent.ExecutionContext.fromExecutor(pool)
            try {
              val cF = scala.concurrent.Future {
                staged.write.parquet(s"$dir/classes") }
              val bF = scala.concurrent.Future {
                bt.repartitionByRange(E.NumBands, col("band"), col("k0"))
                  .sortWithinPartitions(col("band"), col("k0"))
                  .write.partitionBy("band").parquet(s"$dir/bands") }
              scala.concurrent.Await.result(
                scala.concurrent.Future.sequence(Seq(cF, bF)),
                scala.concurrent.duration.Duration(10, "min"))
            } finally pool.shutdown()
          } finally bt.unpersist()
        } finally staged.unpersist()
        spark.read.parquet(s"$dir/classes").limit(1)
      }
      ab("generation staging: concurrent sinks (new) vs sequential (old)",
        () => stageConc(), () => stageSeq())
    }
    spark.stop()
  }
}
