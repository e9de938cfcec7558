package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** At-rest storage for the MinHash class registry — the executable
  * form of x86/x95's incremental-dedup story (reference surface:
  * dedup maintenance over an ever-growing corpus; the engine-side
  * layout follows Delta/Iceberg table-maintenance practice).
  *
  * Layout under one root:
  *  - `<root>/classes`: the class rows `(sig, cnt, min_id, arr)`,
  *    append-only — a sig may appear once per appended day; readers
  *    merge (cnt sums, min_id takes the least, arr is functionally
  *    determined by sig). This is the LSM move: appends are cheap
  *    per-day files, the merge is read-time (or folded at rest by a
  *    compaction pass over [[compactionPlanOf]]).
  *  - `<root>/bands`: the probe index `(sig, k0..k3)` PARTITIONED BY
  *    `band` and range-laid on `k0` inside each partition — a band
  *    probe's equi-join touches exactly ONE of the NumBands partition
  *    directories (Spark partition pruning, proven from the plan in
  *    RegistryStoreSpec), and a band-key range touches a strict
  *    subset of that partition's files by parquet footer min/max
  *    (the ZOrderPruneSpec statistic, proven from real footers).
  *
  * At 100 TB the registry is the piece that must NOT be rescanned
  * per day: the delta's probe reads only the band partitions (1/4 of
  * the index each) and, within them, only the files whose k0 stats
  * intersect the delta's keys. Appends never rewrite history; the
  * per-band delta files stay small and x82's sorted-fill planner
  * ([[graft.queries.Extensions.compactionPlan]]) bins them for a
  * rewrite whose unit is a band partition, never the table. */
object RegistryStore {

  /** Write a class registry (sig, cnt, min_id, arr) as a fresh store
    * at `root`. `filesPerBand` sizes the band index's file count per
    * partition (range-split on k0, so per-file footer stats carve the
    * key space). */
  def write(classes: DataFrame, root: String, filesPerBand: Int = 1): Unit = {
    classes.select(col("sig"), col("cnt"), col("min_id"), col("arr"))
      .write.mode("overwrite").parquet(s"$root/classes")
    bandsFor(classes, filesPerBand)
      .write.partitionBy("band").mode("overwrite").parquet(s"$root/bands")
  }

  /** Append one day's ALREADY-CLASSED delta (a
    * [[graft.queries.Extensions.classesOf]] output) to an existing
    * store: new per-day files land in `classes` and in each band
    * partition — history is never rewritten. Read-time merge makes
    * the result equal [[graft.queries.Extensions.appendRegistry]]
    * over the same days (RegistryStoreSpec pins the equality). */
  def append(deltaClasses: DataFrame, root: String,
             filesPerBand: Int = 1): Unit = {
    deltaClasses.select(col("sig"), col("cnt"), col("min_id"), col("arr"))
      .write.mode("append").parquet(s"$root/classes")
    bandsFor(deltaClasses, filesPerBand)
      .write.partitionBy("band").mode("append").parquet(s"$root/bands")
  }

  /** The merged class view of a store: per sig, cnt sums and min_id
    * takes the least across the appended days (arr is functionally
    * determined by sig — any representative is the value-
    * deterministic one). One hash agg keyed by sig; cost ∝ class
    * rows, never raw history docs. */
  def readClasses(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/classes")
      .groupBy(col("sig"))
      .agg(sum(col("cnt")).as("cnt"), min(col("min_id")).as("min_id"),
        first(col("arr")).as("arr"))

  /** The band probe index (sig, band, k0..k3). Filter on `band`
    * before joining: the filter is a partition predicate, so the scan
    * reads one partition directory per probed band. */
  def readBands(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/bands")

  /** x82's sorted-fill compaction plan over THIS store's band-index
    * file inventory — the maintenance pass that folds small per-day
    * delta files back into `targetBytes`-sized files, per band
    * partition. Metadata-scale: one row per file. */
  def compactionPlanOf(spark: SparkSession, root: String,
                       targetBytes: Long = 1L << 20): DataFrame = {
    val inv = spark.createDataFrame(
      listParquet(spark, s"$root/bands").map(f =>
        (f.getPath.toString, f.getLen)))
      .toDF("file_id", "bytes")
    graft.queries.Extensions.compactionPlan(inv, targetBytes)
  }

  /** Recursive parquet-file inventory via the Hadoop FileSystem API —
    * works on any supported store (local, HDFS, object stores), not
    * just local paths (the 100 TB deployment reads the same code). */
  private def listParquet(spark: SparkSession, dir: String)
      : Seq[org.apache.hadoop.fs.FileStatus] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) out += f
    }
    out.result()
  }

  /** EXECUTE the compaction the planner bins: per band partition,
    * fold the accumulated small per-day delta files into
    * target-sized ones, re-laid as CONTIGUOUS k0 ranges (each output
    * file covers a disjoint k0 slice, so the footer-stat pruning the
    * store relies on is strict again after the rewrite — merging
    * bins as-is would union overlapping day ranges per file). The
    * output file count per band is the planner's bin count for that
    * band's inventory, i.e. ⌈bytes/target⌉-sized files. The classes
    * side folds too: the read-time sig-merge is materialized once,
    * so later reads aggregate pre-merged rows (idempotent — the
    * merge is associative, which is what makes the LSM shape legal).
    *
    * The rewrite unit is ONE BAND PARTITION, never the table: at
    * 100 TB each band folds independently (and can be scheduled
    * independently); readers are unaffected because the swap is
    * per-directory. Readback equality and post-compaction pruning
    * are pinned by RegistryStoreSpec; x95 stays hash-green reading a
    * compacted store. */
  def compact(spark: SparkSession, root: String,
              targetBytes: Long = 1L << 20): Unit = {
    val bandsRoot = new Path(s"$root/bands")
    val fs = bandsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(bandsRoot)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("band="))
      .foreach { part =>
        val files = listParquet(spark, part.getPath.toString)
        if (files.length > 1) {
          val inv = spark.createDataFrame(files.map(f =>
            (f.getPath.toString, f.getLen))).toDF("file_id", "bytes")
          val nOut = graft.queries.Extensions
            .compactionPlan(inv, targetBytes)
            .select(col("bin")).distinct().count().toInt
          val tmp = new Path(s"${part.getPath}__compact_tmp")
          spark.read.parquet(part.getPath.toString)
            .repartitionByRange(nOut, col("k0"))
            .sortWithinPartitions(col("k0"))
            .write.mode("overwrite").parquet(tmp.toString)
          // swap: drop the old delta files, move the folded ones in
          files.foreach(f => fs.delete(f.getPath, false))
          listParquet(spark, tmp.toString).foreach(f =>
            fs.rename(f.getPath, new Path(part.getPath, f.getPath.getName)))
          fs.delete(tmp, true)
        }
      }
    // fold the classes LSM: materialize the read-time merge once
    val merged = readClasses(spark, root)
    val tmpC = new Path(s"$root/classes__compact_tmp")
    merged.write.mode("overwrite").parquet(tmpC.toString)
    fs.delete(new Path(s"$root/classes"), true)
    fs.rename(tmpC, new Path(s"$root/classes"))
  }

  /** Band rows of a class table, ranged on (band, k0) so each written
    * file covers a contiguous k0 slice of its band partition — the
    * layout the footer-stat pruning relies on. */
  private def bandsFor(classes: DataFrame, filesPerBand: Int): DataFrame =
    graft.queries.Extensions
      .bandTableArr(classes.select(col("sig").as("rep"), col("arr")), "t:")
      .withColumnRenamed("rep", "sig")
      .repartitionByRange(
        graft.queries.Extensions.NumBands * filesPerBand,
        col("band"), col("k0"))
      .sortWithinPartitions(col("band"), col("k0"))
}
