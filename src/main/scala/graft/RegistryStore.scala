package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** At-rest storage for the MinHash class registry — the executable
  * form of x86/x95's incremental-dedup story (reference surface:
  * dedup maintenance over an ever-growing corpus; the engine-side
  * layout follows Delta/Iceberg table-maintenance practice).
  *
  * Layout under one root (round 13: generation dirs + an atomic
  * manifest pointer — every mutation is CRASH-SAFE and readers see
  * exactly old-or-new, never a partial):
  *  - `<root>/_manifests/v<NNNNN>.txt`: versioned manifests; the
  *    highest version is the live one. A manifest names, per
  *    component, the generation dirs that hold its data:
  *    `classes` → a list of class generations (the LSM levels),
  *    `band K` → the generations holding band K's index files.
  *  - `<root>/classes_g<NNNNN>`: class rows `(sig, cnt, min_id,
  *    arr)`; a sig may appear once per appended generation; readers
  *    merge (cnt sums, min_id takes the least, arr is functionally
  *    determined by sig). Appends add a generation; compaction folds
  *    all levels into one.
  *  - `<root>/bands_g<NNNNN>/band=K/`: the probe index
  *    `(sig, k0..k3)` PARTITIONED BY `band` and range-laid on `k0`
  *    inside each partition — a band probe's equi-join touches
  *    exactly ONE band directory per generation (Spark partition
  *    pruning, proven from the plan in RegistryStoreSpec), and a
  *    band-key range touches a strict subset of that partition's
  *    files by parquet footer min/max (the ZOrderPruneSpec
  *    statistic, proven from real footers).
  *
  * Commit protocol (the Iceberg/Delta move, RegistryStoreSpec pins
  * each property):
  *  1. every write lands in a FRESH generation dir no manifest
  *     references — invisible to all readers;
  *  2. the commit is ONE atomic `rename` of the next manifest
  *     version into `_manifests/` (rename-to-fresh-path is atomic on
  *     HDFS and POSIX; no manifest file is ever overwritten);
  *  3. stale generations are reaped only AFTER the commit, and only
  *     those unreferenced by the latest [[ReapKeepVersions]] manifest
  *     versions — an in-flight reader that resolved the previous
  *     manifest keeps its files until two further commits land.
  * A crash before (2) leaves orphan generation dirs the next
  * `compact` reaps — readers never see them; a crash after (2)
  * leaves stale-but-unreferenced generations — readers already see
  * the new state. At NO instant is the store unreadable.
  *
  * Writer concurrency is single-writer (the maintenance scheduler's
  * job, as in Delta without a commit service); the protocol protects
  * READERS against a concurrent writer and the store against a
  * writer crash at any point. A double-fired writer LOSES LOUDLY:
  * the second commit of the same manifest version throws at the
  * atomic rename (existence-guarded on stores whose rename
  * overwrites), the live manifest is untouched, and the loser's
  * staged generation is reclaimed as an ordinary orphan —
  * RegistryStoreSpec drives an append racing an append and an append
  * racing a compact.
  *
  * At 100 TB the registry is the piece that must NOT be rescanned
  * per day: the delta's probe reads only the band partitions (1/4 of
  * the index each) and, within them, only the files whose k0 stats
  * intersect the delta's keys. Appends never rewrite history; the
  * per-band delta files stay small and x82's sorted-fill planner
  * ([[graft.queries.Extensions.compactionPlan]]) bins them for a
  * rewrite whose unit is a band partition, never the table. */
object RegistryStore {

  /** Reader protection window: generations referenced by this many
    * latest manifest versions survive reaping. */
  private val ReapKeepVersions = 2

  /** Upper bound on any concurrent fold/write await — generous (a
    * fold is one band partition or the classes merge, never the
    * table), but finite: a hung job must surface as a timeout, not
    * block the writer forever (round-15 used Duration.Inf). */
  private val FoldTimeout =
    scala.concurrent.duration.Duration(6, java.util.concurrent.TimeUnit.HOURS)

  /** The live file inventory: which generations hold the classes LSM
    * levels and each band's index files. */
  private[graft] case class Manifest(version: Int, classes: Seq[Int],
                                     bands: Map[Int, Seq[Int]])

  private def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def classesDir(root: String, g: Int): String =
    f"$root/classes_g$g%05d"
  private def bandsDir(root: String, g: Int): String =
    f"$root/bands_g$g%05d"

  // ---------------------------------------------------------- manifest io
  private def manifestDir(root: String) = new Path(s"$root/_manifests")

  private def manifestVersions(fs: FileSystem, root: String): Seq[Int] = {
    val dir = manifestDir(root)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".txt"))
      .flatMap(n => n.stripPrefix("v").stripSuffix(".txt").toIntOption)
      .sorted
  }

  /** The live manifest = highest committed version. */
  private[graft] def currentManifest(spark: SparkSession,
                                     root: String): Manifest = {
    val fs = fsOf(spark, root)
    val v = manifestVersions(fs, root).lastOption.getOrElse(
      throw new IllegalStateException(s"no committed manifest under $root"))
    readManifest(fs, root, v)
  }

  private def readManifest(fs: FileSystem, root: String, v: Int): Manifest = {
    val in = fs.open(new Path(manifestDir(root), f"v$v%05d.txt"))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    var classes = Seq.empty[Int]
    var bands = Map.empty[Int, Seq[Int]]
    text.linesIterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
      line.split("\\s+").toSeq match {
        case "classes" +: gens => classes = gens.map(_.toInt)
        case "band" +: k +: gens => bands += (k.toInt -> gens.map(_.toInt))
        case _ => // version header / unknown line: ignore
      }
    }
    Manifest(v, classes, bands)
  }

  /** Atomic commit: write the next version to a dot-tmp file, then
    * ONE rename to its final (fresh, never-overwritten) name.
    * (private[graft] so RegistryStoreSpec can drive the concurrent-
    * writer race at exactly this boundary.) */
  private[graft] def commitManifest(fs: FileSystem, root: String,
                                    m: Manifest): Unit =
    commitManifestImpl(fs, root, m, () => ())

  /** Test seam: `beforeRename` runs after the tmp body is durable and
    * before the atomic rename, so a spec can land a full concurrent
    * commit of the SAME version inside the publish window. */
  private[graft] def commitManifestImpl(fs: FileSystem, root: String,
                                        m: Manifest,
                                        beforeRename: () => Unit): Unit = {
    val dir = manifestDir(root)
    fs.mkdirs(dir)
    val body = new StringBuilder(s"v${m.version}\n")
    body ++= m.classes.mkString("classes ", " ", "\n")
    m.bands.toSeq.sortBy(_._1).foreach { case (k, gens) =>
      body ++= gens.mkString(s"band $k ", " ", "\n")
    }
    // The tmp name is unique PER ATTEMPT, not per version: two writers
    // committing the same next version must never share a staging
    // path, or writer B's create(overwrite=true) replaces A's staged
    // body and A's rename publishes B's manifest under A's success —
    // A's generation is silently lost and B's retry then re-appends a
    // generation the live manifest already references (double count).
    // With a nonce the interleave is structurally impossible: each
    // writer renames only bytes it wrote itself, and exactly one
    // rename to the (fresh, never-overwritten) final name wins.
    val nonce = java.util.UUID.randomUUID.toString.take(8)
    val tmp = new Path(dir, f".tmp_v${m.version}%05d_$nonce")
    val out = fs.create(tmp, false)
    try {
      out.write(body.toString.getBytes("UTF-8"))
      // durability fence where the FS supports it (HDFS/object stores);
      // the local checksum FS is not Syncable — close() flushes there
      try out.hsync() catch { case _: UnsupportedOperationException => () }
    } finally out.close()
    beforeRename()
    val fin = new Path(dir, f"v${m.version}%05d.txt")
    // Concurrent-writer guard: on HDFS/object stores rename-to-
    // existing FAILS atomically (the protocol's backbone); POSIX
    // local rename silently REPLACES, so the existence check makes a
    // lost race fail loudly there too (check-then-rename narrows but
    // cannot close the window on such stores — single-writer remains
    // the documented contract, this guard turns a double-fired
    // scheduler into an exception instead of silent last-writer-wins;
    // RegistryStoreSpec drives both race shapes).
    if (fs.exists(fin) || !fs.rename(tmp, fin)) {
      fs.delete(tmp, false) // the loser reclaims its own staging file
      throw new IllegalStateException(
        s"manifest commit lost the race for $fin (single-writer violated)")
    }
  }

  /** Next unused generation id: one past every id any manifest
    * references or any on-disk dir carries (crashed writers leave
    * dirs without manifest entries — their ids stay burned). */
  private[graft] def nextGen(fs: FileSystem, root: String): Int = {
    val onDisk =
      if (!fs.exists(new Path(root))) Seq.empty
      else fs.listStatus(new Path(root)).toSeq.map(_.getPath.getName)
        .collect {
          case n if n.startsWith("classes_g") =>
            n.stripPrefix("classes_g").toIntOption
          case n if n.startsWith("bands_g") =>
            n.stripPrefix("bands_g").toIntOption
        }.flatten
    (0 +: onDisk).max + 1
  }

  // ------------------------------------------------------------- writes
  /** Write a class registry (sig, cnt, min_id, arr) as a store at
    * `root`. Over an EXISTING store this is a full rebuild under the
    * same crash-safety protocol as append/compact: the new contents
    * stage into a fresh generation no reader can see, go live in one
    * atomic manifest commit (version+1, referencing ONLY the new
    * generation), and the superseded generations are reaped under
    * the usual two-version reader-protection window — at no instant
    * is the store unreadable, and a writer crash anywhere leaves the
    * prior store fully live (the pre-round-14 form deleted the root
    * first, so a crash before the commit destroyed the history).
    * `filesPerBand` sizes the band index's file count per partition
    * (range-split on k0, so per-file footer stats carve the key
    * space). */
  def write(classes: DataFrame, root: String, filesPerBand: Int = 1): Unit = {
    val spark = classes.sparkSession
    val fs = fsOf(spark, root)
    val prior = manifestVersions(fs, root).lastOption
    val g = nextGen(fs, root)
    stageGeneration(classes, root, g, filesPerBand)
    commitManifest(fs, root,
      Manifest(prior.getOrElse(0) + 1, Seq(g),
        bandsIn(fs, root, g).map(_ -> Seq(g)).toMap))
    if (prior.nonEmpty) reapStaleGens(spark, root)
  }

  /** Append one day's ALREADY-CLASSED delta (a
    * [[graft.queries.Extensions.classesOf]] output) to an existing
    * store: the delta lands in a fresh generation (one new classes
    * LSM level + new per-band delta files) made live by one atomic
    * manifest commit — history is never rewritten, and a reader
    * NEVER sees a partially-appended day (the pre-generation layout
    * appended files in place, so a concurrent reader could). Read-
    * time merge makes the result equal
    * [[graft.queries.Extensions.appendRegistry]] over the same days
    * (RegistryStoreSpec pins the equality). */
  def append(deltaClasses: DataFrame, root: String,
             filesPerBand: Int = 1): Unit = {
    val spark = deltaClasses.sparkSession
    val fs = fsOf(spark, root)
    val m = currentManifest(spark, root)
    val g = nextGen(fs, root)
    stageGeneration(deltaClasses, root, g, filesPerBand)
    val bands = bandsIn(fs, root, g).foldLeft(m.bands) { (acc, k) =>
      acc + (k -> (acc.getOrElse(k, Seq.empty) :+ g))
    }
    commitManifest(fs, root, Manifest(m.version + 1, m.classes :+ g, bands))
  }

  /** [[append]] with commit-collision RETRY — the daily-crawl answer
    * to a double-fired scheduler. The delta's data stages into its
    * generation ONCE; if the manifest commit then loses a race
    * (another writer committed the same next version first), the
    * live manifest is re-read and the commit retried referencing the
    * already-staged generation — data is never rewritten, and the
    * outcome equals the two appends running sequentially (the
    * read-time sig-merge is associative, so generation order is
    * immaterial; RegistryStoreSpec pins the equality under an
    * injected mid-flight concurrent append). Scope: the retry covers
    * the COMMIT window; two writers whose STAGING overlaps so tightly
    * that they pick the same generation id still fail loudly at the
    * parquet write (SaveMode.ErrorIfExists) and the caller re-runs
    * the whole append — single-writer remains the recommended
    * schedule, this makes the occasional double-fire self-heal.
    * Rethrows the last collision after `maxAttempts` losses. */
  def appendRetrying(deltaClasses: DataFrame, root: String,
      filesPerBand: Int = 1, maxAttempts: Int = 5): Unit =
    appendRetryingImpl(deltaClasses, root, filesPerBand, maxAttempts, () => ())

  /** Test seam: `beforeCommit` runs before each commit attempt so a
    * spec can inject a concurrent writer inside the commit window. */
  private[graft] def appendRetryingImpl(deltaClasses: DataFrame,
      root: String, filesPerBand: Int, maxAttempts: Int,
      beforeCommit: () => Unit): Unit = {
    require(maxAttempts >= 1, "maxAttempts >= 1")
    val spark = deltaClasses.sparkSession
    val fs = fsOf(spark, root)
    val g = nextGen(fs, root)
    stageGeneration(deltaClasses, root, g, filesPerBand)
    var attempt = 1
    var committed = false
    while (!committed) {
      val m = currentManifest(spark, root)
      // Double-publish guard: if the re-read live manifest ALREADY
      // references our staged generation, some commit carrying g won
      // (e.g. a racing writer folded our generation in, or our own
      // earlier attempt's rename landed after its error surfaced) —
      // committing again would reference g twice and double-count
      // every sig in readClasses. The append is done; stop.
      if (m.classes.contains(g)) { committed = true }
      else {
        val bands = bandsIn(fs, root, g).foldLeft(m.bands) { (acc, k) =>
          acc + (k -> (acc.getOrElse(k, Seq.empty) :+ g))
        }
        beforeCommit()
        try {
          commitManifest(fs, root,
            Manifest(m.version + 1, m.classes :+ g, bands))
          committed = true
        } catch {
          case e: IllegalStateException =>
            if (attempt >= maxAttempts) throw e
            attempt += 1 // lost the race: re-read the manifest and retry
        }
      }
    }
  }

  /** band ids present in one bands generation dir. */
  private def bandsIn(fs: FileSystem, root: String, g: Int): Seq[Int] = {
    val dir = new Path(bandsDir(root, g))
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.filter(_.isDirectory)
      .flatMap(_.getPath.getName.split("=") match {
        case Array("band", v) => v.toIntOption
        case _ => None // tmp/garbage dirs never parse as a partition
      })
  }

  /** Absolute band-partition dirs of the LIVE manifest, per band —
    * the physical paths file-level tooling (and the spec's footer
    * probes) should resolve through, never by globbing the root. */
  private[graft] def bandDirs(spark: SparkSession,
                              root: String): Map[Int, Seq[String]] = {
    val m = currentManifest(spark, root)
    m.bands.map { case (k, gens) =>
      k -> gens.map(g => s"${bandsDir(root, g)}/band=$k")
    }
  }

  // -------------------------------------------------------------- reads
  /** The merged class view of a store: per sig, cnt sums and min_id
    * takes the least across the appended generations (arr is
    * functionally determined by sig — any representative is the
    * value-deterministic one). One hash agg keyed by sig; cost ∝
    * class rows, never raw history docs. */
  def readClasses(spark: SparkSession, root: String): DataFrame =
    readClassesOf(spark, root, currentManifest(spark, root))

  /** [[readClasses]] against an explicit manifest SNAPSHOT — the
    * compaction fold must read exactly the generations whose band
    * files it is folding, not whatever a concurrent append just made
    * live (a mixed snapshot would double-fold the delta on retry). */
  private def readClassesOf(spark: SparkSession, root: String,
                            m: Manifest): DataFrame =
    spark.read.parquet(m.classes.map(classesDir(root, _)): _*)
      .groupBy(col("sig"))
      .agg(sum(col("cnt")).as("cnt"), min(col("min_id")).as("min_id"),
        first(col("arr")).as("arr"))

  /** The band probe index (sig, band, k0..k3), resolved through the
    * live manifest: one partition-pruned scan per generation, each
    * restricted to the bands that still live in that generation (a
    * compacted band's old rows stay on disk until reap but are never
    * read). Filter on `band` before joining: the filter is a
    * partition predicate on every generation's scan, so the probe
    * reads one partition directory per generation. */
  def readBands(spark: SparkSession, root: String): DataFrame = {
    val m = currentManifest(spark, root)
    val byGen = m.bands.toSeq
      .flatMap { case (k, gens) => gens.map(_ -> k) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toSeq.sortBy(_._1)
    byGen.map { case (g, ks) =>
      spark.read.parquet(bandsDir(root, g))
        .filter(col("band").isin(ks: _*))
    }.reduceOption(_ unionByName _)
      // a store written from an EMPTY classes frame has no band
      // generations at all (bandsFor of zero rows writes no partition
      // dirs): the probe index is legitimately empty, not an error
      .getOrElse(spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        emptyBandSchema))
  }

  /** Schema of the band probe index as parquet reads it back (data
    * columns, then the `band` partition column) — the zero-bands
    * fallback shape of [[readBands]]. */
  private val emptyBandSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("sig", StringType), StructField("k0", LongType),
      StructField("k1", LongType), StructField("k2", LongType),
      StructField("k3", LongType), StructField("band", IntegerType)))
  }

  /** x82's sorted-fill compaction plan over THIS store's band-index
    * file inventory (live-manifest files only) — the maintenance
    * pass that folds small per-day delta files back into
    * `targetBytes`-sized files, per band partition. Metadata-scale:
    * one row per file. */
  def compactionPlanOf(spark: SparkSession, root: String,
                       targetBytes: Long = 1L << 20): DataFrame = {
    val inv = spark.createDataFrame(
      bandDirs(spark, root).values.flatten.toSeq.sorted
        .flatMap(d => listParquet(spark, d))
        .map(f => (f.getPath.toString, f.getLen)))
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
    if (!fs.exists(p)) return Seq.empty
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
    * independently); a band already at one file is carried by
    * manifest reference, its bytes untouched. All folded output
    * lands in a fresh generation and goes live in ONE atomic
    * manifest commit (see the object doc's crash-safety protocol);
    * generations the last [[ReapKeepVersions]] manifests no longer
    * reference are reaped after the commit. Readback equality,
    * post-compaction pruning, old-or-new reader isolation and
    * crash-window readability are pinned by RegistryStoreSpec; x95
    * stays hash-green reading a compacted store.
    * Commit-collision RETRY (the [[appendRetrying]] move for the
    * compactor): the fold stages into its generation ONCE against a
    * manifest SNAPSHOT; if the commit then loses to a concurrent
    * append, the live manifest is re-read and — because an append
    * only ever EXTENDS the snapshot's generation list — the commit is
    * retried referencing the fold PLUS the appended deltas, which the
    * next compaction folds in turn. The full band rewrite is never
    * thrown away. A concurrent COMPACT (live classes no longer extend
    * the snapshot's) still fails loudly: two compactors is a schedule
    * bug, and folding over a fold cannot be reconciled by reference.
    * @param reap disable only to inspect the post-commit/pre-reap
    *             crash window (tests); production always reaps. */
  def compact(spark: SparkSession, root: String,
              targetBytes: Long = 1L << 20, reap: Boolean = true): Unit =
    compactImpl(spark, root, targetBytes, reap, maxAttempts = 5, () => ())

  /** Test seam: `beforeCommit` runs before each commit attempt so a
    * spec can inject a concurrent append inside the commit window. */
  private[graft] def compactImpl(spark: SparkSession, root: String,
      targetBytes: Long, reap: Boolean, maxAttempts: Int,
      beforeCommit: () => Unit): Unit = {
    require(maxAttempts >= 1, "maxAttempts >= 1")
    val fs = fsOf(spark, root)
    val m = currentManifest(spark, root)
    val g = nextGen(fs, root)
    // The classes LSM fold and each band's fold are INDEPENDENT jobs
    // writing to disjoint paths, and each is small (a band partition,
    // never the table) — run them from a bounded thread pool so one
    // fold's task tail back-fills with the next fold's tasks instead
    // of leaving the cluster idle (optimization-guide §2.6; round-15:
    // the sequential loop ran 1 + |bands| small jobs end to end).
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(4, m.bands.size + 1))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val bands = try {
      // classes LSM fold: materialize the read-time merge once — over
      // exactly the snapshot's generations (see readClassesOf)
      val classesF = scala.concurrent.Future {
        spark.sparkContext.setJobDescription(s"compact classes fold g=$g")
        readClassesOf(spark, root, m).write.parquet(classesDir(root, g))
      }
      // per-band fold of multi-file bands into the fresh generation
      val bandFs = m.bands.toSeq.map { case (k, gens) =>
        scala.concurrent.Future {
          spark.sparkContext.setJobDescription(s"compact fold band=$k g=$g")
          val files = gens.flatMap(gi =>
            listParquet(spark, s"${bandsDir(root, gi)}/band=$k"))
          if (files.length > 1) {
            // sorted-fill fast path: when every file fits one bin by
            // total size, the planner provably emits a single bin —
            // skip the (driver-round-trip) planning job and only run
            // x82's planner when the outcome could differ
            val nOut = if (files.map(_.getLen).sum <= targetBytes) 1
            else {
              val inv = spark.createDataFrame(files.map(f =>
                (f.getPath.toString, f.getLen))).toDF("file_id", "bytes")
              graft.queries.Extensions
                .compactionPlan(inv, targetBytes)
                .select(col("bin")).distinct().count().toInt
            }
            spark.read.parquet(files.map(_.getPath.toString): _*)
              .repartitionByRange(nOut, col("k0"))
              .sortWithinPartitions(col("k0"))
              .write.parquet(s"${bandsDir(root, g)}/band=$k")
            k -> Seq(g)
          } else k -> gens
        }
      }
      // settle EVERY fold before propagating any failure — a failed
      // band fold must not leave the classes write (or another band's
      // write) in flight when the exception surfaces, or the orphan
      // write races a later compact's reapStaleGens — and bound the
      // wait (a hung fold previously blocked compact forever under
      // Duration.Inf)
      val bandTries = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(
          bandFs.map(_.transform(scala.util.Success(_)))),
        FoldTimeout)
      val classesTry = scala.concurrent.Await.result(
        classesF.transform(scala.util.Success(_)), FoldTimeout)
      ((classesTry: scala.util.Try[Any]) +: bandTries).foreach(_.get)
      bandTries.map(_.get).toMap
    } finally {
      pool.shutdown()
      pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS)
    }
    var attempt = 1
    var committed = false
    while (!committed) {
      val live = currentManifest(spark, root)
      // Generations appended since our snapshot: an append commits
      // `classes :+ gDelta`, so the live list must EXTEND ours (and
      // never reference our staged g). Anything else means a foreign
      // compact rewrote the store under us — unreconcilable, and two
      // scheduled compactors is the bug the loud failure reports.
      if (!live.classes.startsWith(m.classes) || live.classes.contains(g))
        throw new IllegalStateException(
          s"concurrent compaction detected under $root: live classes " +
          s"${live.classes} do not extend snapshot ${m.classes}")
      val extras = live.classes.drop(m.classes.length)
      // carry the deltas' band files by reference, after the fold's
      val mergedBands = (bands.keySet ++ live.bands.keySet).map { k =>
        val extraGens =
          live.bands.getOrElse(k, Seq.empty).filter(extras.contains)
        k -> (bands.getOrElse(k, Seq.empty) ++ extraGens)
      }.toMap
      beforeCommit()
      try {
        commitManifest(fs, root,
          Manifest(live.version + 1, g +: extras, mergedBands))
        committed = true
      } catch {
        case e: IllegalStateException =>
          if (attempt >= maxAttempts) throw e
          attempt += 1 // lost the race: re-read the manifest and retry
      }
    }
    if (reap) reapStaleGens(spark, root)
  }

  /** Post-commit garbage collection: delete generation dirs (and
    * manifest versions) unreferenced by the latest
    * [[ReapKeepVersions]] manifests, with ids strictly below the
    * newest committed generation — so an in-flight reader on the
    * previous manifest keeps its files, and crashed writers' orphan
    * generations (dirs with no manifest entry) get reclaimed.
    * Idempotent; safe to run any time. */
  private[graft] def reapStaleGens(spark: SparkSession, root: String): Unit = {
    val fs = fsOf(spark, root)
    val versions = manifestVersions(fs, root)
    val kept = versions.takeRight(ReapKeepVersions)
    val manifests = kept.map(readManifest(fs, root, _))
    val live: Set[Int] = manifests
      .flatMap(mm => mm.classes ++ mm.bands.values.flatten).toSet
    val ceiling = if (live.isEmpty) 0 else live.max
    if (fs.exists(new Path(root))) {
      fs.listStatus(new Path(root)).foreach { st =>
        val n = st.getPath.getName
        val gid =
          if (n.startsWith("classes_g")) n.stripPrefix("classes_g").toIntOption
          else if (n.startsWith("bands_g")) n.stripPrefix("bands_g").toIntOption
          else None
        gid.foreach { id =>
          if (!live.contains(id) && id < ceiling) fs.delete(st.getPath, true)
        }
      }
    }
    versions.dropRight(ReapKeepVersions).foreach(v =>
      fs.delete(new Path(manifestDir(root), f"v$v%05d.txt"), false))
    // a writer crash between fs.create(tmp) and the rename strands a
    // .tmp_v* file; reclaim any whose version a committed manifest
    // already covers (a live writer's in-flight tmp is always at
    // version latest+1, so it survives)
    versions.lastOption.foreach { latest =>
      val dir = manifestDir(root)
      if (fs.exists(dir)) fs.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(".tmp_v"))
          // name shape: .tmp_v<NNNNN>_<nonce> (nonce per attempt)
          n.stripPrefix(".tmp_v").takeWhile(_.isDigit).toIntOption.foreach { v =>
            if (v <= latest) fs.delete(st.getPath, false)
          }
      }
    }
  }

  /** Stage one generation's data files — the classes parquet plus the
    * band index, ranged on (band, k0) so each written file covers a
    * contiguous k0 slice of its band partition (the layout the
    * footer-stat pruning relies on).
    *
    * Both inputs are persisted for the staging window: the classes
    * projection otherwise evaluates THREE times (the classes write,
    * `repartitionByRange`'s range-boundary sampling pass, and the band
    * shuffle itself), and for write/append it is a [[graft.queries
    * .Extensions.classesOf]] aggregation whose every recompute is a
    * full corpus shuffle; the band table is persisted too so the
    * range sampler does not re-run the MinHash signature pass
    * (round-15 measured on x95's lifecycle: 85 jobs → fewer, classes
    * agg evaluated once instead of three times per staged
    * generation). */
  private def stageGeneration(classes: DataFrame, root: String, g: Int,
                              filesPerBand: Int): Unit = {
    val spark = classes.sparkSession
    val staged = classes
      .select(col("sig"), col("cnt"), col("min_id"), col("arr")).persist()
    try {
      // materialize the staged input ONCE before anything consumes it
      // concurrently (racing consumers would each recompute the
      // corpus-scale classesOf aggregation while the cache fills)
      staged.count()
      val bt = graft.queries.Extensions
        .bandTableArr(staged.select(col("sig").as("rep"), col("arr")), "t:")
        .withColumnRenamed("rep", "sig")
        .persist()
      try {
        // The classes parquet write and the band-index write are
        // independent sinks over the materialized staged input —
        // submit them concurrently so the classes write (a cache
        // read + encode + IO pass) back-fills the band side's
        // sampling/shuffle tail (guide §2.6, the compact-fold move).
        val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(pool)
        try {
          val cF = scala.concurrent.Future {
            spark.sparkContext.setJobDescription(s"stage classes g=$g")
            staged.write.parquet(classesDir(root, g))
          }
          val bF = scala.concurrent.Future {
            spark.sparkContext.setJobDescription(s"stage bands g=$g")
            bt.repartitionByRange(
                graft.queries.Extensions.NumBands * filesPerBand,
                col("band"), col("k0"))
              .sortWithinPartitions(col("band"), col("k0"))
              .write.partitionBy("band").parquet(bandsDir(root, g))
          }
          // settle BOTH sinks before propagating any failure (no
          // write may be left in flight when the exception surfaces),
          // under a generous bound instead of Duration.Inf
          val settled = scala.concurrent.Await.result(
            scala.concurrent.Future.sequence(
              Seq(cF, bF).map(_.transform(scala.util.Success(_)))),
            FoldTimeout)
          settled.foreach(_.get)
        } finally {
          pool.shutdown()
          pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS)
        }
      } finally bt.unpersist()
    } finally staged.unpersist()
  }
}
