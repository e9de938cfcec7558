package graft.queries

import graft.ops.Cols._
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.Protocol.{Commit, CommitGeo}

/** Batch implementations of the reference's nine queries
  * (/root/reference/src/main/scala/FlinkAssignment.scala:54-348) over
  * commit-shaped DataFrames. Streaming (incremental-emission)
  * variants live in [[graft.streaming.CommitStreams]].
  *
  * Input: a DataFrame with [[graft.schema.Protocol.commitSchema]]
  * (and [[graft.schema.Protocol.geoSchema]] for q8). The reference's
  * `Option` traversals become SQL three-valued logic — `Option.exists`
  * ≡ null-safe comparison, `Option.flatMap` drop ≡ `isNotNull`
  * filter, `getOrElse` ≡ `coalesce`.
  */
object CommitQueries {

  private val ts: Column = col("commit.committer.date")

  /** Ingestion: newline-delimited JSON with the explicit schema —
    * replaces CommitParser (reference CommitParser.scala:13-22). */
  def readCommits(spark: SparkSession, path: String): Dataset[Commit] = {
    import spark.implicits._
    spark.read.schema(graft.schema.Protocol.commitSchema).json(path).as[Commit]
  }

  def readGeo(spark: SparkSession, path: String): Dataset[CommitGeo] = {
    import spark.implicits._
    spark.read.schema(graft.schema.Protocol.geoSchema).json(path).as[CommitGeo]
  }

  /** FlinkAssignment.scala:54-56 — sha projection. */
  def dummy(commits: DataFrame): DataFrame = commits.select(col("sha"))

  /** Q1 (:62-66): shas of commits with ≥20 additions. `stats` is
    * nullable; `Option.exists` semantics = 3VL `>=` (NULL drops). */
  def q1(commits: DataFrame): DataFrame =
    commits.filter(col("stats.additions") >= 20).select(col("sha"))

  /** Q2 (:72-77): filenames of files with >30 deletions. */
  def q2(commits: DataFrame): DataFrame =
    commits.select(explode(col("files")).as("file"))
      .filter(col("file.deletions") > 30 && col("file.filename").isNotNull)
      .select(col("file.filename").as("filename"))

  /** Q3 (:83-97) final totals: counts of .java / .scala files. */
  def q3(commits: DataFrame): DataFrame =
    commits.select(explode(col("files")).as("file"))
      .select(fileExtension(col("file.filename")).as("ext"))
      .filter(col("ext").isin("java", "scala"))
      .groupBy(col("ext")).agg(count(lit(1)).as("cnt"))

  /** Q4 (:103-115) final totals: total changes per (.js/.py, status). */
  def q4(commits: DataFrame): DataFrame =
    commits.select(explode(col("files")).as("file"))
      .filter(col("file.filename").endsWith(".js") ||
              col("file.filename").endsWith(".py"))
      .select(
        when(col("file.filename").endsWith(".js"), ".js").otherwise(".py").as("ext"),
        coalesce(col("file.status"), lit("unknown")).as("status"),
        col("file.changes").as("changes"))
      .groupBy(col("ext"), col("status"))
      .agg(sum(col("changes")).as("changes"))

  /** Q5 (:122-134): commits per calendar day (non-keyed tumbling
    * window, epoch/UTC-aligned like Flink's day windows). */
  def q5(commits: DataFrame): DataFrame =
    commits.groupBy(window(ts, "1 day"))
      .agg(count(lit(1)).as("cnt"))
      .select(dayKey(col("window.start")).as("date"), col("cnt"))

  /** Q6 (:141-155): small/large commit counts per 48h window sliding
    * by 12h (each event lands in 4 overlapping windows). */
  def q6(commits: DataFrame): DataFrame =
    commits.select(window(ts, "48 hours", "12 hours").as("w"),
        when(coalesce(col("stats.total"), lit(0)) > 20, "large")
          .otherwise("small").as("commit_type"))
      .groupBy(col("w"), col("commit_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("commit_type"), col("cnt"))

  /** Q7 (:172-239): per (repo, day) summary — commit count, distinct
    * committers, total changes, modal committer with alphabetical
    * comma-joined ties — kept only when >20 commits and ≤2
    * committers. Two-level aggregation: per-committer counts first,
    * then the day rollup + mode, so no group ever buffers raw commits
    * (the reference's ProcessWindowFunction buffers the whole window). */
  def q7(commits: DataFrame): DataFrame = {
    val perCommitter = commits
      .select(repoFromUrl(col("url")).as("repo"),
              window(ts, "1 day").getField("start").as("day"),
              col("commit.committer.name").as("committer"),
              coalesce(col("stats.total"), lit(0)).as("total"))
      .groupBy(col("repo"), col("day"), col("committer"))
      .agg(count(lit(1)).as("ccnt"), sum(col("total")).as("cchanges"))
    perCommitter
      .groupBy(col("repo"), col("day"))
      .agg(sum(col("ccnt")).as("amountOfCommits"),
           count(lit(1)).as("amountOfCommitters"),
           sum(col("cchanges")).as("totalChanges"),
           max(col("ccnt")).as("mx"),
           collect_list(struct(col("ccnt"), col("committer"))).as("pairs"))
      .filter(col("amountOfCommits") > 20 && col("amountOfCommitters") <= 2)
      .select(col("repo"), dayKey(col("day")).as("date"),
        col("amountOfCommits"), col("amountOfCommitters"), col("totalChanges"),
        array_join(array_sort(transform(
          filter(col("pairs"), p => p.getField("ccnt") === col("mx")),
          p => p.getField("committer"))), ",").as("mostPopularCommitter"))
  }

  /** Q8 (:249-291): weekly java-file changes per continent via the
    * interval join — geo events within [commit.ts − 1h, commit.ts + 30m]
    * (bounds inclusive, FlinkAssignment.scala:277). The weekly window
    * is assigned from `greatest(commit.ts, geo.createdAt)`: Flink's
    * intervalJoin timestamps each emitted pair with
    * `max(leftTs, rightTs)`, so a pair whose geo event crosses a
    * 7-day boundary lands in the later week. */
  def q8(commits: DataFrame, geo: DataFrame): DataFrame = {
    val javaFiles = commits
      .select(col("sha"), ts.as("c_ts"), explode(col("files")).as("file"))
      .filter(col("file.filename").endsWith(".java"))
      .select(col("sha"), col("c_ts"), col("file.changes").as("changes"))
    javaFiles.join(geo,
        javaFiles("sha") === geo("sha") &&
          geo("createdAt") >= col("c_ts") - expr("INTERVAL 1 HOUR") &&
          geo("createdAt") <= col("c_ts") + expr("INTERVAL 30 MINUTE"))
      .groupBy(window(greatest(col("c_ts"), col("createdAt")), "7 days")
                 .getField("start").as("week"),
               col("continent"))
      .agg(sum(col("changes")).as("changes"))
      .select(col("week"), col("continent"), col("changes"))
  }

  /** Q9 (:299-348): files added then removed within one day, per
    * (repo, filename) — the CEP `followedBy ... within(1 day)`
    * rewritten as a semi-join: one output row per 'added' event that
    * has a matching later 'removed' (the reference emits the 'added'
    * binding of each match). */
  def q9(commits: DataFrame): DataFrame = {
    val fileEvents = commits
      .select(repoFromUrl(col("url")).as("repo"), ts.as("ets"),
              explode(col("files")).as("file"))
      .filter(col("file.filename").isNotNull &&
              col("file.status").isin("added", "removed"))
      .select(col("repo"), col("file.filename").as("filename"),
              col("file.status").as("status"), col("ets"))
    val added = fileEvents.filter(col("status") === "added")
    val removed = fileEvents.filter(col("status") === "removed")
      .select(col("repo").as("r_repo"), col("filename").as("r_name"),
              col("ets").as("r_ts"))
    added.join(removed,
        col("repo") === col("r_repo") && col("filename") === col("r_name") &&
          col("r_ts") >= col("ets") &&
          col("r_ts") <= col("ets") + expr("INTERVAL 1 DAY"),
        "left_semi")
      .select(col("repo"), col("filename"))
  }
}
