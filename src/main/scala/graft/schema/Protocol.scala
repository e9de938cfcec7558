package graft.schema

import java.sql.Timestamp
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types.StructType

/** Spark-native data model for the GitHub-commit domain — same shape
  * as the reference's record types
  * (/root/reference/src/main/scala/util/Protocol.scala:7-61), with
  * `java.util.Date` → `java.sql.Timestamp` (Spark TimestampType) and
  * `Option[_]` → nullable columns via product encoders.
  *
  * `Dataset[Commit]` is the typed ingestion boundary; queries work on
  * the DataFrame view where nested access (`$"stats.additions"`,
  * `explode($"files")`) replaces the reference's Option traversals.
  */
object Protocol {

  final case class CommitUser(name: String, email: String, date: Timestamp)

  final case class User(id: Long, login: String, avatar_url: String,
                        `type`: String, site_admin: Boolean)

  final case class Verification(verified: Boolean, reason: String,
                                signature: Option[String], payload: Option[String])

  final case class Stats(total: Int, additions: Int, deletions: Int)

  final case class File(sha: Option[String], filename: Option[String],
                        status: Option[String], additions: Int, deletions: Int,
                        changes: Int, blob_url: Option[String],
                        raw_url: Option[String], contents_url: Option[String],
                        patch: Option[String])

  final case class Parent(sha: String)
  final case class Tree(sha: String)

  final case class CommitData(author: CommitUser, committer: CommitUser,
                              message: String, tree: Tree, comment_count: Int,
                              verification: Verification)

  final case class Commit(node_id: String, sha: String, url: String,
                          commit: CommitData, author: Option[User],
                          committer: Option[User], parents: Seq[Parent],
                          stats: Option[Stats], files: Seq[File])

  final case class CommitGeo(sha: String, createdAt: Timestamp, continent: String)

  final case class CommitSummary(repo: String, date: String,
                                 amountOfCommits: Long, amountOfCommitters: Long,
                                 totalChanges: Long, mostPopularCommitter: String)

  /** Explicit read schemas — `spark.read.schema(commitSchema).json(...)`
    * replaces the reference's reflective json4s parsers
    * (CommitParser.scala:13-22) with a vectorized, schema-checked scan. */
  val commitSchema: StructType = Encoders.product[Commit].schema
  val geoSchema: StructType = Encoders.product[CommitGeo].schema
}
