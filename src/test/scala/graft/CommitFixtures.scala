package graft

import java.sql.Timestamp
import java.time.Instant
import graft.schema.Protocol._

/** Hand-built commit-shaped fixtures (FIXTURES.md §A): nullable
  * stats/filename/status paths, extension edge cases, tie-breaks,
  * interval bounds. */
object CommitFixtures {

  def t(iso: String): Timestamp =
    Timestamp.from(Instant.parse(iso))

  def file(name: Option[String], status: Option[String] = Some("modified"),
           additions: Int = 0, deletions: Int = 0, changes: Int = 0): File =
    File(Some("fsha"), name, status, additions, deletions, changes,
         None, None, None, None)

  def commit(sha: String,
             date: Timestamp,
             committer: String = "alice",
             repo: String = "apache/flink",
             stats: Option[Stats] = None,
             files: Seq[File] = Nil): Commit = {
    val cu = CommitUser(committer, s"$committer@example.com", date)
    Commit(
      node_id = s"node_$sha",
      sha = sha,
      url = s"https://api.github.com/repos/$repo/commits/$sha",
      commit = CommitData(cu, cu, s"msg $sha", Tree("tsha"), 0,
        Verification(verified = false, "unsigned", None, None)),
      author = None,
      committer = Some(User(1L, committer, "", "User", site_admin = false)),
      parents = Seq(Parent("psha")),
      stats = stats,
      files = files)
  }

  def geo(sha: String, at: Timestamp, continent: String): CommitGeo =
    CommitGeo(sha, at, continent)
}
