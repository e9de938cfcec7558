package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.queries.CommitQueries
import graft.schema.Protocol._
import CommitFixtures._

/** Semantics of the nine reference queries against hand-built
  * fixtures, including the FIXTURES.md §A edge cases: missing stats,
  * missing filename/status, extension corner cases, committer ties,
  * interval-join bounds, and the 1-day CEP `within` boundary. */
class CommitQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(cs: Commit*): DataFrame = cs.toDS().toDF()

  test("q1 keeps >=20 additions, drops missing stats (Option.exists semantics)") {
    val in = df(
      commit("a", t("2019-06-26T10:00:00Z"), stats = Some(Stats(25, 20, 5))),
      commit("b", t("2019-06-26T11:00:00Z"), stats = Some(Stats(25, 19, 6))),
      commit("c", t("2019-06-26T12:00:00Z"), stats = None))
    assert(CommitQueries.q1(in).as[String].collect().toSet == Set("a"))
  }

  test("q2 filters deletions > 30 and drops null filenames") {
    val in = df(commit("a", t("2019-06-26T10:00:00Z"), files = Seq(
      file(Some("big.scala"), deletions = 31),
      file(Some("edge.scala"), deletions = 30),
      file(None, deletions = 99))))
    assert(CommitQueries.q2(in).as[String].collect().toSet == Set("big.scala"))
  }

  test("q3 counts java/scala via last-dot extension, ignores others") {
    // "java" (dotless) counts: the reference's split(".").lastOption
    // returns the whole name when there is no dot
    val in = df(commit("a", t("2019-06-26T10:00:00Z"), files = Seq(
      file(Some("A.java")), file(Some("B.java")), file(Some("C.scala")),
      file(Some("README")), file(Some("x.py")), file(Some("tar.gz.java")),
      file(Some("java")), file(None))))
    val got = CommitQueries.q3(in).as[(String, Long)].collect().toMap
    assert(got == Map("java" -> 4L, "scala" -> 1L))
  }

  test("q4 sums changes per (.js/.py, status) with unknown default") {
    val in = df(commit("a", t("2019-06-26T10:00:00Z"), files = Seq(
      file(Some("app.js"), Some("modified"), changes = 10),
      file(Some("app.js"), Some("modified"), changes = 5),
      file(Some("util.py"), None, changes = 7),
      file(Some("Main.java"), Some("added"), changes = 100))))
    val got = CommitQueries.q4(in).as[(String, String, Long)].collect().toSet
    assert(got == Set((".js", "modified", 15L), (".py", "unknown", 7L)))
  }

  test("q5 tumbling day windows, dd-MM-yyyy keys (README example shape)") {
    val in = df(
      commit("a", t("2019-06-26T00:00:00Z")),
      commit("b", t("2019-06-26T23:59:59Z")),
      commit("c", t("2019-06-27T00:00:00Z")))
    val got = CommitQueries.q5(in).as[(String, Long)].collect().toMap
    assert(got == Map("26-06-2019" -> 2L, "27-06-2019" -> 1L))
  }

  test("q6 sliding 48h/12h windows: each event in 4 windows; null stats = small") {
    val in = df(
      commit("a", t("2019-06-26T13:00:00Z"), stats = Some(Stats(21, 0, 0))),
      commit("b", t("2019-06-26T13:30:00Z"), stats = None))
    val got = CommitQueries.q6(in)
      .as[(java.sql.Timestamp, String, Long)].collect()
    assert(got.count(_._2 == "large") == 4)
    assert(got.count(_._2 == "small") == 4)
    // both events share the same 4 epoch-aligned window starts
    assert(got.map(_._1).distinct.length == 4)
    val starts = got.map(_._1.toInstant.toString).distinct.sorted
    assert(starts.head == "2019-06-25T00:00:00Z") // epoch-aligned 12h grid
  }

  test("q7 summary with HAVING gate and alphabetical tie join (README tie example)") {
    val day = "2019-06-26"
    // 22 commits: georgios 7, jeroen 7, wouter 7, solo 1 -> 4 committers (fails gate)
    // second repo: georgios 11, jeroen 11 -> 22 commits, 2 committers, tie
    val busy = (1 to 11).flatMap { i =>
      Seq(
        commit(s"g$i", t(f"${day}T${i + 1}%02d:00:00Z"), committer = "georgios",
               repo = "tudelft/bdp", stats = Some(Stats(2, 1, 1))),
        commit(s"j$i", t(f"${day}T${i + 1}%02d:30:00Z"), committer = "jeroen",
               repo = "tudelft/bdp", stats = Some(Stats(3, 2, 1))))
    }
    val crowded = (1 to 21).map { i =>
      commit(s"c$i", t(f"${day}T${i % 23}%02d:15:00Z"),
             committer = s"dev${i % 4}", repo = "many/committers")
    }
    val got = CommitQueries.q7(df(busy ++ crowded: _*))
      .as[(String, String, Long, Long, Long, String)].collect()
    assert(got.length == 1)
    val (repo, date, n, nc, changes, top) = got.head
    assert(repo == "tudelft/bdp" && date == "26-06-2019")
    assert(n == 22 && nc == 2 && changes == 11 * 5)
    assert(top == "georgios,jeroen") // tie, alphabetical, comma-joined
  }

  test("q8 interval join honors inclusive [-1h, +30m] bounds") {
    val cts = t("2019-06-26T12:00:00Z")
    val commits = df(commit("s1", cts, files = Seq(
      file(Some("A.java"), Some("modified"), changes = 5))))
    val geos = Seq(
      geo("s1", t("2019-06-26T11:00:00Z"), "Europe"),   // exactly -1h: in
      geo("s1", t("2019-06-26T12:30:00Z"), "Asia"),     // exactly +30m: in
      geo("s1", t("2019-06-26T10:59:59Z"), "Africa"),   // 1s early: out
      geo("s1", t("2019-06-26T12:30:01Z"), "America"))  // 1s late: out
      .toDS().toDF()
    val got = CommitQueries.q8(commits, geos)
      .as[(java.sql.Timestamp, String, Long)].collect()
    assert(got.map(r => r._2 -> r._3).toSet == Set("Europe" -> 5L, "Asia" -> 5L))
  }

  test("q9 added-then-removed within one day, inclusive boundary, per added event") {
    val mk = (sha: String, ts0: String, name: String, status: String) =>
      commit(sha, t(ts0), files = Seq(file(Some(name), Some(status))))
    val in = df(
      mk("a1", "2019-06-26T10:00:00Z", "doomed.txt", "added"),
      mk("r1", "2019-06-27T10:00:00Z", "doomed.txt", "removed"), // exactly 1 day: in
      mk("a2", "2019-06-26T10:00:00Z", "survivor.txt", "added"),
      mk("r2", "2019-06-27T10:00:01Z", "survivor.txt", "removed"), // 1s past: out
      mk("a3", "2019-06-28T10:00:00Z", "orphan.txt", "added"),
      mk("r0", "2019-06-25T10:00:00Z", "reverse.txt", "removed"),
      mk("a4", "2019-06-25T11:00:00Z", "reverse.txt", "added"))
    val got = CommitQueries.q9(in).as[(String, String)].collect().toSeq
    assert(got == Seq(("apache/flink", "doomed.txt")))
  }

  test("json ingestion with explicit schema replaces the reflective parser") {
    val line =
      """{"node_id":"n1","sha":"abc","url":"https://api.github.com/repos/o/r/commits/abc",
        |"commit":{"author":{"name":"a","email":"e","date":"2019-06-26T10:00:00Z"},
        |"committer":{"name":"a","email":"e","date":"2019-06-26T10:00:00Z"},
        |"message":"m","tree":{"sha":"t"},"comment_count":0,
        |"verification":{"verified":false,"reason":"r"}},
        |"parents":[{"sha":"p"}],"stats":{"total":30,"additions":25,"deletions":5},
        |"files":[{"filename":"A.java","status":"added","additions":1,"deletions":0,"changes":1}]}"""
        .stripMargin.replaceAll("\n", "")
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toFile
    val f = new java.io.File(dir, "commits.json")
    java.nio.file.Files.writeString(f.toPath, line)
    val ds = CommitQueries.readCommits(spark, f.getAbsolutePath)
    val c = ds.collect().head
    assert(c.sha == "abc" && c.stats.contains(Stats(30, 25, 5)))
    assert(c.files.head.filename.contains("A.java"))
    assert(CommitQueries.q1(ds.toDF()).count() == 1)
  }
}
