package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.ops.Cols

/** Column helpers vs. a direct Scala port of the reference logic
  * (FlinkAssignment.scala:88 extension, :174-183 extractRepo). */
class ColsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Verbatim port of the reference's extractRepo. */
  private def refExtractRepo(url: String): String = {
    val cleaned = url.replaceAll("\\?.*$", "")
    val parts = cleaned.split("/")
    val idxRepos = parts.indexOf("repos")
    if (idxRepos >= 0 && idxRepos + 2 < parts.length)
      s"${parts(idxRepos + 1)}/${parts(idxRepos + 2)}"
    else if (parts.length >= 4)
      s"${parts(parts.length - 3)}/${parts(parts.length - 2)}"
    else cleaned
  }

  test("repoFromUrl matches the reference on API urls, query strings, and fallbacks") {
    val urls = Seq(
      "https://api.github.com/repos/apache/flink/commits/abc",
      "https://api.github.com/repos/apache/flink/commits/abc?page=2&per_page=1",
      "https://github.com/apache/flink/commit/abc",  // no "repos": positional fallback
      "https://example.com/x",                       // <4 segments: cleaned url
      "http://h/a/b/c",                              // exactly 4 segments
      "https://api.github.com/repos/o/r")            // repos present, r is last
    val got = urls.toDF("url")
      .select(col("url"), Cols.repoFromUrl(col("url")).as("repo"))
      .as[(String, String)].collect().toMap
    urls.foreach { u => assert(got(u) == refExtractRepo(u), s"url=$u") }
  }

  test("fileExtension matches the reference's split-lastOption semantics") {
    val cases = Seq(
      "A.java" -> "java", "tar.gz.java" -> "java", "java" -> "java",
      "README" -> "README", "x.py" -> "py", "name." -> "name")
    val got = cases.map(_._1).toDF("name")
      .select(col("name"), Cols.fileExtension(col("name")).as("ext"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (n, e) =>
      assert(got(n) == e, s"name=$n")
      assert(got(n) == n.split("\\.").lastOption.getOrElse(""), s"ref parity: $n")
    }
  }
}
