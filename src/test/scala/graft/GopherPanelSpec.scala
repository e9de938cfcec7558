package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The native per-row Gopher panel ([[graft.functions.GopherPanel]])
  * against the round-14 DISTRIBUTED engine
  * ([[graft.queries.Extensions.gopherRepetitionExploded]]: 9-n
  * positional explode + count shuffle + start-set joins + coverage
  * HOF) — bit-for-bit on the real corpus, at the exact setting and
  * under the mod-4 dup-identity winnow the x96 gate runs. The
  * exploded engine is itself oracle-pinned (the gate's DuckDB SQL
  * replays it), so this equality chains the per-row pass to the
  * oracle. Plus the edge fixtures the per-row rewrite could get
  * wrong on its own: empty/whitespace texts, sub-window docs, the
  * truncation cap. */
class GopherPanelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")
    .select(col("doc_id"), col("text"))

  private def key(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toVector).sortBy(_.head.asInstanceOf[Long]).toSeq

  test("per-row panel equals the exploded engine on the real corpus (exact)") {
    val got = key(graft.queries.Extensions.gopherRepetition(docs))
    val want = key(graft.queries.Extensions.gopherRepetitionExploded(docs))
    assert(got.nonEmpty && got == want)
  }

  test("per-row panel equals the exploded engine under the gate's mod-4 winnow") {
    val got = key(graft.queries.Extensions.gopherRepetition(docs, dupWinnow = 4))
    val want = key(graft.queries.Extensions
      .gopherRepetitionExploded(docs, dupWinnow = 4))
    assert(got.nonEmpty && got == want)
  }

  test("edge fixtures: empty text, all-space text, sub-window docs, " +
    "single repeated token") {
    val fix = Seq(
      (1L, ""),                         // one empty token, n_chars 0
      (2L, "   "),                      // 4 empty tokens, n_chars 0
      (3L, "a"),                        // no window for any n
      (4L, "a b c d"),                  // windows for n<=4 only
      (5L, "x x x x x x x x x x x x"),  // everything duplicated
      (6L, "a b a b a b a b a b a b")   // alternating dup grams
    ).toDF("doc_id", "text")
    val got = key(graft.queries.Extensions.gopherRepetition(fix))
    val want = key(graft.queries.Extensions.gopherRepetitionExploded(fix))
    assert(got == want, s"got:\n${got.mkString("\n")}\nwant:\n${want.mkString("\n")}")
    // spot-pin the extremes: empty docs report all-zero permilles;
    // the all-duplicate doc reports 1000 on every dup n it has
    // windows for
    val byId = got.map(r => r.head -> r.tail).toMap
    assert(byId(1L).forall(v => v == 0L))
    assert(byId(2L).forall(v => v == 0L))
    assert(byId(5L).drop(1).drop(3).forall(_ == 1000L),
      s"12 identical tokens: every dup fraction is full coverage: ${byId(5L)}")
  }

  test("the per-row engine's plan carries NO shuffle beyond the " +
    "output sort's range partitioning") {
    val plan = graft.queries.Extensions.gopherRepetition(docs)
      .queryExecution.executedPlan
    val exchanges = "Exchange ".r.findAllIn(plan.toString).length
    assert(exchanges <= 1,
      s"per-doc statistic must not shuffle (1 range exchange for the " +
        s"ordered() output allowed), got $exchanges:\n$plan")
  }

  test("streaming twin's truncation cap: a doc over maxTokens is " +
    "scored on its prefix and flagged") {
    val longText = (1 to 50).map(i => s"t$i").mkString(" ")
    val fix = Seq((1L, longText), (2L, "a b a b a b")).toDF("doc_id", "text")
    val got = graft.streaming.DocStreams
      .gopherRepetitionStream(fix, maxTokens = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(r.length - 1), r.getLong(1))).toMap
    assert(got(1L)._1 && !got(2L)._1, s"truncation flags: $got")
    // prefix scoring: n_chars counts only the first 10 tokens
    val prefixChars = (1 to 10).map(i => s"t$i".length).sum
    assert(got(1L)._2 == prefixChars.toLong)
    // and the capped doc's panel equals the batch panel of its prefix
    val capped = graft.streaming.DocStreams
      .gopherRepetitionStream(fix.filter(col("doc_id") === 1L), maxTokens = 10)
      .drop("truncated")
    val prefix = graft.queries.Extensions.gopherRepetition(
      Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text"))
    assert(key(capped) == key(prefix.toDF(capped.columns.toIndexedSeq: _*)))
  }
}
