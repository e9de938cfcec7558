package graft

import graft.pipeline.TrainingPipeline
import graft.pipeline.TrainingPipeline.Config
import graft.queries.Extensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The end-to-end corpus pipeline: every stage's contract holds on
  * the composed output, the whole program is deterministic, and the
  * two placement windows share one shuffle. */
class TrainingPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Sf = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, Sf)

  private lazy val bench: Seq[String] = docs
    .filter(col("doc_id") % 100 === 0)
    .select(explode(Extensions.bigramsExpr).as("bg"))
    .distinct().as[String].collect().toSeq.sorted

  private lazy val cfg = Config(benchBigrams = bench, targetPerLang = 100)
  private lazy val out = TrainingPipeline.prepare(docs, cfg)

  test("composed output honors every stage contract") {
    val rows = out.select(col("doc_id"), col("text"), col("shard"),
        col("pos"), col("n_tok"), col("pack_seq"), col("pack_off"))
      .collect()
    assert(rows.nonEmpty && rows.length < docs.count())

    // dedup: no two survivors share a token set
    val sigs = rows.map(_.getString(1).split(" ").distinct.sorted.mkString(" "))
    assert(sigs.distinct.length == sigs.length)

    // decontamination: no survivor contains a benchmark bigram
    val benchSet = bench.toSet
    rows.foreach { r =>
      val toks = r.getString(1).split(" ")
      val bgs = toks.zip(toks.drop(1)).map { case (a, b) => s"$a $b" }
      assert(!bgs.exists(benchSet), s"doc ${r.getLong(0)} is contaminated")
    }

    // quality: duplicate-bigram fraction within the cutoff
    rows.foreach { r =>
      val toks = r.getString(1).split(" ")
      val uniq = toks.zip(toks.drop(1)).map { case (a, b) => s"$a $b" }
        .distinct.length
      val frac = 1.0 - uniq.toDouble / (toks.length - 1)
      assert(frac <= 0.3 + 1e-12, s"doc ${r.getLong(0)}: $frac")
    }

    // placement: per shard, pos is 1..n and pack offsets walk the
    // cumulative token count in pos order
    rows.groupBy(_.getLong(2)).foreach { case (shard, rs) =>
      val inOrder = rs.sortBy(_.getLong(3))
      assert(inOrder.map(_.getLong(3)).sameElements(1L to rs.length.toLong))
      var offset = 0L
      inOrder.foreach { r =>
        assert(r.getLong(5) == offset / 512 && r.getLong(6) == offset % 512,
          s"doc ${r.getLong(0)} in shard $shard")
        offset += r.getLong(4)
      }
    }
  }

  test("pipeline is deterministic end to end") {
    val a = out.collect().map(_.toString).sorted
    val b = TrainingPipeline.prepare(docs, cfg).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("rank and offset windows share one shard shuffle; survivors cached") {
    out.collect() // finalize the adaptive plan
    val s = out.queryExecution.executedPlan.toString
    // AQE prints final + initial plans; assert on the final section only
    val plan = if (s.contains("== Final Plan =="))
      s.substring(s.indexOf("== Final Plan =="), s.indexOf("== Initial Plan =="))
    else s
    val shardExchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning(shard"))
    assert(shardExchanges == 1, s"expected one shard exchange:\n$plan")
    // both the rates subtree and the main branch must read the
    // persisted survivor set, not recompute the dedup+filter chain
    assert(plan.contains("InMemoryTableScan") || s.contains("InMemoryTableScan"),
      s"survivors not cached:\n$plan")
  }

  test("redact stage scrubs PII before any hashing; clean text is untouched") {
    val dirty = Seq(
      (1L, "email me at a@b.co thanks", "en", "s0"),
      (2L, "call 5551234567 today", "en", "s0"),
      (3L, "all clean words here", "en", "s0")
    ).toDF("doc_id", "text", "lang", "source")
    val got = TrainingPipeline.redact(dirty)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got(1L) == "email me at <EMAIL> thanks")
    assert(got(2L) == "call <NUM> today")
    assert(got(3L) == "all clean words here")
  }

  test("encodeTokens aligns ids with the text token stream, OOV -> 0") {
    val enc = TrainingPipeline.encodeTokens(out.select("doc_id", "text"),
      vocabK = 100, minCount = 2L)
    val rows = enc.select("doc_id", "text", "tok_ids")
      .as[(Long, String, Seq[Long])].collect()
    assert(rows.nonEmpty)
    // rebuild the vocab the same way and check one-to-one alignment
    val counts = scala.collection.mutable.Map.empty[String, Long]
    rows.foreach(_._2.split(" ").foreach(t =>
      counts(t) = counts.getOrElse(t, 0L) + 1))
    val vocab = counts.toSeq.filter(_._2 >= 2L)
      .sortBy { case (t, c) => (-c, t) }.take(100)
      .zipWithIndex.map { case ((t, _), i) => t -> (i + 1L) }.toMap
    rows.foreach { case (id, text, ids) =>
      val toks = text.split(" ")
      assert(ids.length == toks.length, s"doc $id length")
      toks.zip(ids).foreach { case (t, got) =>
        assert(got == vocab.getOrElse(t, 0L), s"doc $id token $t")
      }
    }
  }
}
