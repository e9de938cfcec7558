package graft

import graft.functions.FreqCandidatesAgg
import graft.functions.FreqCandidatesAgg.freqCandidates
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable
import scala.util.Random

/** Misra-Gries heavy-hitter candidate aggregate: the state machine's
  * guarantee (no item above n/(k+1) is ever evicted), the mergeable-
  * summaries combine, and the end-to-end exact-recount equality that
  * x46 builds on. */
class FreqCandidatesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---------------------------------------------------- state machine
  test("observe: k counters never exceeded; a miss on a full map decrements all") {
    val buf = mutable.HashMap.empty[String, Long]
    Seq("a", "a", "b", "c").foreach(FreqCandidatesAgg.observe(buf, _, k = 2))
    // after a,a,b the map is full {a->2, b->1}; the miss on c
    // decrements both and drops b
    assert(buf == mutable.HashMap("a" -> 1L))
    assert(buf.size <= 2)
  }

  test("guarantee: any item with freq > n/(k+1) survives every permutation") {
    val k = 3
    val items = Seq.fill(40)("hot") ++ (1 to 60).map(i => s"cold$i") // n=100
    // hot freq 40 > 100/4 = 25 -> must survive; try adversarial orders
    for (seed <- 1 to 10) {
      val buf = mutable.HashMap.empty[String, Long]
      new Random(seed).shuffle(items).foreach(
        FreqCandidatesAgg.observe(buf, _, k))
      assert(buf.contains("hot"), s"seed $seed evicted the heavy hitter: $buf")
      assert(buf.size <= k)
    }
  }

  test("combine: preserves the guarantee across arbitrary buffer splits") {
    val k = 3
    val items = Seq.fill(40)("hot") ++ (1 to 60).map(i => s"cold$i")
    for (seed <- 1 to 10) {
      val rnd = new Random(seed)
      val parts = rnd.shuffle(items).grouped(17).toSeq
      val bufs = parts.map { p =>
        val b = mutable.HashMap.empty[String, Long]
        p.foreach(FreqCandidatesAgg.observe(b, _, k))
        b
      }
      val merged = bufs.reduce(FreqCandidatesAgg.combine(_, _, k))
      assert(merged.contains("hot"), s"seed $seed lost the heavy hitter in merge")
      assert(merged.size <= k)
    }
  }

  // ------------------------------------------------------- DataFrame
  test("sketch output is a sorted candidate array bounded by k, superset of true HHs") {
    val k = 5
    val rows = (Seq.fill(300)("alpha") ++ Seq.fill(200)("beta") ++
      (1 to 400).map(i => s"tail$i")) // n=900; HH threshold 900/6=150
    for (parts <- Seq(1, 3, 13)) {
      val df = rows.toDF("tok").repartition(parts)
      val cand = df.agg(freqCandidates($"tok", k).as("c"))
        .as[Seq[String]].collect().head
      assert(cand.length <= k)
      assert(cand == cand.sorted)
      assert(cand.contains("alpha") && cand.contains("beta"),
        s"parts=$parts candidates missed a true heavy hitter: $cand")
    }
  }

  test("x46 shape: candidate recount + threshold equals the exact groupBy truth") {
    val k = 4
    val rnd = new Random(7)
    val rows = (1 to 2000).map { _ =>
      val r = rnd.nextInt(100)
      if (r < 35) "w1" else if (r < 60) "w2" else if (r < 70) "w3"
      else s"rare${rnd.nextInt(500)}"
    }
    val toks = rows.toDF("tok").repartition(11)
    val n = rows.size.toLong
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (k + 1) > n }.toMap
    val cand = toks.agg(freqCandidates($"tok", k).as("c"))
      .select(explode($"c").as("tok"))
    val got = toks.join(broadcast(cand), Seq("tok"), "left_semi")
      .groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" * (k + 1) > n)
      .as[(String, Long)].collect().toMap
    assert(got == truth, s"got $got, want $truth")
  }

  test("serde round-trips the buffer exactly") {
    val agg = FreqCandidatesAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), k = 8)
    val buf = mutable.HashMap("a" -> 3L, "ü" -> 1L, "" -> 9L)
    assert(agg.deserialize(agg.serialize(buf)) == buf)
  }
}
