package graft

import graft.ops.SketchOverlap
import org.apache.spark.sql.functions.{col, hll_sketch_estimate}
import org.scalatest.funsuite.AnyFunSuite

/** HLL inclusion-exclusion overlap (ops.SketchOverlap): exact in the
  * sketch's small-set regime, candidate-pair path computes only the
  * requested pairs, estimates within bound on overlapping sets.
  * (Gate x63 pins the error bound against the exact rollup on the
  * real corpus.) */
class SketchOverlapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // three keys: A = 0..99, B = 50..149 (|A∩B|=50, |A∪B|=150),
  // C = 200..249 (disjoint from both)
  private lazy val toks =
    ((0 until 100).map(i => ("A", s"t$i")) ++
     (50 until 150).map(i => ("B", s"t$i")) ++
     (200 until 250).map(i => ("C", s"t$i"))).toDF("src", "tok")

  test("small-set regime: inclusion-exclusion recovers exact intersections") {
    val sk = SketchOverlap.keySketches(toks, "src", "tok")
    val got = SketchOverlap.overlapMatrix(sk)
      .select("key_a", "key_b", "n_a", "n_b", "est_inter")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // HLL keeps exact coupon lists well past these cardinalities
    assert(got(("A", "B")) == ("A", "B", 100L, 100L, 50L))
    assert(got(("A", "C")) == ("A", "C", 100L, 50L, 0L))
    assert(got(("B", "C")) == ("B", "C", 100L, 50L, 0L))
    assert(got.size == 3)
  }

  test("overlapPairs computes only the requested candidate pairs") {
    val sk = SketchOverlap.keySketches(toks, "src", "tok")
    val pairs = Seq(("A", "B")).toDF("key_a", "key_b")
    val got = SketchOverlap.overlapPairs(sk, pairs)
      .select("key_a", "key_b", "est_inter", "est_jaccard")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(("A", "B", 50L, 50.0 / 150)))
  }

  test("streaming twin: per-key sketches maintained in update mode equal the batch path") {
    // HLL sketches are MERGEABLE state, so the same keySketches
    // aggregation runs unbounded on a stream: each micro-batch folds
    // into per-key sketch state, update mode re-emits the key's
    // current sketch. The final emission must estimate exactly what
    // the batch sketch over the full data does — mergeability is the
    // whole open-domain scale story, so the twin pins it.
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = toks.as[(String, String)].collect().toSeq
    val in = MemoryStream[(String, String)]
    val q = SketchOverlap.keySketches(in.toDF().toDF("src", "tok"), "src", "tok")
      .select(col("key"), hll_sketch_estimate(col("sk")).as("n"))
      .writeStream.format("memory").queryName("skstream")
      .outputMode("update").start()
    val (b1, b2) = rows.splitAt(rows.size / 2)
    in.addData(b1); q.processAllAvailable()
    in.addData(b2); q.processAllAvailable()
    // last emission per key = the live sketch state
    val emissions = spark.table("skstream").as[(String, Long)].collect().toSeq
    val live = emissions.zipWithIndex.groupBy(_._1._1)
      .map { case (k, v) => k -> v.maxBy(_._2)._1._2 }
    val batch = SketchOverlap.keySketches(toks, "src", "tok")
      .select(col("key"), hll_sketch_estimate(col("sk")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(live == batch, s"live=$live batch=$batch")
    q.stop()
  }

  test("duplicate tokens do not inflate the distinct estimate") {
    val dup = toks.union(toks).union(toks)
    val sk = SketchOverlap.keySketches(dup, "src", "tok")
    val est = SketchOverlap.overlapMatrix(sk)
      .select("key_a", "key_b", "est_inter")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(est(("A", "B")) == 50L)
  }
}
