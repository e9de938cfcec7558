package graft

import graft.queries.Extensions
import org.scalatest.funsuite.AnyFunSuite

/** Sorted-fill compaction planning (x82): hand-pinned bin assignment
  * plus the invariants that make a plan a plan — it partitions the
  * file set, bins are contiguous and follow the sort order, and no
  * bin exceeds target by more than one file's worth. */
class CompactionPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand case: start-offset binning at target 12") {
    val files = Seq((1L, 10L), (2L, 9L), (3L, 5L), (4L, 3L), (5L, 2L), (6L, 1L))
      .toDF("file_id", "bytes")
    val got = Extensions.compactionPlan(files, target = 12L)
      .select("file_id", "bytes", "bin", "bin_files", "bin_bytes")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // sorted desc: 10,9,5,3,2,1 → start offsets 0,10,19,24,27,29
    // → bins 0,0,1,2,2,2
    assert(got.toSeq == Seq(
      (1L, 10L, 0L, 2L, 19L),
      (2L, 9L, 0L, 2L, 19L),
      (3L, 5L, 1L, 1L, 5L),
      (4L, 3L, 2L, 3L, 6L),
      (5L, 2L, 2L, 3L, 6L),
      (6L, 1L, 2L, 3L, 6L)))
  }

  test("invariants on the real corpus") {
    val target = 4096L
    val files = Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("doc_id AS file_id", "n_chars AS bytes")
    val plan = Extensions.compactionPlan(files, target)
      .as[(Long, Long, Long, Long, Long)].collect()
    // partition: every file exactly once, total bytes preserved
    assert(plan.map(_._1).distinct.length == plan.length)
    val byBin = plan.groupBy(_._3)
    byBin.foreach { case (_, fs) =>
      assert(fs.map(_._2).sum == fs.head._5) // bin_bytes consistent
      assert(fs.length == fs.head._4)        // bin_files consistent
    }
    // bins contiguous from 0
    val bins = byBin.keys.toSeq.sorted
    assert(bins == (0L until bins.length.toLong))
    // sort-order monotone: bin is non-decreasing along (bytes desc, id)
    val sorted = plan.sortBy(f => (-f._2, f._1)).map(_._3)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    // size bound: a bin overflows target by less than one member file
    byBin.foreach { case (_, fs) =>
      val maxFile = fs.map(_._2).max
      assert(fs.head._5 < target + maxFile)
    }
  }
}
