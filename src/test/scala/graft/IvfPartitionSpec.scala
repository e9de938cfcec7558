package graft

import graft.ops.Ivf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The cell-partitioned layout must prune at the SCAN: a probe
  * restricted to two cells reads only those cells' directories
  * (PartitionFilters in the parquet scan), and returns exactly the
  * rows a post-scan filter would. */
class IvfPartitionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("probe scans only the probed cells' partitions") {
    val d = "/root/testdata/sf0.001"
    val v = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val cents = v.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val assigned = Ivf.assignCells(v, cents)
    val path = Files.createTempDirectory("graft-ivf").toString + "/cells"
    Ivf.writeCellPartitioned(assigned, path)

    val probed = spark.read.parquet(path).filter(col("cell").isin(2, 5))
    val got = probed.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val want = assigned.filter(col("cell").isin(2, 5))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)

    probed.collect()
    val scan = probed.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), s"no partition pruning:\n$scan")
    assert(scan.contains("cell#") || scan.contains("cell IN") ||
      scan.contains("(cell"), s"cell filter not pushed to partitions:\n$scan")
  }
}
