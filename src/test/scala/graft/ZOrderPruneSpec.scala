package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import scala.jdk.CollectionConverters._

/** The end-to-end point of [[Sources.zorderWrite]]: a narrow predicate
  * on EITHER z-ordered column must be satisfiable by a strict subset
  * of the output files, judged by the min/max statistics actually
  * present in the parquet footers — the same statistics Spark's
  * vectorized reader (and any lakehouse file-skipping layer) consults
  * when a pushed filter prunes row groups. A single-column sort would
  * pass this for its own column only; Z-order must pass for both.
  */
class ZOrderPruneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Per-file (min, max) of an INT64 column, merged across the file's
    * row groups, straight from the parquet footer. */
  private def footerRange(file: String, column: String): (Long, Long) = {
    val in = HadoopInputFile.fromPath(new Path(file), new Configuration())
    val rd = ParquetFileReader.open(in)
    try {
      val ranges = rd.getFooter.getBlocks.asScala.map { block =>
        val cc = block.getColumns.asScala
          .find(_.getPath.toDotString == column)
          .getOrElse(fail(s"column $column missing from footer of $file"))
        val st = cc.getStatistics
        assert(st != null && !st.isEmpty, s"no stats for $column in $file")
        (st.genericGetMin.asInstanceOf[Long],
          st.genericGetMax.asInstanceOf[Long])
      }
      (ranges.map(_._1).min, ranges.map(_._2).max)
    } finally rd.close()
  }

  test("footer stats prune files for predicates on either dimension") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long").as("day"))
    val out = "/tmp/zorder_prune_spec"
    val nFiles = 16
    Sources.zorderWrite(o, "o_custkey", "day", out, nFiles)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length == nFiles)

    val g = o.agg(min(col("o_custkey")).as("xlo"), max(col("o_custkey")).as("xhi"),
      min(col("day")).as("ylo"), max(col("day")).as("yhi")).collect().head
    // a predicate 1/16th of the global range wide, placed at 9/32 of
    // the domain: inside the second top-level quartile, clear of the
    // 1/4 and 1/2 boundaries where the Morton key's top bits flip (a
    // probe straddling those legitimately touches files on both sides)
    def probe(lo: Long, hi: Long): (Long, Long) = {
      val w = math.max((hi - lo) / 16, 1L)
      val s = lo + 9 * (hi - lo) / 32
      (s, s + w)
    }
    val (xs, xe) = probe(g.getLong(0), g.getLong(1))
    val (ys, ye) = probe(g.getLong(2), g.getLong(3))

    def survivors(column: String, s: Long, e: Long): Int =
      files.count { f =>
        val (mn, mx) = footerRange(f, column)
        mx >= s && mn <= e // file's stat range intersects the predicate
      }
    val xFiles = survivors("o_custkey", xs, xe)
    val yFiles = survivors("day", ys, ye)
    assert(xFiles < nFiles / 2,
      s"x predicate [$xs,$xe] touches $xFiles of $nFiles files — no pruning")
    assert(yFiles < nFiles / 2,
      s"y predicate [$ys,$ye] touches $yFiles of $nFiles files — no pruning")

    // non-vacuous: both probes select real rows, and reading through the
    // surviving files alone returns exactly the full-scan answer
    val back = spark.read.parquet(out)
    val xRows = back.filter(col("o_custkey").between(xs, xe)).count()
    val yRows = back.filter(col("day").between(ys, ye)).count()
    assert(xRows > 0 && yRows > 0)
    val xSurvivorPaths = files.filter { f =>
      val (mn, mx) = footerRange(f, "o_custkey"); mx >= xs && mn <= xe
    }
    val viaSurvivors = spark.read.parquet(xSurvivorPaths: _*)
      .filter(col("o_custkey").between(xs, xe)).count()
    assert(viaSurvivors == xRows, "pruned file set lost rows")
  }
}
