package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Drives [[Sources.zorderWrite]] end-to-end: round-trip fidelity and
  * the property the layout exists for — every output file's min/max
  * footprint boxes BOTH dimensions well under the global range, so
  * file-stat pruning works for predicates on either column. */
class ZOrderWriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("z-ordered files box both dimensions; round trip is lossless") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long").as("day"))
    val out = "/tmp/zorder_spec"
    Sources.zorderWrite(o, "o_custkey", "day", out, 8)

    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length == 8, files.mkString(","))

    // round trip: same rows, helper column gone
    val back = spark.read.parquet(out)
    assert(back.columns.sorted.toSeq == Seq("day", "o_custkey", "o_orderkey"))
    assert(back.count() == o.count())
    assert(back.except(o).isEmpty && o.except(back).isEmpty)

    // locality: per-file width of EACH dimension, averaged, is well
    // under the global width — a single-column sort would leave the
    // other dimension's per-file width at ~100% of global
    val global = o.agg(
      (max(col("o_custkey")) - min(col("o_custkey"))).as("xw"),
      (max(col("day")) - min(col("day"))).as("yw"))
      .collect().head
    val widths = files.map { f =>
      val r = spark.read.parquet(f).agg(
        (max(col("o_custkey")) - min(col("o_custkey"))).as("xw"),
        (max(col("day")) - min(col("day"))).as("yw")).collect().head
      (r.getLong(0).toDouble, r.getLong(1).toDouble)
    }
    val xFrac = widths.map(_._1).sum / widths.length / global.getLong(0)
    val yFrac = widths.map(_._2).sum / widths.length / global.getLong(1)
    assert(xFrac <= 0.8, s"x not boxed: mean per-file width = $xFrac of global")
    assert(yFrac <= 0.8, s"y not boxed: mean per-file width = $yFrac of global")
    // and jointly: the mean box AREA is a small fraction of the plane,
    // the actual pruning measure for two-dimensional predicates
    val areaFrac = widths.map(w => w._1 * w._2).sum / widths.length /
      (global.getLong(0).toDouble * global.getLong(1))
    assert(areaFrac <= 0.4, s"mean box area = $areaFrac of the plane")
  }

  test("constant column degenerates to a single-column sort, losslessly") {
    // max == min on one dimension: the grid formula's greatest(range, 1)
    // guard maps every value to cell 0 and the layout becomes a plain
    // sort on the other column — no div-by-zero, no row loss
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, 7L, i % 97)).toDF("id", "k", "v")
    val out = "/tmp/zorder_const_spec"
    Sources.zorderWrite(df, "k", "v", out, 4)
    val back = spark.read.parquet(out)
    assert(back.count() == 1000)
    assert(back.except(df).isEmpty && df.except(back).isEmpty)
    // v (the live dimension) is still boxed per file
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    val widths = files.map { f =>
      val r = spark.read.parquet(f)
        .agg((max(col("v")) - min(col("v"))).as("w")).collect().head
      r.getLong(0).toDouble
    }
    assert(widths.sum / widths.length / 96.0 <= 0.5,
      "live dimension not clustered when the other is constant")
  }
}
