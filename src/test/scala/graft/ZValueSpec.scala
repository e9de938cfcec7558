package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.functions.ZValue

/** Hand-computed pins of the Morton interleave plus the locality
  * property Z-ordering exists for: a contiguous z-range confines BOTH
  * source dimensions to narrow sub-ranges. */
class ZValueSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-pinned interleaves") {
    // x = 101b on even bits -> 010001b; y = 011b on odd bits -> 001010b
    assert(ZValue.compute(5L, 3L) == 27L)
    assert(ZValue.compute(0L, 0L) == 0L)
    assert(ZValue.compute(1L, 0L) == 1L)
    assert(ZValue.compute(0L, 1L) == 2L)
    // all 31 x-bits set, y = 0: every even bit of the 62-bit result
    assert(ZValue.compute(0x7FFFFFFFL, 0L) == 0x1555555555555555L)
    // both full: all 62 bits set
    assert(ZValue.compute(0x7FFFFFFFL, 0x7FFFFFFFL) == 0x3FFFFFFFFFFFFFFFL)
  }

  test("inputs are masked to 31 bits (documented contract)") {
    assert(ZValue.compute(1L << 31, 0L) == 0L)
    assert(ZValue.compute(-1L, 0L) == ZValue.compute(0x7FFFFFFFL, 0L))
  }

  test("codegen path (DataFrame) agrees with direct compute") {
    val rows = Seq((5L, 3L), (0L, 7L), (123456L, 654321L),
      (0x7FFFFFFFL, 1L)).toDF("x", "y")
    val got = rows.select(col("x"), col("y"),
      ZValue.zValue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == ZValue.compute(x, y)) }
    // null in either operand -> null out (BinaryExpression default)
    val n = rows.selectExpr("cast(null as bigint) as x", "y")
      .select(ZValue.zValue(col("x"), col("y")).as("z")).collect()
    assert(n.forall(_.isNullAt(0)))
  }

  test("z-ordering clusters both dimensions: any z-range box-bounds x and y") {
    // the defining property: the points whose z falls in [lo, hi]
    // lie inside a bounding box not much larger than the range —
    // check the quadrant decomposition exactly: the top interleaved
    // bit pair splits the plane into 4 quadrants whose z-ranges are
    // disjoint and contiguous
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val byZ = pts.map { case (x, y) => (ZValue.compute(x, y), x, y) }.sorted
    // 256 points -> 4 consecutive z-quartiles = the 4 (x<8?, y<8?) quadrants
    byZ.grouped(64).zipWithIndex.foreach { case (quad, i) =>
      val xs = quad.map(_._2); val ys = quad.map(_._3)
      assert(xs.max - xs.min <= 7 && ys.max - ys.min <= 7,
        s"quadrant $i not box-bounded")
    }
    // and z is a bijection on the grid
    assert(byZ.map(_._1).distinct.size == 256)
  }
}
