package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Media

/** Pins [[Media.averageHash]]: the closed-form replay of the gate's
  * gradient raster matches the real codec path bit for bit, flat
  * images saturate (every cell mean equals the global mean), the
  * hash is invariant under lossless re-encode, and identical images
  * collide exactly (Hamming 0). */
class X90PhashSpec extends AnyFunSuite {

  private def gradientPng(off: Int) =
    Media.encodePng(16, 16, (x, y) => {
      val v = (off + y * 16 + x) % 256
      (v << 16) | (v << 8) | v
    })

  /** Independent replay of the aHash rule on the 16×16 gradient:
    * 2×2 cells, integer cross-multiplied threshold. */
  private def reference(off: Int): Long = {
    val sums = new Array[Long](64)
    for (p <- 0 until 256) {
      val c = ((p / 16) / 2) * 8 + (p % 16) / 2
      sums(c) += (off + p) % 256
    }
    val tot = sums.sum
    (0 until 64).foldLeft(0L) { (acc, c) =>
      if (sums(c) * 256 >= tot * 4) acc | (1L << c) else acc
    }
  }

  test("real-codec hash matches the closed-form replay across offsets") {
    for (off <- Seq(0, 1, 63, 128, 200, 255)) {
      val got = Media.averageHash(gradientPng(off)).get
      assert(got == reference(off), s"offset $off")
    }
  }

  test("a flat image saturates all 64 bits") {
    val flat = Media.encodePng(16, 16, (_, _) => 0x7f7f7f)
    assert(Media.averageHash(flat).get == -1L)
  }

  test("lossless re-encode keeps the hash; identical images collide") {
    val png = gradientPng(37)
    val h1 = Media.averageHash(png).get
    val dec = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(dec, "png", out)
    val h2 = Media.averageHash(out.toByteArray).get
    assert(h1 == h2)
    assert(java.lang.Long.bitCount(h1 ^ Media.averageHash(gradientPng(37)).get) == 0)
  }

  test("non-image payloads hash to None") {
    assert(Media.averageHash("not a png".getBytes).isEmpty)
  }

  test("sub-grid images are unhashable, not spuriously-similar") {
    // a 4x4 image leaves 8x8 lattice cells empty; the empty-cell
    // comparison 0*n >= tot*0 would set every empty bit — None
    // instead of a distance-distorting hash
    val tiny = Media.encodePng(4, 4, (x, y) => (x * 16 + y) * 0x010101)
    assert(Media.averageHash(tiny).isEmpty)
    assert(Media.averageHash(Media.encodePng(16, 4, (_, _) => 0x333333))
      .isEmpty)
    // a grid whose hash cannot fit 64 bits is a caller error
    intercept[IllegalArgumentException] {
      Media.averageHash(gradientPng(1), grid = 9)
    }
  }
}
