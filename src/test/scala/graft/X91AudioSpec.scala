package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Media

/** Pins [[Media.energyHash]]: the closed-form replay of the gate's
  * synthetic PCM matches the real codec path bit for bit, a
  * constant-amplitude clip saturates, clips shorter than the grid and
  * non-audio payloads return None. */
class X91AudioSpec extends AnyFunSuite {

  private def clip(off: Int) = Media.encodeWav(
    Array.tabulate(128)(i => (((off * 97 + 31 * i * i) % 65536) - 32768).toShort),
    8000)

  /** Independent replay: |sample| pooled onto 64 blocks of 2 frames,
    * integer cross-multiplied threshold. */
  private def reference(off: Int): Long = {
    val e = Array.tabulate(128)(i =>
      math.abs(((off * 97 + 31 * i * i) % 65536) - 32768).toLong)
    val sums = new Array[Long](64)
    for (i <- 0 until 128) sums(i / 2) += e(i)
    val tot = sums.sum
    (0 until 64).foldLeft(0L) { (acc, b) =>
      if (sums(b) * 128 >= tot * 2) acc | (1L << b) else acc
    }
  }

  test("real-codec fingerprint matches the closed-form replay across offsets") {
    for (off <- Seq(0, 1, 42, 128, 255)) {
      assert(Media.energyHash(clip(off)).get == reference(off), s"offset $off")
    }
  }

  test("a constant-amplitude clip saturates all 64 bits") {
    val wav = Media.encodeWav(Array.fill(128)(1000.toShort), 8000)
    assert(Media.energyHash(wav).get == -1L)
  }

  test("clips shorter than the grid and non-audio payloads return None") {
    val short = Media.encodeWav(Array.fill(63)(5.toShort), 8000)
    assert(Media.energyHash(short).isEmpty)
    assert(Media.energyHash("definitely not a wav".getBytes).isEmpty)
  }

  test("header damage never escapes as a task-killing exception; an " +
    "over-64 grid is a caller error") {
    // a zeroed block-align is NORMALIZED by the JVM's WAV reader
    // (frame size re-derived from channels·bits), so it must still
    // hash — the frameSize < 2 guard covers formats that DO report
    // NOT_SPECIFIED (-1), where the old code died in
    // NegativeArraySizeException outside the IOException catch
    val good = Media.encodeWav(Array.fill(128)(7.toShort), 8000)
    val bad = good.clone()
    bad(32) = 0; bad(33) = 0 // fmt-chunk blockAlign
    assert(Media.energyHash(bad).contains(-1L)) // constant clip saturates
    // truncated / garbage payloads quarantine as None, never throw
    assert(Media.energyHash(good.take(30)).isEmpty)
    intercept[IllegalArgumentException] {
      Media.energyHash(good, grid = 65)
    }
  }
}
