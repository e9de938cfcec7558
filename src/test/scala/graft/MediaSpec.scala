package graft

import graft.multimodal.{Media, MediaRecord}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The multimodal pipeline decodes images for REAL (javax.imageio):
  * metadata-only reads prune the binary column out of the parquet
  * scan, feature extraction decodes actual PNG rasters (checked-in
  * fixture from an independent encoder + synthetic round-trips),
  * resize resamples pixels, and non-decodable payloads take the
  * documented byte-level fallback. */
class MediaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 4x3 gradient PNG: pixel value (x + 10*y) on all three channels. */
  private def gradientPng: Array[Byte] =
    Media.encodePng(4, 3, (x, y) => { val v = x + 10 * y; (v << 16) | (v << 8) | v })

  private def records = Seq(
    MediaRecord(1L, "image/png", gradientPng),
    MediaRecord(2L, "video/fake", Array.tabulate(1000)(i => (i * 13).toByte)),
    MediaRecord(3L, "audio/fake", Array.empty[Byte]))

  test("checked-in PNG from an independent encoder decodes exactly") {
    // src/test/resources/graft/tiny.png: hand-built (python zlib) 3x2
    // RGB — proves the decoder reads real-world PNGs, not just its
    // own encoder's output
    val bytes = {
      val in = getClass.getResourceAsStream("/graft/tiny.png")
      try in.readAllBytes() finally in.close()
    }
    val d = Media.decodeImage(bytes).get
    assert(d.width == 3 && d.height == 2 && d.channels == 3)
    // row0: (255,0,0),(0,255,0),(0,0,255); row1: (10,20,30),(40,50,60),(70,80,90)
    assert(d.bandSums.toSeq == Seq(255L + 10 + 40 + 70, 255L + 20 + 50 + 80,
      255L + 30 + 60 + 90))
  }

  test("encode -> decode round-trips exact sample sums (PNG lossless)") {
    val d = Media.decodeImage(gradientPng).get
    assert(d.width == 4 && d.height == 3 && d.channels == 3)
    // sum of (x + 10y) over 4x3 = sum(x)*3 + 10*sum(y)*4 = 18 + 120
    assert(d.bandSums.toSeq == Seq(138L, 138L, 138L))
    assert(Media.decodeImage("not an image".getBytes).isEmpty)
  }

  test("metadata-only query prunes the binary column from the parquet scan") {
    val dir = Files.createTempDirectory("graft-media").toString + "/media"
    records.toDS().write.mode("overwrite").parquet(dir)
    val metaOnly = spark.read.parquet(dir).select("id", "mime")
    metaOnly.collect()
    val scan = metaOnly.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema") && !scan.contains("bytes"),
      s"bytes should be pruned:\n$scan")
    // the meta() extractor DOES read bytes (octet_length/md5) but
    // emits only scalars
    val m = Media.meta(spark.read.parquet(dir)).collect()
    assert(m.map(_.getLong(2)).sorted.toSeq.last == 1000L)
  }

  test("feature extraction really decodes: dimensions + per-band means") {
    val f = Media.extractFeatures(records.toDS()).collect()
      .map(m => m.id -> m).toMap
    val img = f(1L)
    assert(img.width == 4 && img.height == 3 && img.channels == 3)
    // per-band mean = 138/12 = 11.5, padded to 8 dims with zeros
    assert(img.features.toSeq == Seq(11.5f, 11.5f, 11.5f, 0f, 0f, 0f, 0f, 0f))
    // non-decodable payloads: fallback dimensions + byte histogram
    assert(f(2L).width == -1 && f(2L).channels == 0)
    assert(f(2L).features.length == 8)
    assert(f(3L).width == -1 && f(3L).features.forall(_ == 0f))
    // deterministic across runs
    val again = Media.extractFeatures(records.toDS()).collect()
      .map(m => m.id -> m).toMap
    assert(f(1L).features.sameElements(again(1L).features))
  }

  test("frame sampling emits every k-th chunk at the right offsets") {
    val one = Seq(MediaRecord(9L, "video/fake",
      Array.tabulate(10)(_.toByte))).toDS().toDF()
    // chunk=2, every=2 → offsets 0, 4, 8
    val frames = Media.frameSample(one, chunk = 2, every = 2)
      .collect().sortBy(_.getInt(1))
    assert(frames.length == 3)
    assert(frames(0).getAs[Array[Byte]]("frame").toSeq == Seq[Byte](0, 1))
    assert(frames(1).getAs[Array[Byte]]("frame").toSeq == Seq[Byte](4, 5))
    assert(frames(2).getAs[Array[Byte]]("frame").toSeq == Seq[Byte](8, 9))
  }

  test("image resize resamples pixels; non-images pass through") {
    // 8x4 image, constant value 100 -> resized to maxDim 4 keeps values
    val big = Media.encodePng(8, 4, (_, _) => (100 << 16) | (100 << 8) | 100)
    val out = Media.resizeImages(
      Seq(MediaRecord(1L, "image/png", big),
          MediaRecord(2L, "video/fake", Array.tabulate(100)(_.toByte))).toDS(),
      maxDim = 4).collect().map(r => r.id -> r).toMap
    val d = Media.decodeImage(out(1L).bytes).get
    assert(d.width == 4 && d.height == 2, s"${d.width}x${d.height}")
    // nearest-neighbor over a constant image stays constant
    assert(d.bandSums.toSeq == Seq(800L, 800L, 800L))
    // video payload untouched
    assert(out(2L).bytes.toSeq == Array.tabulate(100)(_.toByte).toSeq)
    // already-small images pass through byte-identical
    val small = Media.resizeImage(gradientPng, maxDim = 16).get
    assert(small.toSeq == gradientPng.toSeq)
  }

  test("opaque byte downsample bounds every payload") {
    val out = Media.resize(records.toDS(), targetBytes = 64)
      .collect().sortBy(_.id)
    assert(out.forall(_.bytes.length <= 64 || out.isEmpty))
    assert(out(2).bytes.isEmpty)
    // stride sampling keeps the first byte
    assert(out(1).bytes(0) == records(1).bytes(0))
  }

  test("WAV encode -> decode round-trips exact sample sums (PCM lossless)") {
    // mono: alternating ramp incl. negative samples
    val mono = Array.tabulate(300)(i => ((i * 37) % 65536 - 32768).toShort)
    val d = Media.decodeWav(Media.encodeWav(mono, 8000)).get
    assert(d.channels == 1 && d.sampleRate == 8000 && d.frames == 300L)
    assert(d.channelSums(0) == mono.map(_.toLong).sum)
    // stereo: interleaved L/R with distinct per-channel sums
    val stereo = Array.tabulate(200)(i =>
      (if (i % 2 == 0) i * 3 else -i).toShort)
    val s = Media.decodeWav(Media.encodeWav(stereo, 44100, channels = 2)).get
    assert(s.channels == 2 && s.sampleRate == 44100 && s.frames == 100L)
    assert(s.channelSums(0) == stereo.zipWithIndex.collect {
      case (v, i) if i % 2 == 0 => v.toLong }.sum)
    assert(s.channelSums(1) == stereo.zipWithIndex.collect {
      case (v, i) if i % 2 == 1 => v.toLong }.sum)
    // non-audio bytes decode to None
    assert(Media.decodeWav(Array.tabulate(64)(_.toByte)).isEmpty)
    assert(Media.decodeWav(gradientPng).isEmpty)
  }

  test("feature extraction decodes WAV audio: per-channel means, (-1,-1,ch) dims") {
    val samples = Array.tabulate(100)(i => (i * 100).toShort) // mean 4950
    val recs = Seq(
      MediaRecord(1L, "audio/wav", Media.encodeWav(samples, 8000)),
      MediaRecord(2L, "video/fake", Array.tabulate(32)(_.toByte)))
    val got = Media.extractFeatures(recs.toDS()).collect()
      .map(f => f.id -> f).toMap
    val a = got(1L)
    assert(a.width == -1 && a.height == -1 && a.channels == 1)
    assert(math.abs(a.features(0) - 4950.0f) < 1e-3)
    // the non-decodable payload keeps the byte-histogram fallback
    val v = got(2L)
    assert(v.width == -1 && v.height == -1 && v.channels == 0)
    assert(v.features.toSeq ==
      Media.byteHistogram(Array.tabulate(32)(_.toByte)).toSeq)
  }
}
