package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Opaque media payload: image/audio/video bytes plus typed metadata.
  * At 100 TB these rows live in parquet with the binary column last
  * (row groups stay scannable for metadata-only queries — Spark prunes
  * `bytes` out of ReadSchema whenever a query doesn't touch it). */
final case class MediaRecord(id: Long, mime: String, bytes: Array[Byte])

final case class MediaMeta(id: Long, mime: String, nbytes: Long, contentMd5: String)

/** Decoded-media features. `width`/`height`/`channels` come from the
  * real image decode ([[Media.decodeImage]]); WAV/PCM audio decodes
  * for real too ([[Media.decodeWav]]: (-1, -1, nChannels) with
  * per-channel mean samples); payloads neither codec reads (video,
  * exotic encodings) carry (-1, -1, 0) and a byte-histogram fallback
  * feature vector. */
final case class MediaFeatures(id: Long, width: Int, height: Int,
                               channels: Int, features: Array[Float])

/** One decoded raster: dimensions, band count, and the EXACT per-band
  * integer sample sums (PNG is lossless, so these are reproducible to
  * the bit on any JVM — the property the closed-form gate oracle
  * checks). */
final case class DecodedImage(width: Int, height: Int, channels: Int,
                              bandSums: Array[Long])

/** One decoded audio clip: format metadata plus the EXACT per-channel
  * integer sample sums (PCM is lossless, so these are bit-reproducible
  * on any JVM — same closed-form-oracle property as [[DecodedImage]]). */
final case class DecodedAudio(channels: Int, sampleRate: Int, frames: Long,
                              channelSums: Array[Long])

/** Multimodal column plumbing with REAL pure-JVM image AND audio
  * codecs.
  *
  * Image decode/encode/resize run on `javax.imageio` (PNG — lossless,
  * headless, zero native deps); audio decode/encode runs on
  * `javax.sound.sampled` (WAV 16-bit PCM — same properties). Video
  * and exotic audio encodings have no JVM codec in this environment,
  * so they take a clearly-marked byte-level fallback; the Spark
  * side — schemas, the metadata path staying columnar (no decode, no
  * byte materialization), and decode running as a `mapPartitions`
  * batch over executors — is the shape a JNI/FFmpeg decoder would
  * plug into for those.
  */
object Media {

  /** Columnar metadata extraction — never deserializes the payload
    * into JVM objects; stays inside whole-stage codegen. */
  def meta(df: DataFrame): DataFrame =
    df.select(col("id"), col("mime"),
      octet_length(col("bytes")).cast("long").as("nbytes"),
      md5(col("bytes")).as("contentMd5"))

  /** REAL image decode via javax.imageio: dimensions, band count, and
    * exact per-band sample sums read straight off the raster (no
    * color-space conversion — `getRGB` would gamma-convert gray
    * rasters; raw samples are lossless for PNG). None for payloads
    * ImageIO has no reader for (audio/video/garbage). */
  def decodeImage(bytes: Array[Byte]): Option[DecodedImage] =
    try {
      Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { img =>
        val raster = img.getRaster
        val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
        val sums = new Array[Long](bands)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < bands) { sums(b) += raster.getSample(x, y, b); b += 1 }
            x += 1
          }
          y += 1
        }
        DecodedImage(w, h, bands, sums)
      }
    } catch { case _: java.io.IOException => None }

  /** PNG-encode a synthetic RGB image: `pixel(x, y)` returns a packed
    * 0xRRGGBB int. Lossless round-trip: [[decodeImage]] of the result
    * reads back exactly these sample values. */
  def encodePng(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, pixel(x, y)); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL audio decode via javax.sound.sampled (WAV/PCM — lossless,
    * headless, zero native deps, the second genuinely-decoded
    * modality next to PNG): format metadata and exact per-channel
    * sample sums, read frame by frame off the PCM stream. Handles
    * 16-bit signed PCM (either endianness); None for payloads the
    * JVM has no reader for, or non-16-bit encodings (those keep the
    * [[byteHistogram]] fallback). */
  def decodeWav(bytes: Array[Byte]): Option[DecodedAudio] =
    try {
      val in = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        if (f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            f.getSampleSizeInBits != 16) None
        else {
          val ch = f.getChannels
          val frameBytes = f.getFrameSize
          val sums = new Array[Long](ch)
          var frames = 0L
          val buf = new Array[Byte](frameBytes * 1024)
          var n = in.read(buf)
          while (n > 0) {
            var off = 0
            while (off + frameBytes <= n) {
              var c = 0
              while (c < ch) {
                val i = off + 2 * c
                val s =
                  if (f.isBigEndian) ((buf(i) << 8) | (buf(i + 1) & 0xff)).toShort
                  else ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort
                sums(c) += s
                c += 1
              }
              off += frameBytes
              frames += 1
            }
            n = in.read(buf)
          }
          Some(DecodedAudio(ch, f.getSampleRate.toInt, frames, sums))
        }
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** WAV-encode 16-bit signed PCM samples (interleaved when
    * channels > 1). Lossless round-trip: [[decodeWav]] of the result
    * reads back exactly these samples. */
  def encodeWav(samples: Array[Short], sampleRate: Int,
                channels: Int = 1): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0,
      s"encodeWav: ${samples.length} samples not a multiple of $channels channels")
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, false) // signed, little-endian
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(raw), fmt, samples.length / channels)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Byte-histogram fallback features for payloads with no JVM codec
    * (video, exotic audio encodings): deterministic 8-dim rolling
    * byte sums. NOT a decode — documented fallback only. */
  /** Perceptual average-hash (aHash) over a REAL decoded raster:
    * band-0 samples block-pooled onto a grid×grid lattice (cell of
    * pixel (x,y) = (y·g div h, x·g div w) — surjective whenever
    * w,h ≥ g), bit c set iff cell c's mean ≥ the image's pixel mean.
    * The comparison is the exact integer cross-multiply
    * `cellSum·n ≥ totalSum·cellCnt` — no float ever exists, so the
    * 64-bit hash is bit-reproducible on any JVM and replayable in
    * closed form by an oracle that knows the pixel function
    * (products stay < 2^63 up to ~30-megapixel 8-bit rasters).
    * Near-duplicate images (re-encodes, small edits, brightness-
    * preserving noise) land within a few Hamming bits; x90 buckets
    * the hash into 16-bit bands for the standard banded near-dup
    * join. None for payloads ImageIO has no reader for, and for
    * images narrower or shorter than the grid: a sub-grid image
    * leaves lattice cells EMPTY, and the empty-cell comparison
    * `0·n ≥ tot·0` is vacuously true — every empty cell would hash
    * as a set bit, distorting Hamming distances toward spurious
    * similarity, so such payloads are unhashable rather than wrong.
    * grid² must fit the 64-bit hash (`1L << i` wraps past bit 63
    * otherwise). */
  def averageHash(bytes: Array[Byte], grid: Int = 8): Option[Long] = {
    require(grid >= 1 && grid * grid <= 64,
      s"grid^2 must fit a 64-bit hash, got $grid")
    try {
      Option(ImageIO.read(new ByteArrayInputStream(bytes)))
        .filter(img => img.getWidth >= grid && img.getHeight >= grid)
        .map { img =>
        val raster = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        val cells = grid * grid
        val sums = new Array[Long](cells)
        val cnts = new Array[Long](cells)
        var y = 0
        while (y < h) {
          val cy = y * grid / h
          var x = 0
          while (x < w) {
            val c = cy * grid + x * grid / w
            sums(c) += raster.getSample(x, y, 0)
            cnts(c) += 1
            x += 1
          }
          y += 1
        }
        var tot = 0L
        var n = 0L
        var i = 0
        while (i < cells) { tot += sums(i); n += cnts(i); i += 1 }
        var bits = 0L
        i = 0
        while (i < cells) {
          if (sums(i) * n >= tot * cnts(i)) bits |= (1L << i)
          i += 1
        }
        bits
      }
    } catch { case _: java.io.IOException => None }
  }

  /** 64-bit energy fingerprint over REAL decoded PCM — the audio
    * sibling of [[averageHash]]: channel-0 |sample| values block-
    * pooled onto `grid` time blocks (block of frame i = i·g div n),
    * bit b set iff block b's mean energy ≥ the clip's mean energy,
    * compared with the exact integer cross-multiply — no floats, so
    * the fingerprint is bit-reproducible and closed-form replayable.
    * Loads channel-0 samples into memory (fingerprinting targets
    * clip-length payloads; block assignment needs the frame count up
    * front). None for non-PCM/16-bit payloads, clips shorter than
    * the grid, or formats reporting an unusable frame size (a
    * malformed header can report NOT_SPECIFIED = -1, which would
    * otherwise escape as NegativeArraySizeException and kill the
    * ingest task instead of quarantining the payload). grid must fit
    * the 64-bit hash. */
  def energyHash(bytes: Array[Byte], grid: Int = 64): Option[Long] = {
    require(grid >= 1 && grid <= 64,
      s"grid must fit a 64-bit hash, got $grid")
    try {
      val in = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        if (f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            f.getSampleSizeInBits != 16 || f.getFrameSize < 2) None
        else {
          val frameBytes = f.getFrameSize
          val out = scala.collection.mutable.ArrayBuffer.empty[Int]
          val buf = new Array[Byte](frameBytes * 1024)
          var n = in.read(buf)
          while (n > 0) {
            var off = 0
            while (off + frameBytes <= n) {
              val s =
                if (f.isBigEndian) ((buf(off) << 8) | (buf(off + 1) & 0xff)).toShort
                else ((buf(off + 1) << 8) | (buf(off) & 0xff)).toShort
              out += math.abs(s.toInt)
              off += frameBytes
            }
            n = in.read(buf)
          }
          val nf = out.length
          if (nf < grid) None
          else {
            val sums = new Array[Long](grid)
            val cnts = new Array[Long](grid)
            var i = 0
            while (i < nf) {
              val b = (i.toLong * grid / nf).toInt
              sums(b) += out(i)
              cnts(b) += 1
              i += 1
            }
            var tot = 0L
            i = 0
            while (i < grid) { tot += sums(i); i += 1 }
            var bits = 0L
            i = 0
            while (i < grid) {
              if (sums(i) * nf >= tot * cnts(i)) bits |= (1L << i)
              i += 1
            }
            Some(bits)
          }
        }
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }
  }

  def byteHistogram(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
    val acc = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) { acc(i % dim) += (bytes(i) & 0xff); i += 1 }
    val n = math.max(bytes.length, 1).toFloat
    acc.map(_ / n)
  }

  /** Decode + featurize, batched per partition. Images and WAV/PCM
    * audio decode for real (per-band / per-channel mean sample values
    * as the feature vector, padded to 8 dims; audio rows carry
    * (-1, -1, nChannels) dimensions); payloads neither codec reads
    * take the byte-histogram fallback with (-1, -1, 0). The iterator
    * shape is the contract: codec init amortizes across the
    * partition, and partition sizing (`maxPartitionBytes`) bounds
    * decoder memory. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder init would go here for a JNI codec;
      // ImageIO/AudioSystem readers are instantiated per call
      it.map { r =>
        decodeImage(r.bytes) match {
          case Some(d) =>
            val n = (d.width.toLong * d.height).toFloat
            val means = d.bandSums.map(_ / n)
            MediaFeatures(r.id, d.width, d.height, d.channels,
              means.padTo(8, 0.0f))
          case None => decodeWav(r.bytes) match {
            case Some(a) =>
              val n = math.max(a.frames, 1L).toFloat
              MediaFeatures(r.id, -1, -1, a.channels,
                a.channelSums.map(_ / n).padTo(8, 0.0f))
            case None =>
              MediaFeatures(r.id, -1, -1, 0, byteHistogram(r.bytes))
          }
        }
      }
    }
  }

  /** Frame sampling for video-like payloads: keep every k-th chunk of
    * the byte stream as its own row (explode stays columnar). */
  def frameSample(df: DataFrame, chunk: Int, every: Int): DataFrame =
    df.select(col("id"),
      posexplode(expr(
        s"transform(sequence(0, greatest(octet_length(bytes) - 1, 0), ${chunk * every}), " +
        s"i -> substring(bytes, i + 1, $chunk))")).as(Seq("frame_no", "frame")))

  /** REAL image resize: nearest-neighbor resample so max(w, h) ≤
    * maxDim, re-encoded as PNG. The sampling loop is our own (not
    * Graphics2D) so the output raster is bit-deterministic on any
    * JVM. None for non-decodable payloads. */
  def resizeImage(bytes: Array[Byte], maxDim: Int): Option[Array[Byte]] =
    try {
      Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        if (w <= maxDim && h <= maxDim) bytes
        else {
          val scale = maxDim.toDouble / math.max(w, h)
          val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
          val out = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < nh) {
            var x = 0
            while (x < nw) {
              out.setRGB(x, y, img.getRGB(x * w / nw, y * h / nh) & 0xFFFFFF)
              x += 1
            }
            y += 1
          }
          val bos = new ByteArrayOutputStream()
          ImageIO.write(out, "png", bos)
          bos.toByteArray
        }
      }
    } catch { case _: java.io.IOException => None }

  /** Resize every image payload to fit maxDim, batched per partition
    * like [[extractFeatures]]; non-image payloads pass through
    * untouched (no codec to resample them with). */
  def resizeImages(ds: Dataset[MediaRecord], maxDim: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map(r => resizeImage(r.bytes, maxDim).map(b => r.copy(bytes = b)).getOrElse(r))
    }
  }

  /** Byte-stride downsample to ≤ targetBytes for OPAQUE payloads
    * (no codec): bounds payload size while keeping a deterministic
    * sample of the stream. Images should use [[resizeImages]]. */
  def downsampleBytes(bytes: Array[Byte], targetBytes: Int): Array[Byte] =
    if (bytes.length <= targetBytes) bytes
    else {
      val stride = (bytes.length + targetBytes - 1) / targetBytes
      bytes.indices.collect { case i if i % stride == 0 => bytes(i) }.toArray
    }

  /** Bound every payload to targetBytes via [[downsampleBytes]],
    * batched per partition. */
  def resize(ds: Dataset[MediaRecord], targetBytes: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map(r => r.copy(bytes = downsampleBytes(r.bytes, targetBytes)))
    }
  }
}
