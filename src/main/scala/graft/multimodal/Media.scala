package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque media payload: image/audio/video bytes plus typed metadata.
  * At 100 TB these rows live in parquet with the binary column last
  * (row groups stay scannable for metadata-only queries — Spark prunes
  * `bytes` out of ReadSchema whenever a query doesn't touch it). */
final case class MediaRecord(id: Long, mime: String, bytes: Array[Byte])

final case class MediaMeta(id: Long, mime: String, nbytes: Long, contentMd5: String)

/** Decoded-media features. `width`/`height`/`nFrames` come from the
  * (stubbed) decoder; `features` is a fixed-width embedding. */
final case class MediaFeatures(id: Long, width: Int, height: Int,
                               nFrames: Int, features: Array[Float])

/** Multimodal column plumbing.
  *
  * The image/audio codecs are NOT available in this environment, so
  * [[Media.decodeStub]] is a clearly-marked deterministic fake. What
  * is real — and what this module exists to pin down — is the Spark
  * side: schemas, the metadata path staying columnar (no decode, no
  * byte materialization), and the decode path running as a
  * `mapPartitions` batch over executors, the same shape a JNI/FFmpeg
  * or JCodec decoder would plug into.
  */
object Media {

  /** Columnar metadata extraction — never deserializes the payload
    * into JVM objects; stays inside whole-stage codegen. */
  def meta(df: DataFrame): DataFrame =
    df.select(col("id"), col("mime"),
      octet_length(col("bytes")).cast("long").as("nbytes"),
      md5(col("bytes")).as("contentMd5"))

  /** STUB decoder — deterministic fake in place of a real codec.
    * Derives "dimensions" from the first payload bytes and a
    * fixed-width feature vector from a rolling byte sum. A real
    * deployment swaps only this function (same signature, same
    * batch-per-partition call pattern). */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val w = 16 + (if (bytes.isEmpty) 0 else (bytes(0) & 0x7f))
    val h = 16 + (if (bytes.length < 2) 0 else (bytes(1) & 0x7f))
    val frames = 1 + bytes.length % 7
    (w, h, frames)
  }

  /** STUB feature extractor — deterministic 8-dim byte-histogram-ish
    * vector; the real one would run a vision/audio model per batch. */
  def featureStub(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
    val acc = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) { acc(i % dim) += (bytes(i) & 0xff); i += 1 }
    val n = math.max(bytes.length, 1).toFloat
    acc.map(_ / n)
  }

  /** Decode + featurize, batched per partition. The iterator shape is
    * the contract: a real decoder amortizes codec init across the
    * partition exactly like this, and partition sizing
    * (`maxPartitionBytes`) bounds decoder memory. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder init would go here (codec handles, model)
      it.map { r =>
        val (w, h, f) = decodeStub(r.bytes)
        MediaFeatures(r.id, w, h, f, featureStub(r.bytes))
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

  /** STUB resize — byte-stride downsample to ≤ targetBytes; a real
    * implementation calls the codec's scaler with the same
    * signature. */
  def resizeStub(bytes: Array[Byte], targetBytes: Int): Array[Byte] =
    if (bytes.length <= targetBytes) bytes
    else {
      val stride = (bytes.length + targetBytes - 1) / targetBytes
      bytes.indices.collect { case i if i % stride == 0 => bytes(i) }.toArray
    }

  /** Resize every payload, batched per partition like
    * [[extractFeatures]] (codec/scaler init amortizes across the
    * partition; partition sizing bounds scaler memory). */
  def resize(ds: Dataset[MediaRecord], targetBytes: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map(r => r.copy(bytes = resizeStub(r.bytes, targetBytes)))
    }
  }
}
