package graft

import graft.multimodal.{Media, MediaRecord}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The multimodal plumbing is real even though the decoder is a
  * stub: metadata-only reads prune the binary column out of the
  * parquet scan, feature extraction is a deterministic per-partition
  * batch, frame sampling chunks by offset, and resize bounds payload
  * size. */
class MediaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def records = Seq(
    MediaRecord(1L, "image/fake", Array.tabulate(100)(i => (i * 7).toByte)),
    MediaRecord(2L, "video/fake", Array.tabulate(1000)(i => (i * 13).toByte)),
    MediaRecord(3L, "audio/fake", Array.empty[Byte]))

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
    assert(m.map(_.getLong(2)).sorted.toSeq == Seq(0L, 100L, 1000L))
  }

  test("feature extraction is a deterministic per-partition batch") {
    val f = Media.extractFeatures(records.toDS()).collect().sortBy(_.id)
    assert(f.length == 3)
    assert(f.forall(_.features.length == 8))
    val again = Media.extractFeatures(records.toDS()).collect().sortBy(_.id)
    assert(f.zip(again).forall { case (a, b) =>
      a.width == b.width && a.height == b.height &&
        a.nFrames == b.nFrames && a.features.sameElements(b.features) })
    // stub contract: dimensions derive from the head bytes
    assert(f.head.width == 16 + (records.head.bytes(0) & 0x7f))
    assert(f(2).width == 16 && f(2).nFrames == 1) // empty payload
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

  test("resize bounds every payload and keeps small ones intact") {
    val out = Media.resize(records.toDS(), targetBytes = 64)
      .collect().sortBy(_.id)
    assert(out(0).bytes.length <= 64 && out(0).bytes.length > 0)
    assert(out(1).bytes.length <= 64)
    assert(out(2).bytes.isEmpty)
    // stride-0 sampling keeps the first byte
    assert(out(0).bytes(0) == records(0).bytes(0))
  }
}
