package graft.tools

import graft.{Sessions, Tables}
import graft.multimodal.{Media, MediaRecord}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev demo: drive the multimodal plumbing end-to-end over real
  * testdata bytes (documents.text as opaque payloads). */
object MediaDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tune(SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val media = Tables.documents(spark, args.headOption.getOrElse("/root/testdata/sf0.001"))
      .select(col("doc_id").as("id"), lit("text/plain").as("mime"),
              col("text").cast("binary").as("bytes"))

    println("== meta ==")
    Media.meta(media).show(3, truncate = false)

    println("== features (mapPartitions decode; text payloads take the fallback) ==")
    val feats = Media.extractFeatures(media.as[MediaRecord])
    feats.show(3, truncate = 60)
    println(s"features rows: ${feats.count()}")

    println("== real PNG decode ==")
    val png = Media.encodePng(16, 8, (x, y) => ((x * 16) << 16) | ((y * 31) << 8) | 128)
    Media.extractFeatures(
      Seq(MediaRecord(99L, "image/png", png)).toDS()).show(truncate = false)

    println("== frame sample (chunk=32, every=4) ==")
    Media.frameSample(media, 32, 4).show(3, truncate = 40)

    println("== empty-payload probe ==")
    val edge = Seq(MediaRecord(1L, "application/octet-stream", Array.emptyByteArray),
                   MediaRecord(2L, "image/fake", Array[Byte](7))).toDS()
    Media.extractFeatures(edge).show(truncate = false)
    spark.stop()
  }
}
