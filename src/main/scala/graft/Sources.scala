package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink matrix beyond the parquet testdata: schema'd CSV and
  * newline-delimited JSON readers/writers with lossless round-trip
  * settings (explicit schema — no inference scan — UTC timestamps,
  * quoted CSV). The reference ingests only NDJSON
  * (FlinkAssignment.scala:37-44); these cover the rest of the batch
  * ingestion surface, and each reader has a `readStream` twin by
  * construction (same format/schema options).
  */
object Sources {
  // Write with explicit 6-digit fractional seconds (micros — Spark's
  // native timestamp precision). TIMESTAMP and TIMESTAMP_NTZ columns
  // are formatted by *different* options (`timestampFormat` vs
  // `timestampNTZFormat`) and the NTZ default truncates to millis on
  // write, so both must be pinned. On read, no format option: the
  // schema'd parser then takes the lenient ISO path (DateTimeUtils
  // .stringToTimestamp[WithoutTimeZone]) which keeps all fractional
  // digits regardless of width.
  private val tsWriteFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
  private val ntzWriteFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", tsWriteFmt)
      .option("timestampNTZFormat", ntzWriteFmt)
      .csv(path)

  def readCsv(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("timestampFormat", tsWriteFmt)
      .option("timestampNTZFormat", ntzWriteFmt)
      .json(path)

  def readJson(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC: the columnar alternative to parquet — binary-typed, so no
    * timestamp format round-trip concerns; schema passed explicitly
    * for parity with the other readers (no inference scan). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).orc(path)
}
