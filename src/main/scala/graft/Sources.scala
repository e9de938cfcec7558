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

  /** Bits per dimension on the common Z grid. Both columns are
    * scaled to [0, 2^16) before interleaving; 16 bits resolves 65536
    * distinct cells per dimension — far more than any realistic file
    * count — while keeping the scaling product `range * 65535` inside
    * a long for column ranges up to 2^46. */
  val ZGridBits = 16
  private val ZGridMax = (1L << ZGridBits) - 1 // 65535

  /** Z-order-clustered parquet writer — the OPTIMIZE ZORDER layout
    * move behind gate x76's audit: scale BOTH columns to a common
    * [[ZGridBits]]-bit grid (`(v − min)·(2^b − 1) div max(max − min,
    * 1)` — the standard OPTIMIZE ZORDER normalization), Morton-
    * interleave the grid coordinates ([[graft.functions.ZValue]]),
    * range-partition rows into `numFiles` contiguous z-runs, sort
    * within each, write one file per partition. Equal bit widths are
    * what make the interleave fair: offsetting to the min alone
    * leaves the wider dimension owning the key's high bits, so every
    * z-range split cuts only that dimension and the narrower column
    * never clusters. With the grid scaling, each output file's
    * (colX, colY) footprint is a tight box, so per-file min/max
    * stats prune scans on EITHER column (ZOrderWriteSpec measures the
    * shrink on both dims; ZOrderPruneSpec counts skipped files from
    * real parquet footers). Scale shape: one tiny 4-scalar agg
    * broadcast back, then `repartitionByRange` SAMPLES the z
    * distribution (RangePartitioner) rather than globally sorting —
    * one shuffle, per-partition sorts only, the identical mechanism
    * at 10^12 rows. */
  def zorderWrite(df: DataFrame, colX: String, colY: String,
      path: String, numFiles: Int): Unit = {
    import org.apache.spark.sql.functions._
    val bounds = df.agg(
      min(col(colX)).cast("long").as("__xmin"),
      max(col(colX)).cast("long").as("__xmax"),
      min(col(colY)).cast("long").as("__ymin"),
      max(col(colY)).cast("long").as("__ymax"))
    def grid(c: String, lo: String, hi: String) = expr(
      s"((cast($c as bigint) - $lo) * $ZGridMax) div greatest($hi - $lo, 1)")
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", graft.functions.ZValue.zValue(
        grid(colX, "__xmin", "__xmax"), grid(colY, "__ymin", "__ymax")))
      .drop("__xmin", "__xmax", "__ymin", "__ymax")
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Name of the quarantine column [[readJsonQuarantine]] appends. */
  val CorruptCol = "_corrupt_record"

  /** PERMISSIVE NDJSON reader with corrupt-record quarantine — the
    * production ingestion contract where FAILFAST would kill a 100 TB
    * job on one mangled line and DROPMALFORMED would lose it
    * silently: schema-valid rows parse normally, unparseable lines
    * land whole in [[CorruptCol]] (their typed columns null), so the
    * caller splits the stream with [[goodRows]] / [[badRows]] and
    * quarantines the bad lines for replay. Spark quirk handled here:
    * a query that selects ONLY the corrupt column over raw JSON is
    * rejected (SPARK-38285-adjacent analyzer rule), so `badRows`
    * carries the parsed columns too — project after collecting if
    * only the raw line is wanted. Streaming-legal: the same
    * schema+options work under `readStream`. */
  def readJsonQuarantine(spark: SparkSession, schema: StructType,
      path: String): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Schema-valid rows of a [[readJsonQuarantine]] frame, corrupt
    * column dropped. */
  def goodRows(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)
  }

  /** Quarantined rows: the raw unparseable line plus the (null) typed
    * columns. */
  def badRows(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.filter(col(CorruptCol).isNotNull)
  }
}
