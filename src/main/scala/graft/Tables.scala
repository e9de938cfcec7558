package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers over a driver testdata directory
  * (`/root/testdata/sf*`, see TESTDATA.md).
  *
  * All readers are plain `spark.read.parquet` scans so Catalyst keeps
  * full pushdown / pruning freedom; callers `select` only what they
  * need and the scan's ReadSchema shrinks accordingly. At cluster
  * scale the same call works on a directory of many files — nothing
  * here assumes a single-file layout.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. With `spark.sql.legacy.parquet.nanosAsLong=true`
    * (set by [[Sessions.tune]]) it arrives as a LongType of
    * nanoseconds; convert to a microsecond TIMESTAMP by integer
    * division — the same floor-truncation DuckDB applies when it reads
    * TIMESTAMP_NS, so both engines see identical values.
    */
  private def normalizeTs(df: DataFrame, colName: String): DataFrame =
    df.schema(colName).dataType match {
      case org.apache.spark.sql.types.LongType =>
        // `div` (integer division), NOT `/`: Column./ is double
        // division, and nanosecond epochs exceed 2^53 — the round-trip
        // through double perturbs microseconds by ±1
        df.withColumn(colName,
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr(s"$colName div 1000")))
      case _ => df
    }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(table(s, d, "events"), "ts")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
