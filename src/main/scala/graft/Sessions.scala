package graft

import org.apache.spark.sql.SparkSession

/** Session configuration shared by Verify, Bench, and tests.
  *
  * These mirror what a production deployment would set cluster-wide:
  * UTC session time (oracle + Flink-epoch window parity), AQE on
  * (runtime re-planning, skew-join splitting at scale), and
  * microsecond parquet output. `nanosAsLong` is required to read the
  * driver's `events.parquet` (TIMESTAMP_NS) at all — see
  * [[Tables.events]].
  */
object Sessions {
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .config("spark.driver.host", "127.0.0.1")
}
