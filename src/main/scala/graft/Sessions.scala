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

  /** State-store providers selectable via `SPARK_GRAFT_STATE_STORE`
    * (`hdfs` | `rocksdb`). The default HDFS-backed store keeps every
    * partition's state on the executor heap — fine until per-partition
    * state outgrows memory; RocksDB spills to local disk with bounded
    * heap, the scale path for large keyed state (big dedup horizons,
    * wide session maps). Both ship with Spark; flipping the flag
    * changes no query code. */
  val stateStoreProviders: Map[String, String] = Map(
    "hdfs" -> "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    "rocksdb" -> "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  def tune(b: SparkSession.Builder): SparkSession.Builder = {
    val base = b
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.driver.host", "127.0.0.1")
    sys.env.get("SPARK_GRAFT_STATE_STORE")
      .flatMap(f => stateStoreProviders.get(f.toLowerCase))
      .fold(base)(cls =>
        base.config("spark.sql.streaming.stateStore.providerClass", cls))
  }
}
