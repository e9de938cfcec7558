package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStreams

/** Dev tool: throughput of the streaming operators over the real
  * sf events table, fed through MemoryStream in micro-batches and
  * written to the noop sink — isolates pipeline + state-store cost
  * from source/sink IO. Reports rows/s per operator. */
object StreamingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val batchRows = 10000
    // Streaming state partitioning ≠ batch shuffle partitioning: the
    // state store loads + commits every partition EVERY micro-batch,
    // so partitions are sized to state volume, not core count
    // (measured ~4x throughput at 8 vs 32 partitions on this state;
    // see PERF.md).
    val parts = sys.env.getOrElse("STREAM_PARTS", "8")
    val spark: SparkSession = Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val events = Tables.events(spark, sfDir).as[Ev]
      .collect().sortBy(_.ts.getTime).toSeq
    println(s"events: ${events.length} rows, batch=$batchRows")

    def run(name: String, q: DataFrame => DataFrame,
            mode: String): Unit = {
      val in = MemoryStream[Ev]
      val sq = q(in.toDF()).writeStream.format("noop")
        .outputMode(mode).start()
      val t0 = System.nanoTime()
      events.grouped(batchRows).foreach { chunk =>
        in.addData(chunk)
        sq.processAllAvailable()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      sq.stop()
      println(f"$name%-22s ${events.length / sec}%,10.0f rows/s  ($sec%.2f s, ${events.length / batchRows} batches)")
    }

    def runJoin(name: String): Unit = {
      val inA = MemoryStream[Ev]
      val inB = MemoryStream[Ev]
      val sq = EventStreams.purchaseContext(inA.toDF(), inB.toDF())
        .writeStream.format("noop").outputMode("append").start()
      val t0 = System.nanoTime()
      events.grouped(batchRows).foreach { chunk =>
        inA.addData(chunk); inB.addData(chunk)
        sq.processAllAvailable()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      sq.stop()
      println(f"$name%-22s ${events.length / sec}%,10.0f rows/s  ($sec%.2f s, ${events.length / batchRows} batches)")
    }

    // Same operator set under each state-store provider (the
    // providerClass conf binds at query start, so one session can
    // benchmark both back to back). HDFS-backed = on-heap, the
    // small-state winner; RocksDB = off-heap/disk with bounded heap,
    // the scale path once per-partition state outgrows memory.
    val providers = sys.env.get("SPARK_GRAFT_STATE_STORE")
      .map(f => Seq(f.toLowerCase)).getOrElse(Seq("hdfs", "rocksdb"))
    providers.foreach { p =>
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        Sessions.stateStoreProviders(p))
      println(s"-- state store: $p --")
      // warm once (JIT + state store init) then measure
      run("warmup", EventStreams.runningTypeCounts, "update")
      run(s"running_counts[$p]", EventStreams.runningTypeCounts, "update")
      run(s"daily_revenue[$p]", EventStreams.dailyTypeRevenue, "append")
      run(s"dedup_1h[$p]", EventStreams.dedupStream(_, "1 hour", Seq("event_id")), "append")
      run(s"sessions_30m[$p]", EventStreams.userSessions, "append")
      runJoin(s"interval_join[$p]")
      runNearDup(s"neardup_lsh[$p]")
      // 10x state: corpus replicated with per-copy token salts (each
      // copy gets fresh signatures → fresh band buckets) under a
      // horizon long enough that nothing expires — the memory-bounded
      // claim for RocksDB is measured, not asserted
      runNearDupScaled(s"neardup_lsh_10x[$p]", mult = 10, horizon = "24 hours")
      runSrpNearDup(s"neardup_srp[$p]")
    }
    // stateless ops once (no state store involved)
    runRedact("pii_redact[stateless]")
    spark.stop()

    // streaming near-dup over the real documents corpus (synthetic
    // ascending timestamps): per-row minhash projection + band-state
    // lookup; docs/s, not rows/s — each doc explodes to 4 band rows
    def runNearDup(name: String): Unit = {
      val docs = Tables.documents(spark, sfDir)
        .select($"doc_id", $"text").as[(Long, String)].collect()
        .map { case (id, tx) =>
          SDoc(id, tx, new java.sql.Timestamp(1700000000000L + id * 1000)) }
        .sortBy(_.ts.getTime).toSeq
      val in = MemoryStream[SDoc]
      val sq = graft.streaming.NearDup.nearDupStream(in.toDF(), "1 hour")
        .writeStream.format("noop").outputMode("append").start()
      val t0 = System.nanoTime()
      docs.grouped(1000).foreach { c => in.addData(c); sq.processAllAvailable() }
      val sec = (System.nanoTime() - t0) / 1e9
      sq.stop()
      println(f"$name%-22s ${docs.length / sec}%,10.0f docs/s  ($sec%.2f s, ${docs.length} docs)")
    }

    // the near-dup band-state workload at `mult`x the state volume:
    // every corpus copy is token-salted so its signatures (hence its
    // band buckets) are distinct, and the horizon outlives the whole
    // feed so the state store really holds mult x the buckets
    def runNearDupScaled(name: String, mult: Int, horizon: String): Unit = {
      val base = Tables.documents(spark, sfDir)
        .select($"doc_id", $"text").as[(Long, String)].collect()
      val n = base.length
      val docs = (0 until mult).flatMap { r =>
        base.map { case (id, tx) =>
          SDoc(id + r.toLong * n, s"$tx salt_r$r",
            new java.sql.Timestamp(1700000000000L + (id + r.toLong * n) * 1000))
        }
      }.sortBy(_.ts.getTime)
      val in = MemoryStream[SDoc]
      val sq = graft.streaming.NearDup.nearDupStream(in.toDF(), horizon)
        .writeStream.format("noop").outputMode("append").start()
      val t0 = System.nanoTime()
      docs.grouped(1000).foreach { c => in.addData(c); sq.processAllAvailable() }
      val sec = (System.nanoTime() - t0) / 1e9
      sq.stop()
      println(f"$name%-22s ${docs.length / sec}%,10.0f docs/s  ($sec%.2f s, ${docs.length} docs)")
    }

    // streaming SRP near-dup over the real embeddings (synthetic
    // ascending timestamps): native per-row signature + band-state
    // lookup holding the rep's quantized vector
    def runSrpNearDup(name: String): Unit = {
      val vecs = Tables.embeddings(spark, sfDir)
        .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
        .map { case (id, v) =>
          SVec(id, v, new java.sql.Timestamp(1700000000000L + id * 1000)) }
        .sortBy(_.ts.getTime).toSeq
      val in = MemoryStream[SVec]
      val sq = graft.streaming.NearDup.srpNearDupStream(in.toDF(), "1 hour")
        .writeStream.format("noop").outputMode("append").start()
      val t0 = System.nanoTime()
      vecs.grouped(500).foreach { c => in.addData(c); sq.processAllAvailable() }
      val sec = (System.nanoTime() - t0) / 1e9
      sq.stop()
      println(f"$name%-22s ${vecs.length / sec}%,10.0f vecs/s  ($sec%.2f s, ${vecs.length} vecs)")
    }

    // stateless PII redaction over customer-shaped records
    def runRedact(name: String): Unit = {
      val recs = Tables.customer(spark, sfDir)
        .select($"c_custkey".as("doc_id"),
          org.apache.spark.sql.functions.concat($"c_name",
            org.apache.spark.sql.functions.lit(" segment="),
            $"c_mktsegment").as("rec"))
        .as[(Long, String)].collect().map { case (id, r) => Rec(id, r) }.toSeq
      val in = MemoryStream[Rec]
      val sq = graft.streaming.DocStreams.redactRecords(in.toDF())
        .writeStream.format("noop").outputMode("append").start()
      val t0 = System.nanoTime()
      recs.grouped(5000).foreach { c => in.addData(c); sq.processAllAvailable() }
      val sec = (System.nanoTime() - t0) / 1e9
      sq.stop()
      println(f"$name%-22s ${recs.length / sec}%,10.0f recs/s  ($sec%.2f s, ${recs.length} recs)")
    }
  }
}
