package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{Cep, EventPattern}

/** Sensor event for the generic-CEP tests. */
case class Sensor(device: String, kind: String, ets: java.sql.Timestamp)

/** Sensor with a level, for the times()+where() guard test. */
case class Lev(device: String, kind: String, lvl: Int,
               ets: java.sql.Timestamp)

/** The generic pattern API ([[graft.streaming.EventPattern]] →
  * [[graft.streaming.Cep.detect]]): a three-stage A→B→C chain with
  * relaxed contiguity, within-window expiry, first-match consumption,
  * and per-stage event capture in the select function. */
class CepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def t(iso: String) =
    java.sql.Timestamp.from(java.time.Instant.parse(iso))

  private val pattern = EventPattern.begin[Sensor]("spike")
    .where(_.kind == "spike")
    .followedBy("stall").where(_.kind == "stall")
    .followedBy("crash").where(_.kind == "crash")
    .within(java.time.Duration.ofHours(1))

  private def detect(in: MemoryStream[Sensor]) =
    Cep.detect(
      in.toDS().withWatermark("ets", "0 seconds"),
      (e: Sensor) => e.device, (e: Sensor) => e.ets.getTime, pattern) { m =>
      (m("spike").head.device, m("spike").head.ets, m("crash").head.ets)
    }.toDF("device", "spike_ts", "crash_ts")

  test("A->B->C matches in order, skipping non-matching events (relaxed contiguity)") {
    val in = MemoryStream[Sensor]
    val q = detect(in).writeStream.format("memory").queryName("cep1")
      .outputMode(OutputMode.Append).start()
    in.addData(
      Sensor("d1", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "noise", t("2019-06-26T10:05:00Z")), // skipped, not fatal
      Sensor("d1", "stall", t("2019-06-26T10:10:00Z")),
      Sensor("d1", "crash", t("2019-06-26T10:20:00Z")),
      Sensor("d2", "spike", t("2019-06-26T10:00:00Z")), // other key: no stall/crash
      Sensor("d2", "crash", t("2019-06-26T10:20:00Z")))
    q.processAllAvailable()
    val got = spark.table("cep1")
      .as[(String, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet
    assert(got == Set(("d1", t("2019-06-26T10:00:00Z"), t("2019-06-26T10:20:00Z"))))
    q.stop()
  }

  test("within() expires a partial; a fresh sequence after expiry still matches") {
    val in = MemoryStream[Sensor]
    val q = detect(in).writeStream.format("memory").queryName("cep2")
      .outputMode(OutputMode.Append).start()
    in.addData(
      Sensor("d1", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "stall", t("2019-06-26T10:30:00Z")))
    q.processAllAvailable()
    // crash lands 90m after the spike: outside the 1h window
    in.addData(Sensor("d1", "crash", t("2019-06-26T11:30:00Z")))
    q.processAllAvailable()
    assert(spark.table("cep2").count() == 0)
    // a complete fresh sequence on the same key still matches
    in.addData(
      Sensor("d1", "spike", t("2019-06-26T12:00:00Z")),
      Sensor("d1", "stall", t("2019-06-26T12:10:00Z")),
      Sensor("d1", "crash", t("2019-06-26T12:20:00Z")))
    q.processAllAvailable()
    val got = spark.table("cep2")
      .as[(String, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet
    assert(got == Set(("d1", t("2019-06-26T12:00:00Z"), t("2019-06-26T12:20:00Z"))))
    q.stop()
  }

  test("first-match consumption: a completed partial cannot match a second closer") {
    val in = MemoryStream[Sensor]
    val q = detect(in).writeStream.format("memory").queryName("cep3")
      .outputMode(OutputMode.Append).start()
    in.addData(
      Sensor("d1", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "stall", t("2019-06-26T10:10:00Z")),
      Sensor("d1", "crash", t("2019-06-26T10:20:00Z")),
      Sensor("d1", "crash", t("2019-06-26T10:25:00Z"))) // partial already consumed
    q.processAllAvailable()
    assert(spark.table("cep3").count() == 1)
    q.stop()
  }

  test("next(): strict contiguity — any intervening event kills the partial") {
    val strict = EventPattern.begin[Sensor]("spike").where(_.kind == "spike")
      .next("stall").where(_.kind == "stall")
      .within(java.time.Duration.ofHours(1))
    val in = MemoryStream[Sensor]
    val q = Cep.detect(
      in.toDS().withWatermark("ets", "0 seconds"),
      (e: Sensor) => e.device, (e: Sensor) => e.ets.getTime, strict) { m =>
      (m("spike").head.device, m("spike").head.ets)
    }.toDF("device", "spike_ts")
      .writeStream.format("memory").queryName("cepn")
      .outputMode(OutputMode.Append).start()
    in.addData(
      // d1: spike -> noise -> stall: the noise KILLS the strict partial
      Sensor("d1", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "noise", t("2019-06-26T10:05:00Z")),
      Sensor("d1", "stall", t("2019-06-26T10:10:00Z")),
      // d2: spike immediately followed by stall: matches
      Sensor("d2", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d2", "stall", t("2019-06-26T10:05:00Z")))
    q.processAllAvailable()
    val got = spark.table("cepn")
      .as[(String, java.sql.Timestamp)].collect().toSet
    assert(got == Set(("d2", t("2019-06-26T10:00:00Z"))))
    q.stop()
  }

  test("notFollowedBy (non-terminal): forbidden event between stages kills the partial") {
    val absence = EventPattern.begin[Sensor]("spike").where(_.kind == "spike")
      .notFollowedBy("recover").where(_.kind == "recover")
      .followedBy("crash").where(_.kind == "crash")
      .within(java.time.Duration.ofHours(1))
    val in = MemoryStream[Sensor]
    val q = Cep.detect(
      in.toDS().withWatermark("ets", "0 seconds"),
      (e: Sensor) => e.device, (e: Sensor) => e.ets.getTime, absence) { m =>
      (m("spike").head.device, m("crash").head.ets, m("recover").size)
    }.toDF("device", "crash_ts", "n_recover")
      .writeStream.format("memory").queryName("cepnf")
      .outputMode(OutputMode.Append).start()
    in.addData(
      // d1: spike -> recover -> crash: recover kills it
      Sensor("d1", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "recover", t("2019-06-26T10:05:00Z")),
      Sensor("d1", "crash", t("2019-06-26T10:10:00Z")),
      // d2: spike -> noise -> crash: matches (noise is not forbidden)
      Sensor("d2", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d2", "noise", t("2019-06-26T10:05:00Z")),
      Sensor("d2", "crash", t("2019-06-26T10:10:00Z")))
    q.processAllAvailable()
    val got = spark.table("cepnf")
      .as[(String, java.sql.Timestamp, Int)].collect().toSet
    assert(got == Set(("d2", t("2019-06-26T10:10:00Z"), 0)))
    q.stop()
  }

  test("terminal notFollowedBy: absence match emits when the window closes unviolated") {
    val quiet = EventPattern.begin[Sensor]("spike").where(_.kind == "spike")
      .notFollowedBy("recover").where(_.kind == "recover")
      .within(java.time.Duration.ofMinutes(30))
    val in = MemoryStream[Sensor]
    val q = Cep.detect(
      in.toDS().withWatermark("ets", "0 seconds"),
      (e: Sensor) => e.device, (e: Sensor) => e.ets.getTime, quiet) { m =>
      (m("spike").head.device, m("spike").head.ets)
    }.toDF("device", "spike_ts")
      .writeStream.format("memory").queryName("cepterm")
      .outputMode(OutputMode.Append).start()
    in.addData(
      Sensor("d1", "spike", t("2019-06-26T10:00:00Z")),
      // d2 recovers inside its window: violated, never emits
      Sensor("d2", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d2", "recover", t("2019-06-26T10:10:00Z")))
    q.processAllAvailable()
    // nothing can emit until d1's window closes
    assert(spark.table("cepterm").count() == 0)
    // push the watermark past 10:30 on both keys
    in.addData(
      Sensor("d1", "noise", t("2019-06-26T11:00:00Z")),
      Sensor("d2", "noise", t("2019-06-26T11:00:00Z")))
    q.processAllAvailable()
    val got = spark.table("cepterm")
      .as[(String, java.sql.Timestamp)].collect().toSet
    assert(got == Set(("d1", t("2019-06-26T10:00:00Z"))))
    q.stop()
  }

  test("terminal notFollowedBy without within() is rejected") {
    val bad = EventPattern.begin[Sensor]("spike").where(_.kind == "spike")
      .notFollowedBy("recover").where(_.kind == "recover")
    val in = MemoryStream[Sensor]
    val ex = intercept[IllegalArgumentException] {
      Cep.detect(
        in.toDS().withWatermark("ets", "0 seconds"),
        (e: Sensor) => e.device, (e: Sensor) => e.ets.getTime, bad) { m =>
        m("spike").head.device
      }
    }
    assert(ex.getMessage.contains("within"))
  }

  test("timed-out partials surface on the side output with what they DID match") {
    val in = MemoryStream[Sensor]
    val q = Cep.detectWithTimeouts(
        in.toDS().withWatermark("ets", "0 seconds"),
        (e: Sensor) => e.device, (e: Sensor) => e.ets.getTime, pattern)(
        m => ("match", m("spike").head.device,
          m.keySet.toSeq.sorted.mkString(",")),
        m => ("timeout", m("spike").head.device,
          m.keySet.toSeq.sorted.mkString(",")))
      .toDF("tag", "device", "stages")
      .writeStream.format("memory").queryName("cepTo")
      .outputMode(OutputMode.Append).start()
    in.addData(
      Sensor("d1", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "stall", t("2019-06-26T10:10:00Z")), // partial: spike+stall
      Sensor("d2", "spike", t("2019-06-26T10:00:00Z")), // partial: spike only
      Sensor("d3", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d3", "stall", t("2019-06-26T10:10:00Z")),
      Sensor("d3", "crash", t("2019-06-26T10:20:00Z"))) // completes
    q.processAllAvailable()
    // push the watermark past every deadline: d1/d2 partials time out
    in.addData(Sensor("d9", "noise", t("2019-06-26T13:00:00Z")))
    q.processAllAvailable()
    val got = spark.table("cepTo")
      .as[(String, String, String)].collect().toSet
    assert(got == Set(
      ("match", "d3", "crash,spike,stall"),   // full match, all stages
      ("timeout", "d1", "spike,stall"),       // died waiting for crash
      ("timeout", "d2", "spike")))            // died waiting for stall
    q.stop()
  }

  test("one closing event completes every open partial (two spikes, one crash path each)") {
    val in = MemoryStream[Sensor]
    val q = detect(in).writeStream.format("memory").queryName("cep4")
      .outputMode(OutputMode.Append).start()
    in.addData(
      Sensor("d1", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "spike", t("2019-06-26T10:02:00Z")),
      Sensor("d1", "stall", t("2019-06-26T10:10:00Z")), // advances both partials
      Sensor("d1", "crash", t("2019-06-26T10:20:00Z"))) // completes both
    q.processAllAvailable()
    val got = spark.table("cep4")
      .as[(String, java.sql.Timestamp, java.sql.Timestamp)].collect()
      .map(_._2).toSet
    assert(got == Set(t("2019-06-26T10:00:00Z"), t("2019-06-26T10:02:00Z")))
    q.stop()
  }

  test("times(n) relaxed: n occurrences collect under one name, noise skipped") {
    val pat = EventPattern.begin[Sensor]("spike").where(_.kind == "spike")
      .followedBy("beat").where(_.kind == "beat").times(3)
      .followedBy("crash").where(_.kind == "crash")
      .within(java.time.Duration.ofHours(1))
    val in = MemoryStream[Sensor]
    val q = Cep.detect(
        in.toDS().withWatermark("ets", "0 seconds"),
        (e: Sensor) => e.device, (e: Sensor) => e.ets.getTime, pat) { m =>
        (m("spike").head.device, m("beat").map(_.ets.getTime).mkString(","),
          m("beat").size)
      }.toDF("device", "beats", "n")
      .writeStream.format("memory").queryName("cepTimes1")
      .outputMode(OutputMode.Append).start()
    in.addData(
      Sensor("d1", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "beat",  t("2019-06-26T10:01:00Z")),
      Sensor("d1", "noise", t("2019-06-26T10:02:00Z")), // skipped (relaxed)
      Sensor("d1", "beat",  t("2019-06-26T10:03:00Z")),
      Sensor("d1", "beat",  t("2019-06-26T10:05:00Z")),
      Sensor("d1", "crash", t("2019-06-26T10:10:00Z")),
      Sensor("d2", "spike", t("2019-06-26T10:00:00Z")), // only 2 beats: no match
      Sensor("d2", "beat",  t("2019-06-26T10:01:00Z")),
      Sensor("d2", "beat",  t("2019-06-26T10:02:00Z")),
      Sensor("d2", "crash", t("2019-06-26T10:10:00Z")))
    q.processAllAvailable()
    val got = spark.table("cepTimes1")
      .as[(String, String, Int)].collect().toSet
    val beats = Seq("2019-06-26T10:01:00Z", "2019-06-26T10:03:00Z",
      "2019-06-26T10:05:00Z").map(x => t(x).getTime).mkString(",")
    assert(got == Set(("d1", beats, 3)))
    q.stop()
  }

  test("next().times(n): repetitions demand strict contiguity — noise kills") {
    val pat = EventPattern.begin[Sensor]("spike").where(_.kind == "spike")
      .next("beat").where(_.kind == "beat").times(2)
      .within(java.time.Duration.ofHours(1))
    val in = MemoryStream[Sensor]
    val q = Cep.detect(
        in.toDS().withWatermark("ets", "0 seconds"),
        (e: Sensor) => e.device, (e: Sensor) => e.ets.getTime, pat) { m =>
        (m("spike").head.device, m("beat").size)
      }.toDF("device", "n")
      .writeStream.format("memory").queryName("cepTimes2")
      .outputMode(OutputMode.Append).start()
    in.addData(
      Sensor("d1", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "beat",  t("2019-06-26T10:01:00Z")),
      Sensor("d1", "noise", t("2019-06-26T10:02:00Z")), // strict: kills d1
      Sensor("d1", "beat",  t("2019-06-26T10:03:00Z")),
      Sensor("d2", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d2", "beat",  t("2019-06-26T10:01:00Z")),
      Sensor("d2", "beat",  t("2019-06-26T10:02:00Z"))) // consecutive: match
    q.processAllAvailable()
    val got = spark.table("cepTimes2").as[(String, Int)].collect().toSet
    assert(got == Set(("d2", 2)))
    q.stop()
  }

  test("where() after times() guards every repetition, not just the last clone") {
    // guard added AFTER times(2) must apply to both beat clones:
    // a "beat" with the wrong level may not count toward the pair
    val pat = EventPattern.begin[Lev]("spike").where(_.kind == "spike")
      .followedBy("beat").where(_.kind == "beat").times(2).where(_.lvl > 5)
      .within(java.time.Duration.ofHours(1))
    val in = MemoryStream[Lev]
    val q = Cep.detect(
        in.toDS().withWatermark("ets", "0 seconds"),
        (e: Lev) => e.device, (e: Lev) => e.ets.getTime, pat) { m =>
        (m("spike").head.device, m("beat").map(_.lvl).mkString(","))
      }.toDF("device", "lvls")
      .writeStream.format("memory").queryName("cepTimes3")
      .outputMode(OutputMode.Append).start()
    in.addData(
      Lev("d1", "spike", 0, t("2019-06-26T10:00:00Z")),
      Lev("d1", "beat", 3, t("2019-06-26T10:01:00Z")), // lvl too low: skipped
      Lev("d1", "beat", 7, t("2019-06-26T10:02:00Z")),
      Lev("d1", "beat", 9, t("2019-06-26T10:03:00Z")))
    q.processAllAvailable()
    val got = spark.table("cepTimes3").as[(String, String)].collect().toSet
    assert(got == Set(("d1", "7,9")))
    q.stop()
  }

  test("oneOrMore: a greedy maximal run ends when the next stage matches") {
    // spike, then one-or-more beats, closed by a crash: the match
    // carries the WHOLE beat run, noise inside the run is skipped
    val pat = EventPattern.begin[Sensor]("spike").where(_.kind == "spike")
      .followedBy("beat").where(_.kind == "beat").oneOrMore
      .followedBy("crash").where(_.kind == "crash")
      .within(java.time.Duration.ofHours(1))
    val in = MemoryStream[Sensor]
    val q = Cep.detect(
        in.toDS().withWatermark("ets", "0 seconds"),
        (e: Sensor) => e.device, (e: Sensor) => e.ets.getTime, pat) { m =>
        (m("spike").head.device, m("beat").size, m("crash").size)
      }.toDF("device", "n_beats", "n_crash")
      .writeStream.format("memory").queryName("cepOom1")
      .outputMode(OutputMode.Append).start()
    in.addData(
      Sensor("d1", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "beat", t("2019-06-26T10:01:00Z")),
      Sensor("d1", "noise", t("2019-06-26T10:02:00Z")), // relaxed: skipped
      Sensor("d1", "beat", t("2019-06-26T10:03:00Z")),
      Sensor("d1", "beat", t("2019-06-26T10:04:00Z")),
      Sensor("d1", "crash", t("2019-06-26T10:05:00Z")),
      Sensor("d2", "spike", t("2019-06-26T10:00:00Z")), // zero beats: no match
      Sensor("d2", "crash", t("2019-06-26T10:05:00Z")))
    q.processAllAvailable()
    val got = spark.table("cepOom1").as[(String, Int, Int)].collect().toSet
    assert(got == Set(("d1", 3, 1)),
      "the full 3-beat run must ride under one match; zero-run d2 must not match")
    q.stop()
  }

  test("oneOrMore at the head: each run start opens its own match (no-skip multiplicity)") {
    val pat = EventPattern.begin[Sensor]("beat").where(_.kind == "beat").oneOrMore
      .followedBy("crash").where(_.kind == "crash")
      .within(java.time.Duration.ofHours(1))
    val in = MemoryStream[Sensor]
    val q = Cep.detect(
        in.toDS().withWatermark("ets", "0 seconds"),
        (e: Sensor) => e.device, (e: Sensor) => e.ets.getTime, pat) { m =>
        (m("beat").head.ets, m("beat").size)
      }.toDF("run_start", "n_beats")
      .writeStream.format("memory").queryName("cepOom2")
      .outputMode(OutputMode.Append).start()
    in.addData(
      Sensor("d1", "beat", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "beat", t("2019-06-26T10:01:00Z")),
      Sensor("d1", "crash", t("2019-06-26T10:02:00Z")))
    q.processAllAvailable()
    val got = spark.table("cepOom2")
      .as[(java.sql.Timestamp, Int)].collect().toSet
    // FlinkCEP no-skip default: the 2-beat run and its 1-beat suffix
    assert(got == Set(
      (t("2019-06-26T10:00:00Z"), 2), (t("2019-06-26T10:01:00Z"), 1)))
    q.stop()
  }

  test("terminal oneOrMore emits one match per prefix as events are absorbed (FlinkCEP parity)") {
    val pat = EventPattern.begin[Sensor]("spike").where(_.kind == "spike")
      .followedBy("beat").where(_.kind == "beat").oneOrMore
      .within(java.time.Duration.ofMinutes(10))
    val in = MemoryStream[Sensor]
    val q = Cep.detect(
        in.toDS().withWatermark("ets", "0 seconds"),
        (e: Sensor) => e.device, (e: Sensor) => e.ets.getTime, pat) { m =>
        (m("spike").head.device, m("beat").size)
      }.toDF("device", "n_beats")
      .writeStream.format("memory").queryName("cepOom3")
      .outputMode(OutputMode.Append).start()
    in.addData(
      Sensor("d1", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "beat", t("2019-06-26T10:02:00Z")),
      Sensor("d1", "beat", t("2019-06-26T10:04:00Z")))
    q.processAllAvailable()
    val eager = spark.table("cepOom3").as[(String, Int)].collect().toSet
    assert(eager == Set(("d1", 1), ("d1", 2)),
      s"each absorbed beat completes its own prefix match immediately: $eager")
    // closing the window adds NOTHING — every prefix already emitted
    in.addData(Sensor("d1", "noise", t("2019-06-26T11:00:00Z")))
    q.processAllAvailable()
    assert(spark.table("cepOom3").count() == 2)
    q.stop()
  }

  test("emitMaximalOnly: the terminal run emits once, maximal, at window close") {
    val pat = EventPattern.begin[Sensor]("spike").where(_.kind == "spike")
      .followedBy("beat").where(_.kind == "beat").oneOrMore
      .within(java.time.Duration.ofMinutes(10))
      .emitMaximalOnly
    val in = MemoryStream[Sensor]
    val q = Cep.detect(
        in.toDS().withWatermark("ets", "0 seconds"),
        (e: Sensor) => e.device, (e: Sensor) => e.ets.getTime, pat) { m =>
        (m("spike").head.device, m("beat").size)
      }.toDF("device", "n_beats")
      .writeStream.format("memory").queryName("cepOom3max")
      .outputMode(OutputMode.Append).start()
    in.addData(
      Sensor("d1", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "beat", t("2019-06-26T10:02:00Z")),
      Sensor("d1", "beat", t("2019-06-26T10:04:00Z")))
    q.processAllAvailable()
    assert(spark.table("cepOom3max").count() == 0,
      "the run is still open — nothing may emit before the window closes")
    in.addData(Sensor("d1", "noise", t("2019-06-26T11:00:00Z")))
    q.processAllAvailable()
    val got = spark.table("cepOom3max").as[(String, Int)].collect().toSet
    assert(got == Set(("d1", 2)))
    q.stop()
  }

  test("times(from, to) range: min enforced, greedy absorption up to max") {
    val pat = EventPattern.begin[Sensor]("spike").where(_.kind == "spike")
      .followedBy("beat").where(_.kind == "beat").times(2, 4)
      .followedBy("crash").where(_.kind == "crash")
      .within(java.time.Duration.ofHours(1))
    val in = MemoryStream[Sensor]
    val q = Cep.detect(
        in.toDS().withWatermark("ets", "0 seconds"),
        (e: Sensor) => e.device, (e: Sensor) => e.ets.getTime, pat) { m =>
        (m("spike").head.device, m("beat").size, m("crash").size)
      }.toDF("device", "n_beats", "n_crash")
      .writeStream.format("memory").queryName("cepRange1")
      .outputMode(OutputMode.Append).start()
    def feed(dev: String, nBeats: Int): Seq[Sensor] =
      Sensor(dev, "spike", t("2019-06-26T10:00:00Z")) +:
        (1 to nBeats).map(i =>
          Sensor(dev, "beat", t(f"2019-06-26T10:0$i:00Z"))) :+
        Sensor(dev, "crash", t("2019-06-26T10:09:00Z"))
    in.addData(feed("d1", 1) ++ feed("d2", 2) ++ feed("d3", 3) ++ feed("d6", 6))
    q.processAllAvailable()
    val got = spark.table("cepRange1").as[(String, Int, Int)].collect().toSet
    // d1: below min — no match. d2/d3: in range, all beats captured.
    // d6: absorbs the max 4 greedily, beats 5-6 are relaxed noise.
    assert(got == Set(("d2", 2, 1), ("d3", 3, 1), ("d6", 4, 1)))
    q.stop()
  }

  test("terminal times(from, to): every count in range emits eagerly (FlinkCEP parity); emitMaximalOnly waits") {
    val base = EventPattern.begin[Sensor]("spike").where(_.kind == "spike")
      .followedBy("beat").where(_.kind == "beat").times(1, 2)
      .within(java.time.Duration.ofMinutes(10))
    val feed = Seq(
      // d1 fills the range: a match per count — {1 beat} then {2 beats}
      Sensor("d1", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "beat", t("2019-06-26T10:01:00Z")),
      Sensor("d1", "beat", t("2019-06-26T10:02:00Z")),
      // d2 reaches only the min: its one prefix emits on the beat
      Sensor("d2", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d2", "beat", t("2019-06-26T10:01:00Z")),
      // d3 never reaches the min: times out silently
      Sensor("d3", "spike", t("2019-06-26T10:00:00Z")))
    val close = Seq(
      Sensor("d1", "noise", t("2019-06-26T11:00:00Z")),
      Sensor("d2", "noise", t("2019-06-26T11:00:00Z")),
      Sensor("d3", "noise", t("2019-06-26T11:00:00Z")))
    def drive(pat: graft.streaming.EventPattern[Sensor], name: String)
        : (Set[(String, Int)], Set[(String, Int)]) = {
      val in = MemoryStream[Sensor]
      val q = Cep.detect(
          in.toDS().withWatermark("ets", "0 seconds"),
          (e: Sensor) => e.device, (e: Sensor) => e.ets.getTime, pat) { m =>
          (m("spike").head.device, m("beat").size)
        }.toDF("device", "n_beats")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      in.addData(feed); q.processAllAvailable()
      val early = spark.table(name).as[(String, Int)].collect().toSet
      in.addData(close); q.processAllAvailable()
      val all = spark.table(name).as[(String, Int)].collect().toSet
      q.stop()
      (early, all)
    }
    val (early, all) = drive(base, "cepRange2")
    assert(early == Set(("d1", 1), ("d1", 2), ("d2", 1)),
      s"every satisfied count emits as its beat arrives: $early")
    assert(all == early, "the window close adds nothing — all prefixes emitted")
    val (earlyM, allM) = drive(base.emitMaximalOnly, "cepRange2max")
    // maximal-only: d1's FULL absorption still emits eagerly (the max
    // is known the moment the range fills); d2's partial absorption
    // waits for the close; d3 still times out silently
    assert(earlyM == Set(("d1", 2)), s"only the full range emits early: $earlyM")
    assert(allM == Set(("d1", 2), ("d2", 1)))
  }

  test("terminal times(from, to) without within() is rejected") {
    val bad = EventPattern.begin[Sensor]("spike").where(_.kind == "spike")
      .followedBy("beat").where(_.kind == "beat").times(1, 3)
    val in = MemoryStream[Sensor]
    val ex = intercept[IllegalArgumentException] {
      Cep.detect(
        in.toDS().withWatermark("ets", "0 seconds"),
        (e: Sensor) => e.device, (e: Sensor) => e.ets.getTime, bad) { m =>
        m("spike").head.device
      }
    }
    assert(ex.getMessage.contains("within"))
  }

  test("until() terminates a terminal oneOrMore, stop event not absorbed") {
    def base = EventPattern.begin[Sensor]("spike").where(_.kind == "spike")
      .followedBy("beat").where(_.kind == "beat").oneOrMore
      .until(_.kind == "stop")
      .within(java.time.Duration.ofHours(1))
    val feed = Seq(
      Sensor("d1", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "beat", t("2019-06-26T10:01:00Z")),
      Sensor("d1", "beat", t("2019-06-26T10:02:00Z")),
      Sensor("d1", "stop", t("2019-06-26T10:03:00Z")),
      Sensor("d1", "beat", t("2019-06-26T10:04:00Z")), // after stop: dead
      // d2's stop arrives before any beat: the partial dies
      Sensor("d2", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d2", "stop", t("2019-06-26T10:01:00Z")),
      Sensor("d2", "beat", t("2019-06-26T10:02:00Z")))
    def drive(pat: graft.streaming.EventPattern[Sensor], name: String)
        : Set[(String, Int)] = {
      val in = MemoryStream[Sensor]
      val q = Cep.detect(
          in.toDS().withWatermark("ets", "0 seconds"),
          (e: Sensor) => e.device, (e: Sensor) => e.ets.getTime, pat) { m =>
          (m("spike").head.device, m("beat").size)
        }.toDF("device", "n_beats")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      in.addData(feed)
      q.processAllAvailable()
      val got = spark.table(name).as[(String, Int)].collect().toSet
      q.stop()
      got
    }
    // parity default: each beat emitted its prefix when absorbed; the
    // stop closes the run (the post-stop beat adds nothing), and no
    // watermark advance is needed for any of it
    assert(drive(base, "cepUntil1") == Set(("d1", 1), ("d1", 2)),
      "prefixes emit on absorption; stop kills the run unabsorbed; empty runs die")
    // emitMaximalOnly: the stop fires the single maximal emission
    assert(drive(base.emitMaximalOnly, "cepUntil1max") == Set(("d1", 2)),
      "maximal-only: the stop emits the run once, maximal")
  }

  test("until() on a non-terminal oneOrMore: stopped run advances to the next stage") {
    val pat = EventPattern.begin[Sensor]("spike").where(_.kind == "spike")
      .followedBy("beat").where(_.kind == "beat").oneOrMore
      .until(_.kind == "stop")
      .followedBy("crash").where(_.kind == "crash")
      .within(java.time.Duration.ofHours(1))
    val in = MemoryStream[Sensor]
    val q = Cep.detect(
        in.toDS().withWatermark("ets", "0 seconds"),
        (e: Sensor) => e.device, (e: Sensor) => e.ets.getTime, pat) { m =>
        (m("spike").head.device, m("beat").size, m("crash").size)
      }.toDF("device", "n_beats", "n_crash")
      .writeStream.format("memory").queryName("cepUntil2")
      .outputMode(OutputMode.Append).start()
    in.addData(
      // d1: run stopped, then crash completes
      Sensor("d1", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "beat", t("2019-06-26T10:01:00Z")),
      Sensor("d1", "stop", t("2019-06-26T10:02:00Z")),
      Sensor("d1", "beat", t("2019-06-26T10:03:00Z")), // after stop: NOT absorbed
      Sensor("d1", "crash", t("2019-06-26T10:04:00Z")),
      // d2: no stop — crash still closes the run the normal way
      Sensor("d2", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d2", "beat", t("2019-06-26T10:01:00Z")),
      Sensor("d2", "crash", t("2019-06-26T10:02:00Z")))
    q.processAllAvailable()
    val got = spark.table("cepUntil2").as[(String, Int, Int)].collect().toSet
    assert(got == Set(("d1", 1, 1), ("d2", 1, 1)))
    q.stop()
  }

  private def runPattern(pat: EventPattern[Sensor], name: String,
                         events: Seq[Sensor]): Set[(Long, Int)] = {
    val in = MemoryStream[Sensor]
    val q = Cep.detect(
        in.toDS().withWatermark("ets", "0 seconds"),
        (e: Sensor) => e.device, (e: Sensor) => e.ets.getTime, pat) { m =>
        (m("beat").head.ets.getTime, m("beat").size)
      }.toDF("run_start", "n_beats")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    in.addData(events)
    q.processAllAvailable()
    val got = spark.table(name).as[(Long, Int)].collect().toSet
    q.stop()
    got
  }

  test("AFTER_MATCH skip strategies change match multiplicity on the b+ c chain") {
    // the FlinkCEP documentation example: beats b1 b2 b3, then crash.
    // noSkip emits every suffix run; skipPastLastEvent only the
    // earliest (maximal) one; skipToFirst("beat") behaves like noSkip
    // here (the skip span [start, first beat) is empty for suffixes);
    // skipToLast("beat") keeps runs starting AT the last beat.
    def base = EventPattern.begin[Sensor]("beat").where(_.kind == "beat")
      .oneOrMore
      .followedBy("crash").where(_.kind == "crash")
      .within(java.time.Duration.ofHours(1))
    val evs = Seq(
      Sensor("d1", "beat", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "beat", t("2019-06-26T10:01:00Z")),
      Sensor("d1", "beat", t("2019-06-26T10:02:00Z")),
      Sensor("d1", "crash", t("2019-06-26T10:03:00Z")))
    val t0 = t("2019-06-26T10:00:00Z").getTime
    val t1 = t("2019-06-26T10:01:00Z").getTime
    val t2 = t("2019-06-26T10:02:00Z").getTime
    assert(runPattern(base, "cepSkip0", evs) ==
      Set((t0, 3), (t1, 2), (t2, 1)), "noSkip: every suffix run emits")
    assert(runPattern(base.afterMatchSkip(
        graft.streaming.SkipStrategy.SkipPastLastEvent), "cepSkip1", evs) ==
      Set((t0, 3)), "skipPastLastEvent: suffixes inside the span die")
    assert(runPattern(base.afterMatchSkip(
        graft.streaming.SkipStrategy.SkipToLast("beat")), "cepSkip2", evs) ==
      Set((t0, 3), (t2, 1)),
      "skipToLast(beat): only runs before the last beat die")
    assert(runPattern(base.afterMatchSkip(
        graft.streaming.SkipStrategy.SkipToFirst("crash")), "cepSkip3", evs) ==
      Set((t0, 3)),
      "skipToFirst(crash): the span reaches the crash — suffixes die")
    // SKIP_TO_NEXT discards only SAME-START siblings; the b+ c suffix
    // runs all start at distinct events, so (matching FlinkCEP's
    // documented semantics) it behaves like noSkip on this chain
    assert(runPattern(base.afterMatchSkip(
        graft.streaming.SkipStrategy.SkipToNext), "cepSkip4", evs) ==
      Set((t0, 3), (t1, 2), (t2, 1)),
      "skipToNext: distinct-start suffix runs all survive")
  }

  test("SKIP_TO_NEXT: at most one match per start event (terminal b+ " +
    "and followedByAny)") {
    // FlinkCEP's own SKIP_TO_NEXT example: pattern b+ over b1 b2 b3
    // emits exactly b1, b2, b3 — every longer run shares an already-
    // emitted match's start and dies with it
    val beats = EventPattern.begin[Sensor]("beat").where(_.kind == "beat")
      .oneOrMore
      .within(java.time.Duration.ofHours(1))
    val evs = Seq(
      Sensor("d1", "beat", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "beat", t("2019-06-26T10:01:00Z")),
      Sensor("d1", "beat", t("2019-06-26T10:02:00Z")))
    val t0 = t("2019-06-26T10:00:00Z").getTime
    val t1 = t("2019-06-26T10:01:00Z").getTime
    val t2 = t("2019-06-26T10:02:00Z").getTime
    assert(runPattern(beats, "cepStn0", evs) ==
      Set((t0, 1), (t0, 2), (t0, 3), (t1, 1), (t1, 2), (t2, 1)),
      "noSkip baseline: every (start, prefix) run emits")
    assert(runPattern(beats.afterMatchSkip(
        graft.streaming.SkipStrategy.SkipToNext), "cepStn1", evs) ==
      Set((t0, 1), (t1, 1), (t2, 1)),
      "skipToNext: one match per start event")
    // followedByAny: both matches share the start event a1 — the
    // first completion consumes the start, the alternative dies
    val anyPat = EventPattern.begin[Sensor]("beat").where(_.kind == "beat")
      .followedByAny("crash").where(_.kind == "crash")
      .within(java.time.Duration.ofHours(1))
    def runCrash(pat: EventPattern[Sensor], name: String): Set[Long] = {
      val in = MemoryStream[Sensor]
      val q = Cep.detect(
          in.toDS().withWatermark("ets", "0 seconds"),
          (e: Sensor) => e.device, (e: Sensor) => e.ets.getTime, pat) { m =>
          m("crash").head.ets.getTime
        }.toDF("crash_ts")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      in.addData(Seq(
        Sensor("d1", "beat", t("2019-06-26T10:00:00Z")),
        Sensor("d1", "crash", t("2019-06-26T10:01:00Z")),
        Sensor("d1", "crash", t("2019-06-26T10:02:00Z"))))
      q.processAllAvailable()
      val got = spark.table(name).as[Long].collect().toSet
      q.stop()
      got
    }
    assert(runCrash(anyPat, "cepStn2") == Set(t1, t2),
      "noSkip baseline: followedByAny emits both alternatives")
    assert(runCrash(anyPat.afterMatchSkip(
        graft.streaming.SkipStrategy.SkipToNext), "cepStn3") == Set(t1),
      "skipToNext: the same-start alternative dies with the first match")
  }

  test("optional: taken when present, skipped when the next stage matches first") {
    val pat = EventPattern.begin[Sensor]("spike").where(_.kind == "spike")
      .followedBy("stall").where(_.kind == "stall").optional
      .followedBy("crash").where(_.kind == "crash")
      .within(java.time.Duration.ofHours(1))
    val in = MemoryStream[Sensor]
    val q = Cep.detect(
        in.toDS().withWatermark("ets", "0 seconds"),
        (e: Sensor) => e.device, (e: Sensor) => e.ets.getTime, pat) { m =>
        (m("spike").head.device, m("stall").size, m("crash").size)
      }.toDF("device", "n_stall", "n_crash")
      .writeStream.format("memory").queryName("cepOpt1")
      .outputMode(OutputMode.Append).start()
    in.addData(
      // d1 goes spike -> stall -> crash: optional taken
      Sensor("d1", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "stall", t("2019-06-26T10:05:00Z")),
      Sensor("d1", "crash", t("2019-06-26T10:10:00Z")),
      // d2 goes spike -> crash directly: optional skipped
      Sensor("d2", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d2", "crash", t("2019-06-26T10:10:00Z")))
    q.processAllAvailable()
    val got = spark.table("cepOpt1").as[(String, Int, Int)].collect().toSet
    assert(got == Set(("d1", 1, 1), ("d2", 0, 1)))
    q.stop()
  }

  test("or(): a stage guard disjunction — either kind starts the match") {
    // spike OR surge opens; .where after .or conjoins onto (a || b)
    val pat = EventPattern.begin[Sensor]("start")
      .where(_.kind == "spike").or(_.kind == "surge")
      .where(_.device != "quarantined")
      .followedBy("crash").where(_.kind == "crash")
      .within(java.time.Duration.ofHours(1))
    val in = MemoryStream[Sensor]
    val q = Cep.detect(
        in.toDS().withWatermark("ets", "0 seconds"),
        (e: Sensor) => e.device, (e: Sensor) => e.ets.getTime, pat) { m =>
        (m("start").head.device, m("start").head.kind)
      }.toDF("device", "start_kind")
      .writeStream.format("memory").queryName("cepOr1")
      .outputMode(OutputMode.Append).start()
    in.addData(
      Sensor("d1", "spike", t("2019-06-26T10:00:00Z")),
      Sensor("d1", "crash", t("2019-06-26T10:10:00Z")),
      Sensor("d2", "surge", t("2019-06-26T10:00:00Z")),
      Sensor("d2", "crash", t("2019-06-26T10:10:00Z")),
      Sensor("d3", "stall", t("2019-06-26T10:00:00Z")), // matches neither arm
      Sensor("d3", "crash", t("2019-06-26T10:10:00Z")),
      Sensor("quarantined", "spike", t("2019-06-26T10:00:00Z")), // killed by the post-or where
      Sensor("quarantined", "crash", t("2019-06-26T10:10:00Z")))
    q.processAllAvailable()
    val got = spark.table("cepOr1").as[(String, String)].collect().toSet
    assert(got == Set(("d1", "spike"), ("d2", "surge")))
    q.stop()
  }

  test("subtype()/whereSubtype(): stage narrowed to a runtime subtype (pure NFA)") {
    // driven through Cep.step directly — a sealed ADT needs no Spark
    // encoder there, and detect() executes exactly this step function
    sealed trait Alarm { def ts: Long }
    case class Warn(ts: Long) extends Alarm
    case class Fatal(ts: Long, code: Int) extends Alarm
    val pat = EventPattern.begin[Alarm]("w").subtype[Warn]
      .followedBy("f").whereSubtype[Fatal](_.code >= 500)
      .within(java.time.Duration.ofMillis(100))
    val events = List[Alarm](
      Warn(0),            // opens
      Fatal(10, 404),     // a Fatal but sub-threshold: skipped (relaxed)
      Warn(20),           // opens a second partial
      Fatal(30, 503))     // closes BOTH opens (one event, many partials)
    val (_, matches, _) = Cep.step(pat.steps, pat.withinMs,
      (e: Alarm) => e.ts, List.empty[Cep.Partial[Alarm]], events, Long.MinValue)
    val got = matches.map(m => (m("w").head.ts, m("f").head.ts)).toSet
    assert(got == Set((0L, 30L), (20L, 30L)))
    // a Fatal never satisfies the Warn-subtyped stage
    val (open, none, _) = Cep.step(pat.steps, pat.withinMs,
      (e: Alarm) => e.ts, List.empty[Cep.Partial[Alarm]],
      List[Alarm](Fatal(0, 503), Fatal(10, 503)), Long.MinValue)
    assert(none.isEmpty && open.isEmpty)
  }

  test("whereIterative(): guard reads the matched prefix (value > 2x the base's)") {
    // FlinkCEP IterativeCondition parity: the second stage's guard is
    // conditioned on what the FIRST stage matched — inexpressible
    // with per-event guards.
    case class V(kind: String, lvl: Int, ts: Long)
    val pat = EventPattern.begin[V]("base").where(_.kind == "base")
      .followedBy("above")
      .whereIterative((e, ctx) =>
        e.kind == "v" && e.lvl > 2 * ctx.eventsFor("base").head.lvl)
      .within(java.time.Duration.ofMillis(1000))
    val events = List(
      V("base", 10, 0),
      V("v", 15, 10),  // not > 20: skipped, partial stays open
      V("v", 25, 20),  // > 20: closes the base-10 partial
      V("base", 1, 30),
      V("v", 2, 40),   // not > 2: skipped
      V("v", 3, 50))   // > 2: closes the base-1 partial
    val (_, matches, _) = Cep.step(pat.steps, pat.withinMs,
      (e: V) => e.ts, List.empty[Cep.Partial[V]], events, Long.MinValue)
    val got = matches.map(m => (m("base").head.lvl, m("above").head.lvl)).toSet
    assert(got == Set((10, 25), (1, 3)))
  }

  test("untilIterative(): the stop condition reads the absorbed run (budgeted one-or-more)") {
    // stop the loop once the matched run's sum reaches 10 — the stop
    // event is NOT absorbed
    case class V(kind: String, lvl: Int, ts: Long)
    def pat = EventPattern.begin[V]("start").where(_.kind == "s")
      .followedBy("run").where(_.kind == "v").oneOrMore
      .untilIterative((e, ctx) =>
        e.kind == "v" && ctx.eventsFor("run").map(_.lvl).sum >= 10)
      .within(java.time.Duration.ofMillis(1000))
    val events = List(
      V("s", 0, 0),
      V("v", 4, 10),   // run sum 0 < 10: absorbed
      V("v", 5, 20),   // run sum 4: absorbed
      V("v", 3, 30),   // run sum 9: absorbed
      V("v", 2, 40),   // run sum 12 >= 10: STOP, not absorbed
      V("v", 9, 50))   // after the stop: a fresh partial would need a new 's'
    // parity default: every prefix emitted as absorbed; the stop
    // closes the run without a further emission
    val (_, matches, _) = Cep.step(pat.steps, pat.withinMs,
      (e: V) => e.ts, List.empty[Cep.Partial[V]], events, Long.MinValue)
    assert(matches.map(_("run").map(_.lvl).toList) ==
      Vector(List(4), List(4, 5), List(4, 5, 3)))
    // emitMaximalOnly: the stop fires the one maximal emission
    val (_, maxm, _) = Cep.step(pat.steps, pat.withinMs,
      (e: V) => e.ts, List.empty[Cep.Partial[V]], events, Long.MinValue,
      maximalOnly = true)
    assert(maxm.map(_("run").map(_.lvl).toList) == Vector(List(4, 5, 3)))
  }

  test("whereIterative() on a times(n) stage sees the run absorbed so far (strictly increasing)") {
    // each clone's guard demands the new value exceed EVERY value the
    // shared-name stage has matched — a strictly increasing length-3
    // subsequence with relaxed contiguity
    case class V(kind: String, lvl: Int, ts: Long)
    val pat = EventPattern.begin[V]("inc").where(_.kind == "v")
      .whereIterative((e, ctx) => ctx.eventsFor("inc").forall(_.lvl < e.lvl))
      .times(3)
      .within(java.time.Duration.ofMillis(1000))
    val events = List(
      V("v", 5, 0), V("v", 3, 10), V("v", 7, 20),
      V("v", 6, 30), V("v", 9, 40))
    val (_, matches, _) = Cep.step(pat.steps, pat.withinMs,
      (e: V) => e.ts, List.empty[Cep.Partial[V]], events, Long.MinValue)
    val got = matches.map(_("inc").map(_.lvl).toList).toSet
    // increasing triples reachable under NFA advance-on-match
    // semantics (a partial consumes a matching event; it does not
    // fork a skip branch): 5-7-9 and 3-7-9 complete; 6 and trailing
    // partials stay open
    assert(got == Set(List(5, 7, 9), List(3, 7, 9)))
  }

  test("a 100%-filtered stretch stalls detect's within-timeouts when " +
    "the filter sits below the clock; WatermarkTicks heartbeats fire " +
    "them through a sentinel key the NFA ignores") {
    import graft.streaming.WatermarkTicks
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.col
    // the stalling shape (the q09 stream's filter-to-relevant-events
    // move, with the predicate landing BELOW the clock): watermark
    // first, then a plain Filter on a non-event-time column —
    // predicate pushdown moves the Filter below the watermark node,
    // so a noise-only stretch advances nothing and an open partial's
    // within-deadline never passes: no timeout side output, and the
    // partial's state lingers (exactly the windowed-agg stall
    // CommitStreamsSpec pins, manifest in the NFA)
    def feed(prep: DataFrame => org.apache.spark.sql.Dataset[Sensor])
        : Set[(String, String, String)] = {
      val in = MemoryStream[Sensor]
      val name = s"cepTick${in.hashCode().abs}"
      val q = Cep.detectWithTimeouts(
          prep(in.toDF()),
          (e: Sensor) => e.device, (e: Sensor) => e.ets.getTime, pattern)(
          m => ("match", m("spike").head.device,
            m.keySet.toSeq.sorted.mkString(",")),
          m => ("timeout", m("spike").head.device,
            m.keySet.toSeq.sorted.mkString(",")))
        .toDF("tag", "device", "stages")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      in.addData(Sensor("d1", "spike", t("2019-06-26T10:00:00Z")))
      q.processAllAvailable()
      // a fully-filtered stretch, hours past d1's 1h deadline
      in.addData(Sensor("d7", "noise", t("2019-06-26T13:00:00Z")))
      q.processAllAvailable()
      in.addData(Sensor("d8", "noise", t("2019-06-26T14:00:00Z")))
      q.processAllAvailable()
      val got = spark.table(name)
        .as[(String, String, String)].collect().toSet
      q.stop()
      got
    }
    val keep = col("kind") =!= "noise"
    val plain = feed(df => df.withWatermark("ets", "0 seconds")
      .filter(keep).as[Sensor])
    assert(plain.isEmpty,
      s"pinning today's engine behavior: the Filter is pushed below " +
        s"the watermark node and the NFA clock must stall — $plain")
    // the structural fix, composed with detect: dropped rows become
    // sentinel-KEYED heartbeats (device = Tick, kind nulled) that
    // flow through the watermark node — the clock advances — and
    // then into the NFA under their own key, where they match no
    // guard (the head guard wants kind == "spike"), open no partial,
    // and leave no state: the same watermark pass that would prune
    // them fires d1's timeout
    val ticked = feed { df =>
      WatermarkTicks.filterTicked(df, keep, "ets", Seq("device"))
        .withWatermark("ets", "0 seconds").as[Sensor]
    }
    assert(ticked == Set(("timeout", "d1", "spike")),
      s"heartbeats must fire the within-timeout and add NOTHING else: $ticked")
  }
}
