package graft

import graft.queries.Extensions
import graft.streaming.NearDup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import CommitFixtures.t

case class SDoc(doc_id: Long, text: String, ts: Timestamp)
case class SVec(vec_id: Long, embedding: Array[Float], ts: Timestamp)

/** Streaming MinHash+LSH near-dup: per-row minhash is bit-identical
  * to the batch aggregate, matches fire for in-horizon near-dups via
  * band-state + exact mask verify, and representatives expire at the
  * event-time horizon. */
class NearDupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit lazy val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("per-row minhashOf is bit-identical to the MinHashAgg aggregate") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val perRow = docs
      .withColumn("hs", Extensions.baseHashes(col("text"), "t:"))
      .select(col("doc_id"), Extensions.minhashOf(col("hs")).as("mhs"))
    val agged = docs
      .select(col("doc_id"), explode(graft.ops.Cols.tokenSet(col("text"))).as("tok"))
      .withColumn("h", conv(substring(md5(concat(lit("t:"), col("tok"))), 1, 8), 16, 10).cast("long"))
      .groupBy(col("doc_id"))
      .agg(graft.functions.MinHashAgg.minhashAgg(col("h"), 16).as("mhs"))
    val a = perRow.as[(Long, Seq[Long])].collect().toMap
    val b = agged.as[(Long, Seq[Long])].collect().toMap
    assert(a.keySet == b.keySet && a.keySet.nonEmpty)
    a.foreach { case (id, mhs) => assert(mhs == b(id), s"doc $id") }
  }

  private def startQuery(in: MemoryStream[SDoc], name: String) = {
    val q = NearDup.nearDupStream(in.toDF(), "1 hour").writeStream
      .format("memory").queryName(name).outputMode("append").start()
    (q, () => spark.table(name).as[(Long, Long, Double)].collect().toSet)
  }

  test("identical doc in horizon matches its representative, disjoint doesn't") {
    val in = MemoryStream[SDoc]
    val (q, got) = startQuery(in, "nd1")
    in.addData(SDoc(1, "alpha beta gamma delta epsilon", t("2024-01-01T10:00:00Z")))
    q.processAllAvailable()
    in.addData(
      SDoc(2, "alpha beta gamma delta epsilon", t("2024-01-01T10:10:00Z")),
      SDoc(3, "zeta eta theta iota kappa", t("2024-01-01T10:20:00Z")))
    q.processAllAvailable()
    // doc 2 matches rep 1 with jac 1.0 (identical token set -> every
    // band agrees -> 4 emissions, same triple); doc 3 matches nothing
    assert(got() == Set((2L, 1L, 1.0)))
    q.stop()
  }

  test("near-identical doc (one extra token) is flagged with jac >= 0.9") {
    val base = (1 to 19).map(i => s"tok$i").mkString(" ")
    val in = MemoryStream[SDoc]
    val (q, got) = startQuery(in, "nd2")
    in.addData(SDoc(10, base, t("2024-01-01T10:00:00Z")))
    q.processAllAvailable()
    in.addData(SDoc(11, s"$base tok20", t("2024-01-01T10:05:00Z")))
    q.processAllAvailable()
    val matches = got()
    assert(matches.nonEmpty, "19/20 token overlap must agree in some band")
    matches.foreach { case (id, rep, jac) =>
      assert(id == 11L && rep == 10L && jac >= 0.9)
    }
    q.stop()
  }

  test("horizonMillis honors day/month interval units (regression: dropped fields)") {
    // the naive microseconds/1000 read dropped CalendarInterval's
    // months/days fields -> "1 day" became 0 ms
    assert(NearDup.horizonMillis("1 hour") == 3600L * 1000)
    assert(NearDup.horizonMillis("1 day") == 24L * 3600 * 1000)
    assert(NearDup.horizonMillis("2 weeks") == 14L * 24 * 3600 * 1000)
  }

  test("day-unit horizon keeps the representative alive across hours") {
    val in = MemoryStream[SDoc]
    val q = NearDup.nearDupStream(in.toDF(), "1 day").writeStream
      .format("memory").queryName("ndday").outputMode("append").start()
    in.addData(SDoc(1, "alpha beta gamma delta epsilon", t("2024-01-01T10:00:00Z")))
    q.processAllAvailable()
    // 12 h later, well inside the 1-day horizon: with the dropped-field
    // bug the rep expired at its own timestamp and this found nothing
    in.addData(SDoc(2, "alpha beta gamma delta epsilon", t("2024-01-01T22:00:00Z")))
    q.processAllAvailable()
    val got = spark.table("ndday").as[(Long, Long, Double)].collect().toSet
    assert(got == Set((2L, 1L, 1.0)), s"got $got")
    q.stop()
  }

  test("representative expires after the horizon — late twin is a new rep") {
    val in = MemoryStream[SDoc]
    val (q, got) = startQuery(in, "nd3")
    in.addData(SDoc(1, "alpha beta gamma delta epsilon", t("2024-01-01T10:00:00Z")))
    q.processAllAvailable()
    // push the watermark past 11:00 so doc 1's bucket state times out
    in.addData(SDoc(90, "unrelated words entirely here", t("2024-01-01T12:30:00Z")))
    q.processAllAvailable()
    in.addData(SDoc(2, "alpha beta gamma delta epsilon", t("2024-01-01T13:00:00Z")))
    q.processAllAvailable()
    assert(got().isEmpty, "doc 2 must become a fresh rep, not match doc 1")
    q.stop()
  }

  test("srp stream: in-horizon similar vectors match with the exact batch cosine") {
    val base = Array.tabulate(64)(i => (math.sin(i + 1) * 0.8).toFloat)
    val close = base.map(x => (x * 1.001f))
    val far = Array.tabulate(64)(i => (math.cos(7 * i + 3) * 0.8).toFloat)
    val in = MemoryStream[SVec]
    val q = NearDup.srpNearDupStream(in.toDF(), "1 hour").writeStream
      .format("memory").queryName("srpnd").outputMode("append").start()
    in.addData(SVec(1, base, t("2024-01-01T10:00:00Z")))
    q.processAllAvailable()
    in.addData(
      SVec(2, close, t("2024-01-01T10:10:00Z")),
      SVec(3, far, t("2024-01-01T10:20:00Z")))
    q.processAllAvailable()
    val got = spark.table("srpnd").as[(Long, Long, Double)].collect().toSet
    assert(got.map(m => (m._1, m._2)) == Set((2L, 1L)),
      s"expected only (2,1), got $got")
    // the streamed score must equal the batch QuantizedCosine exactly
    val batchCos = Seq((base, close)).toDF("a", "b")
      .select(graft.functions.QuantizedCosine.quantizedCosine(col("a"), col("b")))
      .as[Double].head()
    assert(got.head._3 == batchCos, s"stream ${got.head._3} != batch $batchCos")
    q.stop()
  }

  test("srp stream: representative expires after the horizon") {
    val base = Array.tabulate(64)(i => (math.sin(2 * i + 1) * 0.6).toFloat)
    val in = MemoryStream[SVec]
    val q = NearDup.srpNearDupStream(in.toDF(), "1 hour").writeStream
      .format("memory").queryName("srpexp").outputMode("append").start()
    in.addData(SVec(10, base, t("2024-01-01T10:00:00Z")))
    q.processAllAvailable()
    // push the watermark far past the rep's horizon, then replay a dup
    in.addData(SVec(11, base.map(-_), t("2024-01-01T20:00:00Z")))
    q.processAllAvailable()
    in.addData(SVec(12, base, t("2024-01-01T20:30:00Z")))
    q.processAllAvailable()
    val got = spark.table("srpexp").as[(Long, Long, Double)].collect().toSet
    // doc 12 is identical to the EXPIRED rep 10 — no match against it
    assert(!got.exists(m => m._1 == 12L && m._2 == 10L),
      s"expired representative still matching: $got")
    q.stop()
  }
}
