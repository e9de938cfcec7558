package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** CSV and NDJSON round-trips must be lossless against the real
  * events table (timestamps to the microsecond, doubles exact). */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def roundTrip(fmt: String): Unit = {
    val src = Tables.events(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory(s"graft-$fmt").toString + "/out"
    val schema = src.schema
    fmt match {
      case "csv" =>
        Sources.writeCsv(src, dir)
        val back = Sources.readCsv(spark, schema, dir)
        assertLossless(src, back)
      case "json" =>
        Sources.writeJson(src, dir)
        val back = Sources.readJson(spark, schema, dir)
        assertLossless(src, back)
      case "orc" =>
        Sources.writeOrc(src, dir)
        val back = Sources.readOrc(spark, schema, dir)
        assertLossless(src, back)
    }
  }

  private def assertLossless(a: org.apache.spark.sql.DataFrame,
                             b: org.apache.spark.sql.DataFrame): Unit = {
    assert(b.schema == a.schema)
    assert(a.count() == b.count())
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("csv round-trip is lossless on real events")(roundTrip("csv"))
  test("json round-trip is lossless on real events")(roundTrip("json"))
  test("orc round-trip is lossless on real events")(roundTrip("orc"))

  test("json quarantine: good rows parse, mangled lines land whole in the corrupt column") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-quarantine")
    val f = dir.resolve("part.json")
    Files.writeString(f, Seq(
      """{"id": 1, "name": "ok"}""",
      """{"id": broken not json""",
      """{"id": 3, "name": "fine"}""",
      """{"id": "not-a-number", "name": "wrongtype"}""").mkString("\n"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val df = Sources.readJsonQuarantine(spark, schema, dir.toString)
    val good = Sources.goodRows(df).collect().map(r =>
      (r.getLong(0), r.getString(1))).toSet
    assert(good == Set((1L, "ok"), (3L, "fine")))
    // keep the typed columns in the scan: projecting ONLY the corrupt
    // column off raw JSON is the exact query Spark disallows (the
    // quirk the scaladoc documents) — collect full rows, then project
    val bad = Sources.badRows(df).collect()
      .map(_.getAs[String](Sources.CorruptCol)).toSet
    assert(bad == Set(
      """{"id": broken not json""",
      """{"id": "not-a-number", "name": "wrongtype"}"""))
  }
}
