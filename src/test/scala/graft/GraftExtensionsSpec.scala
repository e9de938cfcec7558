package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The extensions class must make quantized_cosine resolvable in a
  * session constructed with it. (The `spark.sql.extensions` config
  * route is a STATIC conf — only honored by a fresh SparkContext —
  * covered by [[ExtensionsDemo]] in its own forked JVM.) */
class GraftExtensionsSpec extends AnyFunSuite {
  test("quantized_cosine resolves via builder.withExtensions") {
    val shared = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions().apply(_))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = s2.sql(
        """SELECT quantized_cosine(array(CAST(0.5 AS FLOAT), CAST(0.25 AS FLOAT)),
                                   array(CAST(0.5 AS FLOAT), CAST(0.25 AS FLOAT))) AS c""")
        .collect().head.getDouble(0)
      assert(r == 1.0)
      val mh = s2.sql(
        "SELECT minhash_agg(h) AS mhs FROM VALUES (42L), (7L) AS t(h)")
        .collect().head.getSeq[Long](0)
      // min over h∈{42,7} of (h·1000003 + 12345) mod 2^32
      assert(mh.length == 16 && mh.head == 7L * 1000003L + 12345L)
      val sh = s2.sql(
        "SELECT simhash_agg(h) AS sh FROM VALUES (3L), (3L) AS t(h)")
        .collect().head.getLong(0)
      // two identical hashes: bits 0,1 voted up twice, rest down -> 3
      assert(sh == 3L)
      val srp = s2.sql(
        "SELECT srp_bands(array_repeat(CAST(0.5 AS FLOAT), 64)) AS b")
        .collect().head.getSeq[Long](0)
      // 8 band bytes in range; value pinned bit-identical to the HOF
      // construction by SrpBandsSpec — here just resolution + shape
      assert(srp.length == 8 && srp.forall(b => b >= 0 && b <= 255))
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }
}
