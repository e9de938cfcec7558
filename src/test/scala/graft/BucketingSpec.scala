package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The point of bucketing is the PLAN, not just the rows: the
  * bucketed lineitem⋈orders must sort-merge join directly on the
  * bucketed scans with no ShuffleExchange on either side. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed equi-join runs without a shuffle exchange") {
    val d = "/root/testdata/sf0.001"
    // the in-memory catalog dies with the JVM but the warehouse dirs
    // survive — clear both or saveAsTable refuses the stale location
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    graft.ops.Bucketing.writeBucketed(
      Tables.lineitem(spark, d), "li_bucketed", "l_orderkey", 8)
    graft.ops.Bucketing.writeBucketed(
      Tables.orders(spark, d), "ord_bucketed", "o_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path: at sf0.001 orders would otherwise
      // broadcast, which avoids a shuffle trivially
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("li_bucketed").join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      val expected = Tables.lineitem(spark, d).join(Tables.orders(spark, d),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(j.count() == expected)

      j.collect() // finalize the adaptive plan
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("ShuffleExchange"),
        s"bucketed join should not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
