package graft

import org.apache.spark.sql.functions._
import graft.ops.Salt

/** Dev demo: salted aggregation over REAL data (lineitem grouped by
  * l_returnflag — naturally few keys, aggregation-skew shaped) and a
  * probe with buckets=1 (degenerates to plain two-phase). */
object ScaleOpsDemo {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val direct = li.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("cnt"), sum($"l_quantity".cast("long")).as("q"))
      .orderBy($"l_returnflag")
    println("== direct ==");  direct.show()
    val salted = Salt.saltedAggregate(li, Seq("l_returnflag"), $"l_orderkey", 16,
        partial = Seq(count(lit(1)).as("cnt"), sum($"l_quantity".cast("long")).as("q")),
        merge = Seq(sum($"cnt").as("cnt"), sum($"q").as("q")))
      .orderBy($"l_returnflag")
    println("== salted (16 buckets) =="); salted.show()
    println("equal: " + (direct.collect().toSeq == salted.collect().toSeq))
    val b1 = Salt.saltedAggregate(li, Seq("l_returnflag"), $"l_orderkey", 1,
        partial = Seq(count(lit(1)).as("cnt")), merge = Seq(sum($"cnt").as("cnt")))
    println("buckets=1 rows: " + b1.count())
    try Salt.saltedAggregate(li, Seq("l_returnflag"), $"l_orderkey", 0, Seq(count(lit(1))), Seq())
    catch { case e: IllegalArgumentException => println("buckets=0 rejected: " + e.getMessage) }
    spark.stop()
  }
}
