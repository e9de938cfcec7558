package graft

import graft.ops.SaltedJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Salted skew join: row-identical to the plain join at any salt
  * count, salts actually spread, and the salt rides the physical
  * join keys. */
class SaltedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new Random(5)
  private val fact = (1L to 3000L)
    .map(i => (i, if (rnd.nextInt(10) < 7) "hot" else s"k${rnd.nextInt(20)}"))
    .toDF("id", "k") // 70% of rows on one key — heavy skew
  private val dim = (Seq("hot") ++ (0 until 20).map(i => s"k$i"))
    .zipWithIndex.map { case (k, v) => (k, v * 100) }.toDF("k", "payload")

  test("row-identical to the plain join across salt counts") {
    val want = fact.join(dim, Seq("k"))
      .select($"id", $"payload").as[(Long, Int)].collect().sorted.toSeq
    for (salts <- Seq(1, 4, 16)) {
      val got = SaltedJoin.join(fact, dim, "k", $"id", salts)
        .select($"id", $"payload").as[(Long, Int)].collect().sorted.toSeq
      assert(got == want, s"salts=$salts diverged from the plain join")
    }
  }

  test("the hot key's rows really spread over the salt space") {
    val spread = fact.filter($"k" === "hot")
      .select(SaltedJoin.saltOf($"id", 8).as("s"))
      .groupBy($"s").count().as[(Int, Long)].collect().toMap
    assert(spread.keySet == (0 until 8).toSet,
      s"every salt bucket must receive rows: $spread")
    val counts = spread.values.toSeq
    assert(counts.max < counts.sum / 2,
      s"no single bucket may dominate after salting: $spread")
  }

  test("the salt is part of the physical join keys") {
    val plan = SaltedJoin.join(fact, dim, "k", $"id", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"),
      s"join must key on the salt column:\n$plan")
  }
}
