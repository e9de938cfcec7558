package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Extensions

/** The salted two-level per-group top-k (x72) must be LOSSLESS: for
  * any bucket count it selects exactly the rows the direct one-window
  * rank selects, because per-bucket top-k is a superset of the global
  * top-k members in that bucket and the (score desc, term) tie-break
  * is a total order. Pinned on tie-heavy fuzz data across k and
  * bucket counts, including buckets=1 (degenerate = direct). */
class X72TopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def direct(occ: org.apache.spark.sql.DataFrame, k: Int) = {
    val tf = occ.groupBy($"source", $"term").agg(count(lit(1)).as("tf"))
    val sdf = tf.groupBy($"term").agg(count(lit(1)).as("sdf"))
    val nSrc = tf.agg(countDistinct($"source").as("n_src"))
    val w = Window.partitionBy($"source").orderBy($"score".desc, $"term")
    tf.join(sdf, "term").crossJoin(broadcast(nSrc))
      .withColumn("score", $"tf" * ($"n_src" - $"sdf" + 1))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"source", $"term", $"tf", $"sdf", $"score", $"rank")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, String, Long, Long, Long, Long)].collect().toSet

  test("fuzz: two-level selection equals the direct window on tie-heavy data, all k and bucket counts") {
    val rnd = new scala.util.Random(7)
    // tiny vocab + few sources -> massive score ties by construction
    val vocab = (0 until 12).map(i => s"t$i")
    val occ = Seq.fill(600) {
      (s"src${rnd.nextInt(4)}", vocab(rnd.nextInt(vocab.size)))
    }.toDF("source", "term").persist()
    occ.count()
    for (k <- Seq(1, 3, 10); buckets <- Seq(1, 4, 16)) {
      val got = rows(Extensions.sourceSignatures(occ, k, buckets))
      val want = rows(direct(occ, k))
      assert(got == want,
        s"k=$k buckets=$buckets: missing ${want -- got}, extra ${got -- want}")
    }
  }

  test("ranks are contiguous 1..k per source") {
    val occ = Seq.fill(300)(
      (s"s${scala.util.Random.nextInt(3)}", s"w${scala.util.Random.nextInt(9)}"))
      .toDF("source", "term")
    val got = Extensions.sourceSignatures(occ, 5, 8)
      .groupBy($"source").agg(collect_list($"rank").as("rs"))
      .as[(String, Seq[Long])].collect()
    got.foreach { case (src, rs) =>
      assert(rs.sorted == (1L to rs.size), s"$src: $rs")
    }
  }
}
