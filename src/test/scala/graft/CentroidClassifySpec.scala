package graft

import graft.queries.Extensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit fixture for x38's nearest-centroid classifier: centroids are
  * per-label integer SUM vectors (cosine is scale-invariant, so the
  * un-normalized sum is the centroid direction), argmax-cosine with
  * ties broken toward the smallest label. */
class CentroidClassifySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("argmax-cosine labeling, smallest-label tie-break, hit flag") {
    // centroid0 = (1500,500,0), centroid1 = (500,1500,0); vectors 2
    // and 3 are identical (500,500,0) and tie exactly between the two
    // centroids by symmetry -> both predict label 0
    val v = Seq(
      (1L, 0, Seq(1000L, 0L, 0L)),
      (2L, 0, Seq(500L, 500L, 0L)),
      (3L, 1, Seq(500L, 500L, 0L)),
      (4L, 1, Seq(0L, 1000L, 0L)))
      .toDF("vec_id", "label", "qv")
    val out = Extensions.centroidClassify(v)
      .select("vec_id", "label", "pred", "hit")
      .as[(Long, Int, Int, Int)].collect().sortBy(_._1)
    assert(out === Array(
      (1L, 0, 0, 1),   // clearly nearest own centroid
      (2L, 0, 0, 1),   // exact tie -> smallest label, correct
      (3L, 1, 0, 0),   // exact tie -> smallest label, miss recorded
      (4L, 1, 1, 1)))
  }

  test("x39: spherical k-means groups by direction from deterministic seeds") {
    // k=2: ids 0 and 1 seed clusters along e1 and e2; 40 leans
    // e1-ward and must land in cluster 0
    val v = Seq(
      (0L, Seq(1000L, 0L, 0L)),
      (1L, Seq(0L, 1000L, 0L)),
      (20L, Seq(900L, 100L, 0L)),
      (30L, Seq(0L, 800L, 200L)),
      (40L, Seq(600L, 500L, 0L)))
      .toDF("vec_id", "qv")
    val got = Extensions.kmeansCluster(v, k = Some(2))
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(got === Map(0L -> 0, 1L -> 1, 20L -> 0, 30L -> 1, 40L -> 0))
  }

  test("a vector colinear with one centroid scores cos = 1.0 to it") {
    val v = Seq(
      (1L, 0, Seq(700L, 0L, 0L)),
      (2L, 0, Seq(300L, 0L, 0L)),
      (3L, 1, Seq(0L, 9L, 0L)))
      .toDF("vec_id", "label", "qv")
    val got = Extensions.centroidClassify(v)
      .filter(col("vec_id") <= 2)
      .select("pred", "cos").as[(Int, Double)].collect()
    assert(got.forall { case (p, c) => p == 0 && c == 1.0 })
  }
}
