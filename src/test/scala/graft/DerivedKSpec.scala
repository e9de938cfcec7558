package graft

import graft.queries.Extensions
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 pin for the √n-derived cluster counts (x21/x39/x47):
  * the production form derives k = max(8, ⌊√n⌋) IN-PLAN; this spec
  * proves the derived form is assignment-identical to the explicit
  * fixture form at the same k — i.e. the derivation plumbing (one-row
  * count agg broadcast into the seed filter) changes nothing but
  * where k comes from. Equality with exactly ONE explicit k also
  * pins the derived value itself: a different k picks different
  * seeds and the outputs diverge on these spread fixtures. */
class DerivedKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** n deterministic, well-spread 4-dim quantized vectors. */
  private def corpus(n: Int) =
    (0 until n).map { i =>
      (i.toLong, Seq(((i * 37) % 97 + 1).toLong, ((i * 53) % 89).toLong,
                     ((i * 71) % 83).toLong, ((i * 13) % 79).toLong))
    }.toDF("vec_id", "qv")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("kmeansCluster: derived k equals explicit k=8 at n=70 (√70 floors to 8)") {
    val v = corpus(70).persist(); v.count()
    assert(rows(Extensions.kmeansCluster(v)) ===
           rows(Extensions.kmeansCluster(v, Some(8))))
    v.unpersist()
  }

  test("kmeansCluster: derived k equals explicit k=12 at n=150 (√150 floors to 12)") {
    val v = corpus(150).persist(); v.count()
    val derived = rows(Extensions.kmeansCluster(v))
    assert(derived === rows(Extensions.kmeansCluster(v, Some(12))))
    // and NOT the old fixed-8 form: the derivation must actually scale
    assert(derived !== rows(Extensions.kmeansCluster(v, Some(8))),
      "derived k stuck at the fixed-8 floor on a 150-vector corpus")
    v.unpersist()
  }

  test("semDedupKeep: derived k equals explicit k=12 at n=150") {
    val v = corpus(150).persist(); v.count()
    assert(rows(Extensions.semDedupKeep(v)) ===
           rows(Extensions.semDedupKeep(v, Some(12))))
    v.unpersist()
  }
}
