package graft

import graft.queries.Extensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization ANN (x44).
  *
  * The oracle gate row pins the full construction against DuckDB;
  * these specs pin the PROPERTIES that make it PQ: codes index a
  * K-entry codebook per subspace, codebook members reconstruct with
  * zero error in every subspace (their assigned codeword IS their
  * slice), ADC distance is exactly the sum of per-subspace L2²
  * against assigned codewords, and the encode path keeps the corpus
  * un-shuffled (broadcast model, per-row HOF).
  */
class PqAnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val M = 4
  private val Sub = 16
  private val K = 16
  private val Dim = M * Sub

  /** 40 deterministic 64-dim long vectors (ids 0..39). */
  private def vecs = {
    val rows = (0 until 40).map { id =>
      (id.toLong, Seq.tabulate(Dim)(i => ((id * 31 + i * 7) % 997 - 498).toLong))
    }
    rows.toDF("vec_id", "qv")
  }

  test("codes are M-long and index the K-entry codebooks") {
    val enc = Extensions.pqEncoded(vecs).select($"vec_id", $"codes")
    val bad = enc.filter(size($"codes") =!= M ||
      exists($"codes", c => c < 0 || c >= K)).count()
    assert(bad === 0)
  }

  test("codebook members reconstruct exactly: assigned codeword = own slice") {
    // vec_id < K supplied the codebook, so each of their subspace
    // slices is at distance 0 from SOME codeword; the argmin must
    // pick a codeword with identical cv (ties broken by code, but
    // cv equality is the invariant).
    // pqEncoded drops qv; re-join it for the check
    val withQv = Extensions.pqEncoded(vecs)
      .join(vecs.withColumnRenamed("qv", "qv_orig"), "vec_id")
      .filter($"vec_id" < K)
      .withColumn("bad",
        exists(sequence(lit(0), lit(M - 1)), sub => {
          val own = slice($"qv_orig", sub * Sub + 1, lit(Sub))
          val cw = element_at(filter($"model", e =>
            e("sub") === sub &&
              e("code") === element_at($"codes", sub + 1)), 1)("cv")
          not(cw === own)
        }))
    assert(withQv.filter($"bad").count() === 0)
  }

  test("ADC distance equals the independent per-subspace L2² sum") {
    val top = Extensions.pqTopK(vecs)
    // independently recompute: join codes back to raw vectors and
    // codebook entries relationally (the shape the oracle uses)
    val enc = Extensions.pqEncoded(vecs)
    val cbRows = enc.limit(1).select(explode($"model").as("e"))
      .select($"e.sub", $"e.code", $"e.cv")
    val codeRows = enc.select($"vec_id",
        posexplode($"codes").as(Seq("sub", "code")))
    val q = vecs.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"qv".as("qq"))
    val expected = q.join(codeRows, $"qid" =!= $"vec_id")
      .join(cbRows, Seq("sub", "code"))
      .withColumn("d", aggregate(
        zip_with(slice($"qq", $"sub" * Sub + 1, lit(Sub)), $"cv",
          (x, y) => (x - y) * (x - y)),
        lit(0L), (a, z) => a + z))
      .groupBy($"qid", $"vec_id").agg(sum($"d").as("adist"))
    val joined = top.join(expected, Seq("qid", "vec_id"))
      .filter(top("adist") =!= expected("adist"))
    assert(joined.count() === 0)
    assert(top.count() === 10 * 5)
  }

  test("native pq_encode matches a driver-side argmin-L2² reference") {
    // pure-Scala replay of the PQ contract: codebook = first K
    // vectors' subspace slices, code = argmin L2², ties to the
    // smallest code (strict < scan in code order)
    val raw = (0 until 40).map { id =>
      id.toLong -> Array.tabulate(Dim)(i => ((id * 31 + i * 7) % 997 - 498).toLong)
    }.toMap
    def slice(v: Array[Long], sub: Int) =
      v.slice(sub * Sub, (sub + 1) * Sub)
    def l2sq(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expected = raw.map { case (id, v) =>
      id -> (0 until M).map { sub =>
        (0 until K).minBy(code => (l2sq(slice(v, sub),
          slice(raw(code.toLong), sub)), code))
      }
    }
    val got = Extensions.pqEncoded(vecs).select($"vec_id", $"codes")
      .as[(Long, Seq[Int])].collect().toMap
    raw.keys.foreach { id =>
      assert(got(id) == expected(id), s"codes diverge for vec $id")
    }
  }

  test("plan: encode side has no shuffle — model broadcasts, corpus stays put") {
    val enc = Extensions.pqEncoded(vecs)
    val plan = enc.queryExecution.executedPlan.toString
    // the only Exchange allowed is the SinglePartition collapse that
    // builds the one-row model — never a hash repartition of the corpus
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected corpus shuffle in encode plan:\n$plan")
  }
}
