package graft

import graft.queries.Extensions
import org.scalatest.funsuite.AnyFunSuite

/** The span-graph substrate's docs-per-span frequency cap
  * (Extensions.spanEdges, SpanDfCap): a stopword span shared by more
  * documents than the cap is dropped at EDGE-CONSTRUCTION time, so
  * the x51/x56/x62 substrate is bounded at cap·(cap−1)/2 edge rows
  * per span — the 100-TB guarantee — while rare (signal-bearing)
  * spans keep their edges. Span width 4 throughout. */
class SpanCapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges(docs: Seq[(Long, String)], maxDf: Int): Set[(Long, Long)] =
    Extensions.spanEdges(docs.toDF("doc_id", "text"), 4, maxDf)
      .as[(Long, Long)].collect().toSet

  test("a stopword span above the cap contributes NO edges; rare spans keep theirs") {
    // 10 docs all share the stopword span; docs 0 and 1 also share a
    // rare span the others lack. Cap 4 < 10 kills every stopword
    // edge; the rare edge survives.
    val stop = "in the of a"
    val docs = (0L until 10L).map { i =>
      val rare = if (i <= 1) " r1 r2 r3 r4" else s" u${i}1 u${i}2 u${i}3 u${i}4"
      i -> s"$stop$rare"
    }
    assert(edges(docs, maxDf = 4) == Set((0L, 1L)))
  }

  test("at or below the cap the full clique emits: C(k,2) edges exactly") {
    val docs = (0L until 5L).map(i => i -> s"a b c d tail$i")
    val got = edges(docs, maxDf = 5)
    assert(got.size == 10 && got == (for {
      a <- 0L until 5L; b <- (a + 1) until 5L } yield (a, b)).toSet)
  }

  test("edge volume is bounded by the cap: one hot span cannot produce a quadratic bucket") {
    // 100 docs share one hot span (uncapped: 4950 pairs); 3 of them
    // also share a cold span. Capped at 64, only the cold clique's 3
    // edges remain — the row-count face of the join-volume drop.
    val docs = (0L until 100L).map { i =>
      val cold = if (i < 3) " c1 c2 c3 c4" else s" v${i}a v${i}b v${i}c v${i}d"
      i -> s"hot1 hot2 hot3 hot4$cold"
    }
    val capped = edges(docs, maxDf = Extensions.SpanDfCap)
    assert(capped == Set((0L, 1L), (0L, 2L), (1L, 2L)),
      s"cap must drop the hot-span quadratic: ${capped.size} edges")
    // sanity: without the cap the hot span dominates with 4950 pairs
    val uncapped = edges(docs, maxDf = 100)
    assert(uncapped.size == 4950)
  }

  test("default cap is a no-op on the sf0.001 corpus (max df far below 64)") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val capped = Extensions.spanEdges(docs, 4).as[(Long, Long)].collect().toSet
    val loose = Extensions.spanEdges(docs, 4, maxDf = Int.MaxValue)
      .as[(Long, Long)].collect().toSet
    assert(capped == loose && capped.nonEmpty)
  }
}
