package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import java.sql.Timestamp
import graft.queries.CommitQueries
import CommitFixtures._

/** Property tests (SURVEY §5): window-assignment invariants, interval
  * join bound equivalence, and CEP-rewrite equivalence against
  * brute-force O(n²) reference implementations. Each ScalaCheck case
  * evaluates one bulk Spark job over a generated event set.
  */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val baseMs = t("2019-06-01T00:00:00Z").getTime
  private def check(name: String, p: Prop, n: Int = 12): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, s"$name: $res")
  }

  private val genTs: Gen[Long] = // up to ~5 days of spread, second granularity
    Gen.choose(0L, 5L * 24 * 3600).map(s => baseMs + s * 1000)

  test("sliding windows: every event lands in exactly size/slide windows, each containing it") {
    val sizeMs = 48L * 3600 * 1000
    val slideMs = 12L * 3600 * 1000
    val p = Prop.forAll(Gen.nonEmptyListOf(genTs)) { tss =>
      val df = tss.map(new Timestamp(_)).toDF("ts")
        .select(col("ts"), window(col("ts"), "48 hours", "12 hours").as("w"))
      val rows = df.select(col("ts"), col("w.start"), col("w.end")).collect()
      val perEvent = rows.groupBy(_.getTimestamp(0)).view.mapValues(_.length).toMap
      // duplicate generated timestamps each contribute their own
      // size/slide rows, so the expected count per DISTINCT value is
      // multiplicity * (size/slide)
      val multiplicity = tss.groupBy(identity).view.mapValues(_.length).toMap
      val allContain = rows.forall { r =>
        val ts = r.getTimestamp(0).getTime
        val s = r.getTimestamp(1).getTime; val e = r.getTimestamp(2).getTime
        ts >= s && ts < e && e - s == sizeMs && s % slideMs == 0
      }
      perEvent.forall { case (ts, n) =>
        n == multiplicity(ts.getTime) * (sizeMs / slideMs) } && allContain
    }
    check("sliding-windows", p)
  }

  test("interval join equals brute-force [-1h,+30m] scan") {
    val genCase = for {
      nC <- Gen.choose(1, 15)
      nG <- Gen.choose(1, 25)
      cs <- Gen.listOfN(nC, genTs)
      gs <- Gen.listOfN(nG, Gen.zip(Gen.choose(0, nC - 1), genTs, Gen.oneOf("EU", "AS")))
    } yield (cs, gs)
    val p = Prop.forAll(genCase) { case (cs, gs) =>
      val commits = cs.zipWithIndex.map { case (ts, i) =>
        commit(s"s$i", new Timestamp(ts),
          files = Seq(file(Some("A.java"), Some("modified"), changes = 1)))
      }.toDS().toDF()
      val geos = gs.zipWithIndex.map { case ((ci, ts, cont), j) =>
        geo(s"s$ci", new Timestamp(ts), cont)
      }.toDS().toDF()
      val got = CommitQueries.q8(commits, geos)
        .agg(sum(col("changes"))).as[Option[Long]].collect().head.getOrElse(0L)
      val expected = gs.map { case (ci, gts, _) =>
        val cts = cs(ci)
        if (gts >= cts - 3600L * 1000 && gts <= cts + 1800L * 1000) 1L else 0L
      }.sum
      got == expected
    }
    check("interval-join", p, n = 10)
  }

  test("CEP rewrite equals brute-force added-then-removed-within-day scan") {
    val names = Gen.oneOf("a.txt", "b.txt", "c.txt")
    val genEvents = Gen.nonEmptyListOf(
      Gen.zip(names, Gen.oneOf("added", "removed", "modified"), genTs))
    val p = Prop.forAll(genEvents) { evs =>
      val commits = evs.zipWithIndex.map { case ((n, st, ts), i) =>
        commit(s"s$i", new Timestamp(ts), files = Seq(file(Some(n), Some(st))))
      }.toDS().toDF()
      val got = CommitQueries.q9(commits).as[(String, String)].collect()
        .toSeq.groupBy(identity).view.mapValues(_.size).toMap
      val dayMs = 24L * 3600 * 1000
      val expected = evs
        .collect { case (n, "added", ts)
          if evs.exists { case (n2, st2, ts2) =>
            n2 == n && st2 == "removed" && ts2 >= ts && ts2 <= ts + dayMs } =>
          ("apache/flink", n)
        }.groupBy(identity).view.mapValues(_.size).toMap
      got == expected
    }
    check("cep-rewrite", p, n = 10)
  }
}
