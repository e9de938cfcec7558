package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's two anti-contention guards, driven through the seamed
  * [[Bench.measure]] loop with scripted (injected-delay) passes:
  *
  *  - the per-pass STARVATION guard (a starved pass never sets the
  *    reported minimum; starved-only queries get isolated retries);
  *  - the round-15 CROSS-ROUND guard: a clean reading >2x the prior
  *    committed artifact at the same SF is retried ISOLATED — the
  *    round-14 blind spot, where a contention window covered BOTH
  *    sweep passes of x87 (9.49 s committed vs 3.56 s real) without
  *    tripping the per-pass guard, and the artifact shipped a phantom
  *    2.6x regression with nothing marking it suspect.
  *
  * The scripted pass function plays the role of the injected delay:
  * each scenario scripts what wall time each (query, attempt) pair
  * "measures", including contended-but-not-starved readings. */
class BenchGuardSpec extends AnyFunSuite {

  /** Scripted pass: per query, a list of (wallSec, starved) readings
    * consumed in order; the last reading repeats if attempts exceed
    * the script. Returns the pass fn plus an attempt counter. */
  private def scripted(script: Map[String, Seq[(Double, Boolean)]])
      : (String => (Double, Boolean), () => Map[String, Int]) = {
    var seen = Map.empty[String, Int].withDefaultValue(0)
    val fn = (n: String) => {
      val i = seen(n); seen = seen.updated(n, i + 1)
      val s = script(n)
      s(math.min(i, s.length - 1))
    }
    (fn, () => seen)
  }

  private def run(script: Map[String, Seq[(Double, Boolean)]],
      baseline: Map[String, Double], reps: Int = 2)
      : (Bench.Measured, Map[String, Int]) = {
    val (pass, seen) = scripted(script)
    val m = Bench.measure(script.keys.toSeq.sorted, pass, reps,
      budgetSec = 1e9, baseline, elapsed = () => 0.0, settle = () => ())
    (m, seen())
  }

  test("x87 scenario: both sweep passes contended-but-clean at 2.6x " +
    "baseline -> routed through an isolated retry, reported at the " +
    "retry's clean reading, marked isolated, not an outlier") {
    val (m, seen) = run(
      script = Map(
        // contention window spans BOTH sweeps (not starvation-flagged),
        // the dedicated retry lands outside the window
        "x87" -> Seq((9.49, false), (9.49, false), (3.56, false)),
        "q01" -> Seq((0.4, false), (0.4, false))),
      baseline = Map("x87" -> 3.65, "q01" -> 0.4))
    assert(m.results("x87") == 3.56,
      s"retry reading must replace the contended sweep min: ${m.results}")
    assert(m.isolated == Seq("x87"), s"isolated: ${m.isolated}")
    assert(m.outliers.isEmpty, s"resolved outlier still listed: ${m.outliers}")
    assert(m.starved.isEmpty)
    assert(seen("x87") == 3 && seen("q01") == 2,
      s"only the flagged query retries: $seen")
  }

  test("a genuine regression survives every isolated retry and is " +
    "NAMED in the outliers field — never silent") {
    val (m, _) = run(
      script = Map("x87" -> Seq((9.49, false))), // every attempt reads 9.49
      baseline = Map("x87" -> 3.65))
    assert(m.results("x87") == 9.49)
    assert(m.outliers == Seq("x87"),
      s"an unresolved >2x reading must be flagged: ${m.outliers}")
    assert(m.isolated.isEmpty, "no retry improved the reading")
  }

  test("sub-second ambient swings stay below the absolute floor and " +
    "are not retried (fixed overheads move 1.3-1.8x run to run)") {
    val (m, seen) = run(
      script = Map("q05" -> Seq((0.9, false))),
      baseline = Map("q05" -> 0.35)) // 2.6x but under the 1.5s floor
    assert(m.results("q05") == 0.9 && m.outliers.isEmpty)
    assert(seen("q05") == 2, s"sweeps only, no retry passes: $seen")
  }

  test("without a baseline (first round / missing file / SF mismatch) " +
    "the cross-round guard is inert") {
    val (m, seen) = run(
      script = Map("x87" -> Seq((9.49, false))),
      baseline = Map.empty)
    assert(m.results("x87") == 9.49 && m.outliers.isEmpty)
    assert(seen("x87") == 2)
  }

  test("starved-only queries still get isolated retries; one that " +
    "starves through every retry is named in starved") {
    val (m, _) = run(
      script = Map(
        "x14" -> Seq((18.1, true), (18.1, true), (1.9, false)),
        "x19" -> Seq((7.7, true))), // starves forever
      baseline = Map.empty)
    assert(m.results("x14") == 1.9 && m.isolated.contains("x14"))
    assert(m.results("x19") == 7.7 && m.starved == Seq("x19"))
    assert(!m.isolated.contains("x19"))
  }

  test("a retry that reads HIGHER than the sweep min never replaces " +
    "it and the query stays flagged") {
    val (m, _) = run(
      script = Map("x30" -> Seq((8.0, false), (8.0, false), (11.0, false))),
      baseline = Map("x30" -> 3.0))
    assert(m.results("x30") == 8.0)
    assert(m.outliers == Seq("x30") && m.isolated.isEmpty)
  }

  test("isOutlier: factor and floor boundaries") {
    assert(!Bench.isOutlier(3.0, 3.0))          // 1x
    assert(!Bench.isOutlier(5.9, 3.0))          // <2x
    assert(Bench.isOutlier(6.1, 3.0))           // >2x, above floor
    assert(!Bench.isOutlier(1.4, 0.5))          // >2x but under 1.5s floor
    assert(!Bench.isOutlier(10.0, -1.0))        // no valid baseline
    assert(!Bench.isOutlier(10.0, 0.0))
  }

  test("parseBaseline reads the committed full-name artifact and " +
    "rejects an SF mismatch or garbage") {
    val line = """{"metric":"total","value":165.8,"unit":"sec",""" +
      """"queries":{"x87_ccnet_buckets":3.65,"q01_filter_project":0.21},""" +
      """"sf":"/root/testdata/sf0.1","passes":4}"""
    val b = Bench.parseBaseline(line, "/root/testdata/sf0.1")
    assert(b == Map("x87_ccnet_buckets" -> 3.65,
      "q01_filter_project" -> 0.21))
    assert(Bench.parseBaseline(line, "/root/testdata/sf1").isEmpty,
      "a baseline from another SF must be discarded")
    assert(Bench.parseBaseline("not json", "/root/testdata/sf0.1").isEmpty)
    assert(Bench.parseBaseline("""{"sf":"/root/testdata/sf0.1"}""",
      "/root/testdata/sf0.1").isEmpty)
  }
}
