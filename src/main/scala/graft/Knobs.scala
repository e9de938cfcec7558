package graft

import org.apache.spark.sql.SparkSession

/** EVERY estimator / cap / winnow scale knob of the engine, in one
  * place, each with its exactness contract and a `spark.graft.*`
  * conf key for user code ([[resolveInt]]/[[resolveLong]]). The
  * oracle-gated queries pin EXPLICIT constants (a conf-dependent
  * gate could silently diverge from its replayed oracle); KnobsSpec
  * pins these defaults so a drive-by change breaks a test, not a
  * hash gate.
  *
  * | knob | key | default | contract |
  * |---|---|---|---|
  * | Gopher dup-gram winnow | `spark.graft.gopher.dupWinnow` | 1 (exact) | mod-k gram-identity sample of the duplicate-n-gram coverage; k>1 makes rep_5..rep_10 deterministic LOWER bounds (monotone: kept starts ⊆ all starts). Public default is EXACT; the x96 gate runs the documented k=4 estimator ([[GopherDupWinnowGate]]) with its oracle replaying the same winnow |
  * | Span-dedup winnow | `spark.graft.span.winnow` | 1 (exact) | mod-k span-hash sample of the (doc, span) table; counts over kept spans are exact, coverage is a 1/k-identity sample (x45 gate = exact form) |
  * | Fingerprint band cap | `spark.graft.fingerprint.bandCap` | 64 | two-stage bucket cap on perceptual-hash band joins (x90/x91/x93): buckets above the cap sub-split by the next band — LOSSLESS for Hamming ≤ threshold matches (pigeonhole over the sub-bands), bounds the per-bucket pair fan-out |
  * | Ingest broadcast class cap | `spark.graft.ingest.bcastClassCap` | 100000 | x86 incremental-ingest: registry classes ≤ cap broadcast (measured, not hinted); above it the probe falls back to a shuffle equi-join — pure execution-strategy switch, result identical |
  * | IVF-PQ re-rank depth R | (constant [[queries.Extensions.IvfPqRerankFixed]]) | 8·k | ADC short-list depth re-ranked exactly; recall floor proven by the x98 gate + X80IvfPqSpec on clustered data. `corpusScaledR = true` is the FIXTURE-ONLY escape hatch for isotropic-noise corpora (x80/x66/x83 gates), never the production default |
  * | Range-join bin size | `spark.graft.rangeJoin.binSize` | off | opt-in Catalyst rewrite of inequality range joins into bucketed equi-joins ([[plans.RangeJoinRule]]); result-identical, plan-level only |
  *
  * Derived (not settable) scale parameters, for completeness: IVF /
  * k-means cluster counts are max(8, ⌊√n⌋) computed in-plan
  * (x07/x21/x39/x47/x80 — DerivedKSpec), never constants. */
object Knobs {

  /** Public-API default for the Gopher duplicate-n-gram winnow:
    * EXACT (no sampling). */
  val GopherDupWinnowExact = 1
  /** The x96 gate's documented estimator setting: mod-4 winnow, a
    * deterministic quarter-identity-sample lower bound (13.3 → 4.3 s
    * at sf0.1; oracle + streaming twin replay the same winnow). */
  val GopherDupWinnowGate = 4
  val GopherDupWinnowKey = "spark.graft.gopher.dupWinnow"

  /** Span-dedup winnow default: exact. */
  val SpanWinnowDefault = 1
  val SpanWinnowKey = "spark.graft.span.winnow"

  /** Perceptual-fingerprint band-bucket cap (lossless sub-split). */
  val FpBandCapDefault = 64
  val FpBandCapKey = "spark.graft.fingerprint.bandCap"

  /** Largest registry class-count broadcast during incremental
    * ingest; above it the probe joins by shuffle. */
  val IngestBcastClassCapDefault = 100000L
  val IngestBcastClassCapKey = "spark.graft.ingest.bcastClassCap"

  /** Conf-or-default resolution for user code. */
  def resolveInt(spark: SparkSession, key: String, default: Int): Int =
    spark.conf.getOption(key).map(_.toInt).getOrElse(default)
  def resolveLong(spark: SparkSession, key: String, default: Long): Long =
    spark.conf.getOption(key).map(_.toLong).getOrElse(default)
}
