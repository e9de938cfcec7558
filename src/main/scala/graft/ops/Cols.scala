package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared column builders.
  *
  * Two cross-cutting concerns shape these helpers:
  *
  *  1. '''Oracle determinism.''' The driver hash-compares our output
  *     against DuckDB running equivalent ANSI SQL. Floating-point
  *     aggregation order differs between engines, so every money/metric
  *     aggregate goes through exact DECIMAL arithmetic (order-free) and
  *     is cast to DOUBLE only at the very end — one deterministic IEEE
  *     conversion on both sides.
  *  2. '''Scale.''' Everything here is a pure `Column` expression —
  *     whole-stage-codegen friendly, no UDFs, no driver-side state —
  *     so plans stay distributed and pushdown-transparent.
  */
object Cols {

  /** Exact sum of a 2-decimal-valued double column, returned as DOUBLE.
    * `sum(decimal)` is exact and commutative, so partial/final agg
    * splits and shuffle order can't perturb the result; the final
    * decimal→double cast is deterministic. DuckDB twin:
    * `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`.
    */
  def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact revenue sum: Σ extendedprice · (1 − discount), computed in
    * decimal, emitted as double. DuckDB twin:
    * `CAST(SUM(CAST(p AS DECIMAL(18,2)) * (1 - CAST(d AS DECIMAL(18,2)))) AS DOUBLE)`.
    */
  def revenueSum(price: Column, discount: Column): Column =
    sum(price.cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 2)) - discount.cast(DecimalType(18, 2))))
      .cast("double")

  /** Integral-valued double (e.g. l_quantity) summed exactly as long. */
  def intSum(c: Column): Column = sum(c.cast("long"))

  /** Event-time formatted like the reference's `dd-MM-yyyy`
    * (semantics of /root/reference/src/main/scala/FlinkAssignment.scala:130-131;
    * UTC session timezone makes this epoch-day aligned like Flink).
    * DuckDB twin: `strftime(ts, '%d-%m-%Y')`.
    */
  def dayKey(ts: Column): Column = date_format(ts, "dd-MM-yyyy")

  /** Repo name from a commit URL — full semantics of the reference's
    * extractRepo (FlinkAssignment.scala:174-183): strip the query
    * string, split on '/', take the two segments after "repos" when
    * present, else the positional owner/repo fallback
    * `parts(len-3)/parts(len-2)` for ≥4-segment URLs, else the
    * cleaned URL itself. Trailing '/'s are stripped before the split
    * to mirror Scala's `String.split` dropping trailing empty
    * segments. All branches are a single CaseWhen — codegen'd, no UDF. */
  def repoFromUrl(url: Column): Column = {
    val cleaned = regexp_replace(url, "\\?.*$", "")
    val parts = split(regexp_replace(cleaned, "/+$", ""), "/")
    val n = size(parts)
    val p = array_position(parts, "repos").cast("int") // 1-based; 0 = absent
    when(p > 0 && p + 1 < n,
        concat_ws("/", element_at(parts, p + 1), element_at(parts, p + 2)))
      .when(n >= 4,
        concat_ws("/", element_at(parts, n - 2), element_at(parts, n - 1)))
      .otherwise(cleaned)
  }

  /** Last dot-separated segment ("extension") — semantics of the
    * reference's `name.split("\\.").lastOption`
    * (FlinkAssignment.scala:88): a dotless name returns the whole
    * name (a file literally named "java" counts). Trailing dots are
    * stripped first, mirroring Scala split's trailing-empty-segment
    * removal; an all-dots name yields "" where the reference yields
    * no row — downstream `isin` filters make the two identical. */
  def fileExtension(name: Column): Column =
    element_at(split(regexp_replace(name, "\\.+$", ""), "\\."), -1)

  /** Distinct, sorted token array of a whitespace-tokenized text.
    * DuckDB twin: `list_sort(list_distinct(string_split(text, ' ')))`. */
  def tokenSet(text: Column): Column =
    array_sort(array_distinct(split(text, " ")))

  /** Canonical token-set signature for exact near-dup grouping — the
    * native fused [[graft.functions.TokenSetSig]] expression (one
    * split + tree-set + digest pass); bit-identical to
    * [[tokenSetSigHof]] (TokenSetSigSpec), which the DuckDB oracles
    * replay. */
  def tokenSetSig(text: Column): Column =
    graft.functions.TokenSetSig.tokenSetSig(text)

  /** The built-in composition the native signature replaced — kept as
    * the spec's equality baseline. */
  def tokenSetSigHof(text: Column): Column =
    md5(array_join(tokenSet(text), " "))
}
