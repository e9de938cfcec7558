package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.{MinHashAgg, QuantizedCosine, SimHashAgg, SimHashArr, SrpBands, TokenBigrams, TokenMask, TokenSetSig}

/** SparkSessionExtensions entry point: makes graft's native
  * expressions available in any session via configuration —
  * {{{ spark.sql.extensions=graft.GraftExtensions }}} —
  * the standard deployment route for cluster-wide custom functions
  * (no code changes in user jobs; `SELECT quantized_cosine(a, b)`
  * and `SELECT minhash_agg(h) ... GROUP BY ...` just resolve).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("quantized_cosine"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[QuantizedCosine].getName, "quantized_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        QuantizedCosine(exprs(0), exprs(1))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_agg"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MinHashAgg].getName, "minhash_agg"),
      // aggregate builders return the AggregateFunction itself — the
      // analyzer wraps it in an AggregateExpression
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashAgg(exprs.head)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("simhash_agg"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SimHashAgg].getName, "simhash_agg"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHashAgg(exprs.head)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("srp_bands"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SrpBands].getName, "srp_bands"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SrpBands(exprs.head)))
  }
}
