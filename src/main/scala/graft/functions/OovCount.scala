package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of a text's whitespace tokens NOT present in a SORTED
  * vocabulary array — x84's out-of-vocabulary numerator as one
  * native pass. Bit-identical to the HOF it replaces
  * (`size(filter(split(text, ' '), t -> NOT array_contains(varr,
  * t)))`; OovCountSpec pins the equality on the real corpus), but
  * the HOF scans the whole vocabulary linearly PER TOKEN through an
  * interpreted lambda — V·tokens string compares made x84 the
  * second-slowest sf1 gate (41.2 s) once the bench evaluated results
  * for real. Here each token BINARY-SEARCHES the vocabulary
  * (⌈log2 V⌉ probes) over binary UTF8String ordering — the exact
  * order `sort_array` / `list(... ORDER BY ...)` produce, which is
  * the CONTRACT: `varr` must be ascending-sorted; an unsorted array
  * gives wrong counts (the one construction site, x84's
  * [[graft.queries.Extensions.oovVocab]], sorts).
  *
  * Tokenization matches `split(text, ' ')` (empties kept). Null
  * vocabulary elements are not expected (the vocab is built from
  * real tokens) and compare as absent. */
case class OovCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"oov_count expects (string, array<string>), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "oov_count"

  override def nullSafeEval(text: Any, varr: Any): Any =
    OovCount.compute(text.asInstanceOf[UTF8String],
      varr.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, v) =>
      s"${ev.value} = graft.functions.OovCount$$.MODULE$$.compute($t, $v);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object OovCount {
  def compute(text: UTF8String, varr: ArrayData): Long = {
    val toks = text.toString.split(" ", -1)
    val v = varr.numElements()
    var oov = 0L
    var i = 0
    while (i < toks.length) {
      val t = UTF8String.fromString(toks(i))
      // binary search over the ascending (UTF8String binary order)
      // vocabulary
      var lo = 0
      var hi = v
      var found = false
      while (lo < hi && !found) {
        val mid = (lo + hi) >>> 1
        val e = varr.getUTF8String(mid)
        val c = if (e == null) 1 else t.compareTo(e)
        if (c == 0) found = true
        else if (c < 0) hi = mid
        else lo = mid + 1
      }
      if (!found) oov += 1
      i += 1
    }
    oov
  }

  /** Column-API face of the expression. */
  def oovCount(text: Column, sortedVocab: Column): Column =
    GraftBridge.column(OovCount(
      GraftBridge.expression(text), GraftBridge.expression(sortedVocab)))
}
