package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Product-quantization encode: per subspace, the argmin-L2²
  * codeword index against a FLAT codebook laid out `(sub, code)`
  * row-major — `cb[(sub*k + code)*subDim + j]`. Bit-identical to the
  * HOF formulation (aggregate over filter(model) with strict `<`,
  * so ties break to the smallest code), but one fused codegen loop
  * per row instead of m interpreted aggregate-over-filter passes —
  * the m·k·subDim multiply-adds per row were x44's dominant encode
  * cost at sf1 (the "last hot interpreted HOF" of the round-6
  * verdict). Exact long arithmetic throughout; returns array<int>
  * of `m` codes.
  *
  * `k` may be the sentinel [[PqEncode.DerivedK]] (−1): the codeword
  * count is then derived PER ROW from the codebook length as
  * `cb.length / (m·subDim)` — the shape a DATA-SIZED codebook needs
  * (the IVF coarse quantizer sizes its cell count ∝ √n, which is not
  * a plan-time constant; the codebook column still comes from one
  * broadcast model row, so the division is against a loop-invariant
  * length and HotSpot hoists it). */
case class PqEncode(qv: Expression, cb: Expression,
                    m: Int, k: Int, subDim: Int)
    extends BinaryExpression {
  require(m >= 1 && subDim >= 1 && (k >= 1 || k == PqEncode.DerivedK),
    "pq_encode: m,subDim >= 1 and k >= 1 or DerivedK")

  override def left: Expression = qv
  override def right: Expression = cb
  override def checkInputDataTypes(): TypeCheckResult =
    (qv.dataType, cb.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects (array<bigint>, array<bigint>), got $l / $r")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(q0: Any, c0: Any): Any = {
    val q = q0.asInstanceOf[ArrayData]
    val c = c0.asInstanceOf[ArrayData]
    val k = if (this.k > 0) this.k else c.numElements() / (m * subDim)
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = -1
      var bestd = Long.MaxValue
      var ki = 0
      while (ki < k) {
        val base = (mi * k + ki) * subDim
        val qbase = mi * subDim
        var d = 0L
        var j = 0
        while (j < subDim) {
          val diff = q.getLong(qbase + j) - c.getLong(base + j)
          d += diff * diff
          j += 1
        }
        if (d < bestd) { bestd = d; best = ki }
        ki += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val codes = ctx.freshName("codes")
      val mi = ctx.freshName("mi"); val ki = ctx.freshName("ki")
      val j = ctx.freshName("j")
      val best = ctx.freshName("best"); val bestd = ctx.freshName("bestd")
      val d = ctx.freshName("d"); val diff = ctx.freshName("diff")
      val base = ctx.freshName("base"); val qbase = ctx.freshName("qbase")
      val kk = ctx.freshName("kk")
      val kInit = if (k > 0) s"$k" else s"$c.numElements() / ${m * subDim}"
      s"""
        int $kk = $kInit;
        int[] $codes = new int[$m];
        for (int $mi = 0; $mi < $m; $mi++) {
          int $best = -1; long $bestd = Long.MAX_VALUE;
          int $qbase = $mi * $subDim;
          for (int $ki = 0; $ki < $kk; $ki++) {
            int $base = ($mi * $kk + $ki) * $subDim;
            long $d = 0L;
            for (int $j = 0; $j < $subDim; $j++) {
              long $diff = $q.getLong($qbase + $j) - $c.getLong($base + $j);
              $d += $diff * $diff;
            }
            if ($d < $bestd) { $bestd = $d; $best = $ki; }
          }
          $codes[$mi] = $best;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(qv = newLeft, cb = newRight)
}

object PqEncode {
  /** Sentinel `k`: derive the codeword count per row from the
    * codebook length (`cb.length / (m·subDim)`). */
  val DerivedK: Int = -1

  /** Column-API face. */
  def pqEncode(qv: Column, cb: Column, m: Int, k: Int, subDim: Int): Column =
    GraftBridge.column(PqEncode(
      GraftBridge.expression(qv), GraftBridge.expression(cb), m, k, subDim))
}

/** Asymmetric-distance computation (ADC) for PQ ANN: the exact-long
  * L2² between a query vector and a PQ-encoded vector's
  * reconstruction — sum over subspaces of L2²(query slice, assigned
  * codeword) against the same flat `(sub, code)` row-major codebook
  * as [[PqEncode]]. This runs once per (query, corpus-vector) pair —
  * x44's true hot path — so the fused loop replaces an interpreted
  * aggregate-over-filter-over-slice HOF chain per pair. */
case class PqAdc(qq: Expression, codes: Expression, cb: Expression,
                 m: Int, k: Int, subDim: Int)
    extends TernaryExpression {
  require(m >= 1 && k >= 1 && subDim >= 1, "pq_adc: m,k,subDim >= 1")

  override def first: Expression = qq
  override def second: Expression = codes
  override def third: Expression = cb
  override def checkInputDataTypes(): TypeCheckResult =
    (qq.dataType, codes.dataType, cb.dataType) match {
      case (ArrayType(LongType, _), ArrayType(IntegerType, _),
            ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "pq_adc expects (array<bigint>, array<int>, array<bigint>), " +
          s"got $a / $b / $c")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(q0: Any, e0: Any, c0: Any): Any = {
    val q = q0.asInstanceOf[ArrayData]
    val e = e0.asInstanceOf[ArrayData]
    val c = c0.asInstanceOf[ArrayData]
    var sum = 0L
    var mi = 0
    while (mi < m) {
      val base = (mi * k + e.getInt(mi)) * subDim
      val qbase = mi * subDim
      var j = 0
      while (j < subDim) {
        val diff = q.getLong(qbase + j) - c.getLong(base + j)
        sum += diff * diff
        j += 1
      }
      mi += 1
    }
    sum
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, e, c) => {
      val mi = ctx.freshName("mi"); val j = ctx.freshName("j")
      val sum = ctx.freshName("sum"); val diff = ctx.freshName("diff")
      val base = ctx.freshName("base"); val qbase = ctx.freshName("qbase")
      s"""
        long $sum = 0L;
        for (int $mi = 0; $mi < $m; $mi++) {
          int $base = ($mi * $k + $e.getInt($mi)) * $subDim;
          int $qbase = $mi * $subDim;
          for (int $j = 0; $j < $subDim; $j++) {
            long $diff = $q.getLong($qbase + $j) - $c.getLong($base + $j);
            $sum += $diff * $diff;
          }
        }
        ${ev.value} = $sum;
      """
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(qq = newFirst, codes = newSecond, cb = newThird)
}

object PqAdc {
  /** Column-API face. */
  def pqAdc(qq: Column, codes: Column, cb: Column,
            m: Int, k: Int, subDim: Int): Column =
    GraftBridge.column(PqAdc(
      GraftBridge.expression(qq), GraftBridge.expression(codes),
      GraftBridge.expression(cb), m, k, subDim))
}
