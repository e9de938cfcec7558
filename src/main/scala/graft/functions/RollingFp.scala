package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The x10 document fingerprint — min md5 over every `w`-CHARACTER
  * window of the text — as one native pass. Bit-identical to the HOF
  * it replaces (`array_min(transform(sequence(1, greatest(len-w+1,
  * 1)), i -> md5(substring(text, i, w))))`; RollingFpSpec pins the
  * equality on the real corpus plus edge fixtures), but the HOF form
  * evaluates an interpreted lambda, allocates a substring AND a
  * 32-hex string per window, and materializes the whole hash array
  * just to take its min — ~length(text) windows per document made
  * x10 the slowest sf1 gate (70.3 s) once the bench evaluated
  * results for real. Here: the text's UTF-8 bytes are encoded ONCE
  * with per-character byte offsets, each window feeds the digest
  * directly from that buffer, and the minimum is tracked as 16 raw
  * digest bytes (unsigned lexicographic — exactly the hex string's
  * sort order, since hex encoding is order-preserving on unsigned
  * bytes); only the winner is hex-encoded.
  *
  * Window semantics match `substring(text, i, w)` (1-based,
  * CHARACTER-counted, clamped at the end): texts shorter than `w`
  * produce one window holding the whole text — including the empty
  * text, whose fingerprint is md5(""). */
case class RollingFp(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"rolling_fp: window must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"rolling_fp expects string, got $t")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "rolling_fp"

  override def nullSafeEval(input: Any): Any =
    RollingFp.compute(input.asInstanceOf[UTF8String], w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingFp$$.MODULE$$.compute($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFp {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val Hex = "0123456789abcdef".getBytes

  def compute(text: UTF8String, w: Int): UTF8String = {
    val s = text.toString
    val n = s.length // UTF-16 units; offsets below walk code points
    // UTF-8 bytes once + the byte offset of every character
    // boundary. Characters are counted as Java chars (UTF-16 units)
    // to match substring()'s indexing on both engines' test surface
    // (the corpus is BMP text, where UTF-16 units == code points;
    // supplementary chars would disagree with the engines'
    // code-point counting in the HOF form too).
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val offs = new Array[Int](n + 1)
    var bi = 0
    var ci = 0
    while (ci < n) {
      offs(ci) = bi
      val ch = s.charAt(ci)
      bi += (if (ch < 0x80) 1 else if (ch < 0x800) 2
             else if (Character.isSurrogate(ch)) 2 // pair = 4 bytes total
             else 3)
      ci += 1
    }
    offs(n) = bytes.length
    val wins = math.max(n - w + 1, 1)
    val digest = md.get()
    var best: Array[Byte] = null
    var i = 0
    while (i < wins) {
      val from = offs(i)
      val to = offs(math.min(i + w, n))
      digest.reset()
      digest.update(bytes, from, to - from)
      val dg = digest.digest()
      if (best == null || unsignedLess(dg, best)) best = dg
      i += 1
    }
    val hx = new Array[Byte](32)
    var b = 0
    while (b < 16) {
      val x = best(b) & 0xff
      hx(2 * b) = Hex(x >>> 4)
      hx(2 * b + 1) = Hex(x & 15)
      b += 1
    }
    UTF8String.fromBytes(hx)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Column-API face of the expression. */
  def rollingFp(text: Column, w: Int): Column =
    GraftBridge.column(RollingFp(GraftBridge.expression(text), w))
}
