package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The WHOLE Gopher Table A1 repetition panel (Rae et al.) of one
  * document as a single native per-row pass:
  * `struct<n_chars, rep_2..rep_10, truncated>` — permille of token
  * characters covered by the top-{2,3,4}-gram's occurrences and by
  * duplicated {5..10}-grams (positional union, no double counting).
  *
  * Every signal here is an IN-DOC statistic — frequencies of a
  * document's own n-grams — so nothing about it needs the corpus.
  * The round-14 batch engine nevertheless computed it DISTRIBUTED:
  * a 9-n positional explode (rows ∝ 9 × corpus tokens) through
  * persist + per-(doc,n,gram) count shuffle + two start-set joins +
  * a coverage HOF, which made x96 the slowest sf1 gate (37.8 s) and
  * its stateless twin the slowest docs/s twin. This expression
  * replaces that chain with per-row work: token bytes UTF-8-encoded
  * once, each n's window digests fed incrementally (the
  * [[GramHashes]] inner loop), counted in a per-n hash map that is
  * discarded before the next n, coverage marked on a boolean bitmap.
  * Cost is linear in 9 × doc tokens with NO shuffle, no exploded
  * intermediate, and O(doc tokens) peak memory — at 100 TB the panel
  * is embarrassingly parallel over document splits, which is the
  * plan shape a per-doc statistic deserves. Bit-for-bit equal to the
  * exploded engine (GopherPanelSpec pins the equality on the real
  * corpus at winnow 1 and 4; the x96 gate's DuckDB oracle replays
  * the exploded form independently).
  *
  * Semantics pinned to the exploded engine and the oracle:
  *  - tokens = `split(text, ' ')` (Java `split(" ", -1)`: empties
  *    kept); a doc longer than `maxTokens` is scored on its prefix
  *    and flagged `truncated` (the ingest cap; batch passes MaxValue)
  *  - gram hash = md5 hex of the windows' tokens joined by ' '
  *  - top side (n ∈ 2..4): the single most frequent gram, ties to
  *    the smallest hash string; covers all its occurrences (count 1
  *    qualifies — Gopher's "top n-gram character fraction")
  *  - dup side (n ∈ 5..10): grams occurring ≥ 2 times; under
  *    `dupWinnow` k > 1 only gram IDENTITIES with hex32(g) ≡ 0
  *    (mod k) contribute (all-or-nothing per identity, so kept
  *    counts stay exact — the documented estimator)
  *  - character counts are Unicode code points (Spark `length`,
  *    DuckDB `length` agree); `rep = covered * 1000 div n_chars`,
  *    0 when the doc has no token characters. */
case class GopherPanel(child: Expression, dupWinnow: Int, maxTokens: Int)
    extends UnaryExpression {
  require(dupWinnow >= 1, s"gopher_panel: dupWinnow >= 1, got $dupWinnow")
  require(maxTokens >= 1, s"gopher_panel: maxTokens >= 1, got $maxTokens")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"gopher_panel expects string, got $t")
    }
  override def dataType: DataType = GopherPanel.schema
  override def prettyName: String = "gopher_panel"

  override def nullSafeEval(input: Any): Any =
    GopherPanel.compute(input.asInstanceOf[UTF8String], dupWinnow, maxTokens)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GopherPanel$$.MODULE$$" +
        s".compute($c, $dupWinnow, $maxTokens);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherPanel {
  /** n of the "top n-gram" fractions / the "duplicate n-gram"
    * fractions — Gopher Table A1's two families. */
  val TopNs: Seq[Int] = Seq(2, 3, 4)
  val DupNs: Seq[Int] = Seq(5, 6, 7, 8, 9, 10)

  val schema: StructType = StructType(
    StructField("n_chars", LongType, nullable = false) +:
      (TopNs ++ DupNs).map(n =>
        StructField(s"rep_$n", LongType, nullable = false)) :+
      StructField("truncated", BooleanType, nullable = false))

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val Hex = "0123456789abcdef".getBytes
  private val Space = Array[Byte](' ')

  def compute(text: UTF8String, dupWinnow: Int, maxTokens: Int)
      : GenericInternalRow = {
    val all = text.toString.split(" ", -1)
    val truncated = all.length > maxTokens
    val toks = if (truncated) java.util.Arrays.copyOf(all, maxTokens) else all
    val len = toks.length
    val digest = md.get()
    // per-token UTF-8 bytes (digest input) and code-point lengths
    // (the character currency of n_chars and coverage), each once
    val tb = new Array[Array[Byte]](len)
    val chars = new Array[Int](len)
    var nChars = 0L
    var t = 0
    while (t < len) {
      tb(t) = toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      chars(t) = toks(t).codePointCount(0, toks(t).length)
      nChars += chars(t)
      t += 1
    }
    val ns = TopNs ++ DupNs
    val out = new Array[Any](ns.length + 2)
    out(0) = nChars
    out(ns.length + 1) = truncated
    val covered = new Array[Boolean](len) // reused per n
    var ni = 0
    while (ni < ns.length) {
      val n = ns(ni)
      val wins = len - n + 1
      var rep = 0L
      if (wins > 0 && nChars > 0) {
        // window hashes for this n only (discarded before the next)
        val hx = new Array[String](wins)
        val cnt = new java.util.HashMap[String, Int](wins * 2)
        var i = 0
        while (i < wins) {
          digest.reset()
          var j = 0
          while (j < n) {
            if (j > 0) digest.update(Space)
            digest.update(tb(i + j))
            j += 1
          }
          val dg = digest.digest()
          val hb = new Array[Byte](32)
          var b = 0
          while (b < 16) {
            val x = dg(b) & 0xff
            hb(2 * b) = Hex(x >>> 4)
            hb(2 * b + 1) = Hex(x & 15)
            b += 1
          }
          val h = new String(hb, java.nio.charset.StandardCharsets.US_ASCII)
          hx(i) = h
          cnt.merge(h, 1, (a, bb) => a + bb)
          i += 1
        }
        java.util.Arrays.fill(covered, false)
        if (n <= TopNs.max) {
          // the single most frequent gram, ties to the smallest hash
          var bestCnt = 0
          var bestG: String = null
          val it = cnt.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue > bestCnt ||
                (e.getValue == bestCnt && e.getKey.compareTo(bestG) < 0)) {
              bestCnt = e.getValue; bestG = e.getKey
            }
          }
          i = 0
          while (i < wins) {
            if (hx(i) == bestG) {
              var p = i; val e = i + n
              while (p < e) { covered(p) = true; p += 1 }
            }
            i += 1
          }
        } else {
          // duplicated grams (the mod-k identity winnow, if any)
          i = 0
          while (i < wins) {
            val h = hx(i)
            if ((dupWinnow == 1 ||
                  java.lang.Long.parseLong(h.substring(0, 8), 16)
                    % dupWinnow == 0) && cnt.get(h) >= 2) {
              var p = i; val e = i + n
              while (p < e) { covered(p) = true; p += 1 }
            }
            i += 1
          }
        }
        var cov = 0L
        var p = 0
        while (p < len) { if (covered(p)) cov += chars(p); p += 1 }
        rep = cov * 1000L / nChars
      }
      out(ni + 1) = rep
      ni += 1
    }
    new GenericInternalRow(out)
  }

  /** Column-API face of the expression. */
  def gopherPanel(text: Column, dupWinnow: Int,
                  maxTokens: Int = Int.MaxValue): Column =
    GraftBridge.column(
      GopherPanel(GraftBridge.expression(text), dupWinnow, maxTokens))
}
