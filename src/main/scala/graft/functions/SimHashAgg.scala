package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType}
import java.nio.ByteBuffer

/** All-in-one SimHash aggregate: for an input column of 32-bit base
  * hashes `h`, maintains the 32 per-bit vote counters
  * `Σ_h (±1 by bit b of h)` in ONE fixed-width buffer and emits the
  * assembled signature `Σ_b (counter_b ≥ 0 ? 1L<<b : 0)` — the
  * custom-UDAF alternative to thirty-two separate `sum(when(...))`
  * aggregate columns (identical values; one 32-int buffer per group
  * instead of 32 agg states, and 32× fewer aggregate expressions for
  * codegen to carry — the same fusion that makes
  * [[graft.functions.MinHashAgg]] fast).
  *
  * Bit-identical to the column formulation (SimHashAggSpec): each
  * counter is an exact integer sum, and the final assembly is the
  * same deterministic comparison chain — so the DuckDB oracle's
  * independent 32-column construction still hash-matches.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  private val NumBits = 32

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_agg expects a bigint hash column, got $t")
  }

  override def createAggregationBuffer(): Array[Int] = new Array[Int](NumBits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < NumBits) {
        buf(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var b = 0
    while (b < NumBits) { buf(b) += other(b); b += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var b = 0
    while (b < NumBits) {
      if (buf(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * NumBits)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(NumBits)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** Column-API face: `simhashAgg($"h")` in a `groupBy(...).agg`. */
  def simhashAgg(h: Column): Column =
    GraftBridge.column(
      SimHashAgg(GraftBridge.expression(h)).toAggregateExpression())
}
