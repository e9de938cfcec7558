package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import java.nio.ByteBuffer
import scala.collection.mutable

/** Misra-Gries / "mergeable summaries" heavy-hitter CANDIDATE
  * aggregate: one pass over a string column with at most `k` counters
  * per aggregation buffer, emitting the surviving keys as a sorted
  * array<string>.
  *
  * Guarantee (the whole point): every item with true frequency
  * `> n/(k+1)` of `n` total rows is ALWAYS in the output, no matter
  * how rows are partitioned or in which order buffers merge — the
  * estimate of any item is undercounted by at most n/(k+1), so a
  * genuinely frequent item cannot be evicted to zero. The summary may
  * also contain infrequent items, and WHICH ones depends on partition
  * order; callers that need a deterministic result must therefore
  * treat this as a candidate set and recount exactly (one semi-joined
  * aggregation — see Extensions x47), after which the output is the
  * exact, order-independent set of true heavy hitters.
  *
  * Why not `groupBy(tok).count`: that shuffles the full vocabulary —
  * unbounded distinct keys at corpus scale. This pass keeps O(k)
  * state per partition, ships ONE k-entry summary per partition to a
  * single reduce, and the exact recount only shuffles rows matching
  * the ≤ k broadcast candidates.
  *
  * update: classic Misra-Gries — hit increments; a miss with a free
  * counter inserts at 1; a miss with all `k` busy decrements every
  * counter (dropping zeros), which "pays" for the unseen item.
  * merge: counter-wise sum, then if over `k` entries subtract the
  * (k+1)-th largest count from all and drop non-positives (Agarwal
  * et al., Mergeable Summaries — preserves the error bound).
  */
case class FreqCandidatesAgg(
    child: Expression,
    k: Int = 100,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, s"freq_candidates needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "freq_candidates"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"freq_candidates expects a string column, got $t")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy out of the reused UTF8String backing buffer
      FreqCandidatesAgg.observe(buf, v.asInstanceOf[UTF8String].toString, k)
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    FreqCandidatesAgg.combine(buf, other, k)

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted.map(UTF8String.fromString(_): AnyRef))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.iterator
      .map { case (s, c) => (s.getBytes("UTF-8"), c) }.toArray
    val bb = ByteBuffer.allocate(
      4 + entries.iterator.map(e => 4 + e._1.length + 8).sum)
    bb.putInt(entries.length)
    entries.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val b = new Array[Byte](bb.getInt)
      bb.get(b)
      buf.put(new String(b, "UTF-8"), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqCandidatesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqCandidatesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqCandidatesAgg =
    copy(child = newChildren.head)
}

object FreqCandidatesAgg {
  /** One Misra-Gries step. Kept on the companion so the spec can
    * exercise the state machine without Catalyst plumbing. */
  private[graft] def observe(
      buf: mutable.HashMap[String, Long], tok: String, k: Int): Unit =
    buf.get(tok) match {
      case Some(c) => buf.update(tok, c + 1)
      case None if buf.size < k => buf.update(tok, 1L)
      case None =>
        // all k counters busy: global decrement pays for the miss
        val dead = mutable.ArrayBuffer.empty[String]
        buf.mapValuesInPlace { (key, c) =>
          if (c == 1L) dead += key
          c - 1
        }
        dead.foreach(buf.remove)
    }

  /** Mergeable-summaries combine: sum, then shrink back to ≤ k by
    * subtracting the (k+1)-th largest count. */
  private[graft] def combine(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long],
      k: Int): mutable.HashMap[String, Long] = {
    other.foreach { case (tok, c) =>
      buf.update(tok, buf.getOrElse(tok, 0L) + c)
    }
    if (buf.size > k) {
      val cut = buf.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace { (key, c) =>
        if (c <= cut) dead += key
        c - cut
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  /** Column-API face: `freqCandidates($"tok", k)` in an `agg`. */
  def freqCandidates(tok: Column, k: Int = 100): Column =
    GraftBridge.column(
      FreqCandidatesAgg(GraftBridge.expression(tok), k).toAggregateExpression())
}
