package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed single-pass alternative to the two-level Q7 rollup
  * (CommitQueries.q7): one `Aggregator` computing the full
  * per-(repo, day) summary — commit count, distinct committers,
  * total changes, alphabetical tie-joined modal committer — with a
  * mergeable buffer, the Spark-native analogue of the reference's
  * ProcessWindowFunction state (FlinkAssignment.scala:195-237).
  *
  * Buffer size is |committers in group|, not |commits|: the same
  * bound the two-level DSL version achieves, here inside one
  * partial/merge/finish aggregation tree, so it composes with any
  * `KeyValueGroupedDataset` and stays correct under partial
  * aggregation and shuffle merges.
  *
  * The buffer is a plain product (`Map[String, Long]` field) so it
  * rides the built-in ExpressionEncoder as a MapType — Tungsten
  * binary rows end to end, no kryo blobs in the shuffle. The
  * alphabetical tie-break is applied once, at `finish`, so merge
  * order can't affect the result.
  */
object CommitSummaryAggregator {

  /** (committerName → commitCount) plus running total changes. */
  final case class Buf(counts: Map[String, Long], totalChanges: Long)
  final case class Summary(amountOfCommits: Long, amountOfCommitters: Long,
                           totalChanges: Long, mostPopularCommitter: String)

  val agg: Aggregator[(String, Long), Buf, Summary] =
    new Aggregator[(String, Long), Buf, Summary] {
      override def zero: Buf = Buf(Map.empty, 0L)
      override def reduce(b: Buf, in: (String, Long)): Buf =
        Buf(b.counts.updated(in._1, b.counts.getOrElse(in._1, 0L) + 1L),
            b.totalChanges + in._2)
      override def merge(a: Buf, b: Buf): Buf =
        Buf(b.counts.foldLeft(a.counts) { case (m, (k, v)) =>
              m.updated(k, m.getOrElse(k, 0L) + v) },
            a.totalChanges + b.totalChanges)
      override def finish(b: Buf): Summary = {
        val n = b.counts.values.sum
        val mx = if (b.counts.isEmpty) 0L else b.counts.values.max
        Summary(n, b.counts.size, b.totalChanges,
          b.counts.collect { case (name, c) if c == mx => name }
            .toSeq.sorted.mkString(","))
      }
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Summary] = Encoders.product[Summary]
    }
}
