package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter pruned semi-join — the explicit form of the runtime
  * filter a warehouse engine injects on a selective join: build a
  * compact bitset over the (filtered) key side, broadcast it to the
  * big side as ONE array<long> row, drop non-members map-side, and
  * only then run the exact semi-join. The final join makes the whole
  * composition LOSSLESS (bloom false positives are eliminated
  * exactly; bloom filters have no false negatives), so callers get
  * plain semi-join semantics while the shuffle carries only the
  * ~|matches| + FP·|big| surviving rows instead of all of `big`.
  *
  * At 100 TB the key side is often too large to broadcast as a hash
  * relation but its bitset is not (16 K words = 128 KB covers ~50k
  * keys at 20 bits/key); the pruned big side then flows into an
  * ordinary shuffle semi-join whose input is orders of magnitude
  * smaller. Construction is deterministic (md5-derived positions,
  * bit_or is commutative), so the filter is identical however the
  * key side is partitioned.
  */
object BloomSemiJoin {

  /** The i-th bit position of `key` (stringified, md5-hashed): 8 hex
    * chars starting at 1+8i → 32 bits, folded into [0, words·64) —
    * wide enough that any practical `words` (≤ 2²⁶) uses its whole
    * bitset (a 16-bit slice would silently cap usable bits at 64 K).
    * md5's 32 hex chars bound `hashes` at 4. */
  private def pos(key: Column, i: Int, words: Int): Column =
    pmod(conv(substring(md5(key.cast("string")), 1 + 8 * i, 8), 16, 10)
      .cast("long"), lit(words * 64L))

  /** One-row (bloom: array<long> of `words`) bitset over `keys(keyCol)`.
    * Built distributedly: each key explodes to `hashes` (word, mask)
    * pairs, a ≤ words-row bit_or groupBy folds them, and the dense
    * array is assembled from the sparse map — no driver-side state. */
  def bloomOf(keys: DataFrame, keyCol: String,
              words: Int = 1024, hashes: Int = 3): DataFrame = {
    require(hashes >= 1 && hashes <= 4,
      s"md5's 32 hex chars provide at most 4 independent 8-hex positions, got $hashes")
    val entries = (0 until hashes).map { i =>
      val p = pos(col(keyCol), i, words)
      struct((p / 64L).cast("int").as("word"),
        call_function("shiftleft", lit(1L), pmod(p, lit(64L)).cast("int")).as("mask"))
    }
    keys
      .select(explode(array(entries: _*)).as("e"))
      .groupBy(col("e.word").as("word"))
      .agg(bit_or(col("e.mask")).as("mask"))
      .agg(map_from_entries(collect_list(struct(col("word"), col("mask"))))
        .as("sparse"))
      .select(transform(sequence(lit(0), lit(words - 1)),
        w => coalesce(element_at(col("sparse"), w.cast("int")), lit(0L)))
        .as("bloom"))
  }

  /** Membership test of `key` against a `bloom` array column. NULL
    * keys test NULL → a filter drops them, matching semi-join
    * semantics (NULL never matches). */
  def mightContain(key: Column, bloom: Column,
                   words: Int = 1024, hashes: Int = 3): Column =
    (0 until hashes).map { i =>
      val p = pos(key, i, words)
      (element_at(bloom, (p / 64L).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), pmod(p, lit(64L)).cast("int"))) =!= 0L)
    }.reduce(_ && _)

  /** `big` rows whose `bigKey` appears in `keys(keyCol)` — exact
    * semi-join semantics, bloom-pruned map-side first. */
  def semiJoin(big: DataFrame, bigKey: String, keys: DataFrame, keyCol: String,
               words: Int = 1024, hashes: Int = 3): DataFrame = {
    val pruned = big
      .crossJoin(broadcast(bloomOf(keys, keyCol, words, hashes)))
      .filter(mightContain(col(bigKey), col("bloom"), words, hashes))
      .drop("bloom")
    pruned.join(keys.select(col(keyCol).as(bigKey)), Seq(bigKey), "left_semi")
  }
}
