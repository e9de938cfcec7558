package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the classic hot-key mitigation for joining a
  * skewed fact side to a dimension that is too big to broadcast:
  * every fact row gets a deterministic salt in `[0, salts)`, the
  * dimension replicates `salts`× (one clone per salt via
  * `explode(sequence)`), and the join runs on `(key, salt)` — so a
  * hot key's rows spread over `salts` shuffle partitions instead of
  * hammering one reducer. Results are EXACTLY the plain join's:
  * every (key, salt) pair finds the dimension clone carrying that
  * salt, each fact row owns one salt → each matched pair appears
  * exactly once.
  *
  * Cost: the dimension shuffles `salts`× larger — worth it when the
  * fact side's skew dominates (the 100 TB shape: a handful of
  * keys holding 30% of rows makes one straggler task own 30% of the
  * join; AQE's skew-join split handles sort-merge cases at runtime,
  * salting is the PLAN-level fix that also covers aggregations-
  * after-join and stream-static joins where AQE cannot re-plan). */
object SaltedJoin {

  /** Deterministic salt from an expression unique-ish per row (e.g.
    * the fact table's primary key): md5-derived, uniform. */
  def saltOf(e: Column, salts: Int): Column =
    pmod(conv(substring(md5(e.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(salts.toLong)).cast("int")

  /** Inner-join `fact` to `dim` on `key`, spreading each key over
    * `salts` partitions. `saltBy` picks the fact row's salt — pass a
    * per-row unique column (id) for uniform spread. */
  def join(fact: DataFrame, dim: DataFrame, key: String,
           saltBy: Column, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val f = fact.withColumn("__salt", saltOf(saltBy, salts))
    // NB: a generator cannot nest inside another expression (no
    // .cast around the explode) — sequence of int literals is already
    // array<int>, matching saltOf's int
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }
}
