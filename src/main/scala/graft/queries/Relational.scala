package graft.queries

import graft.{GateQuery, Tables}
import graft.GateQuery.ordered
import graft.ops.Cols._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The SURVEY §2 operator inventory re-expressed over the driver's
  * testdata tables, one gate query per operator family, each with a
  * DuckDB oracle twin.
  *
  * Scale notes (designed for ~100 TB inputs even though the gate runs
  * at sf0.01/sf0.1):
  *   - every filter/projection is a `Column` expression → pushed into
  *     the parquet scan (PushedFilters / pruned ReadSchema);
  *   - aggregations are declarative `groupBy.agg` → Catalyst splits
  *     partial/final around a single hash shuffle;
  *   - dimension sides of joins are explicitly `broadcast()` when they
  *     are orders-of-magnitude smaller than the fact side, avoiding
  *     fact-table shuffles; AQE handles skew on the rest;
  *   - no UDFs, no collect-side loops — everything stays inside
  *     whole-stage codegen.
  */
object Relational {

  /** Small/large commit-style classifier (reference semantics of
    * FlinkAssignment.scala:147-151, re-keyed on `events.value`). */
  private def sizeType(value: Column): Column =
    when(value > 100, "large").otherwise("small")

  // ---------------------------------------------------------------- q01
  // P1/P2/P5: filter + project, predicate pushed to the scan.
  private val q01 = GateQuery(
    "q01_filter_project",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      ordered(
        li.filter(col("l_quantity") >= 20)
          .select(col("l_orderkey"), col("l_linenumber"),
                  col("l_quantity").cast("long").as("qty")))
    },
    Some("""SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty
            FROM lineitem WHERE l_quantity >= 20 ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- q02
  // P3/P4: array flatten (reference `flatMap(_.files)` pattern) + filter.
  private val q02 = GateQuery(
    "q02_explode_filter",
    (s, d) => {
      val docs = Tables.documents(s, d)
      ordered(
        docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
          .filter(length(col("word")) > 5))
    },
    Some("""SELECT doc_id, word FROM (
              SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
            WHERE length(word) > 5 ORDER BY 1,2"""))

  // ---------------------------------------------------------------- q03
  // A1: keyed count (final-total semantics of the reference's running
  // per-extension counter, FlinkAssignment.scala:95-96).
  private val q03 = GateQuery(
    "q03_keyed_count",
    (s, d) =>
      ordered(Tables.events(s, d).groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"))),
    Some("SELECT event_type, count(*) AS cnt FROM events GROUP BY 1 ORDER BY 1,2"))

  // ---------------------------------------------------------------- q04
  // A2: composite-key sum (FlinkAssignment.scala:113-114 semantics).
  private val q04 = GateQuery(
    "q04_composite_sum",
    (s, d) =>
      ordered(Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(intSum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))),
    Some("""SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
              count(*) AS cnt
            FROM lineitem GROUP BY 1,2 ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- q05
  // A3/T3: non-keyed tumbling 1-day event-time window, dd-MM-yyyy key
  // (FlinkAssignment.scala:128-133). Epoch/UTC aligned on both sides.
  private val q05 = GateQuery(
    "q05_tumbling_daily",
    (s, d) =>
      ordered(Tables.events(s, d)
        .groupBy(window(col("ts"), "1 day"))
        .agg(count(lit(1)).as("cnt"))
        .select(dayKey(col("window.start")).as("day"), col("cnt"))),
    Some("""SELECT strftime(date_trunc('day', ts), '%d-%m-%Y') AS day,
              count(*) AS cnt
            FROM events GROUP BY date_trunc('day', ts) ORDER BY 1,2"""))

  // ---------------------------------------------------------------- q06
  // A4/T4: keyed sliding window 48h/12h (FlinkAssignment.scala:152-154).
  // Spark's window() is epoch-aligned; the oracle reproduces the same
  // 4-windows-per-event assignment with integer epoch arithmetic.
  private val q06 = GateQuery(
    "q06_sliding_window",
    (s, d) =>
      ordered(Tables.events(s, d)
        .select(window(col("ts"), "48 hours", "12 hours").as("w"),
                sizeType(col("value")).as("ctype"))
        .groupBy(col("w"), col("ctype"))
        .agg(count(lit(1)).as("cnt"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
                col("ctype"), col("cnt"))),
    Some("""SELECT strftime(make_timestamp((epoch_us(ts) // 43200000000 - k.k) * 43200000000),
                           '%Y-%m-%d %H:%M:%S') AS window_start,
              CASE WHEN value > 100 THEN 'large' ELSE 'small' END AS ctype,
              count(*) AS cnt
            FROM events CROSS JOIN (VALUES (0),(1),(2),(3)) AS k(k)
            GROUP BY 1,2 ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- q07
  // A5/T7: keyed tumbling day window, multi-aggregate + HAVING, with the
  // reference's tie-safe alphabetical top-committer mode
  // (FlinkAssignment.scala:192-238) re-keyed as top event_type per
  // (user_id, day). Two-level aggregation keeps the mode computation
  // distributed (no per-group buffering beyond the 5-type fanout).
  private val q07 = GateQuery(
    "q07_multi_agg_having",
    (s, d) => {
      val perType = Tables.events(s, d)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"),
                 col("event_type"))
        .agg(count(lit(1)).as("tcnt"),
             sum(col("value").cast("decimal(18,2)")).as("vdec"))
      val byDay = perType
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("tcnt")).as("n_events"),
             count(lit(1)).as("n_types"),
             sum(col("vdec")).cast("double").as("total_value"),
             max(col("tcnt")).as("mx"),
             collect_list(struct(col("tcnt"), col("event_type"))).as("pairs"))
        .withColumn("top_type",
          array_join(array_sort(transform(
            filter(col("pairs"), p => p.getField("tcnt") === col("mx")),
            p => p.getField("event_type"))), ","))
        .filter(col("n_events") >= 5)
        .select(col("user_id"), dayKey(col("day")).as("day"),
                col("n_events"), col("n_types"), col("total_value"),
                col("top_type"))
      ordered(byDay)
    },
    Some("""WITH per_type AS (
              SELECT user_id, date_trunc('day', ts) AS d, event_type,
                     count(*) AS tcnt,
                     SUM(CAST(value AS DECIMAL(18,2))) AS vdec
              FROM events GROUP BY 1,2,3),
            agg AS (
              SELECT user_id, d, CAST(SUM(tcnt) AS BIGINT) AS n_events,
                     count(*) AS n_types, CAST(SUM(vdec) AS DOUBLE) AS total_value,
                     MAX(tcnt) AS mx
              FROM per_type GROUP BY 1,2)
            SELECT a.user_id, strftime(a.d, '%d-%m-%Y') AS day, a.n_events,
                   a.n_types, a.total_value,
                   string_agg(p.event_type, ',' ORDER BY p.event_type) AS top_type
            FROM agg a
            JOIN per_type p ON p.user_id = a.user_id AND p.d = a.d AND p.tcnt = a.mx
            WHERE a.n_events >= 5
            GROUP BY a.user_id, a.d, a.n_events, a.n_types, a.total_value
            ORDER BY 1,2,3,4,5,6"""))

  // ---------------------------------------------------------------- q08
  // J1/T8: interval join — equi-key + time-range condition, the batch
  // form of the reference's intervalJoin.between(-1h, +30m)
  // (FlinkAssignment.scala:274-290). Bounds inclusive on both ends.
  private val q08 = GateQuery(
    "q08_interval_join",
    (s, d) => {
      val e = Tables.events(s, d)
      val a = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("a_user"), col("ts").as("a_ts"),
                col("event_id").as("a_id"))
      val b = e.select(col("user_id").as("b_user"), col("ts").as("b_ts"),
                       col("event_id").as("b_id"), col("event_type").as("b_type"),
                       col("value").as("b_value"))
      // time-bucketed rewrite (graft.ops.IntervalJoin): equi-join on
      // (user, bucket) + exact residual range — same rows as the
      // naive key-join + filter (spec-verified), but pair generation
      // is bounded by the interval's neighborhood, not key history
      val joined = graft.ops.IntervalJoin.bucketed(
          a.withColumnRenamed("a_user", "user_id"),
          b.withColumnRenamed("b_user", "user_id"),
          "user_id", "a_ts", "b_ts", -3600L, 1800L, bucketSeconds = 5400L)
        .filter(col("a_id") =!= col("b_id"))
      ordered(joined.groupBy(col("b_type"))
        .agg(count(lit(1)).as("cnt"), moneySum(col("b_value")).as("sum_value")))
    },
    Some("""SELECT b.event_type AS b_type, count(*) AS cnt,
              CAST(SUM(CAST(b.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND b.ts >= a.ts - INTERVAL 1 HOUR
             AND b.ts <= a.ts + INTERVAL 30 MINUTE
             AND a.event_id <> b.event_id
            WHERE a.event_type = 'purchase'
            GROUP BY 1 ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- q09
  // T10: CEP "A followed by B within 1 day" (FlinkAssignment.scala:332-347)
  // as a relational semi-join: one output row per 'signup' that has a
  // later 'purchase' by the same user within a day — the first-match
  // dedup of the reference's PatternSelectFunction.
  private val q09 = GateQuery(
    "q09_cep_pattern",
    (s, d) => {
      val e = Tables.events(s, d)
      val adds = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id"), col("ts"))
      val rems = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("r_user"), col("ts").as("r_ts"))
      val matched = adds.join(rems,
        col("user_id") === col("r_user") &&
          col("r_ts") > col("ts") &&
          col("r_ts") <= col("ts") + expr("INTERVAL 1 DAY"),
        "left_semi")
      ordered(matched.select(col("user_id"), col("event_id")))
    },
    Some("""SELECT a.user_id, a.event_id FROM events a
            WHERE a.event_type = 'signup' AND EXISTS (
              SELECT 1 FROM events r
              WHERE r.user_id = a.user_id AND r.event_type = 'purchase'
                AND r.ts > a.ts AND r.ts <= a.ts + INTERVAL 1 DAY)
            ORDER BY 1,2"""))

  // ---------------------------------------------------------------- q10
  // §2.3 scalar surface: regexp_extract, split+element_at, endsWith,
  // nullif/coalesce, concat_ws, date_format — all codegen built-ins.
  private val q10 = GateQuery(
    "q10_scalar_funcs",
    (s, d) =>
      ordered(Tables.events(s, d).select(
        col("event_id"),
        regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("int").as("k"),
        dayKey(col("ts")).as("day"),
        concat_ws("-", col("event_type"), col("user_id").cast("string")).as("tag"),
        element_at(split(concat_ws("-", col("event_type"),
          col("user_id").cast("string")), "-"), -1).as("uid_str"),
        col("event_type").endsWith("e").as("ends_e"),
        coalesce(nullif(col("event_type"), lit("view")), lit("was_view")).as("kind"))),
    Some("""SELECT event_id,
              CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k,
              strftime(ts, '%d-%m-%Y') AS day,
              concat_ws('-', event_type, CAST(user_id AS VARCHAR)) AS tag,
              string_split(concat_ws('-', event_type, CAST(user_id AS VARCHAR)), '-')[-1] AS uid_str,
              ends_with(event_type, 'e') AS ends_e,
              coalesce(nullif(event_type, 'view'), 'was_view') AS kind
            FROM events ORDER BY 1,2,3,4,5,6,7"""))

  // ---------------------------------------------------------------- q11
  // §2.6 OVER ranking: top-2 orders per customer, deterministic
  // tie-break on o_orderkey.
  private val q11 = GateQuery(
    "q11_window_rank",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      ordered(Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2))
    },
    Some("""SELECT * FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders)
            WHERE rn <= 2 ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- q12
  // §2.6 lag/lead over a deterministic per-user event-time order;
  // NULL edges coalesced to -1 (engines disagree on NULL sort order).
  private val q12 = GateQuery(
    "q12_lag_lead",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      ordered(Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("prev_id", coalesce(lag(col("event_id"), 1).over(w), lit(-1L)))
        .withColumn("next_id", coalesce(lead(col("event_id"), 1).over(w), lit(-1L)))
        .drop("ts"))
    },
    Some("""SELECT user_id, event_id,
              coalesce(lag(event_id) OVER w, -1) AS prev_id,
              coalesce(lead(event_id) OVER w, -1) AS next_id
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- q13
  // §2.7 global top-k with deterministic tie-break. Spark executes this
  // as TakeOrderedAndProject — no full sort of the fact table.
  private val q13 = GateQuery(
    "q13_topk",
    (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .orderBy(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
    Some("""SELECT * FROM (
              SELECT o_orderkey, o_custkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 100)
            ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- q14
  // §2.7 set ops: EXCEPT (customers with no 'F' order) and INTERSECT
  // (customers holding a >400k order), tagged and unioned.
  private val q14 = GateQuery(
    "q14_set_ops",
    (s, d) => {
      val cust = Tables.customer(s, d)
      val ords = Tables.orders(s, d)
      val noF = cust.select(lit("no_f").as("tag"), col("c_custkey").as("key"))
        .except(ords.filter(col("o_orderstatus") === "F")
          .select(lit("no_f").as("tag"), col("o_custkey").as("key")))
      val big = cust.select(lit("big").as("tag"), col("c_custkey").as("key"))
        .intersect(ords.filter(col("o_totalprice") > 400000)
          .select(lit("big").as("tag"), col("o_custkey").as("key")))
      ordered(noF.union(big))
    },
    Some("""SELECT tag, key FROM (
              SELECT 'no_f' AS tag, c_custkey AS key FROM customer
              EXCEPT
              SELECT 'no_f' AS tag, o_custkey AS key FROM orders WHERE o_orderstatus = 'F')
            UNION ALL
            SELECT tag, key FROM (
              SELECT 'big' AS tag, c_custkey AS key FROM customer
              INTERSECT
              SELECT 'big' AS tag, o_custkey AS key FROM orders WHERE o_totalprice > 400000)
            ORDER BY 1,2"""))

  // ---------------------------------------------------------------- q15
  // Star join: fact lineitem ⋈ orders, dimensions broadcast — the only
  // shuffle left at scale is lineitem⋈orders on orderkey plus the final
  // group-by exchange. Exact decimal revenue.
  private val q15 = GateQuery(
    "q15_star_join_agg",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val o  = Tables.orders(s, d)
      val c  = broadcast(Tables.customer(s, d))
      val n  = broadcast(Tables.nation(s, d))
      val r  = broadcast(Tables.region(s, d))
      ordered(li
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("l_returnflag"))
        .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
             count(lit(1)).as("cnt")))
    },
    Some("""SELECT r_name, l_returnflag,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                       (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
              count(*) AS cnt
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            GROUP BY 1,2 ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- q16
  // Outer join + null-aware aggregation: every customer kept, orderless
  // customers contribute zero.
  private val q16 = GateQuery(
    "q16_outer_join_agg",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      ordered(c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("c_custkey")).as("n_cust"),
             count(col("o_orderkey")).as("n_orders"),
             sum(coalesce(col("o_totalprice"), lit(0)).cast("decimal(18,2)"))
               .cast("double").as("total")))
    },
    Some("""SELECT c_mktsegment, count(DISTINCT c_custkey) AS n_cust,
              count(o_orderkey) AS n_orders,
              CAST(SUM(CAST(coalesce(o_totalprice, 0) AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY 1 ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- q17
  // Semi/anti joins (EXISTS / NOT EXISTS).
  private val q17 = GateQuery(
    "q17_semi_anti",
    (s, d) => {
      val c = Tables.customer(s, d)
      val p = Tables.orders(s, d).filter(col("o_orderstatus") === "P")
      val semi = c.join(p, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(lit("has_p").as("tag"), col("c_custkey").as("key"))
      val anti = c.join(p, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(lit("no_p").as("tag"), col("c_custkey").as("key"))
      ordered(semi.union(anti))
    },
    Some("""SELECT 'has_p' AS tag, c_custkey AS key FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
            UNION ALL
            SELECT 'no_p' AS tag, c_custkey AS key FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
            ORDER BY 1,2"""))

  // ---------------------------------------------------------------- q18
  // T5 session windows (unused by the reference but part of the
  // engine's window surface): per-user sessions with a 30-minute gap.
  // A new session starts when the inter-event gap EXCEEDS the gap
  // duration — probed empirically: Spark merges events exactly
  // gap-apart (session end is inclusive for the merge test). The
  // oracle is the classic gaps-and-islands rewrite with `>`.
  private val q18 = GateQuery(
    "q18_session_window",
    (s, d) =>
      ordered(Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), moneySum(col("value")).as("sum_value"))
        .select(col("user_id"),
                // string output: Spark parquet timestamps are
                // UTC-adjusted, DuckDB's are naive — a raw timestamp
                // column can never hash-match across engines
                date_format(col("session_window.start"),
                  "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
                col("n_events"), col("sum_value"))),
    Some("""WITH flags AS (
              SELECT user_id, ts, value,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS nf
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            sess AS (
              SELECT user_id, ts, value,
                SUM(nf) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
              FROM flags)
            SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
              count(*) AS n_events,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM sess GROUP BY user_id, sid ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- q19
  // Rollup / grouping-sets surface (beyond the reference, standard
  // OLAP): per (returnflag, linestatus) with subtotal and grand-total
  // rows. Rollup emits NULL group keys, which can never hash-match
  // across engines at the sort step — so keys are coalesced to 'ALL'
  // via grouping() on both sides.
  private val q19 = GateQuery(
    "q19_rollup",
    (s, d) =>
      ordered(Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), intSum(col("l_quantity")).as("sum_qty"),
             grouping(col("l_returnflag")).as("g1"),
             grouping(col("l_linestatus")).as("g2"))
        .select(
          when(col("g1") === 1, "ALL").otherwise(col("l_returnflag")).as("rf"),
          when(col("g2") === 1, "ALL").otherwise(col("l_linestatus")).as("ls"),
          col("cnt"), col("sum_qty"))),
    Some("""SELECT
              CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS rf,
              CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS ls,
              count(*) AS cnt,
              CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
            ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- q20
  // As-of join (operator Spark lacks; see graft.ops.AsOf): for every
  // click, the user's most recent purchase at or before it. Oracle is
  // DuckDB's native ASOF JOIN — an independent implementation of the
  // same semantics, not a replay of our construction.
  private val q20 = GateQuery(
    "q20_asof_join",
    (s, d) => {
      val e = Tables.events(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("p_id")) // unique per (key, ts)
      ordered(graft.ops.AsOf.asOfJoin(clicks, purchases, "user_id", "ts")
        .select(col("event_id"), col("user_id"),
                coalesce(col("p_id"), lit(-1L)).as("last_purchase")))
    },
    Some("""SELECT c.event_id, c.user_id, coalesce(p.event_id, -1) AS last_purchase
            FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
            ASOF LEFT JOIN (
              SELECT user_id, ts, max(event_id) AS event_id
              FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) p
              ON c.user_id = p.user_id AND c.ts >= p.ts
            ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- q21
  // Pivot: per-user event-type counts as columns. Spark's relational
  // pivot with an explicit value list — one hash aggregation, no
  // per-value scans; the explicit list keeps the plan static (no
  // value-discovery job) exactly as one would at 100 TB. Oracle is
  // the ANSI conditional-aggregation rewrite.
  private val q21 = GateQuery(
    "q21_pivot",
    (s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      ordered(Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .select(col("user_id") +:
          types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*))
    },
    Some("""SELECT user_id,
              count(*) FILTER (WHERE event_type = 'click')    AS n_click,
              count(*) FILTER (WHERE event_type = 'error')    AS n_error,
              count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
              count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
              count(*) FILTER (WHERE event_type = 'view')     AS n_view
            FROM events GROUP BY 1 ORDER BY 1,2,3,4,5,6"""))

  // ---------------------------------------------------------------- q22
  // Exact percentiles (continuous interpolation): quartiles of
  // l_quantity per return flag. Both engines compute the same
  // (n-1)·p linear interpolation over integral values, so the doubles
  // match bit-for-bit. Spark's percentile is a single-pass exact
  // aggregate (partial/final split like any other agg).
  private val q22 = GateQuery(
    "q22_percentile",
    (s, d) =>
      ordered(Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(percentile(col("l_quantity"), lit(0.25)).as("p25"),
             percentile(col("l_quantity"), lit(0.5)).as("p50"),
             percentile(col("l_quantity"), lit(0.75)).as("p75"),
             min(col("l_quantity")).cast("long").as("mn"),
             max(col("l_quantity")).cast("long").as("mx"))),
    Some("""SELECT l_returnflag,
              quantile_cont(l_quantity, 0.25) AS p25,
              quantile_cont(l_quantity, 0.5)  AS p50,
              quantile_cont(l_quantity, 0.75) AS p75,
              CAST(min(l_quantity) AS BIGINT) AS mn,
              CAST(max(l_quantity) AS BIGINT) AS mx
            FROM lineitem GROUP BY 1 ORDER BY 1,2,3,4,5,6"""))

  // ---------------------------------------------------------------- q23
  // Window frames: running total (ROWS UNBOUNDED PRECEDING) and a
  // trailing 3-row frame sum/count per user over event time. Exact
  // decimal arithmetic inside the frames; one shuffle on user_id
  // shared by all three window expressions (same partitioning+order).
  private val q23 = GateQuery(
    "q23_window_frames",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val base = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tri = base.rowsBetween(-2, Window.currentRow)
      val vdec = col("value").cast("decimal(18,2)")
      ordered(Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("running_sum", sum(vdec).over(run).cast("double"))
        .withColumn("tri_sum", sum(vdec).over(tri).cast("double"))
        .withColumn("tri_cnt", count(lit(1)).over(tri))
        .drop("ts", "value"))
    },
    Some("""SELECT user_id, event_id,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_sum,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS tri_sum,
              COUNT(*) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS tri_cnt
            FROM events ORDER BY 1,2,3,4,5"""))

  // ---------------------------------------------------------------- q24
  // Correlated scalar subquery (orders above their customer's average
  // order value), decorrelated by hand into a per-key aggregate +
  // broadcast join — exactly the plan Catalyst's decorrelation
  // produces for the SQL form, written declaratively. The average is
  // exact-decimal sum / count with ONE final double division, so both
  // engines compare identical doubles.
  private val q24 = GateQuery(
    "q24_scalar_subquery",
    (s, d) => {
      val o = Tables.orders(s, d)
      val cavg = o.groupBy(col("o_custkey").as("ck"))
        .agg((moneySum(col("o_totalprice")) / count(lit(1))).as("cust_avg"))
      ordered(o.join(broadcast(cavg), col("o_custkey") === col("ck"))
        .filter(col("o_totalprice") > col("cust_avg"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
                col("cust_avg")))
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice, cust_avg FROM (
              SELECT o_orderkey, o_custkey, o_totalprice,
                (SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*)
                 FROM orders o2 WHERE o2.o_custkey = o.o_custkey) AS cust_avg
              FROM orders o)
            WHERE o_totalprice > cust_avg ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- q25
  // Cube (all four grouping sets over two dims) — completes the
  // grouping-sets surface next to q19's rollup. Same NULL-key
  // discipline: grouping() → 'ALL' on both sides; the year dimension
  // is emitted as a string so the 'ALL' coalesce stays one type.
  private val q25 = GateQuery(
    "q25_cube",
    (s, d) =>
      ordered(Tables.lineitem(s, d)
        // the year is projected BEFORE the cube: grouping() resolves
        // against grouping columns, not aliased grouping expressions
        .withColumn("yr", year(col("l_shipdate")))
        .cube(col("l_returnflag"), col("yr"))
        .agg(count(lit(1)).as("cnt"), intSum(col("l_quantity")).as("sum_qty"),
             grouping(col("l_returnflag")).as("g1"),
             grouping(col("yr")).as("g2"))
        .select(
          when(col("g1") === 1, "ALL").otherwise(col("l_returnflag")).as("rf"),
          when(col("g2") === 1, "ALL").otherwise(col("yr").cast("string")).as("yr"),
          col("cnt"), col("sum_qty"))),
    Some("""SELECT
              CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS rf,
              CASE WHEN GROUPING(year(l_shipdate)) = 1 THEN 'ALL'
                   ELSE CAST(year(l_shipdate) AS VARCHAR) END AS yr,
              count(*) AS cnt,
              CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
            FROM lineitem GROUP BY CUBE (l_returnflag, year(l_shipdate))
            ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- q26
  // The SQL layer itself (a surface the reference lacks entirely —
  // SURVEY §3): the tables become temp views and ONE ANSI string is
  // executed verbatim by BOTH engines — spark.sql here, DuckDB as
  // the oracle. Ordinal GROUP BY/ORDER BY, decimal arithmetic, and
  // multi-join syntax all parse and plan identically.
  private val q26Sql =
    """SELECT r_name, l_returnflag,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         count(*) AS cnt
       FROM lineitem
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation   ON c_nationkey = n_nationkey
       JOIN region   ON n_regionkey = r_regionkey
       GROUP BY 1, 2 ORDER BY 1, 2, 3, 4"""
  private val q26 = GateQuery(
    "q26_sql_interface",
    (s, d) => {
      Seq("region", "nation", "customer", "orders", "lineitem")
        .foreach(t => Tables.table(s, d, t).createOrReplaceTempView(t))
      s.sql(q26Sql)
    },
    Some(q26Sql))

  // ---------------------------------------------------------------- q27
  // The typed Dataset surface — the API shape the reference's users
  // actually write (case-class streams, FlinkAssignment.scala:35-44):
  // encoder-backed Dataset[Lineitem], typed groupByKey, one streamed
  // foldLeft per group (O(1) state, no group buffering). The filter
  // stays a COLUMN expression so predicate pushdown survives — typed
  // lambdas are opaque to Catalyst, so the idiomatic hybrid is
  // column filters at the scan, typed logic after.
  private val q27 = GateQuery(
    "q27_typed_dataset",
    (s, d) => {
      import s.implicits._
      val ds = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity"))
        .filter(col("l_quantity") >= 20) // pushed to the scan
        .as[(String, Double)]
      ds.groupByKey(_._1)
        .mapGroups { (rf, it) =>
          val (sumQty, cnt) = it.foldLeft((0L, 0L)) { case ((sq, n), r) =>
            (sq + r._2.toLong, n + 1)
          }
          (rf, sumQty, cnt)
        }
        .toDF("l_returnflag", "sum_qty", "cnt")
        .orderBy(col("l_returnflag"), col("sum_qty"), col("cnt"))
    },
    Some("""SELECT l_returnflag,
              CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
              count(*) AS cnt
            FROM lineitem WHERE l_quantity >= 20
            GROUP BY 1 ORDER BY 1,2,3"""))

  val all: Seq[GateQuery] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09,
    q10, q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23,
    q24, q25, q26, q27)
}
