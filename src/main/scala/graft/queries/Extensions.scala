package graft.queries

import graft.{GateQuery, Tables}
import graft.GateQuery.ordered
import graft.ops.Cols._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data-pipeline operators over `documents` / `embeddings`:
  * deduplication (exact, token-set, exact Jaccard, MinHash+LSH,
  * SimHash), similarity search (brute-force + IVF), text analysis,
  * and multimodal metadata plumbing.
  *
  * Determinism design: every hash is derived from `md5` (identical in
  * Spark and DuckDB), every similarity is computed over integer
  * quantities with at most one float division/sqrt chain in a fixed
  * expression shape — so even the *approximate* operators (MinHash
  * LSH) hash-match their DuckDB oracle, because the oracle replicates
  * the same deterministic construction rather than a ground truth.
  *
  * Scale design (the 100 TB story):
  *  - exact near-dup first collapses documents to distinct token-set
  *    signatures (hash groupBy — one shuffle), then operates at
  *    signature level; on this corpus that is a 20-30% reduction, on
  *    real crawl data typically 2-5×;
  *  - every token set also gets a HASHED 64-bit bitmask built in one
  *    per-row projection (`aggregate(transform(tokens, w -> 1L <<
  *    (hash(w) % 64)), 0, |)`) — no vocabulary table, no shuffle, no
  *    global coordination at any scale. Distinct words can fold onto
  *    one bit, so mask-Jaccard (a pair of popcounts) is a tight UPPER
  *    approximation of set-Jaccard used for pair SCORING only; class
  *    identity always comes from the exact [[tokenSetSig]] key, so a
  *    mask collision can never merge two different token sets into
  *    one dedup class (DocMasksSpec pins this with a deliberately
  *    colliding fixture);
  *  - MinHash+LSH generates candidates by equi-join on band keys (a
  *    shuffle join on a short string key — no cross product), then
  *    verifies candidates exactly; only verified pairs survive;
  *  - brute-force kNN broadcasts the (small) query set against the
  *    corpus — one pass, no shuffle; the IVF variant prunes the scan
  *    to the probed cells' partitions;
  *  - embedding near-dup has two scale paths: IVF cell equi-join
  *    (x21) and SRP sign-bit banding (x29 — a native codegen'd
  *    signature against a constant hyperplane matrix, no fitting);
  *  - pair graphs collapse to clusters via connected components
  *    (x30 — pointer-jumped label propagation, O(log diameter)
  *    rounds, oracle-replayed as a recursive CTE);
  *  - the trainer-facing steps (vocab x31, PII scrub x32, token ids
  *    x33, chunking x34, packing x23, shuffle x27, mixing x28) are
  *    per-row projections plus aggregations whose OUTPUT is constant-
  *    or enum-sized and broadcasts back — corpus text never shuffles.
  */
object Extensions {

  private val JaccardThreshold = 0.9
  // 4 bands x 4 rows: the standard banding for a ~0.9 Jaccard
  // threshold (t* = (1/b)^(1/r) ≈ 0.71, recall ≈ 0.986 at s = 0.9).
  // 2-row bands admit ~4x the candidates on this high-similarity
  // corpus (22.5M vs 5.5M pairs at sf0.1) for negligible extra recall.
  private[graft] val NumMinhash = 16
  private[graft] val BandRows = 4
  private[graft] val NumBands = NumMinhash / BandRows

  /** 32-bit integer from the first 8 hex chars of an md5 column. */
  private[graft] def hex32(e: Column): Column =
    conv(substring(e, 1, 8), 16, 10).cast("long")

  /** DuckDB twin of [[hex32]] over a named column holding an md5 hex
    * string: Σ digit·16^(8-i) with instr-based digit decoding
    * (DuckDB has no conv()). */
  private def duckHex32(m: String): String =
    (1 to 8).map { i =>
      val p = math.pow(16, 8 - i).toLong
      s"(instr('0123456789abcdef', substr($m, $i, 1)) - 1) * $p"
    }.mkString("(", " + ", ")")

  // ------------------------------------------------------------- shared
  /** (doc_id, sig, mask) — the exact token-set signature
    * ([[graft.ops.Cols.tokenSetSig]], the dedup CLASS key) plus the
    * token set as a 64-bit HASHED bitmap: bit index = md5-derived
    * hash of the word mod 64, OR-folded per row with an
    * `aggregate(transform(...))` HOF. A pure projection — no
    * vocabulary table, no explode, NO SHUFFLE — so the bit assignment
    * needs zero global coordination at any scale (the round-2
    * scale-killer was a single-partition `row_number()` window
    * building dense word ids; a hash needs no ids, and folding
    * per-row needs no groupBy). Two words may fold onto one bit,
    * making mask-Jaccard a tight upper approximation of set-Jaccard —
    * which is why the mask is never a class key: `sig` is exact, so
    * colliding masks cannot merge different token sets into one class
    * (DocMasksSpec). The construction is deterministic and the oracle
    * replays it bit for bit. */
  private[graft] def docMasksOf(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      tokenSetSig(col("text")).as("sig"),
      maskExpr.as("mask"))

  private def docMasks(s: SparkSession, d: String): DataFrame =
    docMasksOf(Tables.documents(s, d))

  private val duckMasksCte =
    s"""toks AS (
         SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
         FROM documents),
       dmask AS (
         -- bit 63 spelled out: DuckDB rejects 1::BIGINT << 63 as a
         -- signed overflow, while Spark's shiftleft wraps it to
         -- Long.MinValue — the CASE reproduces the wrapped value
         SELECT doc_id,
           bit_or(CASE WHEN CAST(${duckHex32("md5(w)")} % 64 AS INT) = 63
                  THEN CAST(-9223372036854775808 AS BIGINT)
                  ELSE CAST(1 AS BIGINT) << CAST(${duckHex32("md5(w)")} % 64 AS INT)
                  END) AS mask
         FROM toks GROUP BY 1),
       masks AS (
         SELECT d.doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(d.text, ' '))), ' ')) AS sig,
           m.mask
         FROM documents d JOIN dmask m ON m.doc_id = d.doc_id),
       sigs AS (
         SELECT sig, mask, min(doc_id) AS rep, count(*) AS cnt
         FROM masks GROUP BY 1, 2)"""

  /** (sig, mask, rep, cnt) — one row per distinct token set. The
    * class key is the exact `sig`; `mask` is functionally dependent
    * on it (same token set ⇒ same mask), so grouping by both yields
    * exactly the `sig` classes while keeping the mask for scoring. */
  private[graft] def sigTable(s: SparkSession, d: String): DataFrame =
    docMasks(s, d).groupBy(col("sig"), col("mask"))
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("cnt"))

  /** LSH candidate pairs from a band table (`rep`, `band`, `k0..k3`):
    * a self equi-join on the whole band yields (rep_a, rep_b) with
    * rep_a < rep_b, dedup'd. Shared by the token-set (x04) and
    * bigram (x14) dedup paths.
    *
    * Deliberately NO broadcast hint: the join keys (band, k0..k3)
    * make this a plain shuffle-able equi-join. At 100 TB the band
    * table is proportional to |distinct signatures| — a forced
    * broadcast (as this had in round 2) is an OOM, while size-gated
    * AQE still picks broadcast when it genuinely fits (LshPlanSpec
    * asserts the degraded path).
    *
    * CALLERS MUST PERSIST+MATERIALIZE `banded` (or its immediate
    * parent) first. With AQE off, static ReuseExchange dedups the two
    * identical sides (LshPlanSpec); with AQE ON, runtime stage reuse
    * does NOT fire across the self-join's InMemoryTableScan-rooted
    * subtrees, and the whole tokenize → md5 → minhash aggregation
    * runs once per side (measured 3.8s vs 2.4s at sf0.1, and it is
    * the CPU-heavy part at any scale).
    *
    * `maxBucket` caps a band bucket's membership: a bucket of k
    * signatures emits k·(k-1)/2 candidates, so one ultra-hot bucket
    * (a near-identical cluster that survives exact-class collapse)
    * turns quadratic — 1M members is 5·10^11 pairs on one key. Above
    * the cap the whole bucket is dropped (standard LSH-dedup
    * hygiene): its members are near-identical to each other, so they
    * keep co-occurring in their OTHER bands' (smaller) buckets, and
    * the recall loss is confined to the hot cluster. The bucket count
    * is a window over the join's own partitioning key, so the extra
    * pass rides the exchange the join already needs. Default
    * unlimited: the gate corpus has no pathological buckets and the
    * oracle replays uncapped semantics. */
  private[graft] def lshCandidates(banded: DataFrame,
                                   maxBucket: Int = Int.MaxValue): DataFrame = {
    val pruned =
      if (maxBucket == Int.MaxValue) banded
      else {
        val bucketKey = col("band") +: (0 until BandRows).map(j => col(s"k$j"))
        banded.withColumn("__bn",
            count(lit(1)).over(Window.partitionBy(bucketKey: _*)))
          .filter(col("__bn") <= maxBucket).drop("__bn")
      }
    val joinCond = col("a.band") === col("b.band") &&
      (0 until BandRows).map(j => col(s"a.k$j") === col(s"b.k$j")).reduce(_ && _) &&
      col("a.rep") < col("b.rep")
    pruned.as("a").join(pruned.as("b"), joinCond)
      .select(col("a.rep").as("rep_a"), col("b.rep").as("rep_b"))
      .distinct()
  }

  /** Affine coefficients for the minhash family: h_i = (a·h + b) mod
    * 2^32 over one md5-derived 32-bit base hash — the textbook
    * construction, and 16× less hashing than one md5 per seed.
    * a·h < 2^52, so the arithmetic is exact in both BIGINT and the
    * doubles DuckDB might route through. */
  private def mhA(i: Int): Long = 1000003L + 2L * i
  private def mhB(i: Int): Long = 12345L + 7919L * i
  private val Mod32 = 4294967296L

  /** LSH band table (`rep`, `band`, `k0..k3`) over an exploded token
    * column (`rep`, `tok`); the base hash is md5-derived with a
    * [[prefix]] so token-set (x04) and bigram (x14) families are
    * independent. The 16 minima come from ONE native
    * [[graft.functions.MinHashAgg]] buffer (same affine family,
    * bit-identical values — MinHashAggSpec), and the band structs are
    * sliced straight off the aggregate's array output — no 16-column
    * intermediate projection, no extra materialization between the
    * aggregation and the candidate join. */
  private[graft] def bandTable(toks: DataFrame, prefix: String): DataFrame = {
    val h = toks.withColumn("h", hex32(md5(concat(lit(prefix), col("tok")))))
    val mh = h.groupBy(col("rep"))
      .agg(graft.functions.MinHashAgg.minhashAgg(col("h"), NumMinhash).as("mhs"))
    bandsOf(mh)
  }

  /** The zero-shuffle band table: per-row fused minhash over a
    * shingle ARRAY column (`rep`, `arr`) via the native
    * [[graft.functions.MinHashArr]] — no explode, no aggregation; the
    * LSH pipeline's first wide op becomes the candidate join itself.
    * Shingle-less rows (empty array → null minima) drop out exactly
    * as they never produced aggregate rows in [[bandTable]]
    * (MinHashArrSpec pins band-table equality). */
  private[graft] def bandTableArr(reps: DataFrame, prefix: String): DataFrame =
    bandsOf(reps
      .select(col("rep"),
        graft.functions.MinHashArr.minhashArr(col("arr"), prefix).as("mhs"))
      .filter(col("mhs").isNotNull))

  /** Slice a (`rep`, `mhs`) minhash table into the (band, k0..k3)
    * equi-join shape. */
  private[graft] def bandsOf(mh: DataFrame): DataFrame = {
    val bandStructs = (0 until NumBands).map { b =>
      struct((0 until BandRows).map(j =>
        element_at(col("mhs"), BandRows * b + j + 1).as(s"k$j")): _*)
    }
    mh.select(col("rep"), posexplode(array(bandStructs: _*)).as(Seq("band", "ks")))
      .select(col("rep") +: col("band") +:
        (0 until BandRows).map(j => col(s"ks.k$j").as(s"k$j")): _*)
  }

  /** Per-ROW minhash construction for streaming: the same md5 base
    * hash and 16-transform affine family as [[bandTable]] /
    * [[graft.functions.MinHashAgg]], but computed with array HOFs
    * over one row's token set instead of a grouped aggregate — a
    * stream can minhash each document statelessly in a projection.
    * Split into two columns so the md5 pass evaluates ONCE per token
    * (CollapseProject keeps non-cheap producers out of multi-use
    * consumers; fusing them would re-md5 every token 16 times — the
    * measured x14 pitfall). MinHashAggSpec pins bit-identity with the
    * aggregate. */
  private[graft] def baseHashes(text: Column, prefix: String): Column =
    transform(tokenSet(text), t => hex32(md5(concat(lit(prefix), t))))

  /** 16 affine minima over a base-hash array column ([[baseHashes]]). */
  private[graft] def minhashOf(hs: Column): Column =
    array((0 until NumMinhash).map { i =>
      array_min(transform(hs, h => (h * mhA(i) + mhB(i)) % Mod32))
    }: _*)

  /** The 4 LSH band keys of a minhash array, as "band:k0:k1:k2:k3"
    * strings — the streaming join/state key twin of [[bandTable]]'s
    * (band, k0..k3) equi-join columns. */
  private[graft] def bandKeysOf(mhs: Column): Column =
    array((0 until NumBands).map { b =>
      concat_ws(":", (lit(b) +: (0 until BandRows).map(j =>
        element_at(mhs, BandRows * b + j + 1))): _*)
    }: _*)

  /** The hashed 64-bit token-set bitmask as a standalone column
    * (the [[docMasksOf]] construction) — usable in a streaming
    * projection. Native fused [[graft.functions.TokenMask]]
    * expression; bit-identical to [[maskHofExpr]] (TokenMaskSpec). */
  private[graft] val maskExpr: Column =
    graft.functions.TokenMask.tokenMask(col("text"))

  /** The built-in-HOF construction maskExpr replaced — kept as the
    * spec's equality baseline; the oracle replays the same
    * arithmetic (duckMasksCte). */
  private[graft] val maskHofExpr: Column =
    expr("""aggregate(
         transform(array_sort(array_distinct(split(text, ' '))),
           w -> shiftleft(CAST(1 AS BIGINT),
                  CAST(CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT) % 64 AS INT))),
         CAST(0 AS BIGINT),
         (acc, b) -> acc | b)""")

  // ---------------------------------------------------------------- x01
  // Exact dedup: hash-groupBy on raw text; every doc labeled keep/dup.
  private val x01 = GateQuery(
    "x01_dedup_exact",
    (s, d) => {
      val w = Window.partitionBy(col("h")).orderBy(col("doc_id"))
      ordered(Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("h"))
        .withColumn("dup", row_number().over(w) > 1))
    },
    Some("""SELECT doc_id, h, rn > 1 AS dup FROM (
              SELECT doc_id, md5(text) AS h,
                     row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
              FROM documents)
            ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- x02
  // Token-set dedup: docs whose distinct-word sets are identical
  // (order/multiplicity-insensitive near-dup, Jaccard = 1.0 class).
  private val x02 = GateQuery(
    "x02_dedup_tokenset",
    (s, d) =>
      ordered(Tables.documents(s, d)
        .groupBy(tokenSetSig(col("text")).as("sig"))
        .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keep"))
        .filter(col("cnt") > 1)),
    Some("""SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS sig,
              count(*) AS cnt, min(doc_id) AS keep
            FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- x03
  // Near-dup pairs at signature level: mask-Jaccard >= 0.9 via
  // bitmask popcount. The classes are exact (sig-keyed); the SCORE is
  // the hashed-mask Jaccard — an upper approximation of set-Jaccard
  // (colliding bits can only grow the intersection), so this admits,
  // never misses, a >= t pair.
  //
  // Two-level LOSSLESS pruning (oracle stays plain all-pairs):
  //  1. DISTINCT-MASK COLLAPSE: sigs sharing a mask pair at jac = 1.0
  //     by definition, so intra-mask pairs emit directly off a
  //     mask equi-join (output-sized work, no scoring); the pair
  //     SCAN runs at distinct-mask granularity (sf0.1: 3935 sigs →
  //     3232 masks, candidates 2.53M → 1.61M).
  //  2. LENGTH-FILTER equi-join between distinct masks: jac(a,b) <=
  //     min(pc)/max(pc), so a >= t pair needs popcounts within a
  //     factor t of each other; the a side explodes to its admissible
  //     partner popcounts (<= ~8 values at t=0.9) — never enumerates
  //     pairs the bound rules out.
  //
  // Measured honesty (PERF.md, sf0.1): the OUTPUT is 142,524 pairs
  // out of 7.74M all-pairs (1.8% — quadratic-DENSE), so no exact
  // candidate generator can be sub-quadratic here; this plan's
  // candidates are ~11x output. Alternatives measured and rejected:
  // Hamming-band pigeonhole (jac>=0.9 on 64 bits => hamming<=6, 7
  // bands) admits 2.38M — finer keys but a 7x explode on both join
  // sides; routing through x04's MinHash bands admits 5.5M AND
  // loses 486 true pairs (LSH recall — wrong output). x04/x35 are
  // the sub-quadratic near-dup paths with different semantics; this
  // is the exact-scoring specialization.
  private val x03 = GateQuery(
    "x03_dedup_jaccard",
    (s, d) => {
      val sigs = sigTable(s, d).persist() // four consumers below
      sigs.count() // eager: consumers race on a cold cache (see x14)
      // intra-mask pairs: identical masks are jac = 1.0 by identity —
      // equi-join on the mask, buckets = mask-class sizes, output-
      // sized. (Guard pc > 0: two empty masks score 0/0 = NaN in the
      // scan formulation and must stay absent here too.)
      val intra = sigs.select(col("mask"), col("rep").as("rep_a"), col("cnt").as("cnt_a"))
        .join(sigs.select(col("mask"), col("rep").as("rep_b"), col("cnt").as("cnt_b")),
          Seq("mask"))
        .filter(col("rep_a") < col("rep_b") && bit_count(col("mask")) > 0)
        .select(col("rep_a"), col("rep_b"), col("cnt_a"), col("cnt_b"),
          lit(1.0).as("jac"))
      // inter-mask candidates at distinct-mask granularity
      val dm = sigs.groupBy(col("mask")).agg(count(lit(1)).as("nsig"))
        .persist()
      dm.count()
      // epsilon loosens the float bounds so t*pc landing a hair above
      // an integer can never EXCLUDE an admissible popcount (the
      // prefilter may only over-admit; exactness lives in `jac`)
      val a = dm.select(col("mask").as("mask_a"))
        .withColumn("pc_b", explode(sequence(
          ceil(bit_count(col("mask_a")) * lit(JaccardThreshold) - lit(1e-9)).cast("int"),
          floor(bit_count(col("mask_a")) / lit(JaccardThreshold) + lit(1e-9)).cast("int"))))
      val b = dm.select(col("mask").as("mask_b"))
      val vp = a.join(b,
          col("pc_b") === bit_count(col("mask_b")) && col("mask_a") < col("mask_b"))
        .withColumn("jac",
          bit_count(col("mask_a").bitwiseAND(col("mask_b"))).cast("double") /
            bit_count(col("mask_a").bitwiseOR(col("mask_b"))))
        .filter(col("jac") >= JaccardThreshold)
        .select(col("mask_a"), col("mask_b"), col("jac"))
      // expand verified MASK pairs back to sig pairs (output-sized):
      // canonical (rep_a, rep_b) ordering is by rep, not by mask
      val inter = vp
        .join(sigs.select(col("mask").as("mask_a"), col("rep").as("r1"),
          col("cnt").as("c1")), "mask_a")
        .join(sigs.select(col("mask").as("mask_b"), col("rep").as("r2"),
          col("cnt").as("c2")), "mask_b")
        .select(
          least(col("r1"), col("r2")).as("rep_a"),
          greatest(col("r1"), col("r2")).as("rep_b"),
          when(col("r1") < col("r2"), col("c1")).otherwise(col("c2")).as("cnt_a"),
          when(col("r1") < col("r2"), col("c2")).otherwise(col("c1")).as("cnt_b"),
          col("jac"))
      ordered(intra.unionByName(inter))
    },
    Some(s"""WITH $duckMasksCte
            SELECT a.rep AS rep_a, b.rep AS rep_b, a.cnt AS cnt_a, b.cnt AS cnt_b,
              CAST(bit_count(a.mask & b.mask) AS DOUBLE) / bit_count(a.mask | b.mask) AS jac
            FROM sigs a JOIN sigs b ON a.rep < b.rep
            WHERE CAST(bit_count(a.mask & b.mask) AS DOUBLE) / bit_count(a.mask | b.mask) >= $JaccardThreshold
            ORDER BY 1,2,3,4,5"""))

  // ---------------------------------------------------------------- x04
  // MinHash + LSH near-dup: 16 md5-derived minhashes per signature in
  // 4 bands of 4; candidates = signatures agreeing on a whole band
  // (multi-column numeric equi-join — no cross product, no string
  // keys); candidate pairs dedup'd, then verified with exact bitmask
  // Jaccard over the broadcast signature table. Deterministic end to
  // end, so the oracle replays the identical construction.
  private val x04 = GateQuery(
    "x04_dedup_minhash",
    (s, d) => {
      // three consumers (minhash tokens + both verify sides), two of
      // them broadcast subtrees: persist AND materialize eagerly so
      // the tokenize → vocab → mask collapse runs once instead of
      // once per racing consumer (see the x14 comment)
      val sigs = sigTable(s, d).persist()
      sigs.count()
      ordered(verifiedMinhashPairs(s, d, sigs)
        .select(col("rep_a"), col("rep_b"), col("jac")))
    },
    Some(s"""WITH $duckMasksCte, $duckMinhashCtes
          SELECT rep_a, rep_b, jac FROM verified
          ORDER BY 1,2,3"""))

  /** x04's candidate generation + exact verify, parameterized on a
    * persisted-and-materialized signature table: minhash the rep
    * docs' token sets, LSH-band join for candidates, exact bitmask
    * Jaccard verify. @return (rep_a, rep_b, jac), rep_a < rep_b. */
  private def verifiedMinhashPairs(s: SparkSession, d: String,
                                   sigs: DataFrame): DataFrame = {
    // tokenSet depends only on documents.text, so without the
    // repartition barrier Catalyst pushes the (heavy) array + minhash
    // projection below the join into the documents BROADCAST subtree
    // — which is the 1-split scan, i.e. one serial task (measured
    // 0.9 s → 2.6 s when it happened). The narrow repartition keeps
    // the per-row signature work spread across the cluster.
    val docArrs = Tables.documents(s, d)
      .repartition(col("doc_id"))
      .select(col("doc_id"), tokenSet(col("text")).as("arr"))
    val repArrs = sigs.join(docArrs, col("rep") === col("doc_id"))
      .select(col("rep"), col("arr"))
    // the self-join reads the band table twice and AQE does not reuse
    // the stage (see lshCandidates) — materialize it once
    val banded = bandTableArr(repArrs, "t:").persist()
    banded.count()
    val cand = lshCandidates(banded).persist()
    cand.count()
    // verify-side masks: semi-join the signature table down to the ids
    // that actually appear in a candidate pair and broadcast only those
    // — the full sigs table is |distinct docs|-sized (corpus-scale at
    // 100 TB), the candidate set is bounded by LSH collisions (x14's
    // pattern)
    val candIds = cand.select(col("rep_a").as("rep"))
      .union(cand.select(col("rep_b").as("rep"))).distinct()
    val candSigs = sigs.join(candIds, "rep")
    val ma = broadcast(candSigs.select(col("rep").as("rep_a"), col("mask").as("mask_a")))
    val mb = broadcast(candSigs.select(col("rep").as("rep_b"), col("mask").as("mask_b")))
    cand.join(ma, "rep_a").join(mb, "rep_b")
      .withColumn("jac",
        bit_count(col("mask_a").bitwiseAND(col("mask_b"))).cast("double") /
          bit_count(col("mask_a").bitwiseOR(col("mask_b"))))
      .filter(col("jac") >= JaccardThreshold)
  }

  /** x04's oracle CTE chain (everything after sigs), shared with x19. */
  private def duckMinhashCtes: String = {
    val mhCols = (0 until NumMinhash).map { i =>
      s"MIN((h * ${mhA(i)} + ${mhB(i)}) % $Mod32) AS mh$i"
    }.mkString(", ")
    val bandSelects = (0 until NumBands).map { b =>
      val ks = (0 until BandRows)
        .map(j => s"mh${BandRows * b + j} AS k$j").mkString(", ")
      s"SELECT rep, $b AS band, $ks FROM mh"
    }.mkString(" UNION ALL ")
    val joinKeys = "a.band = b.band AND " +
      (0 until BandRows).map(j => s"a.k$j = b.k$j").mkString(" AND ")
    s"""rep_toks AS (
          SELECT s.rep, unnest(list_distinct(string_split(doc.text, ' '))) AS tok
          FROM sigs s JOIN documents doc ON doc.doc_id = s.rep),
        th AS (SELECT rep, ${duckHex32("md5('t:' || tok)")} AS h FROM rep_toks),
        mh AS (SELECT rep, $mhCols FROM th GROUP BY rep),
        banded AS ($bandSelects),
        cand AS (
          SELECT DISTINCT a.rep AS rep_a, b.rep AS rep_b
          FROM banded a JOIN banded b ON $joinKeys AND a.rep < b.rep),
        verified AS (
          SELECT c.rep_a, c.rep_b,
            CAST(bit_count(sa.mask & sb.mask) AS DOUBLE) / bit_count(sa.mask | sb.mask) AS jac
          FROM cand c
          JOIN sigs sa ON sa.rep = c.rep_a
          JOIN sigs sb ON sb.rep = c.rep_b
          WHERE CAST(bit_count(sa.mask & sb.mask) AS DOUBLE) / bit_count(sa.mask | sb.mask) >= $JaccardThreshold)"""
  }

  // ---------------------------------------------------------------- x05
  // SimHash: 32-bit signature; bit b set iff Σ_token (±1 by bit b of
  // the token's md5-derived hash) is non-negative. The 32 per-bit
  // vote counters live in ONE fused [[graft.functions.SimHashAgg]]
  // buffer (bit-identical to 32 separate sum(when) aggregate columns
  // — SimHashAggSpec — but one agg state instead of 32, and 32× fewer
  // aggregate expressions for codegen to carry). The oracle keeps the
  // independent 32-column construction.
  private val x05 = GateQuery(
    "x05_simhash",
    (s, d) =>
      // per-row fused signature (SimHashArr) — no explode, no agg
      // shuffle; repartitioned off the 1-split scan so the digest
      // work parallelizes (the x36 pitfall)
      ordered(Tables.documents(s, d)
        .repartition(col("doc_id"))
        .select(col("doc_id"),
          graft.functions.SimHashArr.simhashArr(tokenSet(col("text")))
            .as("simhash"))),
    Some {
      val bitSums = (0 until 32).map { b =>
        s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b"
      }.mkString(", ")
      val assemble = (0 until 32).map { b =>
        s"(CASE WHEN b$b >= 0 THEN ${1L << b} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH th AS (
             SELECT doc_id, ${duckHex32("md5(tok)")} AS h FROM (
               SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
               FROM documents)),
           bits AS (SELECT doc_id, $bitSums FROM th GROUP BY 1)
          SELECT doc_id, $assemble AS simhash FROM bits ORDER BY 1,2"""
    })

  // ------------------------------------------------------------- shared
  /** FLOOR(x·1000) integer-quantized cosine — all similarity
    * arithmetic is exact integer math; the only floats are one
    * sqrt·sqrt product and one division, in a fixed expression shape
    * on both engines. Computed by the native codegen'd
    * [[graft.functions.QuantizedCosine]] expression (one fused loop;
    * bit-identical to the HOF composition the oracle mirrors — see
    * QuantizedCosineSpec). */
  private def cosCol(a: Column, b: Column): Column =
    graft.functions.QuantizedCosine.quantizedCosine(a, b)

  /** Exact long dot product (inputs are already integer-quantized). */
  private def dotLongCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, z) => acc + z)

  /** Cosine over two ALREADY-quantized long arrays (x38's centroids
    * are integer sum vectors, so [[cosCol]]'s float-input quantization
    * step doesn't apply): exact integer dots, one sqrt·sqrt product
    * and one division — the same fixed float shape the oracle states.
    * Computed by the native codegen'd [[graft.functions.LongCosine]]
    * (one fused loop; bit-identical to the HOF composition —
    * LongCosineSpec — which dominated x47's measured pair-join cost). */
  private def cosLongCol(a: Column, b: Column): Column =
    graft.functions.LongCosine.longCosine(a, b)

  private val NumQueries = 10
  private val TopK = 5

  // ---------------------------------------------------------------- x06
  // Brute-force cosine top-k: queries (vec_id < 10) broadcast against
  // the corpus; per-query row_number over (cos desc, vec_id).
  private val x06 = GateQuery(
    "x06_knn_bruteforce",
    (s, d) => {
      val v = Tables.embeddings(s, d).select(col("vec_id"), col("embedding").as("qv"))
      val q = v.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("qv").as("qq"))
      val scored = broadcast(q).join(v, col("qid") =!= col("vec_id"))
        .withColumn("cos", cosCol(col("qq"), col("qv")))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("vec_id"))
      ordered(scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= TopK)
        .select(col("qid"), col("vec_id"), col("rn"), col("cos")))
    },
    Some(s"""WITH v AS (
              SELECT vec_id, list_transform(embedding,
                x -> CAST(FLOOR(x * 1000) AS BIGINT)) AS qv
              FROM embeddings),
            scored AS (
              SELECT q.vec_id AS qid, v.vec_id,
                list_dot_product(q.qv, v.qv) /
                  (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(v.qv, v.qv))) AS cos
              FROM v q JOIN v ON q.vec_id < $NumQueries AND q.vec_id <> v.vec_id)
            SELECT qid, vec_id, rn, cos FROM (
              SELECT qid, vec_id, cos,
                row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
              FROM scored)
            WHERE rn <= $TopK ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- x07
  // IVF-style ANN (the scale path), SCALE-HONEST parameterization:
  // the cell count GROWS with the corpus — cells = max(8,
  // floor(sqrt(n))), the standard nlist ≈ √n sizing — while the probe
  // count stays FIXED, so the scanned fraction probe/cells = 2/√n
  // VANISHES as the corpus grows and per-query cost ≈ probe·n/cells
  // = 2·√n is sublinear: an index, not a partitioned scan (the
  // round-11 constants, 2 probes of 8 fixed cells, scanned a constant
  // 25% of ANY corpus). Centroids are the first `cells` vectors
  // (deterministic); assignment is a PER-ROW argmax over ONE
  // broadcast centroid-model row — zero corpus shuffles at build (the
  // previous row_number formulation shuffled corpus×cells rows); a
  // query probes its IvfProbe nearest cells and ranks only those
  // cells' vectors. Approximate by construction but fully
  // deterministic, so it is still oracle-checkable in SQL — the
  // oracle derives the same cells count from its own count(*).
  private val IvfProbe = 2
  private val x07 = GateQuery(
    "x07_knn_ivf",
    (s, d) => {
      val v = Tables.embeddings(s, d).select(col("vec_id"), col("embedding").as("qv"))
      // cells = max(8, floor(sqrt(n))), computed IN-PLAN (a one-row
      // agg cross-joined into the seed filter — no driver-side count)
      val ncells = v.agg(greatest(lit(8L),
        floor(sqrt(count(lit(1)).cast("double"))).cast("long")).as("ncells"))
      val cents = v.crossJoin(broadcast(ncells))
        .filter(col("vec_id") < col("ncells"))
        .select(col("vec_id").as("cid"), col("qv").as("cv"))
      // cell assignment: nearest centroid (ties -> smallest cid) as a
      // per-row argmax against the broadcast model row — the max of
      // struct(cos, -cid) is exactly ORDER BY cos DESC, cid ASC rn=1
      val cmodel = cents
        .agg(sort_array(collect_list(struct(col("cid"), col("cv")))).as("cm"))
      val assigned = v.crossJoin(broadcast(cmodel))
        .withColumn("best", array_max(transform(col("cm"),
          c => struct(cosCol(col("qv"), c("cv")).as("ccos"),
            (-c("cid")).as("ncid")))))
        .select(col("vec_id"), col("qv"), (-col("best")("ncid")).as("cid"))
      // query probes: IvfProbe nearest cells (window over the tiny
      // queries×cells table, never the corpus)
      val q = v.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("qv").as("qq"))
      val wProbe = Window.partitionBy(col("qid"))
        .orderBy(col("pcos").desc, col("cid"))
      val probes = q.crossJoin(broadcast(cents))
        .withColumn("pcos", cosCol(col("qq"), col("cv")))
        .withColumn("prn", row_number().over(wProbe))
        .filter(col("prn") <= IvfProbe)
        .select(col("qid"), col("qq"), col("cid"))
      val scored = broadcast(probes).join(assigned, "cid")
        .filter(col("qid") =!= col("vec_id"))
        .withColumn("cos", cosCol(col("qq"), col("qv")))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("vec_id"))
      ordered(scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= TopK)
        .select(col("qid"), col("vec_id"), col("rn"), col("cos")))
    },
    Some(s"""WITH v AS (
              SELECT vec_id, list_transform(embedding,
                x -> CAST(FLOOR(x * 1000) AS BIGINT)) AS qv
              FROM embeddings),
            cents AS (SELECT vec_id AS cid, qv AS cv FROM v
              WHERE vec_id < (SELECT GREATEST(8,
                CAST(FLOOR(SQRT(count(*))) AS BIGINT)) FROM v)),
            assigned AS (
              SELECT vec_id, qv, cid FROM (
                SELECT v.vec_id, v.qv, c.cid,
                  row_number() OVER (PARTITION BY v.vec_id ORDER BY
                    list_dot_product(v.qv, c.cv) /
                      (sqrt(list_dot_product(v.qv, v.qv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                    c.cid) AS crn
                FROM v CROSS JOIN cents c)
              WHERE crn = 1),
            probes AS (
              SELECT qid, qq, cid FROM (
                SELECT q.vec_id AS qid, q.qv AS qq, c.cid,
                  row_number() OVER (PARTITION BY q.vec_id ORDER BY
                    list_dot_product(q.qv, c.cv) /
                      (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                    c.cid) AS prn
                FROM v q CROSS JOIN cents c WHERE q.vec_id < $NumQueries)
              WHERE prn <= $IvfProbe),
            scored AS (
              SELECT p.qid, a.vec_id,
                list_dot_product(p.qq, a.qv) /
                  (sqrt(list_dot_product(p.qq, p.qq)) * sqrt(list_dot_product(a.qv, a.qv))) AS cos
              FROM probes p JOIN assigned a ON a.cid = p.cid AND p.qid <> a.vec_id)
            SELECT qid, vec_id, rn, cos FROM (
              SELECT qid, vec_id, cos,
                row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
              FROM scored)
            WHERE rn <= $TopK ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- x08
  // Text statistics: token counts, average token length, stopword
  // ratio — all single-division floats over exact integers.
  private val x08 = GateQuery(
    "x08_text_stats",
    (s, d) => {
      val toks = split(col("text"), " ")
      val nTok = size(toks)
      val stopCnt = size(filter(toks, t => t.isin("the", "a", "and", "of")))
      ordered(Tables.documents(s, d).select(
        col("doc_id"),
        nTok.as("n_tokens"),
        size(array_distinct(toks)).as("n_uniq"),
        ((length(col("text")) - nTok + 1).cast("double") / nTok).as("avg_token_len"),
        stopCnt.as("stop_cnt"),
        (stopCnt.cast("double") / nTok).as("stop_ratio")))
    },
    Some("""SELECT doc_id,
              len(string_split(text, ' ')) AS n_tokens,
              len(list_distinct(string_split(text, ' '))) AS n_uniq,
              CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
                / len(string_split(text, ' ')) AS avg_token_len,
              len(list_filter(string_split(text, ' '),
                t -> t = 'the' OR t = 'a' OR t = 'and' OR t = 'of')) AS stop_cnt,
              CAST(len(list_filter(string_split(text, ' '),
                t -> t = 'the' OR t = 'a' OR t = 'and' OR t = 'of')) AS DOUBLE)
                / len(string_split(text, ' ')) AS stop_ratio
            FROM documents ORDER BY 1,2,3,4,5,6"""))

  // ---------------------------------------------------------------- x09
  // Language-ID heuristic (stopword-density n-gram-free variant)
  // scored against the labeled lang column.
  private val x09 = GateQuery(
    "x09_langid",
    (s, d) => {
      val toks = split(col("text"), " ")
      val ratio = size(filter(toks, t => t.isin("the", "a", "and", "of")))
        .cast("double") / size(toks)
      ordered(Tables.documents(s, d).select(
        col("doc_id"), col("lang"),
        when(ratio >= 0.08, "en").otherwise("unk").as("lang_pred"),
        (when(ratio >= 0.08, "en").otherwise("unk") === col("lang")).as("matched")))
    },
    Some("""SELECT doc_id, lang, lang_pred, lang_pred = lang AS matched FROM (
              SELECT doc_id, lang,
                CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                  t -> t = 'the' OR t = 'a' OR t = 'and' OR t = 'of')) AS DOUBLE)
                  / len(string_split(text, ' ')) >= 0.08
                THEN 'en' ELSE 'unk' END AS lang_pred
              FROM documents)
            ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- x10
  // Document fingerprint: lexicographic min over all 8-gram md5s
  // (min-hash winnowing flavor; rolling window, shift 1).
  // Round 15: the min-of-window-md5s runs as ONE native pass
  // (graft.functions.RollingFp — text bytes encoded once, min
  // tracked as raw digest bytes, only the winner hex-encoded). The
  // HOF form it replaces (array_min over a transform materializing
  // ~length(text) hex strings through an interpreted lambda) was the
  // slowest sf1 gate (70.3 s) once the bench evaluated results for
  // real; RollingFpSpec pins bit-equality against it.
  private val x10 = GateQuery(
    "x10_fingerprint",
    (s, d) =>
      ordered(Tables.documents(s, d).select(col("doc_id"),
        graft.functions.RollingFp.rollingFp(col("text"), 8).as("fp"))),
    Some("""SELECT doc_id,
              list_aggregate(list_transform(range(1, greatest(length(text) - 7, 1) + 1),
                i -> md5(substr(text, CAST(i AS INT), 8))), 'min') AS fp
            FROM documents ORDER BY 1,2"""))

  // ---------------------------------------------------------------- x11
  // Multimodal metadata: documents treated as opaque byte payloads —
  // size, content hash, head bytes (the schema/plumbing layer for
  // binary columns; real decode lives in graft.multimodal).
  private val x11 = GateQuery(
    "x11_media_meta",
    (s, d) =>
      ordered(Tables.documents(s, d).select(
        col("doc_id"),
        octet_length(col("text")).as("nbytes"),
        md5(col("text")).as("content_md5"),
        lower(hex(substring(col("text"), 1, 8))).as("head_hex"))),
    Some("""SELECT doc_id, octet_length(encode(text)) AS nbytes, md5(text) AS content_md5,
              lower(hex(substr(text, 1, 8))) AS head_hex
            FROM documents ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- x12
  // Deterministic "feature extraction" over the byte payload — the
  // gate-checkable face of the stubbed multimodal decode pipeline.
  private val x12 = GateQuery(
    "x12_media_features",
    (s, d) =>
      ordered(Tables.documents(s, d).select(
        col("doc_id"),
        octet_length(col("text")).cast("long").as("f_bytes"),
        hex32(md5(col("text"))).as("f_hash"),
        size(split(col("text"), " ")).cast("long").as("f_tokens"),
        length(col("text")).cast("long").as("f_chars"))),
    Some(s"""SELECT doc_id,
              CAST(octet_length(encode(text)) AS BIGINT) AS f_bytes,
              CAST(${duckHex32("md5(text)")} AS BIGINT) AS f_hash,
              CAST(len(string_split(text, ' ')) AS BIGINT) AS f_tokens,
              CAST(length(text) AS BIGINT) AS f_chars
            FROM documents ORDER BY 1,2,3,4,5"""))

  // ---------------------------------------------------------------- x13
  // Embedding-cosine near-dup: all vector pairs above a cosine
  // threshold under the same exact quantized metric as the kNN
  // queries. An EXACT theta join is inherently Θ(n²) compare work
  // (and neither IVF cells nor SRP bands are lossless at cos ≥ 0.5 —
  // both would change the output), so the scale question is SHAPE:
  // round 4 shipped a broadcast nested-loop join (whole table to
  // every executor, driver-brokered); this is now a GRID-PARTITIONED
  // theta join (the classic 1-bucket-theta layout): ids hash into B
  // blocks, side a replicates across partner blocks (ba, *), side b
  // across (*, bb), and the join is a plain shuffle EQUI-join on the
  // (ba, bb) block pair with the cosine threshold as the residual —
  // each of the B² buckets does (n/B)² compares, evenly spread, no
  // broadcast, no NLJ. Shuffle volume is 2·n·B rows; at a real
  // cluster size B² while n/B rows fit an executor.
  //
  // CONTRACT: exact all-pairs cosine is Θ(n²) COMPARE work no matter
  // the layout (measured 79.8× time for 10× rows, BENCH_SFX10), so
  // this operator is bounded-input BY CONTRACT — the caller hands it
  // a capped candidate set (an LSH/IVF survivor class, a sampled
  // recall audit), never a raw corpus. The gate enforces the cap
  // explicitly (vec_id < X13ExactCap — a no-op at the correctness
  // SFs, a hard bound above). Unbounded corpora route through the
  // sub-quadratic paths: x21 (IVF cells) / x29 (SRP bands), with
  // this operator as their within-bucket verify or sampled oracle.
  private val GridBlocks = 8
  private[graft] val X13ExactCap = 4096
  private val x13 = GateQuery(
    "x13_dedup_embedding",
    (s, d) => {
      // make a capped run distinguishable from full coverage: count
      // the excluded tail (parquet metadata count — no scan) and say
      // so out loud, so "gate green" is never mistaken for "exact
      // all-pairs ran over the whole corpus"
      val excluded = Tables.embeddings(s, d)
        .filter(col("vec_id") >= X13ExactCap).count()
      if (excluded > 0)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"x13: bounded-input contract active — $excluded vectors " +
            s"beyond X13ExactCap=$X13ExactCap excluded from exact " +
            "all-pairs (route unbounded corpora through x21/x29)")
      val v = Tables.embeddings(s, d)
        .filter(col("vec_id") < X13ExactCap)
        .select(col("vec_id"), col("embedding"),
          pmod(col("vec_id"), lit(GridBlocks)).cast("int").as("blk"))
      val a = v.select(col("vec_id").as("id_a"), col("embedding").as("ea"),
          col("blk").as("ba"))
        .withColumn("bb", explode(sequence(lit(0), lit(GridBlocks - 1))))
      val b = v.select(col("vec_id").as("id_b"), col("embedding").as("eb"),
          col("blk").as("bb"))
        .withColumn("ba", explode(sequence(lit(0), lit(GridBlocks - 1))))
      // bucket (i, j) holds a-rows with own block i and b-rows with
      // own block j → every (id_a < id_b) pair lands in EXACTLY one
      // bucket (its own block coordinates) — no dedup pass needed.
      // The threshold stays INSIDE the join condition: non-survivors
      // (~99.99% here) never materialize as output rows.
      ordered(a.join(b,
          a("ba") === b("ba") && a("bb") === b("bb") &&
            col("id_a") < col("id_b") && cosCol(col("ea"), col("eb")) >= 0.5)
        .withColumn("cos", cosCol(col("ea"), col("eb")))
        .select(col("id_a"), col("id_b"), col("cos")))
    },
    Some(s"""WITH v AS (
              SELECT vec_id, list_transform(embedding,
                x -> CAST(FLOOR(x * 1000) AS BIGINT)) AS qv
              FROM embeddings WHERE vec_id < $X13ExactCap)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              list_dot_product(a.qv, b.qv) /
                (sqrt(list_dot_product(a.qv, a.qv)) * sqrt(list_dot_product(b.qv, b.qv))) AS cos
            FROM v a JOIN v b ON a.vec_id < b.vec_id
            WHERE list_dot_product(a.qv, b.qv) /
                (sqrt(list_dot_product(a.qv, a.qv)) * sqrt(list_dot_product(b.qv, b.qv))) >= 0.5
            ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- x14
  // n-gram (token-bigram) Jaccard near-dup: order-sensitive shingles
  // catch docs that share word *sequences*, not just word sets.
  // Same LSH machinery as x04 over bigram shingles (seed-prefixed so
  // the hash family is independent), exact set-intersection verify.
  private val NgramThreshold = 0.8
  /** Distinct token bigrams of `text` — the native fused
    * [[graft.functions.TokenBigrams]] expression (one split, one
    * shingling pass in generated code). Shared by x14/x24/x26/x36 and
    * the doc streams; bit-identical to [[bigramsHofExpr]]
    * (TokenBigramsSpec). */
  private[graft] val bigramsExpr: Column =
    graft.functions.TokenBigrams.tokenBigrams(col("text"))

  /** The built-in-HOF reference construction bigramsExpr replaced:
    * zip the token array with its own shift-by-one. (The earlier
    * element_at(split(...), i) lambda formulation re-tokenized the
    * whole text once per element — O(len²) per doc, measured 10x
    * slower end to end.) Kept as the spec's equality baseline; the
    * oracle replays the same arithmetic as a DuckDB list
    * comprehension. */
  private[graft] val bigramsHofExpr = expr(
    """array_distinct(zip_with(
         slice(split(text, ' '), 1, size(split(text, ' ')) - 1),
         slice(split(text, ' '), 2, size(split(text, ' ')) - 1),
         (a, b) -> concat(a, ' ', b)))""")

  /** DuckDB twin of [[bigramsExpr]] over a `tk` token-array column. */
  private val duckBigrams =
    "list_distinct([tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))])"

  private val x14 = GateQuery(
    "x14_dedup_ngram",
    (s, d) => {
      // signature collapse WITHOUT the bitmask/vocab machinery: x14's
      // verify uses bigram arrays, not masks, so the class signature
      // can be the md5 of the sorted token set (x02's tokenSetSig) —
      // the same equivalence classes and the same min-doc_id reps as
      // sigTable, in ONE groupBy instead of explode → vocab window →
      // join → bit_or (4 fewer stages on the cold path).
      //
      // The rep bigram table and the candidate pairs are each used by
      // several downstream joins — persist both AND materialize them
      // eagerly (count) before the dependent joins are even built.
      // Lazy persist is not enough: the consumers include broadcast
      // subtrees, which execute concurrently on the driver; with a
      // cold cache they race and each recomputes the whole signature
      // collapse + LSH pipeline (measured 83s for a plan whose stages
      // sum to 11s when forced in order). At 100 TB these are the
      // small materialized index tables: distinct signatures, not
      // documents — materializing them is the intended checkpoint.
      val reps = Tables.documents(s, d)
        .groupBy(tokenSetSig(col("text")).as("sig"))
        .agg(min(col("doc_id")).as("rep"))
        .join(Tables.documents(s, d), col("rep") === col("doc_id"))
        .select(col("rep"), bigramsExpr.as("bgs"))
        .persist()
      reps.count()
      val banded = bandTableArr(
        reps.select(col("rep"), col("bgs").as("arr")), "b:").persist()
      banded.count() // self-join side dedup — see lshCandidates
      val cand = lshCandidates(banded).persist()
      cand.count()
      // verify-side bigrams: semi-join reps down to the ids that
      // actually appear in a candidate pair, and broadcast only those —
      // never the full corpus' bigram arrays
      val candIds = cand.select(col("rep_a").as("rep"))
        .union(cand.select(col("rep_b").as("rep"))).distinct()
      val candReps = reps.join(candIds, "rep")
      def side(n: String) = broadcast(
        candReps.select(col("rep").as(s"rep_$n"), col("bgs").as(s"bgs_$n")))
      val inter = size(array_intersect(col("bgs_a"), col("bgs_b")))
      val jac = inter.cast("double") /
        (size(col("bgs_a")) + size(col("bgs_b")) - inter)
      ordered(cand.join(side("a"), "rep_a").join(side("b"), "rep_b")
        .withColumn("jac", jac)
        .filter(col("jac") >= NgramThreshold)
        .select(col("rep_a"), col("rep_b"), col("jac")))
    },
    Some {
      val mhCols = (0 until NumMinhash).map { i =>
        s"MIN((h * ${mhA(i)} + ${mhB(i)}) % $Mod32) AS mh$i"
      }.mkString(", ")
      val bandSelects = (0 until NumBands).map { b =>
        val ks = (0 until BandRows)
          .map(j => s"mh${BandRows * b + j} AS k$j").mkString(", ")
        s"SELECT rep, $b AS band, $ks FROM mh"
      }.mkString(" UNION ALL ")
      val joinKeys = "a.band = b.band AND " +
        (0 until BandRows).map(j => s"a.k$j = b.k$j").mkString(" AND ")
      s"""WITH sigs AS (
             SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS sig,
                    min(doc_id) AS rep
             FROM documents GROUP BY 1),
           reps AS (
             SELECT s.rep, $duckBigrams AS bgs
             FROM sigs s
             JOIN (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) d2
               ON d2.doc_id = s.rep),
           bg_toks AS (SELECT rep, unnest(bgs) AS tok FROM reps),
           th AS (SELECT rep, ${duckHex32("md5('b:' || tok)")} AS h FROM bg_toks),
           mh AS (SELECT rep, $mhCols FROM th GROUP BY rep),
           banded AS ($bandSelects),
           cand AS (
             SELECT DISTINCT a.rep AS rep_a, b.rep AS rep_b
             FROM banded a JOIN banded b ON $joinKeys AND a.rep < b.rep)
          SELECT c.rep_a, c.rep_b,
            CAST(len(list_intersect(ra.bgs, rb.bgs)) AS DOUBLE) /
              (len(ra.bgs) + len(rb.bgs) - len(list_intersect(ra.bgs, rb.bgs))) AS jac
          FROM cand c
          JOIN reps ra ON ra.rep = c.rep_a
          JOIN reps rb ON rb.rep = c.rep_b
          WHERE CAST(len(list_intersect(ra.bgs, rb.bgs)) AS DOUBLE) /
              (len(ra.bgs) + len(rb.bgs) - len(list_intersect(ra.bgs, rb.bgs))) >= $NgramThreshold
          ORDER BY 1,2,3"""
    })

  // ---------------------------------------------------------------- x15
  // BPE-ish tokenization: letter runs, digit runs, and punctuation
  // runs as separate tokens (the regex shape GPT-style tokenizers
  // pre-split on), counted per document. Same RE2/Java-compatible
  // character-class-only pattern on both engines.
  private val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"
  private val x15 = GateQuery(
    "x15_token_bpe",
    (s, d) => {
      // staged projection: the regexp tokenization is evaluated ONCE
      // per row and then referenced — Catalyst keeps the projects
      // separate when a non-cheap expression is used more than once
      // (inlining it would re-run the regex per use-site; measured
      // 18s → sub-second on this corpus). Digit runs come from a
      // second direct regexp: the BPE alternation emits maximal digit
      // runs, so extracting '[0-9]+' yields the same list as
      // filtering the BPE tokens — without a per-element interpreted
      // lambda over every token.
      val staged = Tables.documents(s, d).select(
        col("doc_id"),
        regexp_extract_all(col("text"), lit(BpePattern), lit(0)).as("toks"),
        size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
          .as("n_digit_runs"))
      ordered(staged.select(
        col("doc_id"),
        size(col("toks")).as("n_bpe"),
        size(array_distinct(col("toks"))).as("n_bpe_uniq"),
        col("n_digit_runs")))
    },
    Some(s"""SELECT doc_id,
              len(regexp_extract_all(text, '$BpePattern')) AS n_bpe,
              len(list_distinct(regexp_extract_all(text, '$BpePattern'))) AS n_bpe_uniq,
              len(list_filter(regexp_extract_all(text, '$BpePattern'),
                t -> regexp_matches(t, '^[0-9]+$$'))) AS n_digit_runs
            FROM documents ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- x16
  // Quality scoring: integer point system over exact token statistics
  // (the filter stage of a training-data pipeline). Every term is an
  // integer comparison or a single-division ratio — deterministic on
  // both engines; docs pass at score >= 3.
  /** x16's score replayed in SQL, `source` carried for x54. */
  private val duckQualityCte =
    """qt AS (
         SELECT doc_id, source,
           len(string_split(text, ' ')) AS n_tok,
           len(list_distinct(string_split(text, ' '))) AS n_uniq,
           len(list_filter(string_split(text, ' '),
             x -> x = 'the' OR x = 'a' OR x = 'and' OR x = 'of')) AS stop_cnt,
           CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
             / len(string_split(text, ' ')) AS avg_len
         FROM documents),
       qsc AS (
         SELECT doc_id, source,
           (CASE WHEN n_tok >= 5 AND n_tok <= 2000 THEN 1 ELSE 0 END) +
           (CASE WHEN avg_len >= 2.0 AND avg_len <= 15.0 THEN 1 ELSE 0 END) +
           (CASE WHEN CAST(stop_cnt AS DOUBLE) / n_tok >= 0.01 THEN 1 ELSE 0 END) +
           (CASE WHEN CAST(n_uniq AS DOUBLE) / n_tok >= 0.3 THEN 1 ELSE 0 END)
           AS quality_score
         FROM qt)"""

  /** x16's integer quality score as a per-doc table, carrying the
    * extra columns asked for (x54 needs `source`). Staged projection:
    * tokenize ONCE into integer stats, then score over the stat
    * COLUMNS — writing `score` as one expression tree over the raw
    * text duplicates the split() inside every when() branch (~20
    * evaluations per row; measured 16 s vs 0.3 s). */
  private[graft] def qualityScored(docs: DataFrame,
                                   carry: Seq[String] = Nil): DataFrame = {
    val toks = split(col("text"), " ")
    val stats = docs.select(
      (col("doc_id") +: carry.map(col)) ++ Seq(
        size(toks).as("n_tok"),
        size(array_distinct(toks)).as("n_uniq"),
        size(filter(toks, t => t.isin("the", "a", "and", "of"))).as("stop_cnt"),
        length(col("text")).as("n_chars")): _*)
    val avgLen = (col("n_chars") - col("n_tok") + 1).cast("double") / col("n_tok")
    stats.select(
      (col("doc_id") +: carry.map(col)) :+
        (when(col("n_tok") >= 5 && col("n_tok") <= 2000, 1).otherwise(0) +
         when(avgLen >= 2.0 && avgLen <= 15.0, 1).otherwise(0) +
         when(col("stop_cnt").cast("double") / col("n_tok") >= 0.01, 1).otherwise(0) +
         when(col("n_uniq").cast("double") / col("n_tok") >= 0.3, 1).otherwise(0))
          .as("quality_score"): _*)
  }

  private val x16 = GateQuery(
    "x16_quality_score",
    (s, d) => {
      val scored = qualityScored(Tables.documents(s, d))
      ordered(scored.select(
        col("doc_id"), col("quality_score"),
        (col("quality_score") >= 3).as("keep")))
    },
    Some(s"""WITH $duckQualityCte
            SELECT doc_id, quality_score, quality_score >= 3 AS keep
            FROM qsc ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- x17
  // Language ID, n-gram flavor: density of the most frequent English
  // character bigrams over all character bigrams of the text —
  // the classic n-gram-profile heuristic (x09 is the stopword-density
  // variant). Same substring windowing as the x10 fingerprint.
  private val EnBigrams = Seq("th", "he", "in", "er", "an", "re", "on", "at", "en", "nd")
  private val x17 = GateQuery(
    "x17_langid_ngram",
    (s, d) => {
      // Count profile-bigram hits WITHOUT materializing the bigram
      // list: for a 2-char pattern whose chars differ (true for all
      // 10 profile bigrams), overlapping occurrences are impossible,
      // so `(length(text) - length(replace(text, p))) / 2` is exactly
      // the number of positions the per-position scan would match.
      // Each replace is one codegen'd pass over the text, versus one
      // interpreted lambda call per character position (measured
      // 21s → sub-second on this corpus). The oracle keeps the
      // independent list-comprehension construction — values match
      // because the hit COUNT and the final cast/divide are identical.
      val cnt = EnBigrams.map { p =>
        expr(s"(length(text) - length(replace(text, '$p', ''))) div 2")
      }.reduce(_ + _).cast("int")
      val staged = Tables.documents(s, d).select(
        col("doc_id"), col("lang"),
        cnt.as("hits"),
        greatest(length(col("text")) - 1, lit(1)).as("n_bigrams"))
      val pred = when(
        col("hits").cast("double") / col("n_bigrams") >= 0.06, "en")
        .otherwise("unk")
      ordered(staged.select(
        col("doc_id"), col("lang"), pred.as("lang_pred"),
        (pred === col("lang")).as("matched")))
    },
    Some {
      val profList = EnBigrams.map(b => s"'$b'").mkString("[", ", ", "]")
      s"""SELECT doc_id, lang, lang_pred, lang_pred = lang AS matched FROM (
            SELECT doc_id, lang,
              CASE WHEN CAST(len(list_filter(bgs, b -> list_contains($profList, b))) AS DOUBLE)
                     / len(bgs) >= 0.06
                   THEN 'en' ELSE 'unk' END AS lang_pred
            FROM (
              SELECT doc_id, lang,
                list_transform(range(1, greatest(length(text) - 1, 1) + 1),
                  i -> substr(text, CAST(i AS INT), 2)) AS bgs
              FROM documents))
          ORDER BY 1,2,3,4"""
    })

  // ---------------------------------------------------------------- x18
  // HLL++ distinct sketch: the streaming/at-scale replacement for
  // exact countDistinct (Q7's distinct-committer count is the
  // reference use case — exact distinct is unsupported in streaming
  // and shuffle-heavy at 100 TB). The sketch value itself is
  // engine-specific, so the gate asserts the documented error bound
  // instead: |approx − exact| / exact ≤ 0.1 (2× the requested 5%
  // rsd), which the oracle pins as a constant-true column next to
  // the exact counts it CAN check. Deterministic: HLL++ hashes are
  // fixed, so the same input set always yields the same estimate.
  private val x18 = GateQuery(
    "x18_sketch_hll",
    (s, d) =>
      ordered(Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"),
             approx_count_distinct(col("user_id"), 0.05).as("n_approx"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("n_approx") - col("n_exact")).cast("double") / col("n_exact")
            <= 0.1).as("approx_ok"))),
    Some("""SELECT event_type, count(DISTINCT user_id) AS n_exact, TRUE AS approx_ok
            FROM events GROUP BY 1 ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- x19
  // End-to-end dedup keep-list: the materialized artifact a training
  // pipeline actually ships — one keep/drop decision per document.
  // A doc survives iff (a) it is the canonical rep (min doc_id) of
  // its token-set signature class, and (b) its class was not merged
  // away by the MinHash+LSH near-dup pass (greedy one-level merge:
  // every verified pair (rep_a < rep_b) drops rep_b's class; no
  // transitive closure — the standard single-sweep LSH dedup).
  private val x19 = GateQuery(
    "x19_dedup_keep",
    (s, d) => {
      // cached pre-partitioned on sig: HashPartitioning(sig)
      // satisfies both downstream consumers — the (sig, mask) groupBy
      // (partitioning on a key subset clusters the full key) and the
      // class-membership join on sig — so neither re-shuffles the
      // corpus-sized mask table, and the sigs table inherits the
      // partitioning for its join side too
      val masks = docMasks(s, d).repartition(col("sig")).persist()
      masks.count()
      val sigs = masks.groupBy(col("sig"), col("mask"))
        .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("cnt"))
        .persist()
      sigs.count()
      val losers = verifiedMinhashPairs(s, d, sigs)
        .select(col("rep_b").as("loser")).distinct()
      // class membership joins on the EXACT sig key — a hashed-mask
      // collision can therefore never route a doc to another class's
      // rep and drop a non-duplicate (DocMasksSpec). No broadcast
      // hints: sigs is |distinct signatures|-sized and losers is
      // |near-dup classes|-sized — both grow with the corpus, so these
      // are plain shuffle equi-joins (AQE still size-gates a broadcast
      // when a side genuinely fits)
      ordered(masks
        .join(sigs.select(col("sig"), col("rep")), "sig")
        .join(losers, col("rep") === col("loser"), "left_outer")
        .select(col("doc_id"),
          (col("doc_id") === col("rep") && col("loser").isNull).as("keep")))
    },
    Some(s"""WITH $duckMasksCte, $duckMinhashCtes,
           losers AS (SELECT DISTINCT rep_b FROM verified)
          SELECT m.doc_id,
            (m.doc_id = s.rep AND l.rep_b IS NULL) AS keep
          FROM masks m
          JOIN sigs s ON s.sig = m.sig
          LEFT JOIN losers l ON l.rep_b = s.rep
          ORDER BY 1,2"""))

  // ---------------------------------------------------------------- x20
  // Quantile sketch (Greenwald-Khanna summaries): the at-scale
  // replacement for exact percentiles (q22) — single pass, bounded
  // memory, mergeable partials. Like x18, the sketch value is
  // engine-internal, so the gate emits the exact quartiles it CAN
  // cross-check plus a bound assertion: at accuracy=1000 the rank
  // error is n/1000, which over 1..50-valued quantities keeps the
  // approximate median within 1.0 of the exact one.
  private val x20 = GateQuery(
    "x20_sketch_quantiles",
    (s, d) => {
      val agged = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(percentile(col("l_quantity"), lit(0.5)).as("p50_exact"),
             approx_percentile(col("l_quantity"), lit(0.5), lit(1000))
               .as("p50_approx"))
      ordered(agged.select(col("l_returnflag"), col("p50_exact"),
        (abs(col("p50_approx") - col("p50_exact")) <= 1.0).as("approx_ok")))
    },
    Some("""SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS p50_exact,
              TRUE AS approx_ok
            FROM lineitem GROUP BY 1 ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- x21
  // Embedding near-dup, the SCALE path: x13's brute-force pair scan
  // replaced by IVF-cell-pruned pair generation — vectors are
  // assigned to nearest-centroid cells (graft.ops.Ivf, same
  // quantized cosine and tie-break as x07), and only SAME-CELL pairs
  // are compared: an equi-join on the cell id, never a cross
  // product. Approximate by construction (cross-cell near-dups are
  // missed) but fully deterministic, so the oracle replays the
  // identical assignment. At 100 TB the cell id is also the storage
  // partition key (IvfPartitionSpec), making the join co-located.
  //
  // cells = max(8, ⌊√n⌋) DERIVED IN-PLAN (the x07/x80 ivfPqNcells
  // one-row agg broadcast into the centroid filter): cell occupancy
  // is O(√n), so the same-cell pair join carries O(n·√n) candidates
  // — the round-12 fixed-8-cell form was n²/8 and measured 22× on
  // 10× data (0.55 → 12.3 s, sf0.1 → sf1), a quadratic scan wearing
  // an index costume at the 100 TB target.
  private val x21 = GateQuery(
    "x21_dedup_ivf",
    (s, d) => {
      val v = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cents = v.crossJoin(broadcast(ivfPqNcells(v)))
        .filter(col("vec_id") < col("ncells"))
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val assigned = graft.ops.Ivf.assignCells(v, cents).persist()
      assigned.count() // eager: both join sides consume it (see x14)
      val a = assigned.select(col("cell"), col("vec_id").as("id_a"),
                              col("embedding").as("ea"))
      val b = assigned.select(col("cell").as("cell_b"), col("vec_id").as("id_b"),
                              col("embedding").as("eb"))
      // 0.4, not x13's 0.5: same-cell pairs are the candidate set the
      // prune admits; >=0.4 keeps a non-trivial pair result that
      // exercises the pruned join on 64-dim noise (cross-cell
      // near-dups are the documented recall cost of the prune)
      ordered(a.join(b,
          col("cell") === col("cell_b") && col("id_a") < col("id_b") &&
            cosCol(col("ea"), col("eb")) >= 0.4)
        .withColumn("cos", cosCol(col("ea"), col("eb")))
        .select(col("id_a"), col("id_b"), col("cell").cast("long").as("cell"),
                col("cos")))
    },
    Some(s"""WITH v AS (
              SELECT vec_id, list_transform(embedding,
                x -> CAST(FLOOR(x * 1000) AS BIGINT)) AS qv
              FROM embeddings),
            cents AS (SELECT vec_id AS cid, qv AS cv FROM v
                      WHERE vec_id < $SqlDerivedK),
            assigned AS (
              SELECT vec_id, qv, cid AS cell FROM (
                SELECT v.vec_id, v.qv, c.cid,
                  row_number() OVER (PARTITION BY v.vec_id ORDER BY
                    list_dot_product(v.qv, c.cv) /
                      (sqrt(list_dot_product(v.qv, v.qv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                    c.cid) AS crn
                FROM v CROSS JOIN cents c)
              WHERE crn = 1)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              CAST(a.cell AS BIGINT) AS cell,
              list_dot_product(a.qv, b.qv) /
                (sqrt(list_dot_product(a.qv, a.qv)) * sqrt(list_dot_product(b.qv, b.qv))) AS cos
            FROM assigned a JOIN assigned b
              ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE list_dot_product(a.qv, b.qv) /
                (sqrt(list_dot_product(a.qv, a.qv)) * sqrt(list_dot_product(b.qv, b.qv))) >= 0.4
            ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- x22
  // SimHash near-dup pairs at signature-class level: a 64-bit SimHash
  // per class rep, built as TWO independent 32-bit halves (the fused
  // [[graft.functions.SimHashArr]] over the raw token set and over an
  // "s1:"-seeded copy — simhash bits are independent across hash
  // families, so halves concatenate into one 64-bit signature without
  // any 64-bit md5 arithmetic either engine would have to emulate).
  // Candidates from a 4-band x 16-BIT equi-join — pigeonhole: a pair
  // within Hamming distance 3 over the 64 combined bits must agree on
  // at least one whole 16-bit band, so the join has NO false
  // negatives — then exact popcount Hamming verify over both halves.
  // Why 16-bit bands: the 10x scale run measured the earlier 4x8-bit
  // layout at 15.6x the sf0.1 time — an 8-bit key has only 256
  // distinct values, so band buckets hold ~n/256 reps and candidates
  // grow quadratically (the x03 critique, reborn at 10x). A 16-bit
  // key has 65536 values: buckets stay O(n/65536) and the candidate
  // set tracks the true near-dup count. Same 100 TB shape as x04:
  // candidates come from a shuffle equi-join on a short numeric key,
  // never a cross product. Deterministic end to end, so the oracle
  // replays the identical construction.
  private val SimHashBands = 4
  private val HammingMax = SimHashBands - 1 // pigeonhole-complete
  private val x22 = GateQuery(
    "x22_dedup_simhash",
    (s, d) => {
      val sigs = sigTable(s, d).persist()
      sigs.count() // eager: consumers race on a cold cache (see x14)
      // per-row fused signatures over a repartitioned documents side
      // (the one-sided-projection pushdown pitfall — see
      // verifiedMinhashPairs); tokenSet staged once, hashed twice
      val docSh = Tables.documents(s, d)
        .repartition(col("doc_id"))
        .select(col("doc_id"), tokenSet(col("text")).as("tks"))
        .select(col("doc_id"),
          graft.functions.SimHashArr.simhashArr(col("tks")).as("sh0"),
          graft.functions.SimHashArr.simhashArr(
            transform(col("tks"), t => concat(lit("s1:"), t))).as("sh1"))
      val sh = sigs
        .join(docSh, col("rep") === col("doc_id"))
        .select(col("rep"), col("sh0"), col("sh1"))
        .persist()
      sh.count() // three consumers (banded + both verify sides)
      val banded = (0 until SimHashBands).map { j =>
        val half = if (j < 2) col("sh0") else col("sh1")
        sh.select(col("rep"), lit(j).as("band"),
          shiftright(half, 16 * (j % 2)).bitwiseAND(lit(65535L)).as("bv"))
      }.reduce(_ unionAll _)
      val cand = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.rep") < col("b.rep"))
        .select(col("a.rep").as("rep_a"), col("b.rep").as("rep_b")).distinct()
      val ha = sh.select(col("rep").as("rep_a"), col("sh0").as("sh0_a"),
        col("sh1").as("sh1_a"))
      val hb = sh.select(col("rep").as("rep_b"), col("sh0").as("sh0_b"),
        col("sh1").as("sh1_b"))
      ordered(cand.join(ha, "rep_a").join(hb, "rep_b")
        .withColumn("hamming",
          (bit_count(col("sh0_a").bitwiseXOR(col("sh0_b"))) +
            bit_count(col("sh1_a").bitwiseXOR(col("sh1_b")))).cast("long"))
        .filter(col("hamming") <= HammingMax)
        .select(col("rep_a"), col("rep_b"), col("hamming")))
    },
    Some {
      def bitSums(col: String) = (0 until 32).map { b =>
        s"SUM(CASE WHEN ($col >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b"
      }.mkString(", ")
      val assemble = (0 until 32).map { b =>
        s"(CASE WHEN b$b >= 0 THEN ${1L << b} ELSE 0 END)"
      }.mkString(" + ")
      val bandSelects = (0 until SimHashBands).map { j =>
        val half = if (j < 2) "sh0" else "sh1"
        s"SELECT rep, $j AS band, ($half >> ${16 * (j % 2)}) & 65535 AS bv FROM sh"
      }.mkString(" UNION ALL ")
      s"""WITH $duckMasksCte,
          rep_toks AS (
            SELECT s.rep, unnest(list_distinct(string_split(doc.text, ' '))) AS tok
            FROM sigs s JOIN documents doc ON doc.doc_id = s.rep),
          th AS (SELECT rep, ${duckHex32("md5(tok)")} AS h0,
                        ${duckHex32("md5('s1:' || tok)")} AS h1
                 FROM rep_toks),
          bits0 AS (SELECT rep, ${bitSums("h0")} FROM th GROUP BY 1),
          bits1 AS (SELECT rep, ${bitSums("h1")} FROM th GROUP BY 1),
          sh AS (SELECT b0r.rep, b0r.sh0, b1r.sh1 FROM
                   (SELECT rep, $assemble AS sh0 FROM bits0) b0r
                   JOIN (SELECT rep, $assemble AS sh1 FROM bits1) b1r
                     ON b1r.rep = b0r.rep),
          banded AS ($bandSelects),
          cand AS (
            SELECT DISTINCT a.rep AS rep_a, b.rep AS rep_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bv = b.bv AND a.rep < b.rep)
          SELECT c.rep_a, c.rep_b,
            CAST(bit_count(xor(sa.sh0, sb.sh0)) +
                 bit_count(xor(sa.sh1, sb.sh1)) AS BIGINT) AS hamming
          FROM cand c
          JOIN sh sa ON sa.rep = c.rep_a
          JOIN sh sb ON sb.rep = c.rep_b
          WHERE bit_count(xor(sa.sh0, sb.sh0)) +
                bit_count(xor(sa.sh1, sb.sh1)) <= $HammingMax
          ORDER BY 1,2,3"""
    })

  // ---------------------------------------------------------------- x23
  // Sequence packing for LLM pre-training: concatenate documents in a
  // deterministic order and chunk the token stream into fixed-length
  // context windows (GPT-style "concat then split at N tokens" —
  // docs may straddle a boundary). Packing is SHARD-LOCAL: the
  // running token offset is windowed over (source, shard), where a
  // shard is a bounded doc_id range — exactly how a real pipeline
  // packs (each worker packs its own input shard), and the reason
  // this scales: the cumulative sum is a window over a bounded
  // partition, never a single global ordered partition (the round-2
  // scale-killer shape). At 100 TB shard count grows with data while
  // shard SIZE stays constant, so every window partition stays small
  // and parallelism is unbounded.
  private val PackLen = 512L // context window, in whitespace tokens
  private val ShardDocs = 200L // docs per packing shard
  private val x23 = GateQuery(
    "x23_pack_sequences",
    (s, d) => {
      val w = Window.partitionBy(col("source"), col("shard"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val t = Tables.documents(s, d).select(
        col("doc_id"), col("source"),
        floor(col("doc_id") / lit(ShardDocs)).cast("long").as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      val packed = t
        .withColumn("start", sum(col("n_tok")).over(w) - col("n_tok"))
        .select(col("doc_id"), col("source"), col("shard"), col("n_tok"),
          floor(col("start") / lit(PackLen)).cast("long").as("pack_seq"),
          (col("start") % lit(PackLen)).as("pack_off"))
      ordered(packed)
    },
    Some(s"""WITH t AS (
              SELECT doc_id, source,
                     CAST(doc_id // $ShardDocs AS BIGINT) AS shard,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
              FROM documents),
            c AS (
              SELECT doc_id, source, shard, n_tok,
                     CAST(SUM(n_tok) OVER (PARTITION BY source, shard
                       ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       - n_tok AS start
              FROM t)
            SELECT doc_id, source, shard, n_tok,
                   CAST(start // $PackLen AS BIGINT) AS pack_seq,
                   CAST(start % $PackLen AS BIGINT) AS pack_off
            FROM c ORDER BY 1,2,3,4,5,6"""))

  // ---------------------------------------------------------------- x24
  // Benchmark decontamination: flag corpus documents that share any
  // token bigram with a "benchmark" set (here a deterministic 1%
  // doc_id slice stands in for the eval suite; a real pipeline loads
  // the actual benchmark). The benchmark n-gram set is tiny by
  // construction (benchmarks are MBs against a 100 TB corpus), so it
  // BROADCASTS: the corpus side never shuffles text — it explodes
  // bigrams, hash-joins the broadcast set map-side, and only the HIT
  // rows (a minuscule fraction) reach the per-doc aggregation
  // shuffle. Real pipelines use 13-grams; bigrams fit this corpus'
  // short synthetic docs. Shares [[bigramsExpr]] with x14.
  private val BenchMod = 100
  private val x24 = GateQuery(
    "x24_decontam",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val bench = broadcast(docs.filter(col("doc_id") % BenchMod === 0)
        .select(explode(bigramsExpr).as("bg")).distinct())
      val corp = docs.filter(col("doc_id") % BenchMod =!= 0)
        .select(col("doc_id"), bigramsExpr.as("bgs"))
        .select(col("doc_id"), size(col("bgs")).cast("long").as("n_bigrams"),
          explode(col("bgs")).as("bg"))
      // bigrams are distinct within a doc (array_distinct) and within
      // the benchmark set (.distinct), so count(1) == distinct hits
      ordered(corp.join(bench, "bg")
        .groupBy(col("doc_id"), col("n_bigrams"))
        .agg(count(lit(1)).as("n_hits"))
        .select(col("doc_id"), col("n_hits"), col("n_bigrams"),
          (col("n_hits").cast("double") / col("n_bigrams")).as("frac")))
    },
    Some(s"""WITH tks AS (
              SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
            bench AS (
              SELECT DISTINCT unnest($duckBigrams) AS bg
              FROM tks WHERE doc_id % $BenchMod = 0),
            corp AS (
              SELECT doc_id, $duckBigrams AS bgs
              FROM tks WHERE doc_id % $BenchMod <> 0),
            ex AS (
              SELECT doc_id, CAST(len(bgs) AS BIGINT) AS n_bigrams,
                     unnest(bgs) AS bg
              FROM corp)
            SELECT e.doc_id, count(*) AS n_hits, e.n_bigrams,
                   CAST(count(*) AS DOUBLE) / e.n_bigrams AS frac
            FROM ex e JOIN bench b ON e.bg = b.bg
            GROUP BY e.doc_id, e.n_bigrams
            ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- x25
  // Deterministic stratified sampling: cap every language stratum at
  // ~StratTarget docs in expectation by keeping rows whose md5-derived
  // bucket falls under a per-stratum permille rate. Two stages, both
  // scale-free: a per-lang count (an aggregation whose OUTPUT is
  // stratum-sized — tiny — so it broadcasts back), then a stateless
  // per-row hash filter. No global ordering, no reservoir state, no
  // second pass over the data; the same row is kept at any cluster
  // size because the keep decision is a pure function of (doc_id,
  // stratum rate).
  private val StratTarget = 100L
  private val x25 = GateQuery(
    "x25_sample_stratified",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val rates = broadcast(docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("lang_cnt"))
        .select(col("lang"),
          least(lit(1000L), floor(lit((StratTarget * 1000).toDouble) /
            col("lang_cnt")).cast("long")).as("rate_pm")))
      val bucketed = docs.select(col("doc_id"), col("lang"),
        (hex32(md5(concat(lit("s:"), col("doc_id").cast("string"))))
          % 1000).as("bucket"))
      ordered(bucketed.join(rates, "lang")
        .filter(col("bucket") < col("rate_pm"))
        .select(col("doc_id"), col("lang"), col("bucket"), col("rate_pm")))
    },
    Some(s"""WITH rates AS (
              SELECT lang, CAST(LEAST(1000, CAST(FLOOR(${StratTarget * 1000}.0
                       / count(*)) AS BIGINT)) AS BIGINT) AS rate_pm
              FROM documents GROUP BY 1),
            b AS (
              SELECT doc_id, lang,
                ${duckHex32("md5('s:' || CAST(doc_id AS VARCHAR))")} % 1000
                  AS bucket
              FROM documents)
            SELECT b.doc_id, b.lang, CAST(b.bucket AS BIGINT) AS bucket,
                   r.rate_pm
            FROM b JOIN rates r ON b.lang = r.lang
            WHERE b.bucket < r.rate_pm
            ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- x26
  // Within-document repetition score (Gopher-style quality rule): the
  // fraction of a doc's token bigrams that are repeats of an earlier
  // bigram in the SAME doc. Heavily repeated boilerplate scores high
  // and gets flagged. Pure per-row HOF arithmetic — no shuffle, no
  // state, embarrassingly parallel at any corpus size. Shares
  // [[bigramsExpr]]'s distinct-bigram construction; the repeat count
  // is (total bigrams) - (distinct bigrams).
  private val DupBigramMax = 0.3
  private val x26 = GateQuery(
    "x26_repetition",
    (s, d) => {
      val t = Tables.documents(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        size(bigramsExpr).cast("long").as("n_uniq_bg"))
      ordered(t.filter(col("n_tok") >= 2)
        .withColumn("dup_bg_frac", lit(1.0) -
          col("n_uniq_bg").cast("double") / (col("n_tok") - 1))
        .withColumn("flagged", col("dup_bg_frac") > DupBigramMax))
    },
    Some(s"""WITH t AS (
              SELECT doc_id,
                     CAST(len(tk) AS BIGINT) AS n_tok,
                     CAST(len($duckBigrams) AS BIGINT) AS n_uniq_bg
              FROM (SELECT doc_id, string_split(text, ' ') AS tk
                    FROM documents))
            SELECT doc_id, n_tok, n_uniq_bg,
                   1.0 - CAST(n_uniq_bg AS DOUBLE) / (n_tok - 1) AS dup_bg_frac,
                   (1.0 - CAST(n_uniq_bg AS DOUBLE) / (n_tok - 1))
                     > $DupBigramMax AS flagged
            FROM t WHERE n_tok >= 2 ORDER BY 1,2,3,4,5"""))

  // ---------------------------------------------------------------- x27
  // Deterministic corpus shuffle into training shards: every doc gets
  // an md5-derived sort key, lands in shard (key mod NumShards), and
  // takes its rank within the shard as its training position — the
  // "global shuffle before packing" step of a pre-training pipeline,
  // reproducible bit-for-bit at any cluster size. The rank window is
  // per-SHARD, and shard count is a config sized so one shard fits
  // one task (at 100 TB you run ~1e6 shards, same as output file
  // count) — the window partition stays bounded as data grows, never
  // a global ordered partition.
  private val NumShards = 32L
  private val x27 = GateQuery(
    "x27_shuffle_shards",
    (s, d) => {
      val keyed = Tables.documents(s, d).select(col("doc_id"),
        hex32(md5(concat(lit("sh:"), col("doc_id").cast("string"))))
          .as("skey"))
        .withColumn("out_shard", col("skey") % NumShards)
      val w = Window.partitionBy(col("out_shard"))
        .orderBy(col("skey"), col("doc_id"))
      ordered(keyed.select(col("doc_id"), col("out_shard"),
        row_number().over(w).cast("long").as("pos")))
    },
    Some(s"""WITH k AS (
              SELECT doc_id,
                ${duckHex32("md5('sh:' || CAST(doc_id AS VARCHAR))")} AS skey
              FROM documents)
            SELECT doc_id, CAST(skey % $NumShards AS BIGINT) AS out_shard,
                   CAST(row_number() OVER (PARTITION BY skey % $NumShards
                     ORDER BY skey, doc_id) AS BIGINT) AS pos
            FROM k ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- x28
  // Data mixing with epoch repeats: give every SOURCE the same token
  // budget. rate_pm = budget·1000 / source_tokens (permille,
  // UNCAPPED): an under-budget source gets rate > 1000 and its docs
  // repeat ⌊rate/1000⌋ times plus one more when the doc's md5 bucket
  // falls under the fractional part — deterministic up-sampling; an
  // over-budget source down-samples the same way (n_repeat drops to
  // 0 or 1). Expected tokens per source ≈ budget on both sides. One
  // aggregation whose output is source-sized (broadcast back) + a
  // stateless per-row decision — x25's scale shape, generalized from
  // doc-count caps to token budgets with repetition.
  private val MixBudgetTokens = 2000L
  private val x28 = GateQuery(
    "x28_mix_epochs",
    (s, d) => {
      val t = Tables.documents(s, d).select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      val w = broadcast(t.groupBy(col("source"))
        .agg(sum(col("n_tok")).as("tot"))
        .select(col("source"),
          floor(lit((MixBudgetTokens * 1000).toDouble) / col("tot"))
            .cast("long").as("rate_pm")))
      val b = t.withColumn("bucket",
        hex32(md5(concat(lit("m:"), col("doc_id").cast("string")))) % 1000)
      ordered(b.join(w, "source")
        .select(col("doc_id"), col("source"), col("n_tok"), col("bucket"),
          (floor(col("rate_pm") / 1000).cast("long") +
            when(col("bucket") < col("rate_pm") % 1000, 1L).otherwise(0L))
            .as("n_repeat")))
    },
    Some(s"""WITH t AS (
              SELECT doc_id, source,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
              FROM documents),
            w AS (
              SELECT source,
                     CAST(FLOOR(${MixBudgetTokens * 1000}.0
                       / SUM(n_tok)) AS BIGINT) AS rate_pm
              FROM t GROUP BY 1),
            b AS (
              SELECT doc_id, source, n_tok,
                ${duckHex32("md5('m:' || CAST(doc_id AS VARCHAR))")} % 1000
                  AS bucket
              FROM t)
            SELECT b.doc_id, b.source, b.n_tok, CAST(b.bucket AS BIGINT) AS bucket,
                   CAST(w.rate_pm // 1000
                     + CASE WHEN b.bucket < w.rate_pm % 1000 THEN 1 ELSE 0 END
                     AS BIGINT) AS n_repeat
            FROM b JOIN w ON b.source = w.source
            ORDER BY 1,2,3,4,5"""))

  // ---------------------------------------------------------------- x29
  // Embedding near-dup via signed random projections (SRP-LSH): the
  // CENTROID-FREE ANN candidate path (x21's IVF needs a seed centroid
  // set; SRP needs only a fixed hyperplane matrix baked into the
  // binary). Each vector gets 64 sign bits — bit i = 1 iff
  // dot(qv, plane_i) >= 0 over the same FLOOR(x*1000) quantized
  // integers as every other similarity op — grouped into 8 bands of
  // 8 bits; candidates = vectors agreeing on a whole band (equi-join
  // on (band, byte) — never a cross product); exact quantized-cosine
  // verify keeps only pairs >= the threshold.
  //
  // The hyperplane matrix is DETERMINISTIC data-independent constant:
  // coefficient (i,j) = (md5-derived hash of "p:i:j") % 2001 - 1000,
  // computed once at build time and embedded as literals in both the
  // Spark plan and the oracle SQL — no fitting step, no global
  // coordination, the same signature for a row at any cluster size.
  // Sign-agreement probability for one plane is 1 - θ/π (Charikar),
  // so an 8-bit band matches with p = (1-θ/π)^8 and 8 bands give
  // ~99% recall at cos ≈ 0.95 — the regime dedup cares about; at the
  // gate threshold 0.4 recall is deliberately partial (~15%) and the
  // oracle replays the identical banding, so the gate stays exact.
  //
  // Scale: the signature is a pure per-row projection (the qv
  // staging column is non-cheap and multiply-referenced, so Catalyst
  // keeps it staged instead of inlining 64 copies); the band table
  // carries (vec_id, band, byte) only — embeddings are joined back
  // just for the verified candidates.
  private val SrpPlanes = 64
  private val SrpBands = 8
  private val SrpBandBits = SrpPlanes / SrpBands
  private val SrpThreshold = 0.4

  /** The md5-seeded hyperplane matrix, shared with the native
    * [[graft.functions.SrpBands]] expression and embedded as literals
    * in the oracle SQL. */
  private lazy val srpCoef: IndexedSeq[IndexedSeq[Long]] =
    graft.functions.SrpBands.matrix

  /** The 8 SRP band-byte columns bv0..bv7 over a quantized `qv`
    * array column — the built-in-HOF reference construction that
    * SrpBandsSpec pins bit-identical to the native fused expression
    * (which is what x29 actually runs). */
  private[graft] def srpBandCols: Seq[Column] = {
    def dot(i: Int): Column =
      aggregate(
        zip_with(col("qv"), typedLit(srpCoef(i)), (x, c) => x * c),
        lit(0L), (acc, p) => acc + p)
    (0 until SrpBands).map { b =>
      (0 until SrpBandBits).map { j =>
        when(dot(SrpBandBits * b + j) >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _).as(s"bv$b")
    }
  }

  /** SRP candidate pairs from a (vec_id, band, bv) band table — the
    * x22/x04 equi-join shape on the (band, byte) key. `maxBucket` is
    * the same hot-bucket hygiene as [[lshCandidates]]: a degenerate
    * embedding corpus (e.g. many zero-ish vectors whose sign dots all
    * tie to ≥ 0) can pile one band byte into a quadratic bucket; above
    * the cap the whole bucket is dropped, and its members keep
    * co-occurring in their other bands' smaller buckets. The count
    * window rides the exchange the join already needs. Default
    * unlimited — the oracle replays uncapped semantics. */
  private[graft] def srpCandidates(banded: DataFrame,
                                   maxBucket: Int = Int.MaxValue): DataFrame = {
    val pruned =
      if (maxBucket == Int.MaxValue) banded
      else banded.withColumn("__bn",
          count(lit(1)).over(Window.partitionBy(col("band"), col("bv"))))
        .filter(col("__bn") <= maxBucket).drop("__bn")
    pruned.as("a").join(pruned.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
  }

  private val x29 = GateQuery(
    "x29_dedup_srp",
    (s, d) => {
      // the signature is ONE native codegen'd expression per row
      // (graft.functions.SrpBands — fused quantize + 64 sign dots),
      // not the 128 interpreted HOF passes of the reference
      // construction in srpBandCols
      // PAIR-BAND keys: the 10x scale run measured single 8-bit band
      // keys at 14.8x the sf0.1 time — a 256-value key piles ~n/256
      // vectors per bucket (the x22 band-width disease). Requiring
      // TWO bands to agree makes the key 16-bit (65536 values) while
      // staying pigeonhole-complete for Hamming <= 3 over the 64
      // bits: <= 3 flipped bits dirty <= 3 of the 8 bands, leaving
      // >= 5 clean bands and hence >= C(5,2) = 10 clean pairs. For
      // genuine near-dups (cos ~0.95) expected recall only drops
      // ~0.99 -> ~0.92 — P(>= 2 clean bands) with per-band
      // sign-agreement (1 - theta/pi)^8 — while candidate buckets
      // shrink 256x. The 28 combos cost 3.5x the band-table rows;
      // rows are (vec_id, key) longs, negligible next to the
      // quadratic bucket growth they prevent.
      val banded = Tables.embeddings(s, d)
        .select(col("vec_id"),
          graft.functions.SrpBands.srpBands(col("embedding")).as("bvs"))
        .select(col("vec_id"), posexplode(expr(
          """flatten(transform(sequence(0, 6), b1 ->
               transform(sequence(b1 + 1, 7), b2 ->
                 struct(b1 * 8 + b2 AS pb,
                        element_at(bvs, b1 + 1) + element_at(bvs, b2 + 1) * 256 AS pv))))"""))
          .as(Seq("idx", "s")))
        .select(col("vec_id"), col("s.pb").as("band"), col("s.pv").as("bv"))
        .persist()
      banded.count() // self-join side dedup — see lshCandidates
      val cand = srpCandidates(banded)
      val ea = Tables.embeddings(s, d)
        .select(col("vec_id").as("id_a"), col("embedding").as("ea"))
      val eb = Tables.embeddings(s, d)
        .select(col("vec_id").as("id_b"), col("embedding").as("eb"))
      ordered(cand.join(ea, "id_a").join(eb, "id_b")
        .withColumn("cos", cosCol(col("ea"), col("eb")))
        .filter(col("cos") >= SrpThreshold)
        .select(col("id_a"), col("id_b"), col("cos")))
    },
    Some {
      def duckDot(i: Int): String =
        s"list_dot_product(qv, ${srpCoef(i).mkString("[", ", ", "]")})"
      val bvCols = (0 until SrpBands).map { b =>
        (0 until SrpBandBits).map { j =>
          s"(CASE WHEN ${duckDot(SrpBandBits * b + j)} >= 0 THEN ${1L << j} ELSE 0 END)"
        }.mkString("(", " + ", s") AS bv$b")
      }.mkString(", ")
      val bandSelects = (0 until SrpBands)
        .map(b => s"SELECT vec_id, $b AS band, bv$b AS bv FROM sig")
        .mkString(" UNION ALL ")
      s"""WITH v AS (
            SELECT vec_id,
              list_transform(embedding, x -> CAST(FLOOR(x * 1000) AS BIGINT)) AS qv
            FROM embeddings),
          sig AS (SELECT vec_id, $bvCols FROM v),
          banded AS ($bandSelects),
          cand AS (
            -- two-band agreement = one pair-band key collision
            SELECT id_a, id_b FROM (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b, count(*) AS nb
              FROM banded a JOIN banded b
                ON a.band = b.band AND a.bv = b.bv AND a.vec_id < b.vec_id
              GROUP BY 1, 2)
            WHERE nb >= 2)
          SELECT c.id_a, c.id_b,
            list_dot_product(va.qv, vb.qv) /
              (sqrt(list_dot_product(va.qv, va.qv)) * sqrt(list_dot_product(vb.qv, vb.qv))) AS cos
          FROM cand c
          JOIN v va ON va.vec_id = c.id_a
          JOIN v vb ON vb.vec_id = c.id_b
          WHERE list_dot_product(va.qv, vb.qv) /
              (sqrt(list_dot_product(va.qv, va.qv)) * sqrt(list_dot_product(vb.qv, vb.qv))) >= $SrpThreshold
          ORDER BY 1,2,3"""
    })

  // ---------------------------------------------------------------- x30
  // Dedup clusters: connected components over the verified MinHash
  // pair graph ([[graft.ops.ConnectedComponents]] — min-label
  // propagation to fixpoint, one shuffle per round, rounds bounded by
  // cluster diameter). x19's greedy one-level merge under-merges
  // chains (a~b, b~c leaves c's class alive when a~c was never a
  // pair); the component labeling is the standard transitive answer a
  // training pipeline ships. Deterministic fixpoint → the oracle
  // replays it as a recursive CTE.
  /** x30's graph input, materialized: (nodes(id), edges(src, dst)) —
    * the distinct-signature reps and the verified MinHash pair list.
    * Exposed for the CcAbProbe A/B harness, which measures
    * [[graft.ops.ConnectedComponents]] variants on the REAL graph
    * shape rather than a synthetic fixture. */
  private[graft] def x30Input(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val sigs = sigTable(s, d).persist()
    sigs.count()
    val pairs = verifiedMinhashPairs(s, d, sigs)
      .select(col("rep_a"), col("rep_b")).persist()
    pairs.count()
    (sigs.select(col("rep").as("id")),
      pairs.select(col("rep_a").as("src"), col("rep_b").as("dst")))
  }

  private val x30 = GateQuery(
    "x30_dedup_components",
    (s, d) => {
      val (nodes, edges) = x30Input(s, d)
      val comps = graft.ops.ConnectedComponents.label(nodes, edges)
      ordered(comps.select(col("id").as("rep"), col("component")))
    },
    Some(s"""WITH RECURSIVE $duckMasksCte, $duckMinhashCtes,
          edges AS (
            SELECT rep_a AS src, rep_b AS dst FROM verified
            UNION ALL SELECT rep_b, rep_a FROM verified),
          reach(id, lbl) AS (
            SELECT rep, rep FROM sigs
            UNION
            SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id)
          SELECT id AS rep, min(lbl) AS component FROM reach
          GROUP BY 1 ORDER BY 1,2"""))

  // ---------------------------------------------------------------- x31
  // Vocabulary construction: top-K corpus tokens by occurrence count
  // (the frequency pass under BPE/WordPiece vocab building). One
  // explode + one map-side-combinable groupBy; the top-K is
  // TakeOrderedAndProject (each partition keeps K, driver merges K-
  // sized heaps — no global sort shuffle), and the rank window runs
  // over the already-truncated CONSTANT-K result, so the
  // single-partition window is bounded at any corpus size.
  private val VocabK = 100
  private val VocabMinCount = 5L
  private val x31 = GateQuery(
    "x31_vocab_topk",
    (s, d) => {
      val counts = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= VocabMinCount)
      val top = counts.orderBy(col("cnt").desc, col("tok")).limit(VocabK)
      val w = Window.orderBy(col("cnt").desc, col("tok"))
      ordered(top.withColumn("vrank", row_number().over(w).cast("long")))
    },
    Some(s"""WITH c AS (
              SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
            g AS (
              SELECT tok, count(*) AS cnt FROM c
              GROUP BY 1 HAVING count(*) >= $VocabMinCount),
            t AS (
              SELECT tok, cnt,
                row_number() OVER (ORDER BY cnt DESC, tok) AS rnk
              FROM g)
            SELECT tok, cnt, CAST(rnk AS BIGINT) AS vrank FROM t
            WHERE rnk <= $VocabK ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- x32
  // PII scrubbing over structured-record text (the redaction pass
  // before records become training text): emails, long digit runs
  // (ids/phones), and URLs replaced by placeholder tokens, with
  // per-category counts. Patterns use only character-class regex
  // syntax valid in both Java regex (Spark) and RE2 (DuckDB); the
  // whole op is a per-row projection — no shuffle at any scale.
  // Runs over customer records (c_name carries a long digit run per
  // row); the email/URL categories are proven on synthetic fixtures
  // in PipelineOpsSpec — this corpus legitimately contains none.
  private[graft] val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PiiNum = "[0-9]{4,}"
  private[graft] val PiiUrl = "https?://[^ ]+"

  /** Per-category PII occurrence counts over a record column —
    * counted BEFORE redaction, shared by batch x32 and the streaming
    * twin ([[graft.streaming.DocStreams.redactRecords]]). */
  private[graft] def piiCounts(rec: Column): Seq[Column] = Seq(
    regexp_count(rec, lit(PiiEmail)).cast("long").as("n_email"),
    regexp_count(rec, lit(PiiNum)).cast("long").as("n_num"),
    regexp_count(rec, lit(PiiUrl)).cast("long").as("n_url"))

  /** The redacted record: email → URL → digit-run replacement, in
    * that fixed order on every engine and surface. */
  private[graft] def piiRedacted(rec: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(rec, PiiEmail, "<EMAIL>"),
        PiiUrl, "<URL>"),
      PiiNum, "<NUM>")

  private val x32 = GateQuery(
    "x32_pii_redact",
    (s, d) => {
      val staged = Tables.customer(s, d).select(
        col("c_custkey"),
        concat(col("c_name"), lit(" segment="), col("c_mktsegment")).as("rec"))
      ordered(staged.select(
        col("c_custkey") +: (piiCounts(col("rec")) :+
          piiRedacted(col("rec")).as("redacted")): _*))
    },
    Some(s"""WITH staged AS (
              SELECT c_custkey, c_name || ' segment=' || c_mktsegment AS rec
              FROM customer)
            SELECT c_custkey,
              CAST(len(regexp_extract_all(rec, '$PiiEmail')) AS BIGINT) AS n_email,
              CAST(len(regexp_extract_all(rec, '$PiiNum')) AS BIGINT) AS n_num,
              CAST(len(regexp_extract_all(rec, '$PiiUrl')) AS BIGINT) AS n_url,
              regexp_replace(
                regexp_replace(
                  regexp_replace(rec, '$PiiEmail', '<EMAIL>', 'g'),
                  '$PiiUrl', '<URL>', 'g'),
                '$PiiNum', '<NUM>', 'g') AS redacted
            FROM staged ORDER BY 1,2,3,4,5"""))

  // ---------------------------------------------------------------- x33
  // Token-id encoding: map every token position to its vocabulary id
  // (x31's rank; out-of-vocabulary → 0) — the text→ids step between
  // corpus prep and the trainer. The vocab is CONSTANT-K by
  // construction, so it broadcasts and the corpus side is explode +
  // map-side hash join: text never shuffles, output is (doc_id, pos,
  // tok_id) rows ready to group into id arrays per context window.
  private val x33 = GateQuery(
    "x33_token_ids",
    (s, d) => {
      val counts = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= VocabMinCount)
      val w = Window.orderBy(col("cnt").desc, col("tok"))
      val vocab = counts.orderBy(col("cnt").desc, col("tok")).limit(VocabK)
        .withColumn("tok_id", row_number().over(w).cast("long"))
        .select(col("tok"), col("tok_id"))
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      ordered(toks.join(broadcast(vocab), Seq("tok"), "left_outer")
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          coalesce(col("tok_id"), lit(0L)).as("tok_id")))
    },
    Some(s"""WITH c AS (
              SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
            g AS (
              SELECT tok, count(*) AS cnt FROM c
              GROUP BY 1 HAVING count(*) >= $VocabMinCount),
            v AS (
              SELECT tok, CAST(rnk AS BIGINT) AS tok_id FROM (
                SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) AS rnk
                FROM g)
              WHERE rnk <= $VocabK),
            t AS (
              SELECT doc_id, generate_subscripts(tk, 1) - 1 AS pos,
                     unnest(tk) AS tok
              FROM (SELECT doc_id, string_split(text, ' ') AS tk
                    FROM documents))
            SELECT t.doc_id, CAST(t.pos AS BIGINT) AS pos,
                   COALESCE(v.tok_id, 0) AS tok_id
            FROM t LEFT JOIN v ON v.tok = t.tok
            ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- x34
  // Overlapping document chunking (RAG / embedding-prep): each doc is
  // split into fixed-size token windows with a fixed stride; the last
  // chunk may be short, and every chunk carries its md5 so downstream
  // embedding jobs key on content. Pure per-row HOF arithmetic over
  // the token array — one generator, no shuffle at any corpus size.
  private val ChunkLen = 32
  private val ChunkStride = 24
  private val x34 = GateQuery(
    "x34_chunk_overlap",
    (s, d) => {
      val staged = Tables.documents(s, d).select(
        col("doc_id"), split(col("text"), " ").as("tk"))
      // chunk starts: 0, stride, 2·stride, … while start < n_tok
      // (ceil(n/stride) chunks; a doc shorter than one window yields
      // exactly one chunk)
      val chunks = staged.select(
        col("doc_id"), size(col("tk")).cast("long").as("n_tok"),
        posexplode(expr(
          s"""transform(
                sequence(0, cast(ceil(size(tk) / cast($ChunkStride as double)) as int) - 1),
                i -> array_join(slice(tk, i * $ChunkStride + 1, $ChunkLen), ' '))"""))
          .as(Seq("chunk_id", "chunk")))
      ordered(chunks.select(
        col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("n_tok"),
        size(split(col("chunk"), " ")).cast("long").as("chunk_tok"),
        md5(col("chunk")).as("chunk_md5")))
    },
    Some(s"""WITH staged AS (
              SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
            chunks AS (
              SELECT doc_id,
                     CAST(len(tk) AS BIGINT) AS n_tok,
                     i AS chunk_id,
                     array_to_string(tk[i * $ChunkStride + 1 :
                                        i * $ChunkStride + $ChunkLen], ' ') AS chunk
              FROM staged,
                   unnest(range(0, CAST(ceil(len(tk) / $ChunkStride.0) AS BIGINT))) AS u(i))
            SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, n_tok,
                   CAST(len(string_split(chunk, ' ')) AS BIGINT) AS chunk_tok,
                   md5(chunk) AS chunk_md5
            FROM chunks ORDER BY 1,2,3,4,5"""))

  // ---------------------------------------------------------------- x35
  // EXACT set-similarity join by prefix filtering (SSJoin/PPJoin
  // family): all signature pairs with token-set Jaccard >= t, with
  // candidates from an equi-join on PREFIX tokens instead of
  // LSH — lossless, so unlike x04/x29 the result is exactly the
  // all-pairs truth and the oracle can state it as plain all-pairs
  // SQL without replaying the pruning.
  //
  // Prefix-filter lemma: order every set by one GLOBAL token order
  // (rarest-first by document frequency, ties lexical); if
  // jac(A,B) >= t then |A∩B| >= ceil(t·max(|A|,|B|)), and two sets
  // sharing >= α elements must share one within their first
  // |X| − α + 1 — so any qualifying pair collides on some token of
  // the two prefixes of length |X| − ceil(t·|X|) + 1. Candidates =
  // equi-join on prefix token + the |B| ∈ [t·|A|, |A|/t] length
  // bound; the exact intersection verify decides.
  //
  // Scale: everything is signature-level. The prefix explode emits
  // ~(1−t)·|set| tokens per set; rare-first ordering makes prefix
  // tokens the LOW-df ones, so candidate buckets are small by
  // construction (the classic SSJoin result). A pathological shared
  // rare token still bounds a bucket by that token's df. The df
  // table is vocabulary-sized; the verify joins back only candidate
  // ids. At t=0.9 on this corpus: 2072 result pairs.
  private val PfJaccard = 0.9

  /** Signature-collapsed distinct token sets of `docs` (doc_id,
    * text): one row per distinct token SET, rep = min doc_id — dedup
    * before any pair work, so identical sets never generate pairs.
    * Persisted (df/order/verify sides all consume it). Shared by x35
    * (whole corpus) and x69 (the non-benchmark slice). */
  private[graft] def tokenSetReps(docs: DataFrame): DataFrame = {
    val reps = docs
      .groupBy(tokenSetSig(col("text")).as("sig"))
      .agg(min(col("doc_id")).as("rep"))
      .join(docs, col("rep") === col("doc_id"))
      .select(col("rep"), tokenSet(col("text")).as("toks"))
      .persist()
    reps.count()
    reps
  }

  /** Rare-first ordered-set table for prefix filtering: each rep's
    * tokens sorted by one GLOBAL (df, token) order, with set size `n`
    * and prefix length `plen` = n − ceil(t·n) + 1 (ceil applied with
    * the 1e-9 epsilon: a float product landing a hair above an exact
    * integer must not SHORTEN the prefix — losslessness over any
    * threshold). Deliberately NO
    * broadcast hint on the df table: it is VOCABULARY-sized
    * (unbounded on real crawl data), and both join sides are
    * exchanged on `tok`, so the shuffle join co-partitions naturally;
    * size-gated AQE still broadcasts when it genuinely fits. Shared
    * by x35 (Jaccard) and x69 (containment — same α = ceil(t·n)
    * overlap bound, so the same prefix length is lossless for both). */
  private[graft] def orderedSetTable(reps: DataFrame, thr: Double): DataFrame = {
    val toksE = reps.select(col("rep"), explode(col("toks")).as("tok"))
    val dfTab = toksE.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    toksE.join(dfTab, "tok")
      .groupBy(col("rep"))
      .agg(transform(
        array_sort(collect_list(struct(col("df"), col("tok")))),
        e => e.getField("tok")).as("otoks"))
      .withColumn("n", size(col("otoks")).cast("long"))
      .withColumn("plen",
        (col("n") - ceil(col("n") * lit(thr) - lit(1e-9)) + 1).cast("int"))
  }

  /** x35's candidate stage: prefix-token equi-join + length filter +
    * (optionally) the PPJoin POSITION filter. Ordered-set table in,
    * `(rep_a, rep_b)` candidate pairs out.
    *
    * Position filter (lossless): for the first common token of a
    * qualifying pair — which the prefix lemma places inside BOTH
    * prefixes — no earlier token is shared, so the whole overlap sits
    * at/after it: |A∩B| <= 1 + min(|A|−i, |B|−j) (1-based positions
    * i,j). Qualifying pairs need |A∩B| >= ceil(t/(1+t)·(|A|+|B|)), so
    * keeping every collision where the bound clears the threshold
    * admits at least that first-token collision — pairs are only ever
    * dropped when NO collision can carry enough overlap. Cuts the
    * post-join `distinct` input without touching the result set. */
  /** x35's candidate stage, k=2 prefix extension (ED-Join-family
    * lemma): if |A∩B| >= α then the first two common tokens o1<o2
    * (global order) sit within BOTH extended prefixes of length
    * n − α + 2 — at most n − α non-overlap tokens plus one earlier
    * overlap token can precede o2 — so every qualifying pair collides
    * on a token PAIR of the two extended prefixes. Joining on the
    * unordered pair key makes bucket size the pair's CO-occurrence
    * count: on corpora whose vocabulary is small relative to corpus
    * size (every single prefix token is high-df — the measured 10x
    * pathology: median prefix-token df 2857, 21.7M candidates, 39 s)
    * this cuts candidates by the co-occurrence ratio while staying
    * LOSSLESS. Position filter, pair form: for the minimal shared
    * pair, all other overlap sits strictly after o2 in both sets, so
    * |A∩B| <= 2 + min(n_a − i2_a − 1, n_b − i2_b − 1) (0-based
    * original positions); rows whose bound can't reach
    * α = ceil(t/(1+t)·(n_a+n_b)) are dropped — the minimal-pair row
    * of a qualifying pair always survives. */
  private[graft] def ssjoinCandidates2(otab: DataFrame): DataFrame = {
    val ext = otab.select(col("rep"), col("n"),
      expr("slice(otoks, 1, plen + 1)").as("ptoks"))
    val first = ext
      .select(col("rep"), col("n"), col("ptoks"),
        posexplode(col("ptoks")).as(Seq("i1", "t1")))
    val pairs = first
      .select(col("rep"), col("n"), col("t1"), col("i1"),
        posexplode(expr("slice(ptoks, i1 + 2, size(ptoks))"))
          .as(Seq("j0", "t2")))
      .withColumn("i2", col("i1") + lit(1) + col("j0"))
      .select(col("rep"), col("n"), col("t1"), col("t2"), col("i2"))
      .persist()
    // both self-join sides consume the pair-prefix table, and (the
    // lshCandidates rule) AQE stage reuse does NOT fire across the
    // two identical InMemoryTableScan-rooted subtrees — without the
    // persist the double posexplode chain evaluates once per side
    pairs.count()
    val lenOk =
      col("b.n") >= ceil(col("a.n") * lit(PfJaccard)) &&
        col("a.n") >= ceil(col("b.n") * lit(PfJaccard))
    val posOk =
      lit(2) + least(col("a.n") - col("a.i2") - 1,
                     col("b.n") - col("b.i2") - 1) >=
        ceil((col("a.n") + col("b.n")) * lit(PfJaccard / (1 + PfJaccard)) - lit(1e-9))
    pairs.as("a").join(pairs.as("b"),
        col("a.t1") === col("b.t1") && col("a.t2") === col("b.t2") &&
          col("a.rep") < col("b.rep") && lenOk && posOk)
      .select(col("a.rep").as("rep_a"), col("b.rep").as("rep_b"))
      .distinct()
  }

  private[graft] def ssjoinCandidates(otab: DataFrame,
                                      positional: Boolean = true): DataFrame = {
    val pref = otab.select(col("rep"), col("n"),
      posexplode(expr("slice(otoks, 1, plen)")).as(Seq("pos", "tok")))
    val lenOk =
      col("b.n") >= ceil(col("a.n") * lit(PfJaccard)) &&
        col("a.n") >= ceil(col("b.n") * lit(PfJaccard))
    // overlap threshold alpha = ceil(t/(1+t)·(na+nb)); epsilon keeps a
    // float product landing a hair above an integer from EXCLUDING an
    // admissible pair (over-admission is harmless, the verify is exact)
    val posOk =
      lit(1) + least(col("a.n") - col("a.pos") - 1,
                     col("b.n") - col("b.pos") - 1) >=
        ceil((col("a.n") + col("b.n")) * lit(PfJaccard / (1 + PfJaccard)) - lit(1e-9))
    val cond = col("a.tok") === col("b.tok") && col("a.rep") < col("b.rep") &&
      (if (positional) lenOk && posOk else lenOk)
    pref.as("a").join(pref.as("b"), cond)
      .select(col("a.rep").as("rep_a"), col("b.rep").as("rep_b"))
      .distinct()
  }

  private val x35 = GateQuery(
    "x35_setjoin_prefix",
    (s, d) => {
      val reps = tokenSetReps(Tables.documents(s, d))
      val otab = orderedSetTable(reps, PfJaccard).persist()
      otab.count() // both candidate sides consume it
      val cand = ssjoinCandidates2(otab)
      val ta = reps.select(col("rep").as("rep_a"), col("toks").as("toks_a"))
      val tb = reps.select(col("rep").as("rep_b"), col("toks").as("toks_b"))
      val inter = size(array_intersect(col("toks_a"), col("toks_b")))
      val jac = inter.cast("double") /
        (size(col("toks_a")) + size(col("toks_b")) - inter)
      ordered(cand.join(ta, "rep_a").join(tb, "rep_b")
        .withColumn("jac", jac)
        .filter(col("jac") >= PfJaccard)
        .select(col("rep_a"), col("rep_b"), col("jac")))
    },
    // the pruning is LOSSLESS, so the oracle is the plain all-pairs
    // statement of the semantics — no construction replay needed
    Some(s"""WITH sigs AS (
              SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS sig,
                     min(doc_id) AS rep
              FROM documents GROUP BY 1),
            sets AS (
              SELECT s.rep, list_sort(list_distinct(string_split(d.text, ' '))) AS toks
              FROM sigs s JOIN documents d ON d.doc_id = s.rep)
            SELECT a.rep AS rep_a, b.rep AS rep_b,
              CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
                (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS jac
            FROM sets a JOIN sets b ON a.rep < b.rep
            WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
                (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= $PfJaccard
            ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- x36
  // Corpus-level boilerplate filter (C4-style): the K most frequent
  // corpus bigrams are the boilerplate set; every doc reports what
  // fraction of its distinct bigrams are boilerplate and is flagged
  // above a cutoff. Distinct from x24 (fixed EXTERNAL benchmark set)
  // and x26 (WITHIN-doc repetition): this catches template text
  // repeated ACROSS documents. Same scale shape as x24/x31: the
  // bigram count agg is map-side combined, the top-K is
  // TakeOrderedAndProject, and the constant-K boilerplate set
  // broadcasts — document text never shuffles; only hit rows reach
  // the per-doc agg.
  private val BoilerK = 20
  private val BoilerMaxFrac = 0.5
  private val x36 = GateQuery(
    "x36_boilerplate",
    (s, d) => {
      // Stage the bigram arrays ONCE, repartitioned off the scan: the
      // sf parquet is a single split, and the bigram HOF is the
      // per-row cost — without the repartition the whole corpus
      // tokenizes serially in one task (measured 10.5 s vs 2.3 s),
      // and without the persist the top-K broadcast subtree and the
      // corpus side each recompute it (the x14 racing-consumers
      // pitfall). At real scale the scan has many splits and the
      // repartition is unnecessary but harmless (one narrow-row
      // shuffle of raw text).
      val bgs = Tables.documents(s, d)
        .repartition(col("doc_id"))
        .select(col("doc_id"), bigramsExpr.as("bgs"))
        .persist()
      bgs.count()
      val top = bgs.select(explode(col("bgs")).as("bg"))
        .groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("bg")).limit(BoilerK)
        .select(col("bg"))
      val corp = bgs.select(col("doc_id"),
          size(col("bgs")).cast("long").as("n_bg"),
          explode(col("bgs")).as("bg"))
      // bigrams are distinct within a doc, so count(1) = distinct hits
      val hits = corp.join(broadcast(top), "bg")
        .groupBy(col("doc_id"), col("n_bg"))
        .agg(count(lit(1)).as("n_boiler"))
      ordered(hits
        .withColumn("frac", col("n_boiler").cast("double") / col("n_bg"))
        .withColumn("flagged", col("frac") > BoilerMaxFrac)
        .select(col("doc_id"), col("n_bg"), col("n_boiler"), col("frac"),
          col("flagged")))
    },
    Some(s"""WITH tks AS (
              SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
            bgs AS (
              SELECT doc_id, $duckBigrams AS bgl FROM tks),
            cnts AS (
              SELECT bg, count(*) AS cnt
              FROM (SELECT doc_id, unnest(bgl) AS bg FROM bgs)
              GROUP BY 1),
            top AS (
              SELECT bg FROM cnts ORDER BY cnt DESC, bg LIMIT $BoilerK),
            corp AS (
              SELECT doc_id, CAST(len(bgl) AS BIGINT) AS n_bg,
                     unnest(bgl) AS bg
              FROM bgs),
            hits AS (
              SELECT c.doc_id, c.n_bg, count(*) AS n_boiler
              FROM corp c JOIN top t ON t.bg = c.bg
              GROUP BY 1, 2)
            SELECT doc_id, n_bg, n_boiler,
                   CAST(n_boiler AS DOUBLE) / n_bg AS frac,
                   CAST(n_boiler AS DOUBLE) / n_bg > $BoilerMaxFrac AS flagged
            FROM hits ORDER BY 1,2,3,4,5"""))

  // ---------------------------------------------------------------- x37
  // REAL image decode in the gate: every document gets a deterministic
  // synthetic PNG (gray gradient keyed by doc_id), encoded AND decoded
  // with the actual javax.imageio codec (graft.multimodal.Media). PNG
  // is lossless, so the decoded raster's dimensions and exact per-band
  // sample sum have a closed form the DuckDB oracle recomputes
  // directly — a fake or lossy decode cannot hash-match this row.
  // Scale shape: pure per-row mapPartitions work after a narrow
  // repartition of doc ids (the codec never sees a shuffle).
  private val x37 = GateQuery(
    "x37_media_decode",
    (s, d) => {
      import s.implicits._
      val decoded = Tables.documents(s, d).select(col("doc_id")).as[Long]
        // the sf parquet is a single split: spread the codec work in
        // row-sized tasks (graft.Knobs.codecParts — a flat 32 made
        // ~10 ms tasks whose scheduling waves dominated on a
        // contended host; at real scale the scan is already
        // multi-split and the clamp is the core budget)
        .repartition(graft.Knobs.codecParts(Tables.documents(s, d).count()))
        .map { id =>
          val w = 8 + (id % 9).toInt
          val h = 8 + ((id * 3) % 9).toInt
          val png = graft.multimodal.Media.encodePng(w, h, (x, y) => {
            val v = ((id * 31 + y.toLong * w + x) % 256).toInt
            (v << 16) | (v << 8) | v
          })
          val dec = graft.multimodal.Media.decodeImage(png).get
          (id, dec.width.toLong, dec.height.toLong, dec.channels.toLong,
            dec.bandSums(0))
        }
        .toDF("doc_id", "width", "height", "channels", "pix_sum")
      ordered(decoded)
    },
    Some("""WITH dims AS (
              SELECT doc_id, 8 + doc_id % 9 AS width,
                     8 + (doc_id * 3) % 9 AS height
              FROM documents)
            SELECT d.doc_id, d.width, d.height, CAST(3 AS BIGINT) AS channels,
                   CAST(sum((d.doc_id * 31 + u.i) % 256) AS BIGINT) AS pix_sum
            FROM dims d, unnest(range(d.width * d.height)) AS u(i)
            GROUP BY 1, 2, 3, 4
            ORDER BY 1,2,3,4,5"""))

  // ---------------------------------------------------------------- x38
  // Nearest-centroid classification — the "tiny broadcast model"
  // scoring pattern of training-data pipelines (quality / domain /
  // edu-score classifiers): a per-label centroid is learned as the
  // element-wise INTEGER sum of the label's FLOOR(x*1000)-quantized
  // embeddings (cosine is scale-invariant, so the un-normalized sum
  // vector IS the centroid direction and stays exact integer — no
  // float drift between engines); every vector is then scored
  // map-side against the k broadcast centroids and labeled
  // argmax-cosine (ties -> smallest label). Scale shape: the model
  // collapses to ONE row of k×dim longs broadcast everywhere; the
  // corpus is scored in a pure projection — nothing proportional to
  // corpus size shuffles, exactly how a 100 TB quality-filter pass
  // must run. (The model agg is a dim×k-key shuffle of partial sums.)
  /** x38's learn + score stages, parameterized on a persisted-and-
    * materialized `(vec_id, label, qv: array<long>)` table: per-label
    * integer-sum centroids (k×dim keyed partial sums, reassembled in
    * position order — never more than k×dim rows), collapsed to ONE
    * model row and broadcast; scoring is a per-row HOF over the
    * broadcast centroid array — no per-class join, no regrouping of
    * scored rows. @return (vec_id, label, pred, cos, hit). */
  private[graft] def centroidClassify(v: DataFrame): DataFrame =
    nearestCentroid(v, sumCentroids(v.withColumnRenamed("label", "clabel")))
      .select(col("vec_id"), col("label"), col("pred"), col("cos"))
      .withColumn("hit", (col("label") === col("pred")).cast("int"))

  /** Element-wise integer-SUM centroid per `clabel` over `qv` rows —
    * k×dim keyed partial sums reassembled in position order; never
    * more than k×dim rows in flight. The un-normalized sum is the
    * centroid direction (cosine is scale-invariant) and stays exact
    * integer, so both engines agree bitwise. */
  private[graft] def sumCentroids(assigned: DataFrame): DataFrame =
    assigned
      .select(col("clabel"), posexplode(col("qv")).as(Seq("pos", "q")))
      .groupBy(col("clabel"), col("pos")).agg(sum(col("q")).as("s"))
      .groupBy(col("clabel"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("s")))),
        e => e.getField("s")).as("cv"))

  /** Score every row of `v` (carrying `qv: array<long>`) against a
    * small centroid table `(clabel: int, cv: array<long>)`: argmax
    * quantized cosine, ties toward the smallest clabel. The model
    * collapses to ONE broadcast row and scoring is a per-row HOF —
    * no per-class join, no regrouping of scored rows. Adds
    * `(pred, cos)` to `v`'s columns. */
  private[graft] def nearestCentroid(v: DataFrame, cents: DataFrame): DataFrame = {
    val model = cents
      .agg(collect_list(struct(col("clabel"), col("cv"))).as("cents"))
    val best = array_max(transform(col("cents"), c =>
      struct(
        cosLongCol(col("qv"), c.getField("cv")).as("cos"),
        (c.getField("clabel") * lit(-1)).as("nlabel"))))
    v.crossJoin(broadcast(model))
      .withColumn("best", best)
      .withColumn("pred", col("best.nlabel") * lit(-1))
      .withColumn("cos", col("best.cos"))
      .drop("best", "cents")
  }

  private val x38 = GateQuery(
    "x38_classify_centroid",
    (s, d) => {
      val quant = transform(col("embedding"),
        x => floor(x * lit(1000)).cast("long"))
      val v = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), quant.as("qv"))
        .persist() // centroid agg + scoring pass both consume it
      v.count() // eager: consumers race on a cold cache (see x14)
      ordered(centroidClassify(v))
    },
    Some(s"""WITH v AS (
              SELECT vec_id, label, list_transform(embedding,
                x -> CAST(FLOOR(x * 1000) AS BIGINT)) AS qv
              FROM embeddings),
            sums AS (
              SELECT label, u.i AS pos, sum(qv[u.i + 1]) AS s
              FROM v, unnest(range(len(qv))) AS u(i)
              GROUP BY 1, 2),
            cents AS (
              SELECT label AS clabel, list(s ORDER BY pos) AS cv
              FROM sums GROUP BY 1),
            scored AS (
              SELECT v.vec_id, v.label, c.clabel,
                list_dot_product(v.qv, c.cv) /
                  (sqrt(list_dot_product(v.qv, v.qv)) * sqrt(list_dot_product(c.cv, c.cv))) AS cos
              FROM v CROSS JOIN cents c),
            best AS (
              SELECT vec_id, label, clabel AS pred, cos,
                row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, clabel) AS rn
              FROM scored)
            SELECT vec_id, label, pred, cos,
              CAST(label = pred AS INT) AS hit
            FROM best WHERE rn = 1
            ORDER BY 1,2,3,4,5"""))

  // ---------------------------------------------------------------- x39
  // Spherical k-means clustering (SemDeDup-style semantic grouping):
  // deterministic seeds (the first k vectors), one Lloyd update
  // (assign to seeds → integer-SUM re-estimate) and a final
  // assignment — a FIXED round count, so the construction is
  // deterministic and the oracle replays it exactly. Centroids stay
  // exact integer sums (cosine is scale-invariant); assignments are
  // argmax quantized cosine with ties to the smallest cluster id.
  // Scale shape: each round is one broadcast of k×dim longs + a
  // per-row HOF + a k×dim-key partial-sum shuffle — the corpus
  // itself never shuffles, and rounds are a constant, not data-
  // dependent. (Real pipelines run this to cluster embeddings, then
  // near-dup WITHIN clusters — x21/x29 are those within-bucket
  // joins; x39 supplies the bucketing a learned layout would use.)
  //
  // k is NOT fixed: the production default derives k = max(8, ⌊√n⌋)
  // IN-PLAN (the x07/x80 `ivfPqNcells` machinery — a one-row count
  // agg broadcast into the seed filter, no driver-side action), so
  // the within-cluster pair joins built on this bucketing (x47) stay
  // O(n·√n), never n²/k with a constant k. The round-12 fixed-8 form
  // measured 22× wall-clock on 10× data in the x21 family — the
  // quadratic disease this derivation cures. `k = Some(const)` is
  // the fixture-only override (DerivedKSpec pins that the derived
  // form is assignment-identical to the explicit form at the same k).
  private[graft] def kmeansCluster(v: DataFrame,
                                   k: Option[Int] = None): DataFrame = {
    val seeds = (k match {
      case Some(kk) => v.filter(col("vec_id") < kk)
      case None => v.crossJoin(broadcast(ivfPqNcells(v)))
        .filter(col("vec_id") < col("ncells"))
    }).select(col("vec_id").cast("int").as("clabel"), col("qv").as("cv"))
    val a1 = nearestCentroid(v, seeds)
      .select(col("pred").as("clabel"), col("qv"))
    ordered(nearestCentroid(v, sumCentroids(a1))
      .select(col("vec_id"), col("pred").as("cluster"), col("cos")))
  }
  /** The √n-derived-k oracle clause: DuckDB replays the same
    * max(8, ⌊√n⌋) derivation (IEEE sqrt is correctly rounded and
    * n < 2^52, so both engines floor the same value). A def, not a
    * val: gate vals earlier in this object (x21) interpolate it. */
  private def SqlDerivedK: String =
    "(SELECT GREATEST(8, CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT)) FROM v)"
  private val x39 = GateQuery(
    "x39_kmeans_cluster",
    (s, d) => {
      val quant = transform(col("embedding"),
        x => floor(x * lit(1000)).cast("long"))
      val v = Tables.embeddings(s, d)
        .select(col("vec_id"), quant.as("qv"))
        .persist() // seeds + both assignment passes consume it
      v.count() // eager: consumers race on a cold cache (see x14)
      kmeansCluster(v)
    },
    Some(s"""WITH v AS (
              SELECT vec_id, list_transform(embedding,
                x -> CAST(FLOOR(x * 1000) AS BIGINT)) AS qv
              FROM embeddings),
            seeds AS (
              SELECT CAST(vec_id AS INT) AS clabel, qv AS cv
              FROM v WHERE vec_id < $SqlDerivedK),
            s1 AS (
              SELECT v.vec_id, v.qv, c.clabel,
                list_dot_product(v.qv, c.cv) /
                  (sqrt(list_dot_product(v.qv, v.qv)) * sqrt(list_dot_product(c.cv, c.cv))) AS cos
              FROM v CROSS JOIN seeds c),
            a1 AS (
              SELECT vec_id, qv, clabel FROM (
                SELECT vec_id, qv, clabel,
                  row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, clabel) AS rn
                FROM s1)
              WHERE rn = 1),
            sums AS (
              SELECT clabel, u.i AS pos, sum(qv[u.i + 1]) AS s
              FROM a1, unnest(range(len(qv))) AS u(i)
              GROUP BY 1, 2),
            c1 AS (
              SELECT clabel, list(s ORDER BY pos) AS cv
              FROM sums GROUP BY 1),
            s2 AS (
              SELECT v.vec_id, c.clabel,
                list_dot_product(v.qv, c.cv) /
                  (sqrt(list_dot_product(v.qv, v.qv)) * sqrt(list_dot_product(c.cv, c.cv))) AS cos
              FROM v CROSS JOIN c1 c)
            SELECT vec_id, cluster, cos FROM (
              SELECT vec_id, clabel AS cluster, cos,
                row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, clabel) AS rn
              FROM s2)
            WHERE rn = 1
            ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- x40
  // BM25 relevance scoring against a fixed query-term set — the
  // retrieval-side primitive of a data pipeline (quality-by-query
  // scoring, SEO-spam probes, targeted subcorpus pulls). Per-term
  // rows are emitted instead of a per-doc sum so NO float summation
  // order exists anywhere: every arithmetic step is a fixed-shape
  // double expression over exact integers, bit-identical across
  // engines. The idf uses the log-free odds form
  // (N - df + 0.5)/(df + 0.5) — rendered as exact-integer ratio
  // (2N-2df+1)/(2df+1) — which is a strictly monotone transform of
  // the classic ln-idf (ln is NOT correctly-rounded and differs
  // between libm and the JDK; the odds ratio ranks identically and
  // compares exactly). Scale shape: corpus stats (N, Σdl) are a
  // 1-row agg and df a |terms|-row agg, both broadcast back; tf is a
  // per-row HOF over the token array — document text never shuffles,
  // and only hit rows (tf>0) exist past the projection.
  private val Bm25Terms = Seq("join", "vector", "stream", "window")
  private val x40 = GateQuery(
    "x40_bm25_score",
    (s, d) => {
      // staged projection: split() runs once per row (the x15
      // pitfall); tf for each query term is a filter-HOF over it
      val t = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
          col("tk"))
      val stats = t.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("sum_dl"))
      val hits = t.select(col("doc_id"), col("dl"),
          explode(array(Bm25Terms.map(q => struct(lit(q).as("term"),
            size(filter(col("tk"), x => x === lit(q))).cast("long")
              .as("tf"))): _*)).as("s"))
        .select(col("doc_id"), col("dl"), col("s.term").as("term"),
          col("s.tf").as("tf"))
        .filter(col("tf") > 0)
      val dfs = hits.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val scored = hits.join(broadcast(dfs), "term")
        .crossJoin(broadcast(stats))
      val idf =
        (lit(2) * col("n_docs") - lit(2) * col("df") + lit(1)).cast("double") /
          (lit(2) * col("df") + lit(1)).cast("double")
      val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
      val norm = col("tf").cast("double") * lit(2.2) /
        (col("tf").cast("double") +
          lit(1.2) * (lit(0.25) + lit(0.75) *
            (col("dl").cast("double") / avgdl)))
      ordered(scored.select(col("doc_id"), col("term"), col("tf"),
        col("dl"), (idf * norm).as("score")))
    },
    Some(s"""WITH t AS (
              SELECT doc_id,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
                     string_split(text, ' ') AS tk
              FROM documents),
            stats AS (
              SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
              FROM t),
            q AS (SELECT unnest([${Bm25Terms.map(t => s"'$t'").mkString(", ")}]) AS term),
            hits AS (
              SELECT t.doc_id, t.dl, q.term,
                     CAST(len(list_filter(t.tk, x -> x = q.term)) AS BIGINT) AS tf
              FROM t CROSS JOIN q
              WHERE len(list_filter(t.tk, x -> x = q.term)) > 0),
            dfs AS (SELECT term, count(*) AS df FROM hits GROUP BY 1)
            SELECT h.doc_id, h.term, h.tf, h.dl,
              (CAST(2 * s.n_docs - 2 * d.df + 1 AS DOUBLE) /
               CAST(2 * d.df + 1 AS DOUBLE)) *
              (CAST(h.tf AS DOUBLE) * 2.2 /
               (CAST(h.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
                 (CAST(h.dl AS DOUBLE) /
                  (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE)))))) AS score
            FROM hits h JOIN dfs d ON d.term = h.term CROSS JOIN stats s
            ORDER BY 1,2,3,4,5"""))

  // ---------------------------------------------------------------- x41
  // Inverted-index build — the canonical MapReduce workload, SHARDED:
  // posting lists are grouped by (term, doc_id-range shard), not by
  // bare term, so no single row ever holds a 100 TB stopword's full
  // posting list (the same bounded-partition argument as x23's
  // packing shards: shard COUNT grows with data, shard SIZE is a
  // constant, and a term's postings parallelize across its shards).
  // One explode + one groupBy shuffle keyed by (term, shard); the
  // term-level df rollup aggregates the already-tiny shard table.
  // Postings are emitted as a comma-joined string (delta/varint
  // encoding is the storage refinement; the string is the
  // engine-portable form both engines order identically).
  private val IdxShardDocs = 200L
  private val IdxMinDf = 2L
  private val x41 = GateQuery(
    "x41_inverted_index",
    (s, d) => {
      val post = Tables.documents(s, d)
        .select(col("doc_id"),
          floor(col("doc_id") / lit(IdxShardDocs)).cast("long").as("shard"),
          explode(tokenSet(col("text"))).as("term"))
      val shards = post.groupBy(col("term"), col("shard"))
        .agg(count(lit(1)).as("df_shard"),
          array_join(sort_array(collect_list(col("doc_id")))
            .cast("array<string>"), ",").as("postings"))
        .persist()
      shards.count() // two consumers (rollup feeds the df join back)
      // no broadcast hint on `global`: it is vocabulary-sized (grows
      // with the corpus, the x35 argument) — both sides are already
      // hash-partitioned on `term` from the groupBys, so the equi-join
      // reuses that partitioning; AQE still broadcasts when it fits
      val global = shards.groupBy(col("term"))
        .agg(sum(col("df_shard")).as("df"))
        .filter(col("df") >= IdxMinDf)
      ordered(shards.join(global, "term")
        .select(col("term"), col("shard"), col("df"), col("df_shard"),
          col("postings")))
    },
    Some(s"""WITH post AS (
              SELECT doc_id,
                     CAST(doc_id // $IdxShardDocs AS BIGINT) AS shard,
                     unnest(list_distinct(string_split(text, ' '))) AS term
              FROM documents),
            sl AS (
              SELECT term, shard, count(*) AS df_shard,
                     array_to_string(list_sort(list(doc_id)), ',') AS postings
              FROM post GROUP BY 1, 2),
            g AS (
              SELECT term, CAST(sum(df_shard) AS BIGINT) AS df
              FROM sl GROUP BY 1 HAVING sum(df_shard) >= $IdxMinDf)
            SELECT s.term, s.shard, g.df, s.df_shard, s.postings
            FROM sl s JOIN g ON g.term = s.term
            ORDER BY 1,2,3,4,5"""))

  // ---------------------------------------------------------------- x42
  // FUZZY decontamination: x24 catches exact n-gram overlap with the
  // benchmark set; paraphrased or lightly-edited contamination slips
  // through it. x42 runs the x14 bigram-MinHash family BIPARTITE —
  // corpus side × benchmark side — then verifies candidates with
  // exact bigram Jaccard. Same "b:" hash family as x14 by design:
  // the signatures are reusable between the near-dup and decontam
  // passes of one pipeline run. The stand-in benchmark is a
  // LIGHTLY-EDITED slice of the corpus (a doc_id slice with its
  // first two tokens dropped) — precisely the contamination shape
  // that defeats exact long-span matching but not MinHash. Scale
  // shape: the benchmark is MBs against a 100 TB corpus, so its
  // ENTIRE band table broadcasts and the corpus side streams through
  // a map-side hash join — unlike x14's self-join, nothing here
  // shuffles with corpus cardinality; the verify joins only touch
  // candidate rows.
  private val FuzzyThreshold = 0.8
  private val x42 = GateQuery(
    "x42_decontam_fuzzy",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val editedText = concat_ws(" ",
        slice(split(col("text"), " "), lit(3),
          greatest(size(split(col("text"), " ")) - lit(2), lit(0))))
      val bench = docs.filter(col("doc_id") % BenchMod === 0)
        .select(col("doc_id").as("bench_id"),
          graft.functions.TokenBigrams.tokenBigrams(editedText).as("bgs_b"))
        .persist()
      bench.count()
      // the corpus side is ALL documents — contamination means the
      // corpus CONTAINS benchmark text, so the bench slice's own
      // sources must stay in scope
      val corp = docs
        .repartition(col("doc_id")) // 1-split scan: spread the shingling
        .select(col("doc_id"), bigramsExpr.as("bgs"))
        .persist()
      corp.count()
      val bandB = bandTableArr(
        bench.select(col("bench_id").as("rep"), col("bgs_b").as("arr")), "b:")
      val bandC = bandTableArr(
        corp.select(col("doc_id").as("rep"), col("bgs").as("arr")), "b:")
      val joinCond = col("c.band") === col("b.band") &&
        (0 until BandRows).map(j => col(s"c.k$j") === col(s"b.k$j"))
          .reduce(_ && _)
      val cand = bandC.as("c").join(broadcast(bandB.as("b")), joinCond)
        .select(col("c.rep").as("doc_id"), col("b.rep").as("bench_id"))
        .distinct()
      val inter = size(array_intersect(col("bgs"), col("bgs_b")))
      val jac = inter.cast("double") /
        (size(col("bgs")) + size(col("bgs_b")) - inter)
      ordered(cand.join(corp, "doc_id").join(broadcast(bench), "bench_id")
        .withColumn("jac", jac)
        .filter(col("jac") >= FuzzyThreshold)
        .select(col("doc_id"), col("bench_id"), col("jac")))
    },
    Some {
      val mhCols = (0 until NumMinhash).map { i =>
        s"MIN((h * ${mhA(i)} + ${mhB(i)}) % $Mod32) AS mh$i"
      }.mkString(", ")
      def bandSelects(src: String) = (0 until NumBands).map { b =>
        val ks = (0 until BandRows)
          .map(j => s"mh${BandRows * b + j} AS k$j").mkString(", ")
        s"SELECT rep, $b AS band, $ks FROM $src"
      }.mkString(" UNION ALL ")
      val joinKeys = "c.band = b.band AND " +
        (0 until BandRows).map(j => s"c.k$j = b.k$j").mkString(" AND ")
      s"""WITH tks AS (
             SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
           bench AS (
             SELECT bench_id, $duckBigrams AS bgs_b FROM (
               SELECT doc_id AS bench_id, tk[3:] AS tk
               FROM tks WHERE doc_id % $BenchMod = 0)),
           corp AS (
             SELECT doc_id, $duckBigrams AS bgs FROM tks),
           bt AS (SELECT bench_id AS rep, unnest(bgs_b) AS tok FROM bench),
           ct AS (SELECT doc_id AS rep, unnest(bgs) AS tok FROM corp),
           bth AS (SELECT rep, ${duckHex32("md5('b:' || tok)")} AS h FROM bt),
           cth AS (SELECT rep, ${duckHex32("md5('b:' || tok)")} AS h FROM ct),
           bmh AS (SELECT rep, $mhCols FROM bth GROUP BY rep),
           cmh AS (SELECT rep, $mhCols FROM cth GROUP BY rep),
           bband AS (${bandSelects("bmh")}),
           cband AS (${bandSelects("cmh")}),
           cand AS (
             SELECT DISTINCT c.rep AS doc_id, b.rep AS bench_id
             FROM cband c JOIN bband b ON $joinKeys)
          SELECT ca.doc_id, ca.bench_id,
            CAST(len(list_intersect(co.bgs, be.bgs_b)) AS DOUBLE) /
              (len(co.bgs) + len(be.bgs_b) - len(list_intersect(co.bgs, be.bgs_b))) AS jac
          FROM cand ca
          JOIN corp co ON co.doc_id = ca.doc_id
          JOIN bench be ON be.bench_id = ca.bench_id
          WHERE CAST(len(list_intersect(co.bgs, be.bgs_b)) AS DOUBLE) /
              (len(co.bgs) + len(be.bgs_b) - len(list_intersect(co.bgs, be.bgs_b))) >= $FuzzyThreshold
          ORDER BY 1,2,3"""
    })

  // ---------------------------------------------------------------- x43
  // Keyless numeric range join ([[graft.ops.RangeJoin]]): customers
  // joined into per-nation supplier account-balance bands with NO
  // equi key — the join Spark would otherwise plan as a nested loop
  // (fine for 25 ranges, quadratic for a million-row band table; the
  // operator manufactures the equi key by domain bucketing, and this
  // gate row pins its exact semantics against DuckDB's plain theta
  // join). lo = min(acctbal) is exact (order-independent); hi is one
  // double add — no float aggregation anywhere.
  private val RjBandWidth = 600.0
  private val x43 = GateQuery(
    "x43_range_join",
    (s, d) => {
      val ranges = Tables.supplier(s, d)
        .groupBy(col("s_nationkey").cast("long").as("nationkey"))
        .agg(min(col("s_acctbal")).as("lo"))
        .withColumn("hi", col("lo") + lit(RjBandWidth))
      val pts = Tables.customer(s, d)
        .select(col("c_custkey").as("custkey"), col("c_acctbal"))
      ordered(graft.ops.RangeJoin
        .bucketed(pts, ranges, "c_acctbal", "lo", "hi", bucketWidth = 500.0)
        .select(col("custkey"), col("nationkey"), col("lo"), col("hi")))
    },
    Some(s"""WITH r AS (
              SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
                     min(s_acctbal) AS lo,
                     min(s_acctbal) + $RjBandWidth AS hi
              FROM supplier GROUP BY 1)
            SELECT c.c_custkey AS custkey, r.nationkey, r.lo, r.hi
            FROM customer c
            JOIN r ON c.c_acctbal >= r.lo AND c.c_acctbal <= r.hi
            ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- x44
  // Product-quantization ANN (the IVF-PQ storage half): embeddings
  // are split into M=4 subspaces of 16 dims; each subspace has a
  // K=16-entry codebook (deterministic: the first K vectors' slices,
  // like x39's seeds — real systems train the codebook offline on a
  // sample, the ENGINE's job is encode + asymmetric-distance scan);
  // each vector is stored as M 4-bit codes (2 bytes vs 256 bytes of
  // float32 — 128× compression), and query-time distance is the ADC
  // sum of per-subspace exact L2² between the query slice and the
  // assigned codeword. Every distance is exact BIGINT arithmetic
  // (no floats anywhere), so the oracle replays the construction
  // bit-for-bit. Scale shape: the codebook collapses to ONE
  // broadcast model row (M·K·16 longs); encoding and ADC scoring
  // are per-row HOFs over it — the corpus never shuffles, and the
  // scan that serves a query reads 2-byte codes, not raw vectors.
  // Ties (equidistant codewords / equal ADC) break to the smallest
  // code / vec_id on both engines.
  private val PqM = 4    // subspaces
  private val PqSub = 16 // dims per subspace (4 × 16 = 64)
  private val PqK = 16   // codewords per subspace

  /** Codebook + per-vector PQ codes for `v` (vec_id, qv): returns
    * (vec_id, codes: array<int> of M, model, cbflat) with the
    * codebook collapsed into every row's `model` column (one
    * broadcast row; `cbflat` is the same codebook flattened to one
    * array<long> in (sub, code) row-major order — the layout
    * [[graft.functions.PqEncode]] indexes directly). Encoding is a
    * per-row argmin-L2² — zero shuffles — as a native codegen'd
    * expression: the m·k·subDim multiply-adds per row made the
    * interpreted aggregate-over-filter HOF the encode bottleneck at
    * sf1 (PqAnnSpec pins the native codes to a driver-side
    * reference). */
  private[graft] def pqEncoded(v: DataFrame): DataFrame = {
    // codebook → ONE row: sorted array<struct<sub,code,cv>> (the
    // sort makes in-array order = (sub, code), so the encoder's
    // strict `<` breaks ties to the smallest code)
    val cb = v.filter(col("vec_id") < PqK)
      .select(col("vec_id").cast("int").as("code"), col("qv"))
      .withColumn("sub", explode(sequence(lit(0), lit(PqM - 1))))
      .select(struct(col("sub"), col("code"),
        slice(col("qv"), col("sub") * PqSub + 1, lit(PqSub)).as("cv")).as("e"))
      .agg(sort_array(collect_list(col("e"))).as("model"))
      .withColumn("cbflat", flatten(transform(col("model"), e => e("cv"))))

    v.crossJoin(broadcast(cb))
      .withColumn("codes", graft.functions.PqEncode.pqEncode(
        col("qv"), col("cbflat"), PqM, PqK, PqSub))
      .select(col("vec_id"), col("codes"), col("model"), col("cbflat"))
  }

  /** ADC top-k: queries (vec_id < NumQueries) broadcast against the
    * PQ codes; distance is the per-subspace L2²(query slice, assigned
    * codeword) sum over exact longs — [[graft.functions.PqAdc]], a
    * fused codegen loop, because this evaluates once per
    * (query, corpus-vector) pair: x44's true hot path. */
  private[graft] def pqTopK(v: DataFrame): DataFrame = {
    val enc = pqEncoded(v)
    val q = v.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("qv").as("qq"))
    val adist = graft.functions.PqAdc.pqAdc(
      col("qq"), col("codes"), col("cbflat"), PqM, PqK, PqSub)
    val scored = broadcast(q)
      .join(enc, col("qid") =!= col("vec_id"))
      .withColumn("adist", adist)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adist"), col("vec_id"))
    ordered(scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TopK)
      .select(col("qid"), col("vec_id"), col("rn"), col("adist")))
  }

  private val x44 = GateQuery(
    "x44_knn_pq",
    (s, d) => {
      val quant = transform(col("embedding"),
        x => floor(x * lit(1000)).cast("long"))
      val v = Tables.embeddings(s, d)
        .select(col("vec_id"), quant.as("qv"))
        .persist() // codebook, encode pass and query set all consume it
      v.count() // eager: consumers race on a cold cache (see x14)
      pqTopK(v)
    },
    Some(s"""WITH v AS (
              SELECT vec_id, list_transform(embedding,
                x -> CAST(FLOOR(x * 1000) AS BIGINT)) AS qv
              FROM embeddings),
            subs AS (SELECT unnest(range($PqM)) AS sub),
            cb AS (
              SELECT s.sub, CAST(c.vec_id AS INT) AS code,
                     list_slice(c.qv, s.sub*$PqSub + 1, s.sub*$PqSub + $PqSub) AS cv
              FROM v c CROSS JOIN subs s WHERE c.vec_id < $PqK),
            dist AS (
              SELECT v.vec_id, b.sub, b.code,
                CAST(list_dot_product(list_slice(v.qv, b.sub*$PqSub+1, b.sub*$PqSub+$PqSub),
                                      list_slice(v.qv, b.sub*$PqSub+1, b.sub*$PqSub+$PqSub))
                  - 2*list_dot_product(list_slice(v.qv, b.sub*$PqSub+1, b.sub*$PqSub+$PqSub), b.cv)
                  + list_dot_product(b.cv, b.cv) AS BIGINT) AS d
              FROM v CROSS JOIN cb b),
            enc AS (
              SELECT vec_id, sub, code FROM (
                SELECT vec_id, sub, code,
                  row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code) AS rn
                FROM dist) WHERE rn = 1),
            scored AS (
              SELECT q.vec_id AS qid, e.vec_id,
                CAST(SUM(CAST(
                  list_dot_product(list_slice(q.qv, b.sub*$PqSub+1, b.sub*$PqSub+$PqSub),
                                   list_slice(q.qv, b.sub*$PqSub+1, b.sub*$PqSub+$PqSub))
                  - 2*list_dot_product(list_slice(q.qv, b.sub*$PqSub+1, b.sub*$PqSub+$PqSub), b.cv)
                  + list_dot_product(b.cv, b.cv) AS BIGINT)) AS BIGINT) AS adist
              FROM v q
              JOIN enc e ON q.vec_id < $NumQueries AND q.vec_id <> e.vec_id
              JOIN cb b ON b.sub = e.sub AND b.code = e.code
              GROUP BY 1, 2)
            SELECT qid, vec_id, rn, adist FROM (
              SELECT qid, vec_id, adist,
                row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS rn
              FROM scored) WHERE rn <= $TopK
            ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- x45
  // Exact duplicated-SPAN detection (substring-level dedup, the
  // signal behind "dedup the training set at the 50-token level"
  // rather than whole documents): every W-token window of every
  // document is hashed; a span occurring in ≥ 2 distinct documents is
  // duplicated, and each document reports how many of its distinct
  // spans are shared. Near-dup docs share most spans; templated
  // boilerplate shares a few — this measures both at exact-substring
  // granularity, which whole-doc MinHash (x04) and bag-of-bigram
  // Jaccard (x14) cannot.
  //
  // Scale shape: the span hashes are built in ONE per-row HOF pass
  // (O(n·W) work, no explode of text), deduped per-doc in the same
  // projection (`array_distinct` — a doc repeating its own span
  // counts once), and only then exploded: every shuffled row is
  // (doc_id, 32-hex span hash) — document TEXT never shuffles. One
  // hash-groupBy counts docs per span (map-side partial agg), one
  // equi-join flags each doc's spans, one per-doc agg folds to
  // counts. At 100 TB this is x14's candidate-table shape: rows ∝
  // corpus token count, keys are fixed-width hashes, every wide op
  // an equi-shuffle. The classic refinement — keep only every k-th
  // span hash (winnowing, x10's construction) — drops row count k×:
  // exposed as spanDedupCounts' `winnow` param (PERF.md has the
  // measured row-count/recall delta; the gate runs winnow=1 = exact).
  private val SpanW = 8

  /** Per-document duplicated-span counts over (doc_id, text) rows:
    * (doc_id, n_spans = distinct W-token windows, dup_spans = those
    * occurring in ≥ 2 distinct documents).
    *
    * @param winnow row-count reducer for the exploded (doc_id, hash)
    *   table: keep only spans whose hash ≡ 0 (mod winnow) — CONTENT-
    *   defined sampling ("0 mod p" shingle selection), so the same
    *   window text is kept or dropped identically in every document
    *   regardless of its offset (a positional every-k-th stride would
    *   silently lose cross-doc matches whenever the shared region
    *   sits at different offsets mod k in the two docs). Rows drop
    *   ~winnow×; a duplicated region of ≥ winnow spans expects ≥ 1
    *   surviving witness; `n_spans`/`dup_spans` then count SAMPLED
    *   spans (the k×-scaled estimator). winnow=1 keeps every span —
    *   byte-identical to the exact construction (SpanDedupSpec). */
  private[graft] def spanDedupCounts(docs: DataFrame, w: Int = SpanW,
      winnow: Int = graft.Knobs.SpanWinnowDefault): DataFrame = {
    require(winnow >= 1, s"winnow must be >= 1, got $winnow")
    // distinct span hashes per doc, built row-locally in ONE fused
    // native pass (split + rolling window + incremental md5 + winnow
    // + distinct — graft.functions.SpanHashes; SpanHashesSpec pins it
    // bit-identical to the HOF formulation it replaced, including the
    // n < w empty-array guard and the conv-based winnow filter)
    val spans = docs.select(col("doc_id"),
      explode(graft.functions.SpanHashes.spanHashes(col("text"), w, winnow))
        .as("sh"))
      .persist() // the per-span count and the flag join both consume it
    spans.count()
    val perSpan = spans.groupBy(col("sh"))
      .agg(count(lit(1)).as("n_docs"))
    val perDoc = spans.join(perSpan, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("n_docs") >= 2, lit(1L)).otherwise(lit(0L)))
          .as("dup_spans"))
    // short docs (no spans) still report, with zeros
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_spans"), lit(0L)).as("dup_spans"))
  }

  private val x45 = GateQuery(
    "x45_span_dedup",
    (s, d) => ordered(spanDedupCounts(Tables.documents(s, d))),
    Some(s"""WITH staged AS (
              SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
            spans AS (
              SELECT DISTINCT doc_id,
                     md5(array_to_string(tk[i+1 : i+$SpanW], ' ')) AS sh
              FROM staged,
                   unnest(range(0, GREATEST(len(tk) - ${SpanW - 1}, 0))) AS u(i)),
            per_span AS (SELECT sh, count(*) AS n_docs FROM spans GROUP BY 1),
            per_doc AS (
              SELECT s.doc_id, count(*) AS n_spans,
                     sum(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) AS dup_spans
              FROM spans s JOIN per_span c USING (sh) GROUP BY 1)
            SELECT d.doc_id,
                   CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
                   CAST(COALESCE(p.dup_spans, 0) AS BIGINT) AS dup_spans
            FROM documents d LEFT JOIN per_doc p USING (doc_id)
            ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- x46
  // Exact heavy hitters in two passes with BOUNDED memory: pass 1 is
  // one shared scan computing the Misra-Gries candidate summary
  // (k counters per partial buffer — graft.functions.FreqCandidatesAgg)
  // AND the total row count in the same aggregation; pass 2 recounts
  // exactly, restricted to the ≤ k broadcast candidates by a map-side
  // semi-join. The sketch guarantees candidates ⊇ every token with
  // cnt·(k+1) > n, so the recount-then-threshold output is the EXACT
  // heavy-hitter set — deterministic even though which extra
  // candidates survive the sketch depends on partition order.
  //
  // This is x31's vocabulary problem with the shuffle removed: a full
  // groupBy ships the whole distinct vocabulary through a shuffle
  // (unbounded keys at 100 TB); here pass 1 ships ONE k-entry summary
  // per partition to a 1-row reduce, and pass 2's shuffle carries
  // only rows matching the ≤ k candidates.
  private val HhK = 100
  private val x46 = GateQuery(
    "x46_heavy_hitters",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
      // sketch + n in ONE corpus pass; the result is a single row —
      // persist it eagerly so its two consumers don't re-run the scan
      // (cold-cache race, see x14)
      val sketch = toks.agg(
        graft.functions.FreqCandidatesAgg.freqCandidates(col("tok"), HhK)
          .as("cand"),
        count(lit(1)).as("n")).persist()
      sketch.count()
      val cand = sketch.select(explode(col("cand")).as("tok"))
      val exact = toks.join(broadcast(cand), Seq("tok"), "left_semi")
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      ordered(exact.crossJoin(broadcast(sketch.select(col("n"))))
        .filter(col("cnt") * (HhK + 1) > col("n"))
        .select(col("tok"), col("cnt")))
    },
    Some(s"""WITH t AS (
              SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
            SELECT tok, count(*) AS cnt FROM t
            GROUP BY 1
            HAVING count(*) * ${HhK + 1} > (SELECT count(*) FROM t)
            ORDER BY 1,2"""))

  // ---------------------------------------------------------------- x47
  // SemDeDup (semantic dedup, Abbas et al. 2023): cluster the
  // embedding space, then near-dup ONLY within clusters — the
  // composition real pipelines run, here built from shipped parts:
  // x39's spherical k-means supplies the bucketing, the within-bucket
  // pair join is an equi-join on the cluster id (x21's cell-join
  // shape), and the greedy keep rule drops every vector that has a
  // smaller-id ≥-threshold neighbor in its cluster. Approximate BY
  // DESIGN (cross-cluster near-dups are never compared — that is the
  // trade SemDeDup makes); deterministic end to end, so the oracle
  // replays the construction and the output hash-matches.
  //
  // Scale shape: assignment is x39's broadcast-model HOF (corpus
  // never shuffles); the pair join shuffles (vec_id, cluster, qv)
  // rows on a key whose bucket size is corpus/k — k = max(8, ⌊√n⌋)
  // derived in-plan (see kmeansCluster), so buckets are O(√n) and
  // the within-cluster pair join is O(n·√n), never n²/const; the
  // keep-list join is a distinct on dup ids + one equi-join back.
  private val SemCos = 0.5

  /** (vec_id, cluster, keep) over a persisted (vec_id, qv) table.
    * k = None (production) derives k = max(8, ⌊√n⌋) in-plan;
    * Some(const) is the fixture override. */
  private[graft] def semDedupKeep(v: DataFrame,
                                  k: Option[Int] = None): DataFrame = {
    // both pair-join sides and the final output consume the
    // assignment — materialize it once or the whole k-means pipeline
    // (two scoring passes + centroid shuffle) runs three times
    val asg = kmeansCluster(v, k).select(col("vec_id"), col("cluster"))
      .join(v, Seq("vec_id"))
      .persist()
    asg.count()
    val a = asg.select(col("cluster"),
      col("vec_id").as("id_a"), col("qv").as("qa"))
    val b = asg.select(col("cluster"),
      col("vec_id").as("id_b"), col("qv").as("qb"))
    val dups = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b") &&
        cosLongCol(col("qa"), col("qb")) >= SemCos)
      .select(col("id_b").as("vec_id")).distinct()
      .withColumn("dup", lit(1))
    ordered(asg.join(dups, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cluster"),
        when(col("dup").isNotNull, lit(0L)).otherwise(lit(1L)).as("keep")))
  }

  private val x47 = GateQuery(
    "x47_semdedup",
    (s, d) => {
      val quant = transform(col("embedding"),
        x => floor(x * lit(1000)).cast("long"))
      val v = Tables.embeddings(s, d)
        .select(col("vec_id"), quant.as("qv"))
        .persist() // seeds, two assignment passes and both pair sides
      v.count() // eager: consumers race on a cold cache (see x14)
      semDedupKeep(v)
    },
    Some(s"""WITH v AS (
              SELECT vec_id, list_transform(embedding,
                x -> CAST(FLOOR(x * 1000) AS BIGINT)) AS qv
              FROM embeddings),
            seeds AS (
              SELECT CAST(vec_id AS INT) AS clabel, qv AS cv
              FROM v WHERE vec_id < $SqlDerivedK),
            s1 AS (
              SELECT v.vec_id, v.qv, c.clabel,
                list_dot_product(v.qv, c.cv) /
                  (sqrt(list_dot_product(v.qv, v.qv)) * sqrt(list_dot_product(c.cv, c.cv))) AS cos
              FROM v CROSS JOIN seeds c),
            a1 AS (
              SELECT vec_id, qv, clabel FROM (
                SELECT vec_id, qv, clabel,
                  row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, clabel) AS rn
                FROM s1)
              WHERE rn = 1),
            sums AS (
              SELECT clabel, u.i AS pos, sum(qv[u.i + 1]) AS s
              FROM a1, unnest(range(len(qv))) AS u(i)
              GROUP BY 1, 2),
            c1 AS (
              SELECT clabel, list(s ORDER BY pos) AS cv
              FROM sums GROUP BY 1),
            s2 AS (
              SELECT v.vec_id, c.clabel,
                list_dot_product(v.qv, c.cv) /
                  (sqrt(list_dot_product(v.qv, v.qv)) * sqrt(list_dot_product(c.cv, c.cv))) AS cos
              FROM v CROSS JOIN c1 c),
            asg AS (
              SELECT vec_id, cluster FROM (
                SELECT vec_id, clabel AS cluster,
                  row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, clabel) AS rn
                FROM s2)
              WHERE rn = 1),
            dups AS (
              SELECT DISTINCT b.vec_id
              FROM asg a
              JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
              JOIN v va ON va.vec_id = a.vec_id
              JOIN v vb ON vb.vec_id = b.vec_id
              WHERE list_dot_product(va.qv, vb.qv) /
                (sqrt(list_dot_product(va.qv, va.qv)) * sqrt(list_dot_product(vb.qv, vb.qv))) >= $SemCos)
            SELECT g.vec_id, g.cluster,
                   CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS keep
            FROM asg g LEFT JOIN dups d ON d.vec_id = g.vec_id
            ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- x48
  // Bloom-filter pruned semi-join (the explicit runtime-filter): the
  // urgent-order key set becomes a 1024-word broadcast bitset; the
  // lineitem side drops non-members MAP-SIDE (no false negatives,
  // ~0.2% false positives at this sizing) and only survivors reach
  // the exact semi-join + aggregation. Lossless by construction, so
  // the oracle is the PLAIN semi-join — the bloom stage is invisible
  // in the result, visible in the shuffle size (BloomSemiJoinSpec
  // measures the pruning rate; at 100 TB the key side is too big to
  // broadcast as a hash relation, but its 8 KB-per-million-keys
  // bitset is not). l_quantity is integer-valued, so the double sum
  // is associativity-exact and hash-matches.
  private val x48 = GateQuery(
    "x48_bloom_semijoin",
    (s, d) => {
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"))
      val matched = graft.ops.BloomSemiJoin
        .semiJoin(li, "l_orderkey", urgent, "o_orderkey")
      ordered(matched.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty")))
    },
    Some("""SELECT l_orderkey, count(*) AS n_items, sum(l_quantity) AS sum_qty
            FROM lineitem
            WHERE l_orderkey IN (
              SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
            GROUP BY 1
            ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- x49
  // BPE merge training, the real iterative loop (Sennrich et al.):
  // each round counts ADJACENT symbol pairs over the current corpus,
  // picks the single most frequent pair (ties to the lexicographically
  // smallest — deterministic), and rewrites every sequence by greedy
  // left-to-right non-overlapping replacement of that pair. A FIXED
  // round count R (x39's pattern) keeps the construction replayable,
  // so the oracle unrolls the same R rounds as CTEs and the merge
  // table hash-matches. Symbols start as whitespace tokens (word-level
  // merges — the WordPiece regime; byte-level BPE is the same loop
  // with a different initial alphabet).
  //
  // Scale shape per round: pair counting is one explode + hash
  // groupBy with map-side combine (x31's accepted vocabulary-shuffle
  // shape — pair keys, not corpus rows), the argmax is a 1-row
  // TakeOrdered, and the rewrite is a per-row string replace against
  // the ONE broadcast winner — the corpus never shuffles, and rounds
  // are a constant. Greedy-left semantics ride on replace()'s
  // left-to-right non-overlapping scan in BOTH engines ("a a a"
  // merges once, prefix-first).
  private val BpeRounds = 4
  private val BpeSep = "\u0001" // intra-sequence symbol separator

  /** The shared BPE training loop: R rounds of count → argmax →
    * greedy rewrite over (doc_id, text) rows. Returns each round's
    * winner table (pair, cnt — persisted, one row each) and the
    * final rewritten (doc_id, seq) corpus. */
  private def bpeRun(docs: DataFrame,
                     rounds: Int): (Vector[DataFrame], DataFrame) = {
    val sep = lit(BpeSep)
    // two fixes the sf1 profile demanded (2.6-3.3 s PER ROUND in 2
    // tasks): (1) the corpus arrives as O(parquet splits) partitions
    // — at sf1 that is TWO, so every round's CPU-heavy
    // replace+split+explode ran on 2 of 32 cores; an explicit-N
    // repartition spreads it (explicit N is exempt from AQE's
    // size-based coalescing, which would fold these CPU-bound
    // partitions back together). (2) each round's rewrite is
    // localCheckpoint'ed (lazily — the NEXT round's pair count
    // materializes it), otherwise round r's count re-runs all r-1
    // earlier replace passes from lineage: O(R²) corpus scans.
    val par = docs.sparkSession.sessionState.conf.numShufflePartitions
    var seqs = docs.select(col("doc_id"),
      regexp_replace(col("text"), " ", BpeSep).as("seq"))
      .repartition(par)
      .localCheckpoint(false)
    val tops = (1 to rounds).map { _ =>
      // adjacent pairs of the CURRENT symbol sequences, counted
      val pairs = seqs
        .select(split(col("seq"), BpeSep).as("tk"))
        .select(explode(zip_with(
          slice(col("tk"), lit(1), greatest(size(col("tk")) - 1, lit(0))),
          slice(col("tk"), lit(2), greatest(size(col("tk")) - 1, lit(0))),
          (a, b) => concat(a, sep, b))).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
      // ONE winner row; materialized eagerly so round i+1's plan (and
      // every consumer) reference a cached literal instead of
      // re-running every earlier round's aggregation
      val top = pairs
        .orderBy(col("cnt").desc, col("pair")).limit(1)
        .select(col("pair"), col("cnt"))
        .persist()
      top.count()
      // rewrite: greedy left-to-right replace of the winner, corpus
      // stays put (one broadcast row in a cross join)
      seqs = seqs.crossJoin(broadcast(top))
        .select(col("doc_id"), replace(col("seq"), col("pair"),
          replace(col("pair"), sep, lit(""))).as("seq"))
        .localCheckpoint(false)
      top
    }.toVector
    (tops, seqs)
  }

  /** (rank, merged, cnt) — the R-entry merge table over (doc_id,
    * text) rows. `merged` is the winning pair's concatenation. */
  private[graft] def bpeMerges(docs: DataFrame, rounds: Int = BpeRounds): DataFrame = {
    val (tops, _) = bpeRun(docs, rounds)
    ordered(tops.zipWithIndex.map { case (top, i) =>
      top.select(lit((i + 1).toLong).as("rank"),
        replace(col("pair"), lit(BpeSep), lit("")).as("merged"),
        col("cnt"))
    }.reduce(_ union _))
  }

  /** (doc_id, tok_before, tok_after) — the trained merge table
    * APPLIED: every document re-tokenized under the R learned
    * merges. tok_after ≤ tok_before; the gap is the compression the
    * learned vocabulary buys on this corpus. */
  private[graft] def bpeEncodeCounts(docs: DataFrame,
                                     rounds: Int = BpeRounds): DataFrame = {
    val (_, seqs) = bpeRun(docs, rounds)
    ordered(docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tok_before"))
      .join(seqs.select(col("doc_id"),
        size(split(col("seq"), BpeSep)).cast("long").as("tok_after")),
        Seq("doc_id")))
  }

  private val x49 = GateQuery(
    "x49_bpe_merges",
    (s, d) => bpeMerges(Tables.documents(s, d)),
    Some {
      // unroll the same R rounds as CTEs: s0 is the corpus, each
      // round counts pairs of s{i-1}, picks the winner w{i}, rewrites
      // into s{i}
      val rounds = (1 to BpeRounds).map { i =>
        s"""p$i AS (
              SELECT a || chr(1) || b AS pair, count(*) AS cnt
              FROM (
                SELECT unnest(tk[1:len(tk)-1]) AS a, unnest(tk[2:len(tk)]) AS b
                FROM (SELECT string_split(seq, chr(1)) AS tk FROM s${i - 1}))
              GROUP BY 1),
            w$i AS (
              SELECT pair, cnt FROM p$i ORDER BY cnt DESC, pair LIMIT 1),
            s$i AS (
              SELECT replace(seq, w.pair, replace(w.pair, chr(1), '')) AS seq
              FROM s${i - 1}, w$i w)"""
      }.mkString(",\n")
      val rows = (1 to BpeRounds).map { i =>
        s"""SELECT CAST($i AS BIGINT) AS rank,
                   replace(pair, chr(1), '') AS merged, cnt
            FROM w$i"""
      }.mkString(" UNION ALL ")
      s"""WITH s0 AS (
            SELECT replace(text, ' ', chr(1)) AS seq FROM documents),
          $rounds
          SELECT rank, merged, cnt FROM ($rows)
          ORDER BY 1,2,3"""
    })

  // ---------------------------------------------------------------- x50
  // Changelog compaction (CDC apply / latest-row-wins): the events
  // stream read as a changelog — every event upserts its user's
  // state, 'error' rows are tombstones — materialized to current
  // state: the latest event per user by (ts, event_id) wins; users
  // whose latest event is a tombstone are absent. The canonical
  // upsert-view / compaction job every lakehouse table maintenance
  // pass runs.
  //
  // Scale shape: ONE hash groupBy with a max_by partial aggregate —
  // state per key is a single struct, combined map-side, so the
  // shuffle carries one row per (partition × user), not the
  // changelog. The window-rank formulation (what the oracle states)
  // needs a full per-key sort; max_by doesn't. (ts, event_id) is a
  // total order, so both formulations pick the same row and the
  // hash matches.
  private val x50 = GateQuery(
    "x50_cdc_compact",
    (s, d) => {
      val st = struct(col("ts"), col("event_id"),
        col("event_type"), col("value"))
      ordered(Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max_by(st, struct(col("ts"), col("event_id"))).as("st"))
        .select(col("user_id"),
          col("st.event_type").as("last_type"),
          col("st.value").as("last_value"),
          date_format(col("st.ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("last_ts"))
        .filter(col("last_type") =!= "error"))
    },
    Some("""SELECT user_id, last_type, last_value, last_ts FROM (
              SELECT user_id, event_type AS last_type, value AS last_value,
                     strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
                     row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn
              FROM events)
            WHERE rn = 1 AND last_type <> 'error'
            ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- x51
  // Triangle counting — the canonical two-join graph workload —
  // over the span-sharing document graph (edge = two docs share a
  // W-token window, x45's construction at W=4): wedge join (edges ⋈
  // edges on the middle vertex) then the closing join back to the
  // edge set, per-doc participation counts out. Complements x30
  // (connected components = reachability; triangles = local
  // density/clustering — the dedup-graph diagnostic that tells
  // template families from chance collisions).
  //
  // Scale shape: every join is an equi-join on vertex ids over
  // (long, long) rows — never adjacency lists as single rows, so no
  // row-size blowup on hubs (x41's bounded-shard argument). The
  // wedge join is degree-ORIENTED (low-(deg,id) endpoint → high):
  // wedges form only at each triangle's min-key vertex, so the join
  // is Θ(Σ outdeg²) with outdeg ≤ O(√m) — a star hub of degree k
  // contributes k wedges to its spokes' buckets, not k² to its own
  // (TriangleSpec's hub fixture pins this).
  private val TriW = 4

  /** Docs-per-span frequency cap for [[spanEdges]] (the standard
    * frequent-shingle drop): a span shared by more than this many
    * documents is a STOPWORD span ("in the of a") — it carries no
    * duplication signal and would contribute df² join rows, the one
    * quadratic that kills a span graph at 100 TB. Dropping it bounds
    * every span's edge contribution at cap·(cap−1)/2. On the
    * testdata corpora max df is 4 (sf0.01) / 6 (sf0.1), so the
    * default cap changes nothing at gate scale (SpanCapSpec proves
    * the bound on a skewed fixture; the DuckDB oracles replay the
    * same cap). */
  private[graft] val SpanDfCap = 64

  /** Undirected span-sharing edges: (a < b) doc-id pairs that share a
    * w-token window (fused native [[graft.functions.SpanHashes]]
    * build — document text never shuffles, only (doc_id, hash) rows).
    * The dedup-graph substrate under x51 (triangles), x56 (PageRank)
    * and x62 (two-hop reach); callers persist.
    *
    * Scale shape: the span table is shuffled ONCE onto sh
    * (`repartition` + persist; the df pre-count, the semi-join, and
    * the doc-list agg all reuse the cached HashPartitioning with no
    * further exchange). The df cap is enforced BEFORE any doc list
    * exists: a constant-buffer count agg picks the spans with df in
    * [2, maxDf], the span table semi-joins to that key set, and only
    * then does collect_set run — so its buffer is bounded by maxDf
    * rows by construction and a 100 TB stopword span never
    * materializes its doc list anywhere (the round-8 shape collected
    * the full list first and capped after, an unbounded row on hubs).
    * A kept span has at most maxDf docs, so pairs explode from the
    * list directly: Σ C(df,2) output rows, no self-join. Singleton
    * spans (the vast majority of a real corpus) die in the df
    * pre-count: df=1 makes no edge. */
  private[graft] def spanEdges(docs: DataFrame, w: Int,
                               maxDf: Int = SpanDfCap): DataFrame = {
    val spans = docs.select(col("doc_id"),
      explode(graft.functions.SpanHashes.spanHashes(col("text"), w)).as("sh"))
      .repartition(col("sh")).persist()
    spans.count() // three aligned consumers below; materialize once
    val kept = spans.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, maxDf)).select(col("sh"))
    spans.join(kept, Seq("sh"), "left_semi")
      .groupBy(col("sh"))
      .agg(collect_set(col("doc_id")).as("ds"))
      .select(explode(expr(
        """flatten(transform(sequence(0, size(ds) - 2),
          |  i -> transform(sequence(i + 1, size(ds) - 1),
          |    j -> struct(least(ds[i], ds[j]) AS a,
          |                greatest(ds[i], ds[j]) AS b))))""".stripMargin))
        .as("p"))
      .select(col("p.a"), col("p.b")).distinct()
  }

  /** DuckDB twin of [[spanEdges]]: `staged`/`spans`/`edges` CTE text
    * (callers embed after `WITH`). MATERIALIZED matters: DuckDB
    * inlines a CTE per reference, and both consumers (x51's wedge +
    * closing joins, x56's per-iteration joins) reference these
    * repeatedly — without the hint the span self-join re-executes per
    * reference (x56's sf1 oracle: >300 s inlined, 12 s materialized,
    * identical rows). Replays [[SpanDfCap]]: spans shared by more
    * than `maxDf` docs make no edges, exactly the Spark side's
    * frequent-shingle drop. */
  private def duckSpanEdgesCte(w: Int, maxDf: Int = SpanDfCap): String =
    s"""staged AS MATERIALIZED (
              SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
            spans AS MATERIALIZED (
              SELECT DISTINCT doc_id,
                     md5(array_to_string(tk[i+1 : i+$w], ' ')) AS sh
              FROM staged,
                   unnest(range(0, GREATEST(len(tk) - ${w - 1}, 0))) AS u(i)),
            kept AS MATERIALIZED (
              SELECT sh FROM spans GROUP BY sh
              HAVING count(DISTINCT doc_id) BETWEEN 2 AND $maxDf),
            edges AS MATERIALIZED (
              SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
              FROM spans a
              JOIN kept k ON a.sh = k.sh
              JOIN spans b ON a.sh = b.sh AND a.doc_id < b.doc_id)"""

  private val x51 = GateQuery(
    "x51_triangle_count",
    (s, d) => {
      val edges = spanEdges(Tables.documents(s, d), TriW)
        .persist() // degree agg + orientation both consume it
      edges.count()
      // Degree orientation: point every edge from its lower-(deg, id)
      // endpoint to its higher one. Each triangle then has exactly one
      // vertex with both wedge edges outgoing (its min-key vertex), so
      // wedges are built ONLY at that vertex — Θ(Σ outdeg²) with
      // outdeg ≤ O(√m) instead of Θ(Σ deg²), which is what survives
      // hub vertices (template families are exactly that shape).
      val deg = edges.select(col("a").as("v"))
        .union(edges.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("dg"))
      val dir = edges
        .join(deg.select(col("v").as("a"), col("dg").as("da")), Seq("a"))
        .join(deg.select(col("v").as("b"), col("dg").as("db")), Seq("b"))
        .select(
          when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
            col("a")).otherwise(col("b")).as("src"),
          when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
            col("b")).otherwise(col("a")).as("dst"),
          when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
            col("db")).otherwise(col("da")).as("ddst"))
        // cached pre-partitioned on src: the wedge self-join keys
        // BOTH sides on src, so neither side re-shuffles (the same
        // cached-partitioning move as ConnectedComponents/PageRank);
        // only the closing join's (v, w) re-key pays an exchange
        .repartition(col("src"))
        .persist() // both wedge sides + the closing join consume it
      dir.count()
      // wedge at the pivot: two out-edges of src, canonically ordered
      // by the same (deg, id) key so each unordered pair appears once;
      // the closing edge v→w is then guaranteed to be oriented v→w.
      val wedges = dir
        .select(col("src"), col("dst").as("v"), col("ddst").as("dv"))
        .join(dir.select(col("src"), col("dst").as("w"), col("ddst").as("dw")),
          Seq("src"))
        .filter(struct(col("dv"), col("v")) < struct(col("dw"), col("w")))
      val tri = wedges
        .join(dir.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
        .select(col("src"), col("v"), col("w"))
      ordered(tri
        .select(explode(array(col("src"), col("v"), col("w"))).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_tri")))
    },
    Some(s"""WITH ${duckSpanEdgesCte(TriW)},
            wedges AS (
              SELECT e1.a, e1.b, e2.b AS c
              FROM edges e1 JOIN edges e2 ON e1.b = e2.a),
            tri AS (
              SELECT w.a, w.b, w.c
              FROM wedges w JOIN edges e ON w.a = e.a AND w.c = e.b),
            nodes AS (SELECT unnest([a, b, c]) AS doc_id FROM tri)
            SELECT doc_id, count(*) AS n_tri FROM nodes
            GROUP BY 1
            ORDER BY 1,2"""))

  // ---------------------------------------------------------------- x52
  // Salted skew join (ops.SaltedJoin): documents fact side joined to
  // a per-source dimension on `source` — a handful of distinct
  // sources means EVERY key is hot (the worst skew shape), so the
  // salt spreads each source over 8 shuffle partitions while the
  // tiny dim replicates 8×. Results are exactly the plain join's
  // (oracle = plain join); SaltedJoinSpec pins the equality across
  // salt counts and that the physical join keys carry the salt.
  private val JoinSalts = 8
  private val x52 = GateQuery(
    "x52_salted_join",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"))
      val dim = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("source_cnt"))
      ordered(graft.ops.SaltedJoin
        .join(docs, dim, "source", col("doc_id"), JoinSalts)
        .select(col("doc_id"), col("source"), col("source_cnt")))
    },
    Some("""SELECT d.doc_id, d.source, c.source_cnt
            FROM documents d
            JOIN (SELECT source, count(*) AS source_cnt
                  FROM documents GROUP BY 1) c USING (source)
            ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- x53
  // BPE encode: the x49-trained merge table APPLIED to the corpus —
  // per-document token counts before/after the R learned merges (the
  // compression the vocabulary buys). Training and application share
  // one loop (bpeRun); application is R chained per-row replaces
  // against the R broadcast winners — the corpus never shuffles, and
  // the only join is doc_id-keyed against the original counts.
  private val x53 = GateQuery(
    "x53_bpe_encode",
    (s, d) => bpeEncodeCounts(Tables.documents(s, d)),
    Some {
      val rounds = (1 to BpeRounds).map { i =>
        s"""p$i AS (
              SELECT a || chr(1) || b AS pair, count(*) AS cnt
              FROM (
                SELECT unnest(tk[1:len(tk)-1]) AS a, unnest(tk[2:len(tk)]) AS b
                FROM (SELECT string_split(seq, chr(1)) AS tk FROM s${i - 1}))
              GROUP BY 1),
            w$i AS (
              SELECT pair, cnt FROM p$i ORDER BY cnt DESC, pair LIMIT 1),
            s$i AS (
              SELECT doc_id,
                     replace(seq, w.pair, replace(w.pair, chr(1), '')) AS seq
              FROM s${i - 1}, w$i w)"""
      }.mkString(",\n")
      s"""WITH s0 AS (
            SELECT doc_id, replace(text, ' ', chr(1)) AS seq FROM documents),
          $rounds
          SELECT d.doc_id,
                 CAST(len(string_split(d.text, ' ')) AS BIGINT) AS tok_before,
                 CAST(len(string_split(s.seq, chr(1))) AS BIGINT) AS tok_after
          FROM documents d JOIN s$BpeRounds s USING (doc_id)
          ORDER BY 1,2,3"""
    })

  // ---------------------------------------------------------------- x54
  // Domain capping — the CCNet/RefinedWeb pipeline stage that bounds
  // any one domain's contribution to the training mix: per source,
  // keep only the CapK highest-quality documents (x16's score, doc_id
  // tie-break), every document labeled kept/dropped.
  //
  // Scale shape: exact per-key top-K via SALTED TWO-PHASE ranking —
  // a single `row_number over (partition by source)` window funnels
  // every hot domain's documents through one sorting partition (the
  // very skew domain capping exists to fight). Phase 1 ranks within
  // (source, salt) and keeps each salt's top CapK — the global top-K
  // is a subset of the union (at most K-1 docs outrank a global
  // winner anywhere, so it ranks ≤ K within its own salt). Phase 2
  // re-ranks the ≤ salts×CapK survivors per source — a bounded-size
  // window regardless of domain size. The salt count scales with the
  // cluster, like x52. The kept flag joins back doc_id-keyed; the
  // oracle replays the plain unsalted ranking (salt-invariant by the
  // subset lemma; DomainCapSpec pins it on a skewed fixture).
  private val CapK = 10
  private val CapSalts = 4
  private[graft] def domainCapped(docs: DataFrame, k: Int = CapK,
                                  salts: Int = CapSalts): DataFrame = {
    val scored = qualityScored(docs, carry = Seq("source"))
    val order = Seq(col("quality_score").desc, col("doc_id").asc)
    val w1 = Window.partitionBy(col("source"),
      pmod(col("doc_id"), lit(salts))).orderBy(order: _*)
    val cand = scored.withColumn("rn1", row_number().over(w1))
      .filter(col("rn1") <= k)
    val w2 = Window.partitionBy(col("source")).orderBy(order: _*)
    val kept = cand.withColumn("rn", row_number().over(w2))
      .filter(col("rn") <= k)
      .select(col("doc_id"), lit(true).as("kept"))
    scored.join(kept, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("source"), col("quality_score"),
        coalesce(col("kept"), lit(false)).as("kept"))
  }
  private val x54 = GateQuery(
    "x54_domain_cap",
    (s, d) => ordered(domainCapped(Tables.documents(s, d))),
    Some(s"""WITH $duckQualityCte,
          r AS (
            SELECT doc_id, source, quality_score,
                   row_number() OVER (
                     PARTITION BY source
                     ORDER BY quality_score DESC, doc_id) AS rn
            FROM qsc)
          SELECT doc_id, source, quality_score, rn <= $CapK AS kept
          FROM r ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- x55
  // Split-leakage audit: assign every document to train/test by a
  // deterministic CONTENT hash (md5 of text, mod 10: 8 train / 2
  // test — identical docs can never straddle a content-keyed split),
  // then surface the near-duplicate pairs that DO straddle it —
  // train docs whose bigram Jaccard against a test doc clears the
  // x14 threshold. This is the eval-contamination report a training
  // pipeline runs before shipping a split: x42 audits against an
  // external benchmark, x55 audits the split itself.
  //
  // Scale shape: x14's bigram MinHash-LSH family, but BIPARTITE and
  // all-shuffle — a random split's test side is corpus-proportional
  // (unlike x42's MB-sized benchmark), so NOTHING broadcasts here:
  // candidates come from a plain band-key equi-join of the two band
  // tables, and the verify joins are candidate-id-restricted
  // (the x14/x04 pattern) without hints — AQE size-gates.
  private val LeakThreshold = NgramThreshold
  private val x55 = GateQuery(
    "x55_split_leakage",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .repartition(col("doc_id")) // 1-split scan: spread the shingling
        .select(col("doc_id"),
          (pmod(hex32(md5(col("text"))), lit(10)) < 8).as("is_train"),
          bigramsExpr.as("bgs"))
        .persist()
      docs.count()
      def side(train: Boolean) = bandTableArr(
        docs.filter(if (train) col("is_train") else !col("is_train"))
          .select(col("doc_id").as("rep"), col("bgs").as("arr")), "b:")
      val joinCond = col("a.band") === col("b.band") &&
        (0 until BandRows).map(j => col(s"a.k$j") === col(s"b.k$j"))
          .reduce(_ && _)
      val cand = side(train = true).as("a")
        .join(side(train = false).as("b"), joinCond)
        .select(col("a.rep").as("train_id"), col("b.rep").as("test_id"))
        .distinct()
        .persist()
      cand.count()
      def candBgs(idCol: String, bgsCol: String) = docs
        .join(cand.select(col(idCol).as("doc_id")).distinct(), "doc_id")
        .select(col("doc_id").as(idCol), col("bgs").as(bgsCol))
      val inter = size(array_intersect(col("bgs_t"), col("bgs_e")))
      val jac = inter.cast("double") /
        (size(col("bgs_t")) + size(col("bgs_e")) - inter)
      ordered(cand
        .join(candBgs("train_id", "bgs_t"), "train_id")
        .join(candBgs("test_id", "bgs_e"), "test_id")
        .withColumn("jac", jac)
        .filter(col("jac") >= LeakThreshold)
        .select(col("train_id"), col("test_id"), col("jac")))
    },
    Some {
      val mhCols = (0 until NumMinhash).map { i =>
        s"MIN((h * ${mhA(i)} + ${mhB(i)}) % $Mod32) AS mh$i"
      }.mkString(", ")
      def bandSelects(src: String) = (0 until NumBands).map { b =>
        val ks = (0 until BandRows)
          .map(j => s"mh${BandRows * b + j} AS k$j").mkString(", ")
        s"SELECT rep, $b AS band, $ks FROM $src"
      }.mkString(" UNION ALL ")
      val joinKeys = "a.band = b.band AND " +
        (0 until BandRows).map(j => s"a.k$j = b.k$j").mkString(" AND ")
      s"""WITH sp AS (
             SELECT doc_id, string_split(text, ' ') AS tk,
                    ${duckHex32("md5(text)")} % 10 < 8 AS is_train
             FROM documents),
           dbg AS (SELECT doc_id, is_train, $duckBigrams AS bgs
                   FROM (SELECT doc_id, is_train, tk FROM sp)),
           bg_toks AS (SELECT doc_id, is_train, unnest(bgs) AS tok FROM dbg),
           th AS (SELECT doc_id AS rep, is_train,
                    ${duckHex32("md5('b:' || tok)")} AS h FROM bg_toks),
           tmh AS (SELECT rep, $mhCols FROM th WHERE is_train GROUP BY rep),
           emh AS (SELECT rep, $mhCols FROM th WHERE NOT is_train GROUP BY rep),
           tband AS (${bandSelects("tmh")}),
           eband AS (${bandSelects("emh")}),
           cand AS (
             SELECT DISTINCT a.rep AS train_id, b.rep AS test_id
             FROM tband a JOIN eband b ON $joinKeys)
          SELECT c.train_id, c.test_id,
            CAST(len(list_intersect(t.bgs, e.bgs)) AS DOUBLE) /
              (len(t.bgs) + len(e.bgs) - len(list_intersect(t.bgs, e.bgs))) AS jac
          FROM cand c
          JOIN dbg t ON t.doc_id = c.train_id
          JOIN dbg e ON e.doc_id = c.test_id
          WHERE CAST(len(list_intersect(t.bgs, e.bgs)) AS DOUBLE) /
              (len(t.bgs) + len(e.bgs) - len(list_intersect(t.bgs, e.bgs))) >= $LeakThreshold
          ORDER BY 1,2,3"""
    })

  // ---------------------------------------------------------------- x56
  // PageRank over the span-sharing document graph — the canonical
  // iterative-propagation workload, completing the graph-diagnostic
  // trio: x30 = reachability (which docs are transitively connected),
  // x51 = local density (template families vs chance collisions),
  // x56 = CENTRALITY (which docs sit at the core of a duplication
  // family — the doc a curation pipeline keeps as the family's
  // representative, or down-weights as boilerplate nexus).
  //
  // INTEGER fixed-point arithmetic throughout (scale 10^6, floor
  // division): rank sums are order-independent and bit-identical
  // across engines — no float-summation nondeterminism — so the gate
  // hash-matches a DuckDB replay of the same recurrence:
  //   r_0(v)     = S
  //   r_{t+1}(v) = floor(S·15/100)
  //              + Σ_{u∈N(v)} floor(r_t(u)·85 / (100·deg(u)))
  //
  // Scale shape: classic Pregel-on-relations — per iteration ONE
  // equi-join of the degree-annotated directed edge list (persisted
  // once, reused all rounds) against the current rank table, ONE
  // hash-agg by destination (map-side partial sums). No adjacency
  // lists as rows (hub-safe, x41's bounded-shard argument), no
  // driver-side state; 10 fixed iterations = 10 chained shuffles
  // executed in one action. At 100 TB: edges partition by src, ranks
  // by v — co-partitioned joins all the way down.
  private val PrIters = graft.ops.PageRank.DefaultIters
  private val PrScale = graft.ops.PageRank.DefaultScale
  private val PrBase = PrScale * 15 / 100

  private val x56 = GateQuery(
    "x56_pagerank",
    (s, d) => {
      val edges = spanEdges(Tables.documents(s, d), TriW).persist()
      edges.count()
      ordered(graft.ops.PageRank.run(edges)
        .select(col("id").as("doc_id"), col("pr")))
    },
    Some {
      val iterCtes = (1 to PrIters).map { t =>
        s"""r$t AS (
              SELECT d.dst AS v,
                     CAST($PrBase + sum((r.r * 85) // (100 * g.dg)) AS BIGINT) AS r
              FROM dir d JOIN r${t - 1} r ON d.src = r.v
                         JOIN deg g ON d.src = g.src
              GROUP BY 1)"""
      }.mkString(",\n            ")
      s"""WITH ${duckSpanEdgesCte(TriW)},
            dir AS MATERIALIZED (
                    SELECT a AS src, b AS dst FROM edges
                    UNION ALL SELECT b AS src, a AS dst FROM edges),
            deg AS MATERIALIZED (
                    SELECT src, CAST(count(*) AS BIGINT) AS dg
                    FROM dir GROUP BY 1),
            r0 AS (SELECT src AS v, CAST($PrScale AS BIGINT) AS r FROM deg),
            $iterCtes
          SELECT v AS doc_id, r AS pr FROM r$PrIters ORDER BY 1,2"""
    })

  // ---------------------------------------------------------------- x57
  // Retention cohorts over the events stream: users grouped by
  // first-seen week, distinct actives counted per subsequent week
  // offset — the standard product-analytics retention triangle, and
  // (for a training pipeline) the freshness/engagement profile of a
  // crawl source. Weeks are date_trunc('week') Mondays in both
  // engines; offsets are exact integer multiples of 7 days, emitted
  // as BIGINT; week labels emitted as yyyy-MM-dd strings so neither
  // engine's date/timestamp rendering enters the hash.
  //
  // Scale shape: two shuffles — min(ts) by user (map-side partial
  // min), then distinct-count by (cohort, offset) over rows already
  // reduced to (user, cohort, offset).distinct — no window sort, no
  // per-user event ordering.
  private val x57 = GateQuery(
    "x57_retention_cohorts",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"))
      val firstSeen = ev.groupBy(col("user_id"))
        .agg(min(col("ts")).as("first_ts"))
      ordered(ev.join(firstSeen, Seq("user_id"))
        .select(col("user_id"),
          date_trunc("week", col("first_ts")).as("cw"),
          date_trunc("week", col("ts")).as("aw"))
        .select(col("user_id"),
          date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
          expr("CAST(datediff(aw, cw) div 7 AS BIGINT)").as("week_offset"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users")))
    },
    Some("""WITH fs AS (
              SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1),
            act AS (
              SELECT e.user_id,
                     date_trunc('week', f.first_ts) AS cw,
                     date_trunc('week', e.ts) AS aw
              FROM events e JOIN fs f ON e.user_id = f.user_id)
            SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
                   CAST(date_diff('day', cw, aw) // 7 AS BIGINT) AS week_offset,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM act GROUP BY 1,2 ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- x58
  // Ordered funnel over the events stream: how many users performed
  // view, then click strictly after it, then purchase strictly after
  // that — the classic conversion funnel, computed by min-timestamp
  // CHAINING (step t's earliest qualifying time feeds step t+1's
  // strictly-after filter) rather than per-user event sorting.
  //
  // Scale shape: one groupBy per step on user_id (map-side partial
  // min) + one equi-join per step against the previous step's
  // (user, t) table — no window sort over the event log, no
  // sessionized state. At 100 TB the step tables are user-cardinality
  // (≪ event-cardinality) and every join is user-keyed.
  private val FunnelSteps = Seq("view", "click", "purchase")
  private val x58 = GateQuery(
    "x58_funnel",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"))
      def step(prev: Option[DataFrame], name: String): DataFrame = {
        val base = ev.filter(col("event_type") === name)
        prev match {
          case None => base.groupBy(col("user_id"))
            .agg(min(col("ts")).as("t"))
          case Some(p) => base
            .join(p.select(col("user_id"), col("t").as("pt")), Seq("user_id"))
            .filter(col("ts") > col("pt"))
            .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
        }
      }
      val s1 = step(None, FunnelSteps(0))
      val s2 = step(Some(s1), FunnelSteps(1))
      val s3 = step(Some(s2), FunnelSteps(2))
      def cnt(df: DataFrame, i: Int): DataFrame =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("step"),
            lit(FunnelSteps(i)).as("step_name"), col("n_users"))
      ordered(cnt(s1, 0).union(cnt(s2, 1)).union(cnt(s3, 2)))
    },
    Some(s"""WITH s1 AS (
              SELECT user_id, min(ts) AS t FROM events
              WHERE event_type = '${FunnelSteps(0)}' GROUP BY 1),
            s2 AS (
              SELECT e.user_id, min(e.ts) AS t
              FROM events e JOIN s1 ON e.user_id = s1.user_id
              WHERE e.event_type = '${FunnelSteps(1)}' AND e.ts > s1.t
              GROUP BY 1),
            s3 AS (
              SELECT e.user_id, min(e.ts) AS t
              FROM events e JOIN s2 ON e.user_id = s2.user_id
              WHERE e.event_type = '${FunnelSteps(2)}' AND e.ts > s2.t
              GROUP BY 1)
            SELECT * FROM (
              SELECT CAST(1 AS INT) AS step, '${FunnelSteps(0)}' AS step_name,
                     CAST(count(*) AS BIGINT) AS n_users FROM s1
              UNION ALL SELECT CAST(2 AS INT), '${FunnelSteps(1)}',
                     CAST(count(*) AS BIGINT) FROM s2
              UNION ALL SELECT CAST(3 AS INT), '${FunnelSteps(2)}',
                     CAST(count(*) AS BIGINT) FROM s3)
            ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- x59
  // SCD2 history build: the changelog's OTHER materialization. x50
  // compacts to latest-state-wins; x59 builds the full slowly-
  // changing-dimension type-2 history — one row per STATE CHANGE with
  // [valid_from, valid_to) interval and an is_current flag — the
  // lakehouse dimension-table shape every warehouse downstream of a
  // CDC feed maintains. Consecutive identical states collapse (a
  // repeated reading is not a change).
  //
  // Scale shape: one hash shuffle on the entity key + in-partition
  // sort, two window passes over the SAME partitioning (lag to
  // detect changes, lead over the changes to close intervals) — no
  // self-join, no per-entity collect. Timestamps emitted as
  // microsecond strings (the q18 parity pattern) and the open
  // interval as a sentinel, so no NULL ever reaches the output.
  private[graft] val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  private val DuckTsFmt = "%Y-%m-%d %H:%M:%S.%f"
  private[graft] val OpenEnd = "9999-12-31 00:00:00.000000"
  private val x59 = GateQuery(
    "x59_scd2_history",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val changes = Tables.events(s, d)
        .select(col("user_id"), col("event_type").as("state"),
          col("ts"), col("event_id"))
        .withColumn("prev", lag(col("state"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("state"))
      val w2 = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      ordered(changes
        .withColumn("nxt", lead(col("ts"), 1).over(w2))
        .select(col("user_id"), col("event_id"), col("state"),
          date_format(col("ts"), TsFmt).as("valid_from"),
          coalesce(date_format(col("nxt"), TsFmt), lit(OpenEnd))
            .as("valid_to"),
          col("nxt").isNull.as("is_current")))
    },
    Some(s"""WITH seq AS (
              SELECT user_id, event_type AS state, ts, event_id,
                     lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events),
            chg AS (
              SELECT user_id, state, ts, event_id FROM seq
              WHERE prev IS NULL OR prev <> state)
            SELECT user_id, event_id, state,
                   strftime(ts, '$DuckTsFmt') AS valid_from,
                   coalesce(strftime(lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id),
                     '$DuckTsFmt'), '$OpenEnd') AS valid_to,
                   lead(ts) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                     AS is_current
            FROM chg ORDER BY 1,2,3,4,5,6"""))

  // ---------------------------------------------------------------- x60
  // Deterministic weighted sampling (priority sampling): select K
  // docs where selection probability rises with quality — the
  // training-mix move between uniform sampling (x25) and hard
  // capping (x54). Priority = hash/weight (Duffield-style priority
  // sampling with a content hash standing in for the uniform draw):
  // reproducible on any cluster, no RNG state, and a doc's fate is a
  // pure function of its content + weight. IEEE double division of
  // exact integers is bit-specified, so even the float priority
  // hash-matches the oracle.
  //
  // Scale shape: per-row score + ONE global top-K
  // (TakeOrderedAndProject: map-side partial top-K per partition, K
  // rows to the driver stage — never a full sort of the corpus).
  private val PrioK = 100
  private val x60 = GateQuery(
    "x60_weighted_sample",
    (s, d) => {
      val scored = qualityScored(Tables.documents(s, d), carry = Seq("text"))
      val prio = hex32(md5(col("text"))).cast("double") /
        (col("quality_score") + 1).cast("double")
      ordered(scored
        .withColumn("prio", prio)
        .orderBy(col("prio"), col("doc_id"))
        .limit(PrioK)
        .select(col("doc_id"), col("quality_score"), col("prio")))
    },
    Some(s"""WITH $duckQualityCte,
            pr AS (
              SELECT q.doc_id, q.quality_score,
                     CAST(${duckHex32("md5(d.text)")} AS DOUBLE) /
                       (q.quality_score + 1) AS prio
              FROM qsc q JOIN documents d ON q.doc_id = d.doc_id)
            SELECT * FROM (
              SELECT doc_id, quality_score, prio FROM pr
              ORDER BY prio, doc_id LIMIT $PrioK)
            ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- x61
  // Source-overlap matrix: pairwise exact bigram Jaccard between
  // SOURCES — the corpus-diversity report a curation pipeline reads
  // before weighting a mix (two crawls of the same registry look
  // independent at the doc level until their vocabularies turn out
  // 90% shared). Doc-granularity overlap is x14/x55's job; this is
  // the registry-level rollup.
  //
  // Scale shape: (source, bigram) DISTINCT pairs (vocab × sources
  // rows — document text collapses to per-source vocabularies
  // first), then a bigram-keyed self-join whose output is bounded by
  // |sources|² per bigram. EXACT is the right tool for a bounded
  // source registry (language × curated-crawl, hundreds); for
  // open-domain keys (millions of hosts) the move is per-key HLL
  // sketches + inclusion-exclusion — implemented as
  // [[graft.ops.SketchOverlap]] and gated at x63 — or doc-level LSH
  // (x04). Quadratic-in-sources exactness is priced for registries,
  // and that bound is the documented contract.
  private val x61 = GateQuery(
    "x61_source_overlap",
    (s, d) => {
      val st = Tables.documents(s, d)
        .select(col("source"), explode(bigramsExpr).as("tok"))
        .distinct()
        .persist() // sizes agg + pair self-join both consume it
      st.count()
      val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val pairs = st.as("a")
        .join(st.as("b"), col("a.tok") === col("b.tok") &&
          col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("inter"))
      ordered(pairs
        .join(sizes.select(col("source").as("src_a"), col("n").as("na")),
          Seq("src_a"))
        .join(sizes.select(col("source").as("src_b"), col("n").as("nb")),
          Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("inter"),
          (col("inter").cast("double") /
            (col("na") + col("nb") - col("inter"))).as("jaccard")))
    },
    Some(s"""WITH staged AS (
              SELECT source, string_split(text, ' ') AS tk FROM documents),
            st AS MATERIALIZED (
              SELECT DISTINCT source, tok
              FROM (SELECT source, unnest($duckBigrams) AS tok FROM staged)),
            sizes AS (SELECT source, count(*) AS n FROM st GROUP BY 1),
            pairs AS (
              SELECT a.source AS src_a, b.source AS src_b,
                     CAST(count(*) AS BIGINT) AS inter
              FROM st a JOIN st b
                ON a.tok = b.tok AND a.source < b.source
              GROUP BY 1, 2)
            SELECT p.src_a, p.src_b, p.inter,
                   CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) AS jaccard
            FROM pairs p
            JOIN sizes sa ON sa.source = p.src_a
            JOIN sizes sb ON sb.source = p.src_b
            ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- x63
  // Source overlap, OPEN-DOMAIN path (ops.SketchOverlap): per-source
  // HLL distinct sketches + inclusion-exclusion — the documented x61
  // alternative for unbounded key universes, now a real operator.
  // The corpus collapses to one mergeable KB sketch row per source
  // (no token-universe distinct shuffle); every pair estimate then
  // touches sketches only. Sketch estimates are engine-specific, so
  // the gate pins the ERROR BOUND against the exact x61 rollup it
  // can check (the x18 pattern): relative intersection error ≤ 0.10
  // and absolute Jaccard error ≤ 0.08 — 3× the observed maxima
  // (X63Probe: 3.6%/0.030 at sf0.01, 2.2%/0.030 at sf0.1; HLL lgK=12
  // ≈ 1.6% RSD per estimate).
  private val x63 = GateQuery(
    "x63_overlap_hll",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("source"), explode(bigramsExpr).as("tok"))
      val sk = graft.ops.SketchOverlap.keySketches(toks, "source", "tok")
      val est = graft.ops.SketchOverlap.overlapMatrix(sk)
        .select(col("key_a").as("src_a"), col("key_b").as("src_b"),
          col("est_inter"), col("est_jaccard"))
      // exact rollup (x61's shape) — the pin
      val st = toks.distinct().persist()
      st.count()
      val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val exact = st.as("a")
        .join(st.as("b"), col("a.tok") === col("b.tok") &&
          col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("source").as("src_a"), col("n").as("na")),
          Seq("src_a"))
        .join(sizes.select(col("source").as("src_b"), col("n").as("nb")),
          Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("inter"),
          (col("inter").cast("double") /
            (col("na") + col("nb") - col("inter"))).as("jaccard"))
      ordered(exact.join(est, Seq("src_a", "src_b"))
        .select(col("src_a"), col("src_b"), col("inter"), col("jaccard"),
          (abs(col("est_inter") - col("inter")).cast("double") /
            col("inter") <= 0.10).as("inter_ok"),
          (abs(col("est_jaccard") - col("jaccard")) <= 0.08).as("jac_ok")))
    },
    Some(s"""WITH staged AS (
              SELECT source, string_split(text, ' ') AS tk FROM documents),
            st AS MATERIALIZED (
              SELECT DISTINCT source, tok
              FROM (SELECT source, unnest($duckBigrams) AS tok FROM staged)),
            sizes AS (SELECT source, count(*) AS n FROM st GROUP BY 1),
            pairs AS (
              SELECT a.source AS src_a, b.source AS src_b,
                     CAST(count(*) AS BIGINT) AS inter
              FROM st a JOIN st b
                ON a.tok = b.tok AND a.source < b.source
              GROUP BY 1, 2)
            SELECT p.src_a, p.src_b, p.inter,
                   CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) AS jaccard,
                   TRUE AS inter_ok, TRUE AS jac_ok
            FROM pairs p
            JOIN sizes sa ON sa.source = p.src_a
            JOIN sizes sb ON sb.source = p.src_b
            ORDER BY 1,2,3,4,5,6"""))

  // ---------------------------------------------------------------- x64
  // REAL audio decode in the gate (the x37 pattern for the second
  // modality): every document gets a deterministic synthetic 16-bit
  // PCM mono WAV keyed by doc_id, encoded AND decoded with the actual
  // javax.sound.sampled codec (graft.multimodal.Media). PCM is
  // lossless, so the decoded frame count and exact integer sample sum
  // have a closed form the DuckDB oracle recomputes directly — a fake
  // or lossy decode cannot hash-match. Scale shape: pure per-row
  // mapPartitions work after a narrow repartition (codec never sees a
  // shuffle), identical to x37's.
  private val x64 = GateQuery(
    "x64_audio_decode",
    (s, d) => {
      import s.implicits._
      val decoded = Tables.documents(s, d).select(col("doc_id")).as[Long]
        .repartition(graft.Knobs.codecParts(Tables.documents(s, d).count()))
        .map { id =>
          val n = 64 + (id % 33).toInt
          val samples = Array.tabulate(n)(i =>
            (((id * 7 + i.toLong * 13) % 65536) - 32768).toShort)
          val wav = graft.multimodal.Media.encodeWav(samples, 8000)
          val dec = graft.multimodal.Media.decodeWav(wav).get
          (id, dec.channels.toLong, dec.sampleRate.toLong, dec.frames,
            dec.channelSums(0))
        }
        .toDF("doc_id", "channels", "sample_rate", "n_frames", "sample_sum")
      ordered(decoded)
    },
    Some("""WITH dims AS (
              SELECT doc_id, 64 + doc_id % 33 AS n FROM documents)
            SELECT d.doc_id, CAST(1 AS BIGINT) AS channels,
                   CAST(8000 AS BIGINT) AS sample_rate,
                   CAST(d.n AS BIGINT) AS n_frames,
                   CAST(sum((d.doc_id * 7 + u.i * 13) % 65536 - 32768)
                     AS BIGINT) AS sample_sum
            FROM dims d, unnest(range(d.n)) AS u(i)
            GROUP BY 1, 2, 3, 4
            ORDER BY 1,2,3,4,5"""))

  // ---------------------------------------------------------------- x67
  // Label-propagation communities (ops.LabelPropagation) over the
  // span-sharing graph — the graph quartet's fourth diagnostic: x30
  // reachability, x51 density, x56 centrality, x67 COMMUNITIES (dense
  // template families, split even when a chance collision bridges
  // them into one component). Deterministic synchronous LPA: new
  // label = most frequent neighbor label, ties to the smallest — an
  // integer recurrence with a total order, replayed exactly by the
  // oracle's unrolled per-round CTEs (the x56 pattern: count CTE +
  // row_number argmax per round).
  private val LpaIters = graft.ops.LabelPropagation.DefaultIters

  private val x67 = GateQuery(
    "x67_label_prop",
    (s, d) => {
      val edges = spanEdges(Tables.documents(s, d), TriW).persist()
      edges.count()
      ordered(graft.ops.LabelPropagation.run(edges, LpaIters)
        .select(col("id").as("doc_id"), col("community")))
    },
    Some {
      val iterCtes = (1 to LpaIters).map { t =>
        s"""c$t AS (
              SELECT d.dst AS v, r.lbl, count(*) AS c
              FROM dir d JOIN r${t - 1} r ON d.src = r.v
              GROUP BY 1, 2),
            r$t AS (
              SELECT v, lbl FROM (
                SELECT v, lbl,
                       row_number() OVER (
                         PARTITION BY v ORDER BY c DESC, lbl) AS rn
                FROM c$t)
              WHERE rn = 1)"""
      }.mkString(",\n            ")
      s"""WITH ${duckSpanEdgesCte(TriW)},
            dir AS MATERIALIZED (
                    SELECT a AS src, b AS dst FROM edges
                    UNION ALL SELECT b AS src, a AS dst FROM edges),
            r0 AS (SELECT DISTINCT src AS v, src AS lbl FROM dir),
            $iterCtes
          SELECT v AS doc_id, lbl AS community FROM r$LpaIters
          ORDER BY 1,2"""
    })

  // ---------------------------------------------------------------- x68
  // Bigram-LM surprisal scoring — the CCNet/Gopher "perplexity
  // filter" step: train add-V-smoothed bigram conditional counts on
  // the corpus itself, score every document by its mean per-bigram
  // surprisal, flag outliers. Real perplexity is a geometric mean
  // (transcendental log + order-dependent float sums — unhashable
  // across engines), so the score is INTEGER WHOLE-BIT surprisal:
  //   bits(w1 w2) = floor(log2((c(w1·)+V) / (c(w1,w2)+1)))
  // computed by [[wholeBitLog2Sql]] — decimal(38,0) operands, a
  // direction-split quotient bounded under 2^63, so pure integer
  // arithmetic with headroom for counts up to 2^63−1 — order-free
  // integer sums per doc, ONE final IEEE division for the mean
  // (bit-specified on both engines). Scale shape: one explode pass,
  // a per-(doc,bigram) tf pre-aggregation that caps every later join
  // at distinct-bigrams-per-doc rows (a 100 TB stopword bigram joins
  // once per containing DOC, not once per occurrence); the two count
  // tables are vocabulary-sized, joined hash-to-hash (no corpus
  // broadcast); V is a 1-row broadcast. The tf table is persisted
  // REPARTITIONED ON bg (the round-8 cached-partitioning move), so
  // the c_bg rollup and the bg-keyed join both reuse the cached
  // HashPartitioning with no further exchange.
  /** Exact whole-bit log ratio: floor(log2(num/den)) clamped at −20,
    * as SQL text over two non-negative integer-valued expressions
    * (both >= 1). Shared scorer of x68 (surprisal) and x77 (PMI).
    *
    * Overflow-proof by construction: callers pass DECIMAL(38,0)
    * expressions — a long×long product always fits (2^126 < 10^38) —
    * and the quotient is taken in whichever direction makes it >= 1,
    * so it is bounded by the ratio itself; both gates' ratios are
    * bounded by the corpus total N < 2^63 (num/den = N·c_ab/(c_a·c_b)
    * <= N/c_ab and den/num <= (c_a/N)·(c_b/c_ab)·N <= N), so the
    * `div`-to-long never wraps even at counts of 2^63−1
    * (X77OverflowSpec drives that boundary). Provably equal to the
    * round-8 fixed-point form bitlen(num·2^20 div den) − 21 wherever
    * that one's scaled product stayed inside a long: for num >= den,
    * bitlen(num div den) − 1 = floor(log2(num/den)) (flooring cannot
    * cross an integral power of two); for num < den, the −20-clamped
    * −bitlen((den−1) div num) = −ceil(log2(den/num)) via
    * ceil(log2(x)) = bitlen(ceil(x)−1). */
  private[graft] def wholeBitLog2Sql(num: String, den: String): String =
    s"""cast(if(($num) >= ($den),
       length(conv(($num) div ($den), 10, 2)) - 1,
       greatest(-20, -length(conv((($den) - 1) div ($num), 10, 2))))
       as bigint)"""

  /** DuckDB twin of [[wholeBitLog2Sql]]: HUGEINT expressions in, the
    * same direction-split bitlength out (format('{:b}') is the
    * BIGINT-only binary formatter, reached only after the
    * quotient-fits-long argument above). */
  private def duckWholeBitLog2(num: String, den: String): String =
    s"""CAST(CASE WHEN ($num) >= ($den)
       THEN length(format('{:b}', CAST(($num) // ($den) AS BIGINT))) - 1
       ELSE greatest(-20, -length(format('{:b}',
         CAST((($den) - 1) // ($num) AS BIGINT))))
       END AS BIGINT)"""

  private val LmMaxBits = 4.5 // ~p99 of the corpus mean (measured sf0.01)

  /** x68's engine, parameterized for fixtures: (doc_id, text) rows in,
    * (doc_id, n_bg, bits_sum, avg_bits, flagged) out. X68LmSpec pins
    * the whole-bit arithmetic on a hand-computed corpus. */
  private[graft] def lmSurprisal(docs: DataFrame): DataFrame =
    ordered(lmDocBits(docs)
      .select(col("doc_id"), col("n_bg"), col("bits_sum"),
        (col("bits_sum").cast("double") / col("n_bg")).as("avg_bits"),
        (col("bits_sum").cast("double") / col("n_bg") > LmMaxBits)
          .as("flagged")))

  /** The unordered per-doc core of [[lmSurprisal]]: (doc_id, n_bg,
    * bits_sum) whole-bit surprisal totals. Shared with x87's CCNet
    * bucket assignment. */
  private[graft] def lmDocBits(docs: DataFrame): DataFrame = {
      val tk = docs
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
      val pos = tk.select(col("doc_id"),
        explode(zip_with(
          slice(col("tk"), lit(1), size(col("tk")) - 1),
          slice(col("tk"), lit(2), size(col("tk")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("bg"))
      val docBg = pos.groupBy(col("doc_id"), col("bg"))
        .agg(count(lit(1)).as("tf"))
        .repartition(col("bg"))
        .persist()
      docBg.count() // three consumers below; materialize once
      val cBg = docBg.groupBy(col("bg")).agg(sum(col("tf")).as("c_bg"))
      val cW1 = docBg
        .select(split(col("bg"), " ").getItem(0).as("w1"), col("tf"))
        .groupBy(col("w1")).agg(sum(col("tf")).as("c_w1"))
      val vCtx = cW1.agg(count(lit(1)).as("v_ctx"))
      // Round-16 NEGATIVE A/B (tools/R16AbProbe "lm"): scoring a
      // per-BIGRAM (bg, bits) table (the [[lmBigramBits]] shape) and
      // attaching it with one bg join — "scorer runs per distinct
      // bigram, one fewer corpus-side join" on paper — measured
      // SLOWER at sf0.1 (1.50 vs 1.46 min-of-3) AND at sf1 (7.81 vs
      // 6.86): on this corpus distinct bigrams ≈ (doc,bigram) rows,
      // so the per-bigram saving is nil while the bits table's w1
      // exchange is additive; the count tables broadcast at any SF
      // measured, so the "second corpus-side join" costs one probe,
      // not an exchange. The per-row form stays.
      val scored = docBg
        .withColumn("w1", split(col("bg"), " ").getItem(0))
        .join(cBg, "bg")
        .join(cW1, "w1")
        .crossJoin(broadcast(vCtx))
        .withColumn("bits", expr(wholeBitLog2Sql(
          "cast(c_w1 as decimal(38,0)) + v_ctx",
          "cast(c_bg as decimal(38,0)) + 1")))
      scored.groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_bg"),
          sum(col("tf") * col("bits")).as("bits_sum"))
  }

  /** Oracle twin of [[lmDocBits]]: CTE chain ending in
    * `lm(doc_id, n_bg, bits_sum)`. Shared by x68 and x87. */
  private def duckLmCtes: String =
    s"""tk AS (
              SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
            bgl AS (
              SELECT doc_id,
                     unnest([tk[i] || ' ' || tk[i+1]
                             FOR i IN range(1, len(tk))]) AS bg
              FROM tk),
            db AS MATERIALIZED (
              SELECT doc_id, bg, count(*) AS tf FROM bgl GROUP BY 1, 2),
            cb AS (
              SELECT bg, CAST(sum(tf) AS BIGINT) AS c_bg FROM db GROUP BY 1),
            cw AS (
              SELECT string_split(bg, ' ')[1] AS w1,
                     CAST(sum(tf) AS BIGINT) AS c_w1
              FROM db GROUP BY 1),
            v AS (SELECT count(*) AS v_ctx FROM cw),
            sc AS (
              SELECT d.doc_id, d.tf,
                     ${duckWholeBitLog2("CAST(c.c_w1 AS HUGEINT) + v.v_ctx",
                       "CAST(b.c_bg AS HUGEINT) + 1")} AS bits
              FROM db d
              JOIN cb b ON b.bg = d.bg
              JOIN cw c ON c.w1 = string_split(d.bg, ' ')[1]
              CROSS JOIN v),
            lm AS (
              SELECT doc_id,
                     CAST(sum(tf) AS BIGINT) AS n_bg,
                     CAST(sum(tf * bits) AS BIGINT) AS bits_sum
              FROM sc GROUP BY 1)"""

  private val x68 = GateQuery(
    "x68_lm_surprisal",
    (s, d) => lmSurprisal(Tables.documents(s, d)),
    Some(s"""WITH $duckLmCtes
            SELECT doc_id, n_bg, bits_sum,
                   CAST(bits_sum AS DOUBLE) / n_bg AS avg_bits,
                   CAST(bits_sum AS DOUBLE) / n_bg > $LmMaxBits AS flagged
            FROM lm ORDER BY 1,2,3,4,5"""))

  // ---------------------------------------------------------------- x69
  // CONTAINMENT decontamination (bipartite, benchmark → corpus):
  // corpus docs holding >= t of a benchmark doc's token SET —
  // C(A→B) = |A∩B|/|A| with A the benchmark side. The ASYMMETRIC
  // contamination shape both n-gram overlap (x24) and bipartite
  // near-dup (x42) structurally miss: a benchmark question quoted
  // inside a much LARGER training doc has high containment but tiny
  // Jaccard (the container's size dominates the union), so a
  // symmetric threshold never fires. The full containment SELF-join
  // is deliberately not offered as an operator: on template-heavy
  // corpora its truth is pair-quadratic inside families (measured
  // ~27M qualifying pairs at sf1 on this corpus) — the pipeline-real
  // form is benchmark-bounded, exactly x42's contract.
  //
  // Prefix lemma, containment form: C(A→B) >= t needs |A∩B| >= α =
  // ceil(t·|A|), so at most |A| − α of A's tokens miss B — A must
  // share a token with B within its first |A| − α + 1 tokens in the
  // global CORPUS-df rare-first order. The match can sit ANYWHERE in
  // B, so candidates join A-prefix tokens against B's full token
  // list — lossless; benchmark tokens absent from the corpus get
  // df 0 and sort first, which is also lossless (a prefix of
  // corpus-absent tokens proves |A ∩ corpus vocab| < α — no B can
  // qualify). Scale shape: the benchmark prefix table is tiny and
  // BROADCASTS (the x42 move — the corpus streams map-side, nothing
  // shuffles with corpus cardinality); candidate volume is
  // Σ_prefix-token df, bounded because prefixes hold each set's
  // RAREST corpus tokens; the exact verify touches candidates only.
  private val CtThreshold = 0.9
  /** x69's engine, parameterized for lemma-soundness fixtures:
    * `bench` rows (bench_id, toks_a), `corp` rows (rep, toks_b) —
    * ordered containment pairs with C(A→B) >= thr out. Lossless by
    * the containment-form prefix lemma (see the x69 comment);
    * X69ContainmentSpec fuzzes it against brute force across
    * thresholds, including the corpus-absent-token and exact-boundary
    * cases. Persists both inputs (each feeds several join sides). */
  private[graft] def containmentJoin(bench: DataFrame, corp: DataFrame,
                                     thr: Double): DataFrame = {
    val b = bench.persist()
    b.count() // ordering + verify consume it
    val c = corp.persist()
    c.count() // df + candidate + verify consume it
    val corpTok = c.select(col("rep"),
      size(col("toks_b")).cast("long").as("n_b"),
      explode(col("toks_b")).as("tok"))
    val dfTab = corpTok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val benchOrd = b
      .select(col("bench_id"), explode(col("toks_a")).as("tok"))
      .join(dfTab, Seq("tok"), "left_outer")
      .na.fill(0L, Seq("df"))
      .groupBy(col("bench_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("df"), col("tok")))),
        e => e.getField("tok")).as("otoks"))
      .withColumn("n_a", size(col("otoks")).cast("long"))
      .withColumn("plen",
        (col("n_a") - ceil(col("n_a") * lit(thr) - lit(1e-9)) + 1).cast("int"))
    val pref = benchOrd.select(col("bench_id"), col("n_a"),
      explode(expr("slice(otoks, 1, plen)")).as("tok"))
    // epsilon inside ceil: a float product landing a hair above an
    // integer must not EXCLUDE an admissible pair (over-admission
    // is harmless, the verify is exact)
    val cand = corpTok.join(broadcast(pref), Seq("tok"))
      .filter(col("n_b") >= ceil(col("n_a") * lit(thr) - lit(1e-9)))
      .select(col("bench_id"), col("rep")).distinct()
    ordered(cand
      .join(broadcast(b), "bench_id").join(c, "rep")
      .withColumn("n_a", size(col("toks_a")).cast("long"))
      .withColumn("inter",
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("long"))
      .withColumn("cont", col("inter").cast("double") / col("n_a"))
      .filter(col("cont") >= thr)
      .select(col("bench_id"), col("rep").as("rep_b"), col("n_a"),
        col("inter"), col("cont")))
  }

  private val x69 = GateQuery(
    "x69_decontam_containment",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val bench = docs.filter(col("doc_id") % BenchMod === 0)
        .select(col("doc_id").as("bench_id"), tokenSet(col("text")).as("toks_a"))
      val corp = tokenSetReps(docs.filter(col("doc_id") % BenchMod =!= 0))
        .select(col("rep"), col("toks").as("toks_b"))
      containmentJoin(bench, corp, CtThreshold)
    },
    // the pruning is LOSSLESS, so the oracle is the plain bipartite
    // all-pairs statement of the semantics — no construction replay
    Some(s"""WITH bench AS (
              SELECT doc_id AS bench_id,
                     list_sort(list_distinct(string_split(text, ' '))) AS toks_a
              FROM documents WHERE doc_id % $BenchMod = 0),
            sigs AS (
              SELECT min(doc_id) AS rep
              FROM documents WHERE doc_id % $BenchMod <> 0
              GROUP BY md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))),
            corp AS (
              SELECT s.rep, list_sort(list_distinct(string_split(d.text, ' '))) AS toks_b
              FROM sigs s JOIN documents d ON d.doc_id = s.rep)
            SELECT b.bench_id, c.rep AS rep_b,
              CAST(len(b.toks_a) AS BIGINT) AS n_a,
              CAST(len(list_intersect(b.toks_a, c.toks_b)) AS BIGINT) AS inter,
              CAST(len(list_intersect(b.toks_a, c.toks_b)) AS DOUBLE) /
                len(b.toks_a) AS cont
            FROM bench b CROSS JOIN corp c
            WHERE CAST(len(list_intersect(b.toks_a, c.toks_b)) AS DOUBLE) /
                len(b.toks_a) >= $CtThreshold
            ORDER BY 1,2,3,4,5"""))

  // ---------------------------------------------------------------- x70
  // First-occurrence novelty score: the fraction of a doc's distinct
  // bigrams whose GLOBAL first appearance (min doc_id — the corpus's
  // deterministic arrival order, x27's reproducibility stance) is
  // this doc. The marginal-contribution signal of data curation:
  // near-zero novelty means every shingle was already contributed by
  // earlier docs (the doc is template/boilerplate recombination —
  // droppable even when no single x14-style near-dup partner exists);
  // x26 measures repetition WITHIN a doc, x70 measures redundancy
  // AGAINST the corpus prefix. Scale shape: one shingling pass
  // (native TokenBigrams), one bigram-keyed min-agg, then one
  // doc-keyed count over the FIRST-OCCURRENCE table (vocabulary-
  // sized) — the novel count per doc needs no join back to the
  // corpus-sized explode: a doc's novel bigrams are exactly the rows
  // it owns in the min table. No corpus-sized broadcast, no window.
  /** x70's engine, parameterized for fixtures: (doc_id, text) rows
    * in, per-doc first-occurrence novelty out. Shared as the batch
    * reference by the noveltyStream agreement spec (X70 twin) and
    * pinned by hand in X70NoveltySpec. */
  private[graft] def noveltyScores(docs: DataFrame): DataFrame = {
      val base = docs
        .select(col("doc_id"), bigramsExpr.as("bgs"))
        .select(col("doc_id"), size(col("bgs")).cast("long").as("n_bg"),
          explode(col("bgs")).as("bg"))
        .persist()
      base.count() // first-occurrence agg + per-doc sizes consume it
      val novel = base.groupBy(col("bg")).agg(min(col("doc_id")).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("novel"))
      val dtab = base.groupBy(col("doc_id")).agg(max(col("n_bg")).as("n_bg"))
      ordered(dtab.join(novel, Seq("doc_id"), "left_outer")
        .na.fill(0L, Seq("novel"))
        .select(col("doc_id"), col("n_bg"), col("novel"),
          (col("novel").cast("double") / col("n_bg")).as("novelty"),
          (col("novel") === 0L).as("flagged")))
  }

  private val x70 = GateQuery(
    "x70_novelty",
    (s, d) => noveltyScores(Tables.documents(s, d)),
    Some(s"""WITH tk AS (
              SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
            b AS MATERIALIZED (
              SELECT doc_id,
                     CAST(len($duckBigrams) AS BIGINT) AS n_bg,
                     unnest($duckBigrams) AS bg
              FROM tk),
            f AS (SELECT bg, min(doc_id) AS doc_id FROM b GROUP BY 1),
            nc AS (SELECT doc_id, count(*) AS novel FROM f GROUP BY 1),
            dt AS (SELECT doc_id, max(n_bg) AS n_bg FROM b GROUP BY 1)
            SELECT dt.doc_id, dt.n_bg,
                   CAST(COALESCE(nc.novel, 0) AS BIGINT) AS novel,
                   CAST(COALESCE(nc.novel, 0) AS DOUBLE) / dt.n_bg AS novelty,
                   COALESCE(nc.novel, 0) = 0 AS flagged
            FROM dt LEFT JOIN nc ON nc.doc_id = dt.doc_id
            ORDER BY 1,2,3,4,5"""))

  // ---------------------------------------------------------------- x71
  // k-core peeling over the span graph — the fifth member of the
  // dedup-graph diagnostic suite (x30 reachability, x51 density, x56
  // centrality, x67 communities): the k-core is the maximal subgraph
  // where every doc keeps >= k span-sharing neighbors, the standard
  // "dense nucleus" extractor — a template family's core survives
  // peeling while chance-collision fringe docs (degree-1/2
  // attachments that inflate x62's reach) fall away. Engine, scale
  // shape, and the fixed-round determinism stance live in
  // [[graft.ops.KCore]]; the oracle unrolls the integer recurrence
  // as per-round MATERIALIZED CTEs (the x56 pattern).
  private val KcoreK = 3
  private val KcoreRounds = 4
  private val x71 = GateQuery(
    "x71_kcore",
    (s, d) => {
      // persist+count first: KCore's direction-doubling union reads
      // the edge list twice, and the span self-join must not build
      // twice inside the one materializing job (the x67 pattern)
      val edges = spanEdges(Tables.documents(s, d), TriW).persist()
      edges.count()
      // fixed-round semantics: a vertex that lost neighbors in the
      // LAST round may report deg < k — exactly what the oracle's
      // unrolled CTEs replay (see graft.ops.KCore)
      ordered(graft.ops.KCore.run(edges, KcoreK, KcoreRounds)
        .select(col("id").as("doc_id"), col("deg")))
    },
    Some {
      val rounds = (1 to KcoreRounds).map { r =>
        s"""a$r AS MATERIALIZED (
              SELECT d.src AS v FROM dir d
              JOIN a${r - 1} x ON d.src = x.v
              JOIN a${r - 1} y ON d.dst = y.v
              GROUP BY 1 HAVING count(*) >= $KcoreK)"""
      }.mkString(",\n            ")
      s"""WITH ${duckSpanEdgesCte(TriW)},
            dir AS MATERIALIZED (
                    SELECT a AS src, b AS dst FROM edges
                    UNION ALL SELECT b AS src, a AS dst FROM edges),
            a0 AS MATERIALIZED (SELECT DISTINCT src AS v FROM dir),
            $rounds
          SELECT d.src AS doc_id, CAST(count(*) AS BIGINT) AS deg
          FROM dir d
          JOIN a$KcoreRounds x ON d.src = x.v
          JOIN a$KcoreRounds y ON d.dst = y.v
          GROUP BY 1 ORDER BY 1,2"""
    })

  // ---------------------------------------------------------------- x72
  // Per-source signature terms — the domain-profiling report read
  // before weighting a training mix (x28) or capping a domain (x54):
  // for every source, the top-K terms by an integer distinctiveness
  // score tf·(n_sources − sdf + 1) (term frequency weighted by
  // cross-source rarity — the TF-IDF ranking signal without the
  // transcendental log, which is unhashable across engines). Exact
  // per-GROUP top-k at scale: a naive row_number over (source) sorts
  // each source's whole vocabulary in one partition, so the selection
  // runs TWO-LEVEL — a salted window (source, hash(term) % B) whose
  // partitions are vocab/B-bounded takes per-bucket top-K, then the
  // per-source window ranks only B·K survivors (constant-sized) —
  // lossless (per-bucket top-K is a superset of the global top-K
  // members in that bucket; the tie-break (score desc, term) is a
  // total order, so both engines pick identical rows). The oracle
  // states the direct one-window semantics; the salt is construction,
  // not meaning.
  private val SigTopK = 10
  private val SigSaltBuckets = 16

  /** x72's engine, parameterized for fixtures: (source, term) token
    * occurrence rows in, exact per-source top-k signature terms out.
    * X72TopKSpec pins the salted two-level selection's losslessness
    * against the direct one-window rank on tie-heavy data. */
  private[graft] def sourceSignatures(occ: DataFrame, k: Int,
                                      buckets: Int): DataFrame =
    signaturesFromTf(
      occ.groupBy(col("source"), col("term")).agg(count(lit(1)).as("tf")),
      k, buckets)

  /** x72's scoring half over an already-aggregated (source, term, tf)
    * table — the seam its streaming twin shares: the tf table is the
    * STATE (DocStreams.sourceTfStream maintains it as a streaming
    * aggregation), and sdf / n_src / the salted two-level top-k are
    * marginal-global rollups of that very table, so the stream scores
    * a complete-mode snapshot through this exact path (DocStreamsSpec
    * pins batch/stream equality on the real corpus). */
  private[graft] def signaturesFromTf(tf0: DataFrame, k: Int,
                                      buckets: Int): DataFrame = {
      val tf = tf0.persist()
      tf.count() // sdf + n_src + score join consume it
      val sdf = tf.groupBy(col("term")).agg(count(lit(1)).as("sdf"))
      val nSrc = tf.agg(countDistinct(col("source")).as("n_src"))
      val scored = tf.join(sdf, "term")
        .crossJoin(broadcast(nSrc))
        .withColumn("score", col("tf") * (col("n_src") - col("sdf") + 1))
        .withColumn("salt", pmod(hash(col("term")), lit(buckets)))
      val wBucket = Window.partitionBy(col("source"), col("salt"))
        .orderBy(col("score").desc, col("term"))
      val wSource = Window.partitionBy(col("source"))
        .orderBy(col("score").desc, col("term"))
      ordered(scored
        .withColumn("rn", row_number().over(wBucket))
        .filter(col("rn") <= k)
        .withColumn("rank", row_number().over(wSource))
        .filter(col("rank") <= k)
        .select(col("source"), col("term"), col("tf"),
          col("sdf"), col("score"), col("rank").cast("long").as("rank")))
  }

  private val x72 = GateQuery(
    "x72_source_signature",
    (s, d) => sourceSignatures(
      Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("term")),
      SigTopK, SigSaltBuckets),
    Some(s"""WITH t AS (
              SELECT source, unnest(string_split(text, ' ')) AS term
              FROM documents),
            tfc AS MATERIALIZED (
              SELECT source, term, count(*) AS tf FROM t GROUP BY 1, 2),
            sd AS (SELECT term, count(*) AS sdf FROM tfc GROUP BY 1),
            ns AS (SELECT count(DISTINCT source) AS n_src FROM tfc),
            sc AS (
              SELECT f.source, f.term,
                     CAST(f.tf AS BIGINT) AS tf,
                     CAST(s.sdf AS BIGINT) AS sdf,
                     CAST(f.tf * (ns.n_src - s.sdf + 1) AS BIGINT) AS score
              FROM tfc f JOIN sd s USING (term) CROSS JOIN ns),
            r AS (
              SELECT *, row_number() OVER (
                PARTITION BY source ORDER BY score DESC, term) AS rank
              FROM sc)
            SELECT source, term, tf, sdf, score, CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= $SigTopK
            ORDER BY 1,2,3,4,5,6"""))

  // ---------------------------------------------------------------- x73
  // LSH estimator calibration — x66's audit role for the MinHash
  // dedup family: over x04's OWN candidate pairs, the joint histogram
  // of (minhash component agreement 0..16, exact token-set Jaccard
  // in 1/20 buckets). A healthy family concentrates mass on the
  // diagonal (E[matches]/16 = true Jaccard); a broken affine family,
  // band-slicing bug, or hash collision pathology shows up as
  // off-diagonal mass — the acceptance check a pipeline runs before
  // trusting LSH-filtered dedup, just as x66 gates the IVF index.
  // Everything is hash-exact: matches is an integer count, the
  // bucket is the integer (inter·20) div union — no float sums.
  // Scale shape: reuses x04's signature collapse, native per-row
  // minhash, and band join; the calibration join touches CANDIDATE
  // ids only (semi-joined, then MEASURED-broadcast under the x86
  // IngestBcastClassCap discipline — shuffle fallback over the cap),
  // and samples a deterministic 1-in-4 of candidate pairs by md5
  // bucket (the x66 stance: an audit runs on a sample — the exact
  // token-array intersect is ~20× a mask verify per pair, and the
  // histogram's shape needs mass, not every pair); output is a
  // constant-sized 17×21 histogram.
  private val CalSampleMod = 4

  /** x73's engine, parameterized for the plan spec: `bcastClassCap`
    * is the measured-broadcast bound on the candidate-class count
    * (0 disables the hint entirely; X73PlanSpec pins both branches
    * bit-equal, the x86 pattern). */
  private[graft] def lshCalibration(s: SparkSession, d: String,
      bcastClassCap: Long = IngestBcastClassCap): DataFrame = {
      // sigTable has exactly one consumer here (the repTab join), so
      // it needs no persist of its own — and each persisted stage
      // below is materialized by the FIRST action that consumes it
      // (cache fills on first evaluation), so the only explicit
      // driver actions are the two whose timing matters: banded
      // (its self-join consumes it twice — racing consumers would
      // recompute the MinHash pass per side) and candIds (whose
      // count both materializes the candidate table and supplies the
      // measured-broadcast gate). Round-16: 5 sequential count()
      // actions folded to 2 (guide §1.2 — driver round-trips are
      // per-query fixed cost; the folded counts did the same work the
      // consuming action now does while filling the same caches).
      val sigs = sigTable(s, d)
      val docArrs = Tables.documents(s, d)
        .repartition(col("doc_id"))
        .select(col("doc_id"), tokenSet(col("text")).as("arr"))
      val repTab = sigs.join(docArrs, col("rep") === col("doc_id"))
        .select(col("rep"), col("arr"),
          graft.functions.MinHashArr.minhashArr(col("arr"), "t:").as("mhs"))
        .filter(col("mhs").isNotNull)
        .persist() // band table + both calibration sides consume it
      val banded = bandsOf(repTab.select(col("rep"), col("mhs"))).persist()
      banded.count() // self-join sides; also materializes repTab
      val cand = lshCandidates(banded)
        .filter(hex32(md5(concat_ws(":", col("rep_a"), col("rep_b"))))
          % CalSampleMod === 0)
        .persist()
      val candIds = cand.select(col("rep_a").as("rep"))
        .union(cand.select(col("rep_b").as("rep"))).distinct().persist()
      // MEASURED broadcast (the x86 IngestBcastClassCap discipline —
      // this was the tree's last unconditional hint): candidate reps
      // are class-level and 1-in-4 sampled, but on a near-dup-dense
      // corpus with few exact duplicates candidate reps ≈ classes ≈
      // corpus, and force-shipping every token array to the driver is
      // an OOM. One tiny count over the persisted id set decides;
      // over the cap the verify joins shuffle on rep instead
      // (X73PlanSpec pins both branches bit-equal). This count is
      // also the action that materializes cand and candIds.
      val nCandClasses = candIds.count()
      val candTab = repTab.join(candIds, "rep")
      def gated(side: DataFrame): DataFrame =
        if (bcastClassCap > 0L && nCandClasses <= bcastClassCap)
          broadcast(side)
        else side
      val ta = gated(candTab.select(col("rep").as("rep_a"),
        col("arr").as("arr_a"), col("mhs").as("mhs_a")))
      val tb = gated(candTab.select(col("rep").as("rep_b"),
        col("arr").as("arr_b"), col("mhs").as("mhs_b")))
      val inter = size(array_intersect(col("arr_a"), col("arr_b")))
      val uni = size(col("arr_a")) + size(col("arr_b")) - inter
      ordered(cand.join(ta, "rep_a").join(tb, "rep_b")
        .withColumn("matches",
          size(filter(zip_with(col("mhs_a"), col("mhs_b"),
            (x, y) => x === y), v => v)).cast("long"))
        .withColumn("inter", inter.cast("long"))
        .withColumn("uni", uni.cast("long"))
        .withColumn("jac_bucket", expr("(inter * 20) div uni"))
        .groupBy(col("matches"), col("jac_bucket"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("matches"), col("jac_bucket"), col("cnt")))
  }

  private val x73 = GateQuery(
    "x73_lsh_calibration",
    (s, d) => lshCalibration(s, d),
    Some {
      val matchSum = (0 until NumMinhash)
        .map(i => s"CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $duckMasksCte, $duckMinhashCtes,
            rsets AS (
              SELECT s.rep, list_distinct(string_split(doc.text, ' ')) AS arr
              FROM sigs s JOIN documents doc ON doc.doc_id = s.rep),
            sampled AS (
              SELECT rep_a, rep_b FROM cand
              WHERE ${duckHex32("md5(rep_a || ':' || rep_b)")} % $CalSampleMod = 0),
            pairs AS (
              SELECT ($matchSum) AS matches,
                (len(list_intersect(ra.arr, rb.arr)) * 20) //
                  (len(ra.arr) + len(rb.arr)
                    - len(list_intersect(ra.arr, rb.arr))) AS jac_bucket
              FROM sampled c
              JOIN mh a ON a.rep = c.rep_a
              JOIN mh b ON b.rep = c.rep_b
              JOIN rsets ra ON ra.rep = c.rep_a
              JOIN rsets rb ON rb.rep = c.rep_b)
          SELECT CAST(matches AS BIGINT) AS matches,
                 CAST(jac_bucket AS BIGINT) AS jac_bucket,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM pairs GROUP BY 1, 2 ORDER BY 1,2,3"""
    })

  // ---------------------------------------------------------------- x74
  // PQ distortion audit — the third member of the approximation-audit
  // trio (x66 recall for the IVF index, x73 calibration for the
  // MinHash family, x74 DISTANCE DISTORTION for the PQ codes): for
  // every pair x44's ADC scan actually returned, the asymmetric-
  // distance estimate vs the EXACT quantized L2² to the true vector,
  // as the integer ratio floor(100·adist/(edist+1)) — the
  // reconstruction-error report read before trusting 128×-compressed
  // codes for ranking. All-integer arithmetic end to end (both
  // distances are exact BIGINT sums), so the hash must match. Scale
  // shape: the audited pair set is queries×k BY CONSTRUCTION (an
  // audit reads the index's own answers, x66's stance), so the exact
  // side costs |pairs| dot products — the tiny pair table broadcasts
  // against the corpus vectors; nothing shuffles with corpus
  // cardinality.
  private val x74 = GateQuery(
    "x74_pq_distortion",
    (s, d) => {
      val quant = transform(col("embedding"),
        x => floor(x * lit(1000)).cast("long"))
      val v = Tables.embeddings(s, d)
        .select(col("vec_id"), quant.as("qv"))
        .persist() // pq pipeline + both exact sides consume it
      v.count()
      val pq = pqTopK(v).select(col("qid"), col("vec_id"), col("adist"))
      val qv = v.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("qv").as("qv_q"))
      val cv = v.select(col("vec_id"), col("qv").as("qv_c"))
      val edist = aggregate(
        zip_with(col("qv_q"), col("qv_c"), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, e) => acc + e)
      ordered(broadcast(pq.join(broadcast(qv), "qid"))
        .join(cv, "vec_id")
        .withColumn("edist", edist)
        .withColumn("ratio_pct", expr("(adist * 100) div (edist + 1)"))
        .select(col("qid"), col("vec_id"), col("adist"), col("edist"),
          col("ratio_pct")))
    },
    for (s44 <- x44.oracle) yield
      s"""WITH pq AS ($s44),
            v AS (
              SELECT vec_id, list_transform(embedding,
                x -> CAST(FLOOR(x * 1000) AS BIGINT)) AS qv
              FROM embeddings),
            pairs AS (
              SELECT p.qid, p.vec_id, p.adist,
                CAST(list_dot_product(q.qv, q.qv)
                  - 2*list_dot_product(q.qv, c.qv)
                  + list_dot_product(c.qv, c.qv) AS BIGINT) AS edist
              FROM pq p
              JOIN v q ON q.vec_id = p.qid
              JOIN v c ON c.vec_id = p.vec_id)
          SELECT qid, vec_id, adist, edist,
                 (adist * 100) // (edist + 1) AS ratio_pct
          FROM pairs ORDER BY 1,2,3,4,5""")

  // ---------------------------------------------------------------- x66
  // ANN recall audit: per-query recall@k of the IVF path (x07)
  // against the exact brute-force top-k (x06) — the acceptance gate a
  // pipeline runs before trusting an approximate index (x13's
  // scaladoc names this as the sampled-oracle role of the exact
  // path). Both inputs are fully DETERMINISTIC (fixed-point cosine,
  // (cos desc, vec_id) tie-breaks), so recall is an exact integer
  // ratio here — no error-bound slack, the hash must match. Scale
  // shape: the exact side runs on a SAMPLE of queries by construction
  // (vec_id < NumQueries — a recall audit never brute-forces the full
  // corpus), so the join is query-cardinality; recall = one qid-keyed
  // left join + count agg over two k-row-per-query tables.
  private val x66 = GateQuery(
    "x66_recall_audit",
    (s, d) => {
      val exact = x06.fn(s, d).select(col("qid"), col("vec_id"))
      val approx = x07.fn(s, d)
        .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
      ordered(exact
        .join(approx, Seq("qid", "vec_id"), "left_outer")
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("k"),
             sum(coalesce(col("hit"), lit(0L))).as("hits"))
        .select(col("qid"), col("k"), col("hits"),
          (col("hits").cast("double") / col("k")).as("recall")))
    },
    for (bs <- x06.oracle; is <- x07.oracle) yield
      s"""WITH brute AS ($bs),
            ivf AS ($is)
          SELECT b.qid, CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(CASE WHEN i.vec_id IS NULL THEN 0 ELSE 1 END)
                   AS BIGINT) AS hits,
                 CAST(sum(CASE WHEN i.vec_id IS NULL THEN 0 ELSE 1 END)
                   AS DOUBLE) / count(*) AS recall
          FROM brute b
          LEFT JOIN ivf i ON i.qid = b.qid AND i.vec_id = b.vec_id
          GROUP BY 1
          ORDER BY 1,2,3,4""")

  // ---------------------------------------------------------------- x65
  // Unicode NFC normalization (native graft.functions.NfcNormalize):
  // the canonical-composition ingest pass — composed "café" and
  // decomposed "cafe"+U+0301 must hash identically or every
  // downstream dedup (x01/x14/x45) treats one document as two. The
  // testdata corpus is ASCII (where NFC is the identity and the
  // expression's zero-copy fast path applies), so each doc is
  // prefixed with a deterministic decomposed/composed variant keyed
  // by doc_id — the gate then hash-checks md5(NFC(text)) and the
  // code-point shrink against DuckDB's nfc_normalize (same UAX #15),
  // a wrong or partial normalization cannot match. Scale shape: pure
  // per-row generated code in the scan projection; ASCII rows return
  // the input buffer by reference.
  private val x65 = GateQuery(
    "x65_normalize",
    (s, d) => {
      val variants = array(
        lit("cafe\u0301"),           // decomposed -> 4-cp composed
        lit("A\u030Angstro\u0308m"), // decomposed -> 8-cp composed
        lit("d\u00e9j\u00e0 vu"),    // already NFC (7 cp)
        lit("n\u0303 tilde"),         // decomposed -> 7-cp composed
        lit("plain"))                 // ASCII fast path
      val raw = concat(
        element_at(variants, (col("doc_id") % 5 + 1).cast("int")),
        lit(" "), col("text"))
      val norm = graft.functions.NfcNormalize.nfcNormalize(raw)
      ordered(Tables.documents(s, d)
        .select(col("doc_id"),
          md5(norm).as("norm_md5"),
          length(raw).cast("long").as("n_before"),
          length(norm).cast("long").as("n_after")))
    },
    Some("""WITH v AS (
              SELECT doc_id,
                     CASE CAST(doc_id % 5 AS INT)
                       WHEN 0 THEN 'cafe' || chr(769)
                       WHEN 1 THEN 'A' || chr(778) || 'ngstro' || chr(776) || 'm'
                       WHEN 2 THEN 'd' || chr(233) || 'j' || chr(224) || ' vu'
                       WHEN 3 THEN 'n' || chr(771) || ' tilde'
                       ELSE 'plain'
                     END || ' ' || text AS raw
              FROM documents)
            SELECT doc_id, md5(nfc_normalize(raw)) AS norm_md5,
                   CAST(length(raw) AS BIGINT) AS n_before,
                   CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_after
            FROM v ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- x62
  // Two-hop reach: for every doc in the span-sharing graph, how many
  // docs sit within ≤ 2 hops — the dedup BLAST RADIUS. x30 answers
  // "which component" (unbounded transitive closure, iterative);
  // x62 answers "how far does this doc's duplication influence
  // spread" with a FIXED two-join plan — the quick template-family
  // size estimate a curation pass runs before deciding whether the
  // full component build is even needed.
  //
  // Scale shape: direction-doubled edge list self-joined once on the
  // middle vertex (hop-2 paths), unioned with hop-1, distinct, one
  // count agg — all equi-shuffles on vertex ids, (long, long) rows
  // only. The wedge join is Θ(Σ deg²): hub-quadratic like any
  // unoriented 2-path enumeration, which is exactly the signal — a
  // doc with a huge 2-hop reach IS in a hub family. The substrate's
  // docs-per-span cap ([[SpanDfCap]]) already bounds per-span degree
  // contribution at edge-construction time; a residual degree cap
  // (drop vertices above deg D before the wedge, x54's capping
  // argument) would bound multi-span hubs too — the gate runs with
  // the substrate cap only, a no-op on the testdata graph.
  private val x62 = GateQuery(
    "x62_two_hop_reach",
    (s, d) => {
      val edges = spanEdges(Tables.documents(s, d), TriW).persist()
      edges.count()
      val dir = edges.select(col("a").as("src"), col("b").as("dst"))
        .union(edges.select(col("b").as("src"), col("a").as("dst")))
      val hop2 = dir.select(col("src"), col("dst").as("mid"))
        .join(dir.select(col("src").as("mid"), col("dst").as("far")),
          Seq("mid"))
        .select(col("src"), col("far").as("dst"))
      ordered(dir.union(hop2)
        .filter(col("src") =!= col("dst"))
        .distinct()
        .groupBy(col("src").as("doc_id"))
        .agg(count(lit(1)).as("n_reach")))
    },
    Some(s"""WITH ${duckSpanEdgesCte(TriW)},
            dir AS MATERIALIZED (
              SELECT a AS src, b AS dst FROM edges
              UNION ALL SELECT b AS src, a AS dst FROM edges),
            hop2 AS (
              SELECT d1.src, d2.dst
              FROM dir d1 JOIN dir d2 ON d1.dst = d2.src),
            reach AS (
              SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM dir
                UNION ALL SELECT src, dst FROM hop2)
              WHERE src <> dst)
            SELECT src AS doc_id, CAST(count(*) AS BIGINT) AS n_reach
            FROM reach GROUP BY 1 ORDER BY 1,2"""))

  // ---------------------------------------------------------------- x75
  // Blocked entity resolution (record linkage): link "dirty" records
  // (each document's 40-char snippet with one deterministically-
  // positioned character deleted) back to the canonical registry by
  // edit distance <= 2 — the fuzzy-match step every ingestion
  // pipeline runs when joining externally-sourced records without a
  // shared key. All-pairs levenshtein is pair-quadratic, so the
  // operator is BLOCKED: each record emits two 14-char blocking keys
  // (prefix and suffix — a single edit can break one of them but
  // never both when it falls inside the [5,36] window, which the
  // fixture's deletion positions satisfy), candidates are the union
  // of the two equi-joins, and the
  // exact levenshtein verify touches candidates only. Blocking keys
  // carry a frequency cap (df > cap on either side drops the key —
  // the x61/spanEdges bounded contract) so a degenerate shared prefix
  // can never create a quadratic block at 100 TB; the oracle replays
  // the same cap. Scale shape: two hash joins on high-cardinality
  // 14-char keys + one verify pass — nothing is ever all-pairs, and
  // candidate volume is Σ_key |A_key|·|B_key| <= cap² · #keys.
  private val ErBlockLen = 14
  private val ErCap = 64L
  private val ErMaxDist = 2

  /** x75's engine, parameterized for fixtures: `a` rows (a_id, a_rec)
    * = canonical registry, `b` rows (b_id, b_rec) = dirty records —
    * (b_id, a_id, dist) matches with dist <= maxDist out, candidates
    * restricted to pairs sharing a prefix- or suffix-`blockLen` block
    * whose size on BOTH sides is <= cap. X75LinkageSpec pins the
    * block-survival guarantee for single interior deletions and the
    * cap behavior on a degenerate shared-prefix fixture. */
  private[graft] def blockedLinkage(a: DataFrame, b: DataFrame,
      blockLen: Int, cap: Long, maxDist: Int): DataFrame = {
    def blocks(df: DataFrame, idC: String, recC: String): DataFrame =
      df.select(col(idC).as("id"), col(recC).as("rec"))
        .select(col("id"), col("rec"), explode(array(
          concat(lit("p:"), substring(col("rec"), 1, blockLen)),
          concat(lit("s:"), expr(s"right(rec, $blockLen)")))).as("bk"))
    val ab = blocks(a, "a_id", "a_rec")
    val bb = blocks(b, "b_id", "b_rec")
    val okA = ab.groupBy(col("bk")).agg(count(lit(1)).as("ca"))
      .filter(col("ca") <= cap).select(col("bk"))
    val okB = bb.groupBy(col("bk")).agg(count(lit(1)).as("cb"))
      .filter(col("cb") <= cap).select(col("bk"))
    // keys admissible on BOTH sides; joining the B side through it
    // restricts the A-side equi-join to the same key set
    val okKeys = okA.join(okB, "bk")
    val cand = bb.join(okKeys, "bk")
      .select(col("bk"), col("id").as("b_id"), col("rec").as("b_rec"))
      .join(ab.select(col("bk"), col("id").as("a_id"),
        col("rec").as("a_rec")), "bk")
      .select(col("b_id"), col("a_id"), col("b_rec"), col("a_rec"))
      .distinct() // a pair may meet in both the prefix and suffix block
    ordered(cand
      .withColumn("dist", levenshtein(col("b_rec"), col("a_rec")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("b_id"), col("a_id"), col("dist")))
  }

  private val x75 = GateQuery(
    "x75_entity_resolution",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val canon = docs.select(col("doc_id").as("a_id"),
        substring(col("text"), 1, 40).as("a_rec"))
      // dirty copy: delete the char at 1-indexed position
      // (doc_id % 32) + 5 ∈ [5, 36] of the 40-char snippet
      val dirty = docs.select(col("doc_id").as("b_id"),
        expr("concat(substring(substring(text, 1, 40), 1, " +
          "cast(doc_id % 32 as int) + 4), " +
          "substring(substring(text, 1, 40), cast(doc_id % 32 as int) + 6))")
          .as("b_rec"))
      blockedLinkage(canon, dirty, ErBlockLen, ErCap, ErMaxDist)
    },
    Some(s"""WITH canon AS (
              SELECT doc_id AS a_id, substr(text, 1, 40) AS a_rec
              FROM documents),
            dirty AS (
              SELECT doc_id AS b_id,
                     substr(substr(text, 1, 40), 1,
                            CAST(doc_id % 32 AS INT) + 4)
                     || substr(substr(text, 1, 40),
                               CAST(doc_id % 32 AS INT) + 6) AS b_rec
              FROM documents),
            ab AS MATERIALIZED (
              SELECT a_id AS id, a_rec AS rec,
                     'p:' || substr(a_rec, 1, $ErBlockLen) AS bk FROM canon
              UNION ALL
              SELECT a_id, a_rec, 's:' || right(a_rec, $ErBlockLen)
              FROM canon),
            bb AS MATERIALIZED (
              SELECT b_id AS id, b_rec AS rec,
                     'p:' || substr(b_rec, 1, $ErBlockLen) AS bk FROM dirty
              UNION ALL
              SELECT b_id, b_rec, 's:' || right(b_rec, $ErBlockLen)
              FROM dirty),
            oka AS (SELECT bk FROM ab GROUP BY 1 HAVING count(*) <= $ErCap),
            okb AS (SELECT bk FROM bb GROUP BY 1 HAVING count(*) <= $ErCap),
            ok AS (SELECT oka.bk FROM oka JOIN okb ON okb.bk = oka.bk),
            cand AS (
              SELECT DISTINCT b.id AS b_id, a.id AS a_id,
                              b.rec AS b_rec, a.rec AS a_rec
              FROM bb b JOIN ok k ON k.bk = b.bk JOIN ab a ON a.bk = b.bk)
          SELECT b_id, a_id,
                 CAST(levenshtein(b_rec, a_rec) AS BIGINT) AS dist
          FROM cand WHERE levenshtein(b_rec, a_rec) <= $ErMaxDist
          ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- x76
  // Z-order layout audit: Morton-interleave (o_custkey, order-day)
  // into one 62-bit key via the native codegen'd [[ZValue]]
  // expression, range-bucket rows by fixed integer arithmetic on the
  // key, and report per-bucket min/max of BOTH dimensions — the
  // locality report a table-maintenance job (OPTIMIZE ZORDER) emits
  // to prove that per-file statistics will prune scans on EITHER
  // column. The real writer is `repartitionByRange(z)` + per-file
  // min/max; the gate's bucket = z div (max_z div 64 + 1) is the
  // deterministic, sort-free stand-in (a 4-scalar bounds agg plus the
  // 1-row zmax agg, both broadcast back — no global sort, no window):
  // bucket assignment is a pure projection, so the whole plan is
  // scan → project → two tiny aggs → broadcast → hash agg, and would
  // run identically on 10^12 rows.
  // Both dimensions are scaled to a common 16-bit grid before
  // interleaving — `(v − min)·(2^16 − 1) div max(max − min, 1)`, the
  // standard OPTIMIZE ZORDER normalization ([[Sources.ZGridBits]]).
  // Offsetting to the min alone is NOT enough: on this data custkey
  // spans ~8 bits and order-day ~12, so an un-normalized interleave
  // hands the key's high bits to the day column exclusively and every
  // z-range split cuts only days — the narrow column never clusters
  // (round-8's measured flaw: per-bucket x-width 0.90 of global vs y
  // 0.09). Equal widths make the interleave alternate fairly, boxing
  // BOTH dimensions per bucket.
  private val ZBuckets = 64L
  private val x76 = GateQuery(
    "x76_zorder_layout",
    (s, d) => {
      val o = Tables.orders(s, d).select(
        col("o_custkey").as("x"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long").as("y"))
      val bounds = o.agg(min(col("x")).as("xmin"), max(col("x")).as("xmax"),
        min(col("y")).as("ymin"), max(col("y")).as("ymax"))
      def grid(c: String) = expr(
        s"(($c - ${c}min) * 65535) div greatest(${c}max - ${c}min, 1)")
      val z = o.crossJoin(broadcast(bounds))
        .withColumn("z", graft.functions.ZValue.zValue(grid("x"), grid("y")))
      val zmax = z.agg(max(col("z")).as("zmax"))
      ordered(z.crossJoin(broadcast(zmax))
        .withColumn("bucket", expr(s"z div (zmax div $ZBuckets + 1)"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_cust"), max(col("x")).as("max_cust"),
          min(col("y")).as("min_day"), max(col("y")).as("max_day"),
          min(col("z")).as("min_z"), max(col("z")).as("max_z")))
    },
    Some(s"""WITH o AS (
              SELECT o_custkey AS x,
                     CAST(datediff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) AS BIGINT) AS y
              FROM orders),
            mn AS (SELECT min(x) AS xmin, max(x) AS xmax,
                          min(y) AS ymin, max(y) AS ymax FROM o),
            g AS (
              SELECT x, y,
                     ((x - mn.xmin) * 65535)
                       // GREATEST(mn.xmax - mn.xmin, 1) AS gx,
                     ((y - mn.ymin) * 65535)
                       // GREATEST(mn.ymax - mn.ymin, 1) AS gy
              FROM o, mn),
            z AS MATERIALIZED (
              SELECT x, y,
                     CAST(list_sum([
                       (((gx >> i) & 1) << (2 * i))
                       + (((gy >> i) & 1) << (2 * i + 1))
                       FOR i IN range(0, 16)]) AS BIGINT) AS z
              FROM g),
            m AS (SELECT max(z) AS zmax FROM z)
          SELECT z // (m.zmax // $ZBuckets + 1) AS bucket,
                 CAST(count(*) AS BIGINT) AS n,
                 min(x) AS min_cust, max(x) AS max_cust,
                 min(y) AS min_day, max(y) AS max_day,
                 min(z) AS min_z, max(z) AS max_z
          FROM z, m GROUP BY 1 ORDER BY 1,2,3,4,5,6,7,8"""))

  // ---------------------------------------------------------------- x77
  // PPMI co-occurrence (collocation mining): forward skip-gram pairs
  // at distance 1 and 2, scored by INTEGER WHOLE-BIT pointwise mutual
  // information — pmi_bits = floor(log2(N·c(a,b) / (c(a·)·c(·b))))
  // clamped at −20, computed by [[wholeBitLog2Sql]] (pure integer
  // arithmetic, hash-exact on both engines, no wraparound at any
  // long-valued counts; a sub-2^-20 ratio yields the −20 floor). This is
  // the phrase-detection / PPMI-matrix step of an embedding pipeline
  // (word2vec-phrases), distinct from x68's per-DOCUMENT surprisal:
  // the output is the vocabulary×vocabulary association table, not a
  // doc score. Scale shape: one explode pass, a (w1,w2) hash agg that
  // caps everything downstream at distinct-pair-type rows (vocab²,
  // not corpus-sized), two marginal rollups of that table joined back
  // hash-to-hash, the 1-row N broadcast — corpus text shuffles once.
  private val PmiMinCount = 20L

  /** Forward skip-gram pairs (offsets 1 and 2) of a token-array
    * column `tk`, as "w1 w2" strings (x68's bg shape) — the pair
    * substrate shared by batch x77 and its streaming twin
    * ([[graft.streaming.DocStreams.ppmiPairCountStream]]). Slice
    * length clamps at 0 so sub-(k+1)-token rows emit nothing. */
  private[graft] def skipGramPairs: Column = {
    def pairsAt(k: Int): Column = zip_with(
      slice(col("tk"), lit(1), greatest(size(col("tk")) - k, lit(0))),
      slice(col("tk"), lit(1 + k), greatest(size(col("tk")) - k, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    concat(pairsAt(1), pairsAt(2))
  }

  /** x77's engine, parameterized for fixtures: (doc_id, text) rows in,
    * (w1, w2, c_ab, pmi_bits) out for pair types with c_ab >= minCount.
    * X77PmiSpec pins the whole-bit arithmetic on a hand-computed
    * corpus, including the negative-PMI and div-to-zero floors. */
  private[graft] def ppmiPairs(docs: DataFrame, minCount: Long): DataFrame =
    pmiFromPairCounts(
      docs.select(split(col("text"), " ").as("tk"))
        .select(explode(skipGramPairs).as("p"))
        .groupBy(col("p")).agg(count(lit(1)).as("c_ab")),
      minCount)

  /** The scoring half of x77 over an already-aggregated (p, c_ab)
    * pair-count table — separated so a STREAMING pair-count state
    * snapshot scores identically to the batch path (PMI is marginal-
    * global: marginals and N are rollups of this table, so scoring is
    * a batch/snapshot step by nature). */
  private[graft] def pmiFromPairCounts(cAb0: DataFrame,
      minCount: Long): DataFrame = {
    val cAb = cAb0
      .persist() // marginals ×2, N, and the scored join all consume it
    cAb.count()
    val cA = cAb.select(split(col("p"), " ").getItem(0).as("w1"), col("c_ab"))
      .groupBy(col("w1")).agg(sum(col("c_ab")).as("c_a"))
    val cB = cAb.select(split(col("p"), " ").getItem(1).as("w2"), col("c_ab"))
      .groupBy(col("w2")).agg(sum(col("c_ab")).as("c_b"))
    val n = cAb.agg(sum(col("c_ab")).as("n_pairs"))
    ordered(cAb.filter(col("c_ab") >= minCount)
      .withColumn("w1", split(col("p"), " ").getItem(0))
      .withColumn("w2", split(col("p"), " ").getItem(1))
      .join(cA, "w1").join(cB, "w2")
      .crossJoin(broadcast(n))
      .withColumn("pmi_bits", expr(wholeBitLog2Sql(
        "cast(n_pairs as decimal(38,0)) * c_ab",
        "cast(c_a as decimal(38,0)) * c_b")))
      .select(col("w1"), col("w2"), col("c_ab"), col("pmi_bits")))
  }

  private val x77 = GateQuery(
    "x77_ppmi_pairs",
    (s, d) => ppmiPairs(Tables.documents(s, d), PmiMinCount),
    Some(s"""WITH tk AS (
              SELECT string_split(text, ' ') AS tk FROM documents),
            pr AS (
              SELECT unnest([tk[i] || ' ' || tk[i+1]
                             FOR i IN range(1, len(tk))]) AS p FROM tk
              UNION ALL
              SELECT unnest([tk[i] || ' ' || tk[i+2]
                             FOR i IN range(1, len(tk) - 1)]) AS p FROM tk),
            cab AS MATERIALIZED (
              SELECT p, count(*) AS c_ab FROM pr GROUP BY 1),
            ca AS (
              SELECT string_split(p, ' ')[1] AS w1,
                     CAST(sum(c_ab) AS BIGINT) AS c_a FROM cab GROUP BY 1),
            cb AS (
              SELECT string_split(p, ' ')[2] AS w2,
                     CAST(sum(c_ab) AS BIGINT) AS c_b FROM cab GROUP BY 1),
            n AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n_pairs FROM cab)
          SELECT string_split(p, ' ')[1] AS w1,
                 string_split(p, ' ')[2] AS w2,
                 CAST(c_ab AS BIGINT) AS c_ab,
                 ${duckWholeBitLog2("CAST(n.n_pairs AS HUGEINT) * c_ab",
                   "CAST(ca.c_a AS HUGEINT) * cb.c_b")} AS pmi_bits
          FROM cab
          JOIN ca ON ca.w1 = string_split(p, ' ')[1]
          JOIN cb ON cb.w2 = string_split(p, ' ')[2]
          CROSS JOIN n
          WHERE c_ab >= $PmiMinCount
          ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- x78
  // Blocking-recall audit for x75's entity resolution — the x66/x73/
  // x74 stance applied to the last unaudited approximation: blocking
  // is a candidate-pruning trade, so MEASURE what it loses. A probe
  // corpus is built where the prefix/suffix block-survival guarantee
  // is deliberately violated for a third of the records (one deletion
  // inside the prefix block, and for doc_id % 3 == 0 a second
  // deletion inside the suffix block — dist 2, BOTH keys broken), a
  // deterministic FIXED-SIZE probe set is drawn (the 128 lowest
  // probes in (md5, id) order — an ABSOLUTE count, not a rate: a
  // rate-drawn audit scales with the corpus and turns the truth pass
  // quadratic — measured 81 s at sf0.1 with 1-in-4), and recall is
  // n_blocked/n_true per edit distance in integer basis points.
  // Ground truth is brute-force levenshtein of the 128 probes
  // against the full registry: broadcast-nested-loop, one linear
  // scan of the registry with a constant 128× factor, the same shape
  // x66 uses for IVF recall; the probe pick is a TakeOrdered (no
  // global sort materializes). Expected shape on this fixture:
  // dist<=1 recall 10000 bp
  // (single interior deletion provably preserves a key — the
  // X75LinkageSpec lemma), dist-2 recall well below (both keys
  // broken), which is exactly the trade the audit exists to expose.
  private val ErProbeCount = 128
  private val x78 = GateQuery(
    "x78_blocking_recall",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val canon = docs.select(col("doc_id").as("a_id"),
        substring(col("text"), 1, 40).as("a_rec"))
      val s40 = "substring(text, 1, 40)"
      val p1 = "(cast(doc_id % 12 as int) + 2)" // breaks the prefix block
      val s39 = s"concat(substring($s40, 1, $p1 - 1), " +
        s"substring($s40, $p1 + 1, 40))"
      val p2 = "(cast(doc_id % 8 as int) + 30)" // breaks the suffix block
      val probe = docs.select(col("doc_id").as("b_id"),
        expr(s"if(doc_id % 3 = 0, concat(substring($s39, 1, $p2 - 1), " +
          s"substring($s39, $p2 + 1, 40)), $s39)").as("b_rec"))
      val samp = probe
        .orderBy(md5(col("b_id").cast("string")), col("b_id"))
        .limit(ErProbeCount)
      // repartition the registry before the broadcast-NLJ: the truth
      // pass's cost is registry × 128 levenshteins and inherits the
      // SCAN's partitioning — a compact parquet source yields a
      // handful of partitions and serializes the whole pass (measured
      // 87 s → 3.6 s at sf1 with 64-way)
      val truth = canon.repartition(64).crossJoin(broadcast(samp))
        .withColumn("dist",
          levenshtein(col("b_rec"), col("a_rec")).cast("long"))
        .filter(col("dist") <= ErMaxDist)
      val blocked = blockedLinkage(canon, samp, ErBlockLen, ErCap, ErMaxDist)
      val td = truth.groupBy(col("dist")).agg(count(lit(1)).as("n_true"))
      val bd = blocked.groupBy(col("dist")).agg(count(lit(1)).as("n_blocked"))
      ordered(td.join(bd, Seq("dist"), "left")
        .withColumn("n_blocked", coalesce(col("n_blocked"), lit(0L)))
        .withColumn("recall_bp", expr("(n_blocked * 10000) div n_true"))
        .select(col("dist"), col("n_true"), col("n_blocked"),
          col("recall_bp")))
    },
    Some(s"""WITH canon AS (
              SELECT doc_id AS a_id, substr(text, 1, 40) AS a_rec
              FROM documents),
            p0 AS (
              SELECT doc_id, substr(text, 1, 40) AS s40,
                     CAST(doc_id % 12 AS INT) + 2 AS p1,
                     CAST(doc_id % 8 AS INT) + 30 AS p2
              FROM documents),
            p1c AS (
              SELECT doc_id, p2,
                     substr(s40, 1, p1 - 1) || substr(s40, p1 + 1, 40) AS s39
              FROM p0),
            probe AS (
              SELECT doc_id AS b_id,
                     CASE WHEN doc_id % 3 = 0
                       THEN substr(s39, 1, p2 - 1) || substr(s39, p2 + 1, 40)
                       ELSE s39 END AS b_rec
              FROM p1c),
            samp AS MATERIALIZED (
              SELECT b_id, b_rec FROM probe
              ORDER BY md5(CAST(b_id AS VARCHAR)), b_id
              LIMIT $ErProbeCount),
            truth AS (
              SELECT s.b_id, c.a_id,
                     CAST(levenshtein(s.b_rec, c.a_rec) AS BIGINT) AS dist
              FROM samp s, canon c
              WHERE levenshtein(s.b_rec, c.a_rec) <= $ErMaxDist),
            ab AS MATERIALIZED (
              SELECT a_id AS id, a_rec AS rec,
                     'p:' || substr(a_rec, 1, $ErBlockLen) AS bk FROM canon
              UNION ALL
              SELECT a_id, a_rec, 's:' || right(a_rec, $ErBlockLen)
              FROM canon),
            bb AS MATERIALIZED (
              SELECT b_id AS id, b_rec AS rec,
                     'p:' || substr(b_rec, 1, $ErBlockLen) AS bk FROM samp
              UNION ALL
              SELECT b_id, b_rec, 's:' || right(b_rec, $ErBlockLen)
              FROM samp),
            oka AS (SELECT bk FROM ab GROUP BY 1 HAVING count(*) <= $ErCap),
            okb AS (SELECT bk FROM bb GROUP BY 1 HAVING count(*) <= $ErCap),
            ok AS (SELECT oka.bk FROM oka JOIN okb ON okb.bk = oka.bk),
            cand AS (
              SELECT DISTINCT b.id AS b_id, a.id AS a_id,
                              b.rec AS b_rec, a.rec AS a_rec
              FROM bb b JOIN ok k ON k.bk = b.bk JOIN ab a ON a.bk = b.bk),
            blocked AS (
              SELECT b_id, a_id,
                     CAST(levenshtein(b_rec, a_rec) AS BIGINT) AS dist
              FROM cand WHERE levenshtein(b_rec, a_rec) <= $ErMaxDist),
            td AS (SELECT dist, count(*) AS n_true FROM truth GROUP BY 1),
            bd AS (SELECT dist, count(*) AS n_blocked FROM blocked GROUP BY 1)
          SELECT td.dist,
                 CAST(td.n_true AS BIGINT) AS n_true,
                 CAST(COALESCE(bd.n_blocked, 0) AS BIGINT) AS n_blocked,
                 (CAST(COALESCE(bd.n_blocked, 0) AS BIGINT) * 10000)
                   // td.n_true AS recall_bp
          FROM td LEFT JOIN bd ON bd.dist = td.dist
          ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- x79
  // Open-domain overlap, END TO END: x63 pinned the HLL estimator but
  // took the all-pairs matrix over a rollup-sized key set; the open-
  // domain contract (unbounded key universe) needs a CANDIDATE
  // GENERATOR in front of SketchOverlap.overlapPairs, and this gate
  // ships one — rare-token co-occurrence ([[graft.ops.SketchOverlap
  // .cooccurrenceCandidates]]): keys sharing >= 2 tokens of key-df in
  // [2, cap] pair up, everything else never meets. Keys are
  // deliberately sub-source ("source/doc_id%5", ~100 of them) so the
  // key set is bigger than any rollup and the generator is doing real
  // pruning work against the C(keys,2) matrix. The estimator error is
  // pinned per candidate pair against the exact intersection (the x63
  // booleans — oracle emits TRUE, so one out-of-bound estimate
  // hash-fails the gate). Scale shape: the (key, token) table
  // shuffles once; candidates are Σ C(df<=cap, 2); sketches are one
  // KB row per key; the exact pin joins token lists for CANDIDATE
  // keys only (audit-sized, like x66/x73/x78).
  private val OvTokDfCap = 8
  private val OvMinShared = 2
  private val OvSpanW = 4 // 4-token spans: rare enough to carry signal
  private val x79 = GateQuery(
    "x79_overlap_candidates",
    (s, d) => {
      // spans as 32-hex hashes via the native fused SpanHashes pass
      // (one per-row loop; the HOF formulation it replaced — slice +
      // array_join per element — was x45's measured bottleneck, and
      // fixed-width hash keys shuffle cheaper than span text)
      val toks = Tables.documents(s, d).select(
        concat(col("source"), lit("/"),
          (col("doc_id") % 5).cast("string")).as("key"),
        explode(graft.functions.SpanHashes.spanHashes(
          col("text"), OvSpanW, 1)).as("tok"))
      val kt = toks.distinct().persist()
      kt.count() // generator, sketches, sizes, and the exact pin share it
      val cand = graft.ops.SketchOverlap.cooccurrenceCandidates(
        kt, "key", "tok", OvTokDfCap, OvMinShared).persist()
      cand.count()
      val est = graft.ops.SketchOverlap.overlapPairs(
        graft.ops.SketchOverlap.keySketches(kt, "key", "tok"),
        cand.select(col("key_a"), col("key_b")))
      val sizes = kt.groupBy(col("key")).agg(count(lit(1)).as("n"))
      val candKeys = cand.select(col("key_a").as("key"))
        .union(cand.select(col("key_b").as("key"))).distinct()
      val ktc = kt.join(candKeys, Seq("key"), "left_semi")
      val exact = ktc.as("a")
        .join(ktc.as("b"), col("a.tok") === col("b.tok") &&
          col("a.key") < col("b.key"))
        .groupBy(col("a.key").as("key_a"), col("b.key").as("key_b"))
        .agg(count(lit(1)).as("inter"))
        .join(cand, Seq("key_a", "key_b"), "left_semi")
        .join(sizes.select(col("key").as("key_a"), col("n").as("na")),
          Seq("key_a"))
        .join(sizes.select(col("key").as("key_b"), col("n").as("nb")),
          Seq("key_b"))
      // inclusion-exclusion absolute error scales with the UNION (a
      // few sketch RSEs of it), so the bound is union-relative — not
      // intersection-relative, which would be untenably tight for the
      // small intersections this generator surfaces
      ordered(cand.join(exact, Seq("key_a", "key_b"))
        .join(est, Seq("key_a", "key_b"))
        .select(col("key_a"), col("key_b"), col("shared"), col("inter"),
          (abs(col("est_inter") - col("inter")) <=
            greatest(expr("inter div 10"),
              expr("(na + nb - inter) div 20 + 50"))).as("inter_ok"),
          (abs(col("est_jaccard") - col("inter").cast("double") /
            (col("na") + col("nb") - col("inter"))) <= 0.08).as("jac_ok")))
    },
    Some(s"""WITH staged AS (
              SELECT source || '/' || CAST(doc_id % 5 AS VARCHAR) AS key,
                     string_split(text, ' ') AS tk
              FROM documents),
            st AS MATERIALIZED (
              SELECT DISTINCT key, tok
              FROM (SELECT key,
                      unnest([md5(array_to_string(tk[i+1 : i+$OvSpanW], ' '))
                        FOR i IN range(0,
                          GREATEST(len(tk) - ${OvSpanW - 1}, 0))]) AS tok
                    FROM staged)),
            kept AS (
              SELECT tok FROM st GROUP BY 1
              HAVING count(DISTINCT key) BETWEEN 2 AND $OvTokDfCap),
            shared0 AS (
              SELECT DISTINCT a.key AS key_a, b.key AS key_b, a.tok
              FROM st a
              JOIN kept k ON k.tok = a.tok
              JOIN st b ON b.tok = a.tok AND a.key < b.key),
            cand AS MATERIALIZED (
              SELECT key_a, key_b, CAST(count(*) AS BIGINT) AS shared
              FROM shared0 GROUP BY 1, 2
              HAVING count(*) >= $OvMinShared),
            sizes AS (SELECT key, count(*) AS n FROM st GROUP BY 1),
            inter AS (
              SELECT a.key AS key_a, b.key AS key_b,
                     CAST(count(*) AS BIGINT) AS inter
              FROM st a JOIN st b ON a.tok = b.tok AND a.key < b.key
              GROUP BY 1, 2)
          SELECT c.key_a, c.key_b, c.shared, i.inter,
                 TRUE AS inter_ok, TRUE AS jac_ok
          FROM cand c
          JOIN inter i ON i.key_a = c.key_a AND i.key_b = c.key_b
          ORDER BY 1,2,3,4,5,6"""))

  // ---------------------------------------------------------------- x80
  // IVF-PQ (IVFADC): the composition x07 (coarse cells) and x44 (PQ
  // codes) are the halves of — the standard layout for billion-scale
  // ANN (Jégou et al., "Product Quantization for Nearest Neighbor
  // Search"; reference surface: nearest-neighbor retrieval over the
  // embeddings table). A coarse quantizer assigns every vector to one
  // of ~√n cells; the RESIDUAL (vector − its centroid) is
  // PQ-encoded against a shared residual codebook; a query probes its
  // ~⌈√cells⌉ nearest cells and scans ONLY those cells' codes,
  // with asymmetric distance computed against the query's per-cell
  // residual; the ADC top-R shortlist re-ranks by exact distance.
  // BOTH quantizers are TRAINED with one deterministic Lloyd round
  // (x39's fixed-round pattern: assign to the first-rows seeds →
  // exact floor-div integer means, empty clusters keep their seed),
  // so the construction stays bit-replayable while the cells/codes
  // fit the data instead of the first rows. Exact long L2²
  // everywhere; ties break to the smallest cid / code / vec_id.
  //
  // SCALE-HONEST parameterization (every knob sublinear in n):
  //   cells  = max(8, ⌊√n⌋)        — the standard nlist ≈ √n sizing,
  //                                  derived IN-PLAN (no driver count)
  //   nprobe = max(6, ⌈√cells⌉)    — probe/cells = 1/√cells VANISHES,
  //                                  so the ADC scan touches
  //                                  nprobe·n/cells ≈ n^(3/4) codes
  //                                  per query: an index, not a
  //                                  partitioned scan (the round-11
  //                                  constants probed 6 of 8 FIXED
  //                                  cells — 75% of ANY corpus)
  //   re-rank R = 8·k FIXED        — the production default: O(k)
  //                                  exact distances per query.
  // The ONE fixture-only knob: `corpusScaledR` switches R to
  // max(3k, n/10). The gate corpus is isotropic 64-dim noise — the
  // adversarial case where distances concentrate, the ADC ordering
  // carries little margin, and NO sublinear shortlist can hold
  // recall (the x83 audit exposes exactly this) — so the GATES run
  // with the knob on and x83 reports the honest number; the DEFAULT
  // (fixed R) is what ships, and X80IvfPqSpec + the x98 gate
  // prove it holds recall@5 ≥ 90% on a clustered corpus (the regime
  // real embeddings live in; x39's construction). m=16 subquantizers
  // over 4 dims (vs x44's 4×16) cut the per-sub distortion enough
  // for the shortlist to be signal.
  //
  // Scale shape: both models collapse to ONE broadcast row each;
  // assignment, residual and encode are per-row projections (the
  // corpus NEVER shuffles to build the index — the coarse argmin IS
  // PqEncode with m=1, and each Lloyd round's update is a
  // map-side-combined partial-sum shuffle of ≤ cells·dim /
  // m·k·subDim keyed rows, x39's shape). The scan side touches only
  // the probed cells: in a real deployment `cid` is the storage
  // partition key so the probe join is partition pruning (x07's IVF
  // storage argument); here it is an equi-join of the broadcast
  // probe table (queries × nprobe rows) against the codes.
  // Residual entries are ≤ ±4000, so a per-sub L2² is ≤ 4·8000² ≈
  // 2.6e8 and the ADC sum fits a long with 9 orders of headroom.
  private val IvfPqMinCells = 8L  // floor of the ∝√n cell count
  private val IvfPqMinProbe = 6L  // floor of the ∝√cells probe count
  private val IvfPqM = 16  // subquantizers
  private val IvfPqSub = 4 // dims per subquantizer (16 × 4 = 64)
  private val IvfPqK = 16  // codewords per subquantizer
  private val IvfPqDim = IvfPqM * IvfPqSub // 64

  /** Exact L2² between two equal-length long arrays. */
  private def l2sqCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, t) => acc + t)

  /** One-row coarse model from small (cid, cv) rows: sorted
    * array<struct<cid,cv>> plus the flat cell·dim layout PqEncode
    * indexes (cid values are 0..cells−1, so code index == cid). */
  private def ivfPqModelRow(cents: DataFrame): DataFrame =
    cents.select(struct(col("cid"), col("cv")).as("e"))
      .agg(sort_array(collect_list(col("e"))).as("cmodel"))
      .withColumn("cflat", flatten(transform(col("cmodel"), e => e("cv"))))

  /** One-row (ncells) table: cells = max(IvfPqMinCells, ⌊√n⌋),
    * computed in-plan (a count agg — no driver-side action). IEEE
    * sqrt is correctly rounded and n < 2^52, so both engines floor
    * the same value. */
  private def ivfPqNcells(v: DataFrame): DataFrame =
    v.agg(greatest(lit(IvfPqMinCells),
      floor(sqrt(count(lit(1)).cast("double"))).cast("long")).as("ncells"))

  /** LLOYD-TRAINED coarse-quantizer model: seeds = the first
    * [[ivfPqNcells]] (≈ √n) vectors, then ONE deterministic update round —
    * assign every vector to its argmin-L2² seed and replace each
    * seed by the exact floor-div integer mean of its cluster
    * (FLOOR(sum/count): double division of exact integers is
    * correctly rounded and |sum/count| ≤ 2000 with count ≤ 2^20, so
    * both engines floor the same value); an empty cluster keeps its
    * seed. One row out, [[ivfPqModelRow]] layout.
    *
    * Scale shape: the assignment pass is a per-row native encode over
    * a broadcast seed row; the update is a posexplode partial-sum
    * keyed by (cid, pos) — ≤ cells·dim keys reach the shuffle, the
    * corpus never does (x39's Lloyd-round shape). */
  private[graft] def ivfPqCentModel(v: DataFrame): DataFrame = {
    val seeds = v.crossJoin(broadcast(ivfPqNcells(v)))
      .filter(col("vec_id") < col("ncells"))
      .select(col("vec_id").cast("int").as("cid"), col("qv").as("cv"))
    val asg = v.crossJoin(broadcast(ivfPqModelRow(seeds)))
      .select(graft.functions.PqEncode.pqEncode(
        col("qv"), col("cflat"), 1, graft.functions.PqEncode.DerivedK,
        IvfPqDim).getItem(0).as("cid"), col("qv"))
    val means = asg
      .select(col("cid"), posexplode(col("qv")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos"))
      .agg(floor(sum(col("x")).cast("double") / count(lit(1)))
        .cast("long").as("m"))
      .groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        e => e.getField("m")).as("tcv"))
    ivfPqModelRow(seeds.join(means, Seq("cid"), "left_outer")
      .select(col("cid"), coalesce(col("tcv"), col("cv")).as("cv")))
  }

  /** LOUD guard for the Lloyd seeding convention [[ivfPqCentModel]]
    * and [[ivfPqCodebook]] assume: cluster/codeword seeds are the
    * rows with `vec_id < max(ncells, k)`, and the trained means join
    * back to the seeds by the ENCODE INDEX — identical only when the
    * seed ids form the DENSE prefix 0..max(ncells,k)−1. On a corpus
    * violating that (sparse or re-keyed ids) the join mismatches and
    * the codebook corrupts SILENTLY (AnnStoreSpec's race fixture
    * found it: a %4 split built a 4-codeword book indexed as 16).
    * The gate corpora are 0..n−1 by construction; [[graft.AnnStore]]
    * validates arbitrary corpora here — re-key with dense ids when
    * this throws. One metadata-cheap count + one filtered distinct
    * count; only run on the BUILD path (train-time, not per-delta). */
  private[graft] def ivfPqRequireDenseSeedPrefix(v: DataFrame): Unit = {
    val n = v.count()
    val ncells = math.max(IvfPqMinCells,
      math.floor(math.sqrt(n.toDouble)).toLong)
    val need = math.max(ncells, IvfPqK.toLong)
    val present = v.filter(col("vec_id") >= 0 && col("vec_id") < need)
      .select(col("vec_id")).distinct().count()
    require(present == need,
      s"IVF-PQ seed contract: vec_ids 0..${need - 1} must all be present " +
        s"(found $present of $need); re-key the corpus with dense ids " +
        "before building the index")
  }

  /** Per-row cell assignment (coarse argmin-L2² = PqEncode with m=1)
    * and residual against a frozen one-row [[ivfPqCentModel]] — zero
    * shuffles, streaming-legal (stateless projection over a broadcast
    * model row). */
  private[graft] def ivfPqAssign(v: DataFrame, cents: DataFrame): DataFrame =
    v.crossJoin(broadcast(cents))
      .withColumn("cid", graft.functions.PqEncode.pqEncode(
        col("qv"), col("cflat"), 1, graft.functions.PqEncode.DerivedK,
        IvfPqDim).getItem(0))
      .withColumn("resid", zip_with(col("qv"),
        slice(col("cflat"), col("cid") * IvfPqDim + 1, lit(IvfPqDim)),
        (a, b) => a - b))

  /** One-row residual-codebook model from small (sub, code, cv)
    * rows: sorted array<struct<sub,code,cv>> plus the flat
    * (sub, code) row-major layout PqEncode/PqAdc index. */
  private def ivfPqCbRow(cb: DataFrame): DataFrame =
    cb.select(struct(col("sub"), col("code"), col("cv")).as("e"))
      .agg(sort_array(collect_list(col("e"))).as("rmodel"))
      .withColumn("rflat", flatten(transform(col("rmodel"), e => e("cv"))))

  /** LLOYD-TRAINED shared residual PQ codebook (Faiss's default: one
    * PQ over residuals, not per-cell codebooks): seeds = the first
    * IvfPqK rows' residual sub-slices, then ONE deterministic update
    * round — encode every residual against the seeds, replace each
    * (sub, code) codeword by the exact floor-div integer mean of its
    * assigned sub-vectors; an empty codeword keeps its seed. ONE row
    * out (rmodel, rflat).
    *
    * Scale shape: the encode pass is a per-row native PqEncode over a
    * broadcast seed row; the update is a posexplode partial-sum keyed
    * by (sub, code, spos) — ≤ m·k·subDim keys reach the shuffle. */
  private[graft] def ivfPqCodebook(assigned: DataFrame): DataFrame = {
    val seedCb = assigned.filter(col("vec_id") < IvfPqK)
      .select(col("vec_id").cast("int").as("code"), col("resid"))
      .withColumn("sub", explode(sequence(lit(0), lit(IvfPqM - 1))))
      .select(col("sub"), col("code"),
        slice(col("resid"), col("sub") * IvfPqSub + 1, lit(IvfPqSub)).as("cv"))
    val enc0 = assigned.crossJoin(broadcast(ivfPqCbRow(seedCb)))
      .select(col("resid"), graft.functions.PqEncode.pqEncode(
        col("resid"), col("rflat"), IvfPqM, IvfPqK, IvfPqSub).as("codes"))
    val means = enc0
      .select(col("codes"), posexplode(col("resid")).as(Seq("pos", "x")))
      .select(expr(s"CAST(pos div $IvfPqSub AS INT)").as("sub"),
        expr(s"codes[CAST(pos div $IvfPqSub AS INT)]").as("code"),
        expr(s"pos % $IvfPqSub").as("spos"), col("x"))
      .groupBy(col("sub"), col("code"), col("spos"))
      .agg(floor(sum(col("x")).cast("double") / count(lit(1)))
        .cast("long").as("m"))
      .groupBy(col("sub"), col("code"))
      .agg(transform(array_sort(collect_list(struct(col("spos"), col("m")))),
        e => e.getField("m")).as("tcv"))
    ivfPqCbRow(seedCb.join(means, Seq("sub", "code"), "left_outer")
      .select(col("sub"), col("code"),
        coalesce(col("tcv"), col("cv")).as("cv")))
  }

  /** PQ-encode assigned rows against a frozen one-row codebook:
    * (vec_id, cid, codes, rflat) — the stored index row (one byte per
    * subquantizer at IvfPqK=16). Stateless per-row native encode. */
  private[graft] def ivfPqEncodeDf(assigned: DataFrame,
                                   rcb: DataFrame): DataFrame =
    assigned.crossJoin(broadcast(rcb))
      .withColumn("codes", graft.functions.PqEncode.pqEncode(
        col("resid"), col("rflat"), IvfPqM, IvfPqK, IvfPqSub))
      .select(col("vec_id"), col("cid"), col("codes"), col("rflat"))

  /** The DEFAULT re-rank shortlist: R = 8·k exact distances per
    * query — O(k), corpus-independent, the production IVFADC setting
    * (X80IvfPqSpec + x98 prove it holds recall@5 ≥ 90% on a
    * clustered corpus). */
  private[graft] val IvfPqRerankFixed = 8L * TopK

  /** The FIXTURE-ONLY shortlist knob (one-row table): R = max(3·k,
    * n div 10). Isotropic noise is the one regime where the ADC
    * margin concentrates and no corpus-independent shortlist holds
    * recall — the gate corpus is exactly that fixture, so x80/x83
    * run with this knob ON and report the honest recall. Per-query
    * cost under the knob is linear in the corpus: do NOT ship it as
    * a default (it defeats the point of the index at 100 TB). */
  private def ivfPqRerankR(v: DataFrame): DataFrame =
    v.agg(count(lit(1)).as("n"))
      .select(greatest(lit(3L * TopK), expr("n div 10")).as("rr"))

  /** The ADC half of the IVFADC serving path over persisted (vec_id,
    * qv) rows: build both trained models, encode, probe, ADC-rank —
    * (qid, vec_id, rn, adist), the re-rank shortlist per query
    * (filter rn ≤ TopK for the ADC-only answer). `corpusScaledR`
    * selects the fixture-only [[ivfPqRerankR]] over the default
    * fixed R = [[IvfPqRerankFixed]]. */
  private[graft] def ivfPqAdcRanked(v: DataFrame,
                                    corpusScaledR: Boolean = false)
      : DataFrame = {
      // each model row is tiny, but DERIVING it costs a corpus pass
      // (the Lloyd update's assign-and-mean); unpersisted, every
      // consumer (assignment, probes, codebook, encode) re-runs that
      // subtree — measured 2 extra corpus passes in the x80 plan.
      // Persist + eager count so the passes run once (the x14 cold-
      // cache race discipline).
      val cents = ivfPqCentModel(v).persist()
      cents.count()
      // the coarse assignment feeds both the codebook training and
      // the encode UNPERSISTED on purpose: it is a stateless per-row
      // native encode over the persisted v, and the round-15 A/B
      // (tools/LifecycleAbProbe) measured caching its wide output
      // SLOWER than recomputing it (3.38 s vs 3.17 s through the x80
      // pipeline, min-of-3 same session)
      val assigned = ivfPqAssign(v, cents)
      val rcb = ivfPqCodebook(assigned).persist()
      rcb.count()
      val enc = ivfPqEncodeDf(assigned, rcb)
      ivfPqAdcRankedWith(v, cents, enc, corpusScaledR)
  }

  /** The SERVING half of [[ivfPqAdcRanked]], parameterized on a
    * frozen index: `cents` a one-row coarse model (cmodel, cflat),
    * `enc` the encoded rows (vec_id, cid, codes, rflat) — exactly
    * what [[graft.AnnStore]] stores at rest (readCodes + the model
    * row's rflat), so the probe path over an APPENDED index is the
    * same code the in-memory build runs. Queries (and the fixture
    * re-rank knob's n) come from `v`. */
  private[graft] def ivfPqAdcRankedWith(v: DataFrame, cents: DataFrame,
      enc: DataFrame, corpusScaledR: Boolean): DataFrame = {
      // query probes: nprobe = max(6, ⌈√cells⌉) nearest cells, one
      // residual query per probed cell (queries × cells rows — a
      // window over a tiny table; nprobe is derived from the model
      // row itself, so probe/cells = 1/√cells vanishes with scale)
      val probes = v.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("qv").as("qq"))
        .crossJoin(broadcast(cents))
        .withColumn("nprobe", greatest(lit(IvfPqMinProbe),
          ceil(sqrt(size(col("cmodel")).cast("double")))))
        .select(col("qid"), col("qq"), col("nprobe"),
          explode(col("cmodel")).as("ce"))
        .withColumn("l2", l2sqCol(col("qq"), col("ce")("cv")))
      val wp = Window.partitionBy(col("qid"))
        .orderBy(col("l2"), col("ce")("cid"))
      val probed = probes.withColumn("prn", row_number().over(wp))
        .filter(col("prn") <= col("nprobe"))
        .select(col("qid"), col("ce")("cid").as("cid"),
          zip_with(col("qq"), col("ce")("cv"), (a, b) => a - b).as("qr"))
      // ADC scan over the probed cells only
      val scored = broadcast(probed).join(enc, Seq("cid"))
        .filter(col("qid") =!= col("vec_id"))
        .withColumn("adist", graft.functions.PqAdc.pqAdc(
          col("qr"), col("codes"), col("rflat"), IvfPqM, IvfPqK, IvfPqSub))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("adist"), col("vec_id"))
      val ranked = scored.withColumn("rn", row_number().over(w))
      val cut =
        if (corpusScaledR) ranked.crossJoin(broadcast(ivfPqRerankR(v)))
          .filter(col("rn") <= col("rr"))
        else ranked.filter(col("rn") <= lit(IvfPqRerankFixed))
      cut.select(col("qid"), col("vec_id"), col("rn"), col("adist"))
  }

  /** The re-rank stage production IVFADC runs after the ADC scan
    * (Jégou et al. §V): the ADC top-R candidates — a broadcastable
    * queries×R table — re-order by EXACT quantized L2² against the
    * true vectors, fetched with one broadcast-side equi-join per side
    * (the corpus streams map-side; only R·|q| rows compute a
    * distance). Returns (qid, vec_id, rn, adist, el2), top TopK by
    * (el2, vec_id). */
  private[graft] def ivfPqRerank(v: DataFrame, cand: DataFrame): DataFrame = {
    val q = v.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("qv").as("qq"))
    val exact = v.join(broadcast(cand.select(col("qid"), col("vec_id"),
        col("adist"))), "vec_id")
      .join(broadcast(q), "qid")
      .withColumn("el2", l2sqCol(col("qq"), col("qv")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("el2"), col("vec_id"))
    exact.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TopK)
      .select(col("qid"), col("vec_id"), col("rn"), col("adist"),
        col("el2"))
  }

  /** The full IVFADC serving path: ADC scan to the shortlist (fixed
    * R = [[IvfPqRerankFixed]] by default; `corpusScaledR` = the
    * fixture-only knob), exact re-rank to top TopK — (qid, vec_id,
    * rn, adist, el2). */
  private[graft] def ivfPqTopK(v: DataFrame,
                               corpusScaledR: Boolean = false): DataFrame =
    ivfPqRerank(v, ivfPqAdcRanked(v, corpusScaledR))

  /** [[ivfPqTopK]] served from a FROZEN index (see
    * [[ivfPqAdcRankedWith]]) — the [[graft.AnnStore]] read path:
    * ADC scan over the stored codes, exact re-rank against `v`. */
  private[graft] def ivfPqTopKFrozen(v: DataFrame, cents: DataFrame,
      enc: DataFrame, corpusScaledR: Boolean = false): DataFrame =
    ivfPqRerank(v, ivfPqAdcRankedWith(v, cents, enc, corpusScaledR))

  /** Shared oracle core for x80/x83/x98: every CTE through `adcr`
    * (the ADC top-R candidates, rank kept) and `rer` (the exact
    * re-rank, rank `rern`) — x80's final answer is rer at rern ≤
    * TopK, x83/x98 audit BOTH cuts. `vCte` supplies the corpus
    * (x98 swaps in the clustered construction); `corpusScaledR`
    * mirrors the Spark-side fixture knob. */
  private def ivfPqOracleCore(vCte: String,
                              corpusScaledR: Boolean): String = s"""v AS (
              $vCte),
            seeds AS (
              SELECT CAST(vec_id AS INT) AS cid, qv AS cv
              FROM v WHERE vec_id < (SELECT GREATEST($IvfPqMinCells,
                CAST(FLOOR(SQRT(count(*))) AS BIGINT)) FROM v)),
            sasg0 AS (
              SELECT v.vec_id, v.qv, c.cid,
                CAST(list_dot_product(v.qv, v.qv)
                  - 2*list_dot_product(v.qv, c.cv)
                  + list_dot_product(c.cv, c.cv) AS BIGINT) AS d
              FROM v CROSS JOIN seeds c),
            sasg AS MATERIALIZED (
              SELECT vec_id, qv, cid
              FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY d, cid) AS rn
                    FROM sasg0) WHERE rn = 1),
            cmeans AS (
              SELECT cid, u.i AS pos,
                CAST(FLOOR(CAST(sum(qv[u.i + 1]) AS DOUBLE) / count(*))
                  AS BIGINT) AS m
              FROM sasg, unnest(range($IvfPqDim)) AS u(i)
              GROUP BY 1, 2),
            ctrained AS (
              SELECT cid, list(m ORDER BY pos) AS tcv
              FROM cmeans GROUP BY 1),
            cents AS MATERIALIZED (
              SELECT s.cid, COALESCE(t.tcv, s.cv) AS cv
              FROM seeds s LEFT JOIN ctrained t USING (cid)),
            asg0 AS (
              SELECT v.vec_id, v.qv, c.cid, c.cv,
                CAST(list_dot_product(v.qv, v.qv)
                  - 2*list_dot_product(v.qv, c.cv)
                  + list_dot_product(c.cv, c.cv) AS BIGINT) AS d
              FROM v CROSS JOIN cents c),
            assigned AS MATERIALIZED (
              SELECT vec_id, cid,
                list_transform(range($IvfPqDim), i -> qv[i+1] - cv[i+1]) AS rv
              FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY d, cid) AS rn
                    FROM asg0) WHERE rn = 1),
            subs AS (SELECT unnest(range($IvfPqM)) AS sub),
            rcb0 AS (
              SELECT s.sub, CAST(r.vec_id AS INT) AS code,
                     list_slice(r.rv, s.sub*$IvfPqSub + 1, s.sub*$IvfPqSub + $IvfPqSub) AS cv
              FROM assigned r CROSS JOIN subs s WHERE r.vec_id < $IvfPqK),
            rdist0 AS (
              SELECT r.vec_id, b.sub, b.code,
                CAST(list_dot_product(list_slice(r.rv, b.sub*$IvfPqSub+1, b.sub*$IvfPqSub+$IvfPqSub),
                                      list_slice(r.rv, b.sub*$IvfPqSub+1, b.sub*$IvfPqSub+$IvfPqSub))
                  - 2*list_dot_product(list_slice(r.rv, b.sub*$IvfPqSub+1, b.sub*$IvfPqSub+$IvfPqSub), b.cv)
                  + list_dot_product(b.cv, b.cv) AS BIGINT) AS d
              FROM assigned r CROSS JOIN rcb0 b),
            enc0 AS MATERIALIZED (
              SELECT vec_id, sub, code FROM (
                SELECT vec_id, sub, code,
                  row_number() OVER (PARTITION BY vec_id, sub
                    ORDER BY d, code) AS rn
                FROM rdist0) WHERE rn = 1),
            cbmeans AS (
              SELECT e.sub, e.code, u.i AS spos,
                CAST(FLOOR(CAST(sum(r.rv[e.sub*$IvfPqSub + u.i + 1]) AS DOUBLE)
                  / count(*)) AS BIGINT) AS m
              FROM enc0 e JOIN assigned r USING (vec_id),
                   unnest(range($IvfPqSub)) AS u(i)
              GROUP BY 1, 2, 3),
            cbtrained AS (
              SELECT sub, code, list(m ORDER BY spos) AS cv
              FROM cbmeans GROUP BY 1, 2),
            rcb AS MATERIALIZED (
              SELECT s.sub, s.code, COALESCE(t.cv, s.cv) AS cv
              FROM rcb0 s LEFT JOIN cbtrained t
                ON t.sub = s.sub AND t.code = s.code),
            rdist AS (
              SELECT r.vec_id, b.sub, b.code,
                CAST(list_dot_product(list_slice(r.rv, b.sub*$IvfPqSub+1, b.sub*$IvfPqSub+$IvfPqSub),
                                      list_slice(r.rv, b.sub*$IvfPqSub+1, b.sub*$IvfPqSub+$IvfPqSub))
                  - 2*list_dot_product(list_slice(r.rv, b.sub*$IvfPqSub+1, b.sub*$IvfPqSub+$IvfPqSub), b.cv)
                  + list_dot_product(b.cv, b.cv) AS BIGINT) AS d
              FROM assigned r CROSS JOIN rcb b),
            enc AS (
              SELECT e.vec_id, a.cid, e.sub, e.code
              FROM (SELECT vec_id, sub, code FROM (
                      SELECT vec_id, sub, code,
                        row_number() OVER (PARTITION BY vec_id, sub
                          ORDER BY d, code) AS rn
                      FROM rdist) WHERE rn = 1) e
              JOIN assigned a ON a.vec_id = e.vec_id),
            rr AS (${
              if (corpusScaledR)
                s"""SELECT CAST(GREATEST(${3L * TopK}, count(*) // 10)
                  AS BIGINT) AS rr FROM v"""
              else s"SELECT CAST($IvfPqRerankFixed AS BIGINT) AS rr"}),
            pl2 AS (
              SELECT q.vec_id AS qid, q.qv AS qq, c.cid, c.cv,
                CAST(list_dot_product(q.qv, q.qv)
                  - 2*list_dot_product(q.qv, c.cv)
                  + list_dot_product(c.cv, c.cv) AS BIGINT) AS d
              FROM v q CROSS JOIN cents c WHERE q.vec_id < $NumQueries),
            probes AS (
              SELECT qid, cid,
                list_transform(range($IvfPqDim), i -> qq[i+1] - cv[i+1]) AS qr
              FROM (SELECT *, row_number() OVER (PARTITION BY qid
                      ORDER BY d, cid) AS prn
                    FROM pl2)
              WHERE prn <= (SELECT GREATEST($IvfPqMinProbe,
                CAST(CEIL(SQRT(count(*))) AS BIGINT)) FROM cents)),
            scored AS (
              SELECT p.qid, e.vec_id,
                CAST(SUM(CAST(
                  list_dot_product(list_slice(p.qr, b.sub*$IvfPqSub+1, b.sub*$IvfPqSub+$IvfPqSub),
                                   list_slice(p.qr, b.sub*$IvfPqSub+1, b.sub*$IvfPqSub+$IvfPqSub))
                  - 2*list_dot_product(list_slice(p.qr, b.sub*$IvfPqSub+1, b.sub*$IvfPqSub+$IvfPqSub), b.cv)
                  + list_dot_product(b.cv, b.cv) AS BIGINT)) AS BIGINT) AS adist
              FROM probes p
              JOIN enc e ON e.cid = p.cid AND e.vec_id <> p.qid
              JOIN rcb b ON b.sub = e.sub AND b.code = e.code
              GROUP BY 1, 2),
            adcr AS (
              SELECT qid, vec_id, adist, rn FROM (
                SELECT qid, vec_id, adist,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY adist, vec_id) AS rn
                FROM scored) CROSS JOIN rr WHERE rn <= rr.rr),
            rer AS (
              SELECT qid, vec_id, adist, el2,
                row_number() OVER (PARTITION BY qid
                  ORDER BY el2, vec_id) AS rern
              FROM (
                SELECT c.qid, c.vec_id, c.adist,
                  CAST(list_dot_product(q.qv, q.qv)
                    - 2*list_dot_product(q.qv, x.qv)
                    + list_dot_product(x.qv, x.qv) AS BIGINT) AS el2
                FROM adcr c
                JOIN v x ON x.vec_id = c.vec_id
                JOIN v q ON q.vec_id = c.qid))"""

  /** The gate corpus's quantized-vector CTE (shared by x80/x83). */
  private val ivfPqVCte: String = """SELECT vec_id, list_transform(embedding,
                x -> CAST(FLOOR(x * 1000) AS BIGINT)) AS qv
              FROM embeddings"""

  private val x80 = GateQuery(
    "x80_knn_ivfpq",
    (s, d) => {
      val quant = transform(col("embedding"),
        x => floor(x * lit(1000)).cast("long"))
      val v = Tables.embeddings(s, d)
        .select(col("vec_id"), quant.as("qv"))
        .persist() // centroids, codebook, corpus and queries all consume it
      v.count() // eager: consumers race on a cold cache (see x14)
      // corpusScaledR: the gate corpus IS the isotropic fixture
      ordered(ivfPqTopK(v, corpusScaledR = true))
    },
    Some(s"""WITH ${ivfPqOracleCore(ivfPqVCte, corpusScaledR = true)}
            SELECT qid, vec_id, rern AS rn, adist, el2 FROM rer
            WHERE rern <= $TopK
            ORDER BY 1,2,3,4,5"""))

  // ---------------------------------------------------------------- x81
  // DSIR-style importance weighting (Xie et al., "Data Selection for
  // Language Models via Importance Resampling", NeurIPS 2023): score
  // every document by how much its hashed-unigram profile looks like
  // a TARGET slice relative to the raw corpus. Features are hashed
  // n-gram bucket counts (here unigrams into DsirB buckets — the
  // paper's hashed n-gram estimator); the per-bucket importance
  // weight is the add-1-smoothed log-ratio log2(p_b / q_b) between
  // the target (lang='en') and raw bucket distributions, in WHOLE
  // BITS via the shared integer scorer (decimal(38,0)/HUGEINT
  // products — exact at any corpus size, the x77 pattern); a doc's
  // score is the sum of its token instances' bucket weights (= the
  // log importance weight of the doc under the bag-of-buckets
  // model). Downstream selection is a top-k / weighted sample over
  // `dsir_bits` (x13/x60 shapes) — the gate emits the scores.
  //
  // Scale shape: two corpus scans, ZERO corpus shuffles. Scan 1
  // aggregates token buckets to ≤ DsirB keys (map-side partial agg —
  // the shuffle is B rows); the weight table (B rows) collapses to
  // ONE broadcast array row; scan 2 scores each doc in a single
  // per-row HOF (bucket = md5-derived, weight = element_at into the
  // broadcast array). No vocabulary table, no per-doc feature
  // explosion reaches a shuffle.
  private val DsirB = 256

  /** x81's engine, parameterized for fixtures: (doc_id, text, lang)
    * rows in, (doc_id, is_target, n_tok, dsir_bits) out; target slice
    * = lang == 'en'. X81DsirSpec pins it to a driver-side BigInt
    * reference over the real corpus. */
  private[graft] def dsirWeights(s: SparkSession, docs: DataFrame): DataFrame =
    ordered(dsirScore(docs, dsirWeightModel(s, docs))
      .select(col("doc_id"),
        when(col("lang") === "en", 1).otherwise(0).cast("int").as("is_target"),
        col("n_tok"), col("dsir_bits")))

  /** Train the bucket-weight model: ONE row holding `wa`, the DsirB
    * whole-bit log-ratio weights in bucket order. */
  private[graft] def dsirWeightModel(s: SparkSession,
                                     docs: DataFrame): DataFrame = {
      val tokB = docs.select(col("lang"),
        explode(split(col("text"), " ")).as("t"))
        .select(col("lang"), pmod(hex32(md5(col("t"))), lit(DsirB)).as("b"))
      val cnt = tokB.groupBy(col("b")).agg(
        count(lit(1)).as("qc"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("pc"))
      val tot = cnt.agg(sum(col("qc")).as("qtok"), sum(col("pc")).as("ptok"))
      s.range(0, DsirB.toLong).select(col("id").as("b"))
        .join(cnt, Seq("b"), "left_outer")
        .crossJoin(tot)
        .withColumn("pc1", coalesce(col("pc"), lit(0L)) + 1)
        .withColumn("qc1", coalesce(col("qc"), lit(0L)) + 1)
        .withColumn("w", expr(wholeBitLog2Sql(
          s"cast(pc1 as decimal(38,0)) * (qtok + $DsirB)",
          s"cast(qc1 as decimal(38,0)) * (ptok + $DsirB)")))
        .select(struct(col("b"), col("w")).as("e"))
        .agg(sort_array(collect_list(col("e"))).as("ws"))
        .withColumn("wa", transform(col("ws"), e => e("w")))
        .select(col("wa"))
  }

  /** Score (doc_id, text, …) rows against a frozen one-row
    * [[dsirWeightModel]]: one per-row HOF, zero shuffles,
    * streaming-legal — the production DSIR shape (weights trained
    * offline, stream scored at ingest). Keeps the input's other
    * columns. */
  private[graft] def dsirScore(docs: DataFrame, model: DataFrame): DataFrame = {
      val score = aggregate(
        transform(split(col("text"), " "),
          t => element_at(col("wa"),
            (pmod(hex32(md5(t)), lit(DsirB)) + 1).cast("int"))),
        lit(0L), (acc, x) => acc + x)
      docs.crossJoin(broadcast(model))
        .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
        .withColumn("dsir_bits", score)
        .drop("wa")
  }

  private val x81 = GateQuery(
    "x81_dsir_weights",
    (s, d) => dsirWeights(s, Tables.documents(s, d)),
    Some(s"""WITH tok AS (
              SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
              FROM documents),
            tok2 AS (SELECT doc_id, lang, md5(t) AS m FROM tok),
            tb AS MATERIALIZED (
              SELECT doc_id, lang, (${duckHex32("m")} % $DsirB) AS b
              FROM tok2),
            cnt AS (
              SELECT b, count(*) AS qc,
                     sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pc
              FROM tb GROUP BY 1),
            tot AS (
              SELECT CAST(sum(qc) AS BIGINT) AS qtok,
                     CAST(sum(pc) AS BIGINT) AS ptok FROM cnt),
            spine AS (SELECT unnest(range($DsirB)) AS b),
            w AS (
              SELECT s.b,
                ${duckWholeBitLog2(
                  s"CAST(COALESCE(c.pc, 0) + 1 AS HUGEINT) * (t.qtok + $DsirB)",
                  s"CAST(COALESCE(c.qc, 0) + 1 AS HUGEINT) * (t.ptok + $DsirB)")} AS w
              FROM spine s LEFT JOIN cnt c ON c.b = s.b CROSS JOIN tot t),
            doc AS (
              SELECT tb.doc_id, count(*) AS n_tok,
                     CAST(sum(w.w) AS BIGINT) AS dsir_bits
              FROM tb JOIN w ON w.b = tb.b GROUP BY 1)
            SELECT d.doc_id,
                   CAST(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS INT) AS is_target,
                   CAST(x.n_tok AS BIGINT) AS n_tok, x.dsir_bits
            FROM documents d JOIN doc x ON x.doc_id = d.doc_id
            ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- x82
  // Small-file compaction planning — the table-maintenance move next
  // to x76's Z-ordering (Delta/Iceberg OPTIMIZE bin-packing): given
  // file metadata (id, bytes), assign files to target-sized output
  // bins. True first-fit-decreasing is inherently sequential; the
  // parallel-friendly standard is SORTED-FILL: order by (bytes desc,
  // id), running byte offset, bin = start-offset div target — each
  // bin's content is contiguous in the sorted order, total size ~
  // target (a file straddling a boundary overflows its bin by < its
  // own size; no bin merges two sort-distant files).
  //
  // Scale shape: this is a METADATA-scale op — one row per FILE, not
  // per record (100 TB at 128 MB files ≈ 800k rows), so the single
  // global running-sum window is the documented contract (the same
  // rollup-sized argument as overlapMatrix); were the file count
  // itself huge, the two-level salted shape of x54 applies per
  // prefix. The gate models files as the documents table's
  // (doc_id, n_chars).
  private val CompactTarget = 4096L

  /** Sorted-fill compaction plan over (file_id, bytes) rows:
    * (file_id, bytes, bin, bin_files, bin_bytes). */
  private[graft] def compactionPlan(files: DataFrame,
                                    target: Long = CompactTarget): DataFrame = {
    val w = Window.orderBy(col("bytes").desc, col("file_id"))
    val binned = files
      .withColumn("cum", sum(col("bytes")).over(w))
      .withColumn("bin", expr(s"(cum - bytes) div $target"))
      .drop("cum")
    val stats = binned.groupBy(col("bin")).agg(
      count(lit(1)).as("bin_files"), sum(col("bytes")).as("bin_bytes"))
    binned.join(stats, Seq("bin"))
      .select(col("file_id"), col("bytes"), col("bin"),
        col("bin_files"), col("bin_bytes"))
  }

  private val x82 = GateQuery(
    "x82_compaction_plan",
    (s, d) => ordered(compactionPlan(
      Tables.documents(s, d)
        .select(col("doc_id").as("file_id"), col("n_chars").as("bytes")))),
    Some(s"""WITH f AS (
              SELECT doc_id AS file_id, n_chars AS bytes FROM documents),
            b AS (
              SELECT file_id, bytes,
                CAST((sum(bytes) OVER (ORDER BY bytes DESC, file_id)
                  - bytes) // $CompactTarget AS BIGINT) AS bin
              FROM f),
            s AS (
              SELECT bin, count(*) AS bin_files,
                     CAST(sum(bytes) AS BIGINT) AS bin_bytes
              FROM b GROUP BY 1)
            SELECT b.file_id, b.bytes, b.bin, s.bin_files, s.bin_bytes
            FROM b JOIN s USING (bin)
            ORDER BY 1,2,3,4,5"""))

  // ---------------------------------------------------------------- x83
  // IVF-PQ recall audit — the audit family applied to x80's COMPOSED
  // index: x66 measures what the coarse partitioning loses, x74 what
  // the PQ codes distort; this measures what the full IVFADC path
  // (probe pruning + residual quantization TOGETHER) returns against
  // the exact integer-L2² top-K, per query in integer basis points.
  // Composition can lose more than its parts (a true neighbor in an
  // unprobed cell AND rank displaced by ADC error), which is why
  // serving systems publish recall@k for the composed index, not per
  // stage. Scale shape: the truth pass is the audit trade — a
  // broadcast of the (sampled) query set against one corpus scan
  // (x06's shape); everything else reads x80's own answers
  // (queries×K rows). All-integer, so the oracle hash must match.
  //
  // Expected numbers on THIS corpus (after the round-11 training and
  // tuning of x80 — Lloyd-trained coarse cells + codebook, m=16
  // subquantizers, nprobe=6/8, corpus-scaled re-rank shortlist):
  // measured recall@5 ≥ 94% at sf0.01 / 98% at sf0.1 / 96% at sf1,
  // with the ADC-only cut far below it — the audit exposes both the
  // re-rank LIFT and the residual probe/quantization loss. The
  // pre-training construction measured 20-46%: isotropic embeddings
  // are the adversarial case (distances concentrate, the coarse
  // quantizer prunes near-blindly at small nprobe), which is exactly
  // why the audit, not the index, is the trustworthy component.
  /** The recall-audit body shared by x83 (isotropic gate corpus,
    * fixture knob ON) and x98 (clustered corpus, production default):
    * exact-L2² truth top-K per query; hits for BOTH the re-ranked
    * answer and the ADC-only cut, integer basis points. `v` must be
    * persisted (index build, queries and truth scan all consume it). */
  private[graft] def ivfPqRecallAudit(v: DataFrame,
                                      corpusScaledR: Boolean): DataFrame = {
      val q = v.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("qv").as("qq"))
      val wt = Window.partitionBy(col("qid"))
        .orderBy(col("l2"), col("vec_id"))
      val truthK = v.crossJoin(broadcast(q))
        .filter(col("qid") =!= col("vec_id"))
        .withColumn("l2", l2sqCol(col("qq"), col("qv")))
        .withColumn("rn", row_number().over(wt))
        .filter(col("rn") <= TopK)
        .select(col("qid"), col("vec_id"))
      // both cuts of ONE ADC ranking: the re-ranked answer (x80's
      // path) and the ADC-only top-K — the audit exposes the re-rank
      // LIFT, which is the number that justifies the extra exact pass
      val adc = ivfPqAdcRanked(v, corpusScaledR).persist()
      adc.count() // re-rank + adc-only cut both consume it
      def recallOf(ans: DataFrame, h: String) =
        ans.select(col("qid"), col("vec_id"))
          .join(truthK, Seq("qid", "vec_id"), "left_semi")
          .groupBy(col("qid")).agg(count(lit(1)).as(h))
      ordered(q.select(col("qid"))
        .join(recallOf(ivfPqRerank(v, adc), "hits"), Seq("qid"), "left_outer")
        .join(recallOf(adc.filter(col("rn") <= TopK), "hits_adc"),
          Seq("qid"), "left_outer")
        .select(col("qid"),
          coalesce(col("hits"), lit(0L)).as("hits"),
          coalesce(col("hits_adc"), lit(0L)).as("hits_adc"))
        .withColumn("recall_bp", expr(s"hits * 10000 div $TopK"))
        .withColumn("recall_adc_bp", expr(s"hits_adc * 10000 div $TopK")))
  }

  /** The recall-audit oracle tail shared by x83/x98 (truth, both
    * hit counts, basis points) over [[ivfPqOracleCore]]. */
  private def ivfPqRecallOracle(vCte: String,
                                corpusScaledR: Boolean): String =
    s"""WITH ${ivfPqOracleCore(vCte, corpusScaledR)},
            truth AS (
              SELECT qid, vec_id FROM (
                SELECT q.vec_id AS qid, c.vec_id,
                  row_number() OVER (PARTITION BY q.vec_id ORDER BY
                    CAST(list_dot_product(q.qv, q.qv)
                      - 2*list_dot_product(q.qv, c.qv)
                      + list_dot_product(c.qv, c.qv) AS BIGINT),
                    c.vec_id) AS rn
                FROM v q CROSS JOIN v c
                WHERE q.vec_id < $NumQueries AND c.vec_id <> q.vec_id)
              WHERE rn <= $TopK),
            hits AS (
              SELECT a.qid, CAST(count(*) AS BIGINT) AS hits
              FROM rer a
              JOIN truth t ON t.qid = a.qid AND t.vec_id = a.vec_id
              WHERE a.rern <= $TopK
              GROUP BY 1),
            hitsadc AS (
              SELECT a.qid, CAST(count(*) AS BIGINT) AS hits_adc
              FROM adcr a
              JOIN truth t ON t.qid = a.qid AND t.vec_id = a.vec_id
              WHERE a.rn <= $TopK
              GROUP BY 1)
          SELECT q.vec_id AS qid,
                 CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
                 CAST(COALESCE(ha.hits_adc, 0) AS BIGINT) AS hits_adc,
                 CAST(COALESCE(h.hits, 0) * 10000 // $TopK AS BIGINT)
                   AS recall_bp,
                 CAST(COALESCE(ha.hits_adc, 0) * 10000 // $TopK AS BIGINT)
                   AS recall_adc_bp
          FROM v q
          LEFT JOIN hits h ON h.qid = q.vec_id
          LEFT JOIN hitsadc ha ON ha.qid = q.vec_id
          WHERE q.vec_id < $NumQueries
          ORDER BY 1,2,3,4,5"""

  private val x83 = GateQuery(
    "x83_ivfpq_recall",
    (s, d) => {
      val quant = transform(col("embedding"),
        x => floor(x * lit(1000)).cast("long"))
      val v = Tables.embeddings(s, d)
        .select(col("vec_id"), quant.as("qv"))
        .persist() // index build, queries and truth scan all consume it
      v.count() // eager: consumers race on a cold cache (see x14)
      // corpusScaledR: the gate corpus IS the isotropic fixture
      ivfPqRecallAudit(v, corpusScaledR = true)
    },
    Some(ivfPqRecallOracle(ivfPqVCte, corpusScaledR = true)))

  // ---------------------------------------------------------------- x98
  // The recall proof for the PRODUCTION IVFADC default (√n cells,
  // ⌈√cells⌉ probes, FIXED re-rank R = 8·k — every knob sublinear in
  // the corpus): x83's audit run on a CLUSTERED corpus, the regime
  // real embeddings live in (x39's k-means stance: semantic
  // embeddings concentrate around topic centroids). The corpus is
  // derived DETERMINISTICALLY from the embeddings table — center j =
  // 64 × (the j-th vector), point i = center(i mod 8) + vector i —
  // so clusters are separated by ~64× the intra-cluster spread and
  // the oracle replays the construction exactly (pure integer ops:
  // %, ×, + — no engine-divergent division). X80IvfPqSpec
  // floor-asserts mean recall@5 ≥ 90% on this gate's output; a
  // quantizer regression that stayed hash-green (both engines
  // replaying the same broken construction) fails there.
  private val X98Clusters = 8
  private val X98Spread = 64L

  /** The deterministic clustered corpus: (vec_id, qv). */
  private[graft] def x98ClusteredCorpus(s: SparkSession,
                                        d: String): DataFrame = {
      val quant = transform(col("embedding"),
        x => floor(x * lit(1000)).cast("long"))
      val base = Tables.embeddings(s, d)
        .select(col("vec_id"), quant.as("qv0"))
      val centers = base.filter(col("vec_id") < X98Clusters)
        .select(col("vec_id").as("cj"),
          transform(col("qv0"), x => x * lit(X98Spread)).as("cvv"))
      base.join(broadcast(centers), base("vec_id") % X98Clusters === col("cj"))
        .select(col("vec_id"),
          zip_with(col("cvv"), col("qv0"), (a, b) => a + b).as("qv"))
  }

  private val x98VCte: String = s"""SELECT b.vec_id,
                list_transform(range(len(b.qv)),
                  i -> $X98Spread * c.qv[i+1] + b.qv[i+1]) AS qv
              FROM (SELECT vec_id, list_transform(embedding,
                      x -> CAST(FLOOR(x * 1000) AS BIGINT)) AS qv
                    FROM embeddings) b
              JOIN (SELECT vec_id AS cj, list_transform(embedding,
                      x -> CAST(FLOOR(x * 1000) AS BIGINT)) AS qv
                    FROM embeddings WHERE vec_id < $X98Clusters) c
                ON c.cj = b.vec_id % $X98Clusters"""

  private val x98 = GateQuery(
    "x98_ivfpq_clustered",
    (s, d) => {
      val v = x98ClusteredCorpus(s, d)
        .persist() // index build, queries and truth scan all consume it
      v.count() // eager: consumers race on a cold cache (see x14)
      // corpusScaledR OFF: this gate proves the production default
      ivfPqRecallAudit(v, corpusScaledR = false)
    },
    Some(ivfPqRecallOracle(x98VCte, corpusScaledR = false)))

  // ---------------------------------------------------------------- x99
  // Incremental ANN-index maintenance — x86/x95's daily-crawl move
  // applied to the IVF-PQ index (graft.AnnStore): the index is built
  // once on HISTORY (models trained there), the day's delta is
  // APPENDED by encoding per-row against the FROZEN coarse centroids
  // and residual codebook (a stateless broadcast projection — cost ∝
  // delta, no re-train, no history rescan), staged into a fresh
  // cid-partitioned generation and committed atomically; a compaction
  // folds the delta files. Hash-green proves the x95-shaped lemma END
  // TO END through the at-rest lifecycle (build → append → compact →
  // read): the stored index equals encoding the UNION against the
  // history-frozen models — the oracle replays exactly that (train on
  // the first half, encode everything). What append cannot fix —
  // model drift vs a full re-train — is AnnStoreSpec's measured
  // recall audit, not this equality gate.
  //
  // Scale shape: train cost is confined to build (history-sized, run
  // when the drift audit says so); the daily path is per-row encode +
  // one manifest commit, and the serving probe partition-prunes to
  // nprobe/cells of each generation (AnnStoreSpec proves the pruning
  // from the physical scan).
  private val x99 = GateQuery(
    "x99_ann_index_append",
    (s, d) => {
      val quant = transform(col("embedding"),
        x => floor(x * lit(1000)).cast("long"))
      val v = Tables.embeddings(s, d)
        .select(col("vec_id"), quant.as("qv"))
        .persist() // history build, delta encode and split all consume it
      v.count()
      val h = v.agg(expr("count(1) div 2").as("h"))
      val hist = v.crossJoin(broadcast(h)).filter(col("vec_id") < col("h"))
        .select(col("vec_id"), col("qv"))
      val delta = v.crossJoin(broadcast(h)).filter(col("vec_id") >= col("h"))
        .select(col("vec_id"), col("qv"))
      val root = java.nio.file.Files
        .createTempDirectory("graft_x99_annstore")
      TempReaper.register(root) // scratch store: reclaim at JVM exit
      graft.AnnStore.build(hist, root.toString)
      graft.AnnStore.append(delta, root.toString)
      graft.AnnStore.compact(s, root.toString)
      ordered(graft.AnnStore.readCodes(s, root.toString)
        .select(col("vec_id"), col("cid").cast("int").as("cid"),
          concat_ws(" ", col("codes").cast("array<string>")).as("codes")))
    },
    Some(s"""WITH v AS (
              $ivfPqVCte),
            h AS (SELECT count(*) // 2 AS h FROM v),
            hist AS (SELECT v.* FROM v, h WHERE v.vec_id < h.h),
            seeds AS (
              SELECT CAST(vec_id AS INT) AS cid, qv AS cv
              FROM hist WHERE vec_id < (SELECT GREATEST($IvfPqMinCells,
                CAST(FLOOR(SQRT(count(*))) AS BIGINT)) FROM hist)),
            sasg0 AS (
              SELECT hh.vec_id, hh.qv, c.cid,
                CAST(list_dot_product(hh.qv, hh.qv)
                  - 2*list_dot_product(hh.qv, c.cv)
                  + list_dot_product(c.cv, c.cv) AS BIGINT) AS d
              FROM hist hh CROSS JOIN seeds c),
            sasg AS MATERIALIZED (
              SELECT vec_id, qv, cid
              FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY d, cid) AS rn
                    FROM sasg0) WHERE rn = 1),
            cmeans AS (
              SELECT cid, u.i AS pos,
                CAST(FLOOR(CAST(sum(qv[u.i + 1]) AS DOUBLE) / count(*))
                  AS BIGINT) AS m
              FROM sasg, unnest(range($IvfPqDim)) AS u(i)
              GROUP BY 1, 2),
            ctrained AS (
              SELECT cid, list(m ORDER BY pos) AS tcv
              FROM cmeans GROUP BY 1),
            cents AS MATERIALIZED (
              SELECT s.cid, COALESCE(t.tcv, s.cv) AS cv
              FROM seeds s LEFT JOIN ctrained t USING (cid)),
            hasg0 AS (
              SELECT hh.vec_id, hh.qv, c.cid, c.cv,
                CAST(list_dot_product(hh.qv, hh.qv)
                  - 2*list_dot_product(hh.qv, c.cv)
                  + list_dot_product(c.cv, c.cv) AS BIGINT) AS d
              FROM hist hh CROSS JOIN cents c),
            hassigned AS MATERIALIZED (
              SELECT vec_id, cid,
                list_transform(range($IvfPqDim), i -> qv[i+1] - cv[i+1]) AS rv
              FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY d, cid) AS rn
                    FROM hasg0) WHERE rn = 1),
            subs AS (SELECT unnest(range($IvfPqM)) AS sub),
            rcb0 AS (
              SELECT s.sub, CAST(r.vec_id AS INT) AS code,
                list_slice(r.rv, s.sub*$IvfPqSub + 1, s.sub*$IvfPqSub + $IvfPqSub) AS cv
              FROM hassigned r CROSS JOIN subs s WHERE r.vec_id < $IvfPqK),
            rdist0 AS (
              SELECT r.vec_id, b.sub, b.code,
                CAST(list_dot_product(list_slice(r.rv, b.sub*$IvfPqSub+1, b.sub*$IvfPqSub+$IvfPqSub),
                                      list_slice(r.rv, b.sub*$IvfPqSub+1, b.sub*$IvfPqSub+$IvfPqSub))
                  - 2*list_dot_product(list_slice(r.rv, b.sub*$IvfPqSub+1, b.sub*$IvfPqSub+$IvfPqSub), b.cv)
                  + list_dot_product(b.cv, b.cv) AS BIGINT) AS d
              FROM hassigned r CROSS JOIN rcb0 b),
            enc0 AS MATERIALIZED (
              SELECT vec_id, sub, code FROM (
                SELECT vec_id, sub, code,
                  row_number() OVER (PARTITION BY vec_id, sub
                    ORDER BY d, code) AS rn
                FROM rdist0) WHERE rn = 1),
            cbmeans AS (
              SELECT e.sub, e.code, u.i AS spos,
                CAST(FLOOR(CAST(sum(r.rv[e.sub*$IvfPqSub + u.i + 1]) AS DOUBLE)
                  / count(*)) AS BIGINT) AS m
              FROM enc0 e JOIN hassigned r USING (vec_id),
                   unnest(range($IvfPqSub)) AS u(i)
              GROUP BY 1, 2, 3),
            cbtrained AS (
              SELECT sub, code, list(m ORDER BY spos) AS cv
              FROM cbmeans GROUP BY 1, 2),
            rcb AS MATERIALIZED (
              SELECT s.sub, s.code, COALESCE(t.cv, s.cv) AS cv
              FROM rcb0 s LEFT JOIN cbtrained t
                ON t.sub = s.sub AND t.code = s.code),
            uasg0 AS (
              SELECT x.vec_id, x.qv, c.cid, c.cv,
                CAST(list_dot_product(x.qv, x.qv)
                  - 2*list_dot_product(x.qv, c.cv)
                  + list_dot_product(c.cv, c.cv) AS BIGINT) AS d
              FROM v x CROSS JOIN cents c),
            uassigned AS MATERIALIZED (
              SELECT vec_id, cid,
                list_transform(range($IvfPqDim), i -> qv[i+1] - cv[i+1]) AS rv
              FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY d, cid) AS rn
                    FROM uasg0) WHERE rn = 1),
            urdist AS (
              SELECT r.vec_id, b.sub, b.code,
                CAST(list_dot_product(list_slice(r.rv, b.sub*$IvfPqSub+1, b.sub*$IvfPqSub+$IvfPqSub),
                                      list_slice(r.rv, b.sub*$IvfPqSub+1, b.sub*$IvfPqSub+$IvfPqSub))
                  - 2*list_dot_product(list_slice(r.rv, b.sub*$IvfPqSub+1, b.sub*$IvfPqSub+$IvfPqSub), b.cv)
                  + list_dot_product(b.cv, b.cv) AS BIGINT) AS d
              FROM uassigned r CROSS JOIN rcb b),
            uenc AS (
              SELECT vec_id, sub, code FROM (
                SELECT vec_id, sub, code,
                  row_number() OVER (PARTITION BY vec_id, sub
                    ORDER BY d, code) AS rn
                FROM urdist) WHERE rn = 1)
            SELECT u.vec_id, CAST(a.cid AS INT) AS cid,
                   string_agg(CAST(u.code AS VARCHAR), ' ' ORDER BY u.sub) AS codes
            FROM uenc u JOIN uassigned a USING (vec_id)
            GROUP BY 1, 2
            ORDER BY 1,2,3"""))

  // ---------------------------------------------------------------- x84
  // Out-of-vocabulary rate — the vocab-relative quality signal the
  // heuristic family lacks: x16 scores surface shape, x26
  // repetition, x68 bigram-LM surprisal; this scores each document
  // against the TRAINED top-V vocabulary (x31's table): the permille
  // of token instances outside it. High-OOV documents tokenize into
  // rare-piece soup (the filter CCNet applies via its LM vocabulary).
  //
  // Scale shape: the vocab is corpus-trained in one map-side-partial
  // count agg + distributed TakeOrdered (orderBy.limit — no global
  // window), collapses to ONE broadcast array row; scoring is a
  // per-row HOF membership scan (V·n_tok comparisons per doc, V
  // bounded). Two corpus scans, the only shuffle is vocabulary-sized.
  private val OovV = 256

  /** Train the top-V vocabulary as ONE sorted 1-row array: map-side
    * count agg + distributed TakeOrdered (orderBy.limit — no global
    * window). */
  private[graft] def oovVocab(docs: DataFrame, v: Int = OovV): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(v)
      .agg(sort_array(collect_list(col("tok"))).as("varr"))

  /** Score (doc_id, text, …) rows against a frozen one-row
    * [[oovVocab]]: one per-row HOF membership scan, zero shuffles,
    * streaming-legal (vocab trained offline, arrivals scored at
    * ingest — DocStreams.oovScoreStream). */
  private[graft] def oovScore(docs: DataFrame, voc: DataFrame): DataFrame = {
    val tk = split(col("text"), " ")
    // round 15: the per-token vocabulary probe is a native binary
    // search over the sorted vocab (graft.functions.OovCount) — the
    // former size(filter(tk, t -> !array_contains(varr, t))) scanned
    // all V entries per token through an interpreted lambda
    // (V·tokens compares; 41 s at sf1). varr IS sorted: oovVocab
    // builds it with sort_array — OovCount's contract.
    val oov = graft.functions.OovCount.oovCount(col("text"), col("varr"))
    docs.crossJoin(broadcast(voc))
      .select(col("doc_id"),
        size(tk).cast("long").as("n_tok"),
        oov.as("oov"))
      .withColumn("oov_permille", expr("oov * 1000 div n_tok"))
  }

  private val x84 = GateQuery(
    "x84_oov_rate",
    (s, d) => {
      val docs = Tables.documents(s, d)
      ordered(oovScore(docs, oovVocab(docs)))
    },
    Some(s"""WITH c AS (
              SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
            g AS (SELECT tok, count(*) AS cnt FROM c GROUP BY 1),
            voc AS (
              SELECT tok FROM g ORDER BY cnt DESC, tok LIMIT $OovV),
            va AS (SELECT list(tok ORDER BY tok) AS varr FROM voc),
            sc AS (
              SELECT doc_id,
                CAST(len(tk) AS BIGINT) AS n_tok,
                CAST(len(list_filter(tk,
                  x -> NOT list_contains(va.varr, x))) AS BIGINT) AS oov
              FROM (SELECT doc_id, string_split(text, ' ') AS tk
                    FROM documents), va)
            SELECT doc_id, n_tok, oov,
                   CAST(oov * 1000 // n_tok AS BIGINT) AS oov_permille
            FROM sc ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- x85
  // Prototypicality pruning (the SSL-prototypes data-selection move,
  // Sorscher et al. "Beyond neural scaling laws"): when data is
  // abundant, the EASIEST examples — those closest to their class
  // prototype — teach the least and are pruned first. Prototype =
  // the per-label exact integer sum centroid (x38's construction;
  // with unlabeled data x39's k-means supplies the labels — same
  // substrate, composition documented). Each vector's cosine to its
  // OWN prototype is bucketed by FLOOR(cos·64) — 64 is a power of
  // two, so the scaling multiply is exact and the floor bit-identical
  // across engines — and the per-label keep/prune threshold is the
  // QUANTILE BUCKET: the largest bucket t whose from-the-top
  // cumulative count reaches the prune quota (n·pm/1000). Rows at or
  // above t are pruned — the smallest bucket-aligned superset of the
  // quota, so no per-row rank (and no corpus-wide order statistic)
  // is ever computed.
  //
  // Scale shape: centroid agg = k×dim keyed partial sums (map-side
  // combined, never more rows in flight); scoring joins the k-row
  // centroid table by broadcast and runs one fused native cosine per
  // row (LongCosine); the histogram is ≤ k×129 rows and its window
  // is metadata-scale (the x82 contract) — thresholds broadcast back
  // and the flag is a stateless per-row comparison. Zero corpus-wide
  // shuffles, zero order statistics over the corpus.
  private val ProtoPrunePm = 250L // prune the most-prototypical quartile
  // Power of two: the ·64 scaling multiply is exact in a double.
  // Cross-engine bit-identity additionally requires the integer dot
  // products feeding the cosine to stay BELOW 2^53: Spark computes an
  // exact long dot then converts once to double, while DuckDB's
  // list_dot_product accumulates per-element doubles — above 2^53
  // the two roundings can diverge and a boundary row buckets
  // differently. Here |dot| ≤ dim·1000² = 2^26 with 2^27 headroom;
  // for larger dims/scales compute the oracle dot in HUGEINT before
  // the float division.
  private val ProtoBuckets = 64

  /** x85's engine, parameterized for fixtures: (vec_id, label, qv)
    * rows in, (vec_id, label, bkt, pruned) out. X85ProtoSpec pins the
    * quantile-bucket threshold semantics on hand fixtures. */
  private[graft] def protoPrune(vIn: DataFrame,
      prunePm: Long = ProtoPrunePm): DataFrame = {
    val v = vIn.persist() // centroid agg + scoring pass both consume it
    v.count() // eager: consumers race on a cold cache (see x14)
    val cents = sumCentroids(v.select(col("label").as("clabel"), col("qv")))
      .withColumnRenamed("clabel", "label")
    val sc = protoScore(v, cents)
      .persist() // histogram + final flag pass both consume it
    sc.count()
    ordered(protoFlag(sc, protoThresholds(sc, prunePm)))
  }

  /** Bucketed prototype affinity for (vec_id, label, qv) rows against
    * a frozen (label, cv) centroid table: a k-row broadcast equi-join
    * + one fused native cosine per row — zero shuffles,
    * streaming-legal. */
  private[graft] def protoScore(v: DataFrame, cents: DataFrame): DataFrame =
    v.join(broadcast(cents), "label")
      .select(col("vec_id"), col("label"),
        floor(cosLongCol(col("qv"), col("cv")) * lit(ProtoBuckets))
          .cast("long").as("bkt"))

  /** Per-label quantile-bucket prune thresholds from a scored table:
    * the histogram is ≤ k×129 rows, its window metadata-scale. */
  private[graft] def protoThresholds(sc: DataFrame, prunePm: Long): DataFrame = {
    val n = sc.groupBy(col("label")).agg(count(lit(1)).as("n"))
    val hist = sc.groupBy(col("label"), col("bkt")).agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum(col("c")).over(Window.partitionBy(col("label"))
        .orderBy(col("bkt").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum.join(n, "label")
      .withColumn("quota", expr(s"n * $prunePm div 1000"))
      .filter(col("quota") > 0 && col("cum") >= col("quota"))
      .groupBy(col("label")).agg(max(col("bkt")).as("thr"))
  }

  /** Stateless prune flag against frozen thresholds (labels with no
    * threshold — quota 0 — keep everything). */
  private[graft] def protoFlag(sc: DataFrame, thr: DataFrame): DataFrame =
    sc.join(broadcast(thr), Seq("label"), "left")
      .select(col("vec_id"), col("label"), col("bkt"),
        coalesce(col("bkt") >= col("thr"), lit(false)).as("pruned"))

  private val x85 = GateQuery(
    "x85_proto_prune",
    (s, d) => {
      val quant = transform(col("embedding"),
        x => floor(x * lit(1000)).cast("long"))
      protoPrune(Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), quant.as("qv")))
    },
    Some(s"""WITH v AS (
              SELECT vec_id, label, list_transform(embedding,
                x -> CAST(FLOOR(x * 1000) AS BIGINT)) AS qv
              FROM embeddings),
            sums AS (
              SELECT label, u.i AS pos, sum(qv[u.i + 1]) AS s
              FROM v, unnest(range(len(qv))) AS u(i)
              GROUP BY 1, 2),
            cents AS (
              SELECT label, list(s ORDER BY pos) AS cv
              FROM sums GROUP BY 1),
            sc AS (
              SELECT vec_id, v.label,
                CAST(FLOOR(list_dot_product(v.qv, c.cv) /
                  (sqrt(list_dot_product(v.qv, v.qv))
                   * sqrt(list_dot_product(c.cv, c.cv)))
                  * $ProtoBuckets) AS BIGINT) AS bkt
              FROM v JOIN cents c ON c.label = v.label),
            n AS (SELECT label, count(*) AS n FROM sc GROUP BY 1),
            hist AS (
              SELECT label, bkt, count(*) AS c FROM sc GROUP BY 1, 2),
            cum AS (
              SELECT label, bkt,
                sum(c) OVER (PARTITION BY label ORDER BY bkt DESC) AS cum
              FROM hist),
            thr AS (
              SELECT cum.label, max(bkt) AS thr
              FROM cum JOIN n ON n.label = cum.label
              WHERE (n.n * $ProtoPrunePm) // 1000 > 0
                AND cum >= (n.n * $ProtoPrunePm) // 1000
              GROUP BY 1)
          SELECT sc.vec_id, sc.label, sc.bkt,
                 coalesce(sc.bkt >= t.thr, false) AS pruned
          FROM sc LEFT JOIN thr t ON t.label = sc.label
          ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- x86
  // Incremental dedup ingest — the daily-crawl move: dedup TODAY'S
  // delta against the 100 TB history WITHOUT rescanning it. The
  // history is a frozen REGISTRY of MinHash band keys (here rebuilt
  // from doc_id % 4 != 0 for the gate; in production it is written
  // once, stored PARTITIONED BY band key, and only appended to); the
  // batch (doc_id % 4 == 0) computes its own bands and probes the
  // registry with a band equi-join — cost ∝ delta size + collision
  // sets, never ∝ history size, and the x48 Bloom semi-join composes
  // on the registry scan so only buckets the delta actually touches
  // are read. Candidates verify with EXACT token-set Jaccard
  // (integer intersection/union sizes over the sorted-distinct
  // arrays, inter·10 ≥ 9·union ⇔ jac ≥ 0.9 — no float anywhere),
  // restricted to candidate ids (x04's semi-join-then-broadcast
  // pattern). Per batch doc: duplicate count, best match by
  // (jac_permille desc, reg_id asc), novelty flag; novel docs carry
  // the (-1, 0) sentinels — no NULLs. The streaming twin is the
  // NearDup/DocStreams watermark-bounded path; this is its BATCH
  // form where history stays at rest.
  /** Exact token-set CLASS table of a (doc_id, arr) corpus: one row
    * per distinct token set — (sig, cnt, min_id, arr). This IS the
    * registry representation x86's ingest probes (its band table is
    * derived per probe, or stored band-partitioned in production) and
    * the unit [[appendRegistry]] maintains. Collapsing to classes
    * first is x01's move: Jaccard is a function of the token SET
    * alone, so class-level banding + verify is EXACTLY doc-level
    * semantics — and on dup-dense corpora it is the difference
    * between a tractable join and a quadratic one (measured at sf1:
    * 24.0M doc-level distinct candidates collapse to class-level
    * pairs). */
  // Round-15 NEGATIVE A/B (tools/LifecycleAbProbe, OPTIMIZATION_r15
  // .md): collapsing this to ONE groupBy with first(arr) — "3
  // exchanges → 1" on the plan — measured SLOWER through the full
  // x86 ingest chain (5.16 s vs 4.24 s min-of-3, same session):
  // first() over an array column can't ride the fixed-width
  // HashAggregate fast path, while dropDuplicates' key-only dedup and
  // the class-scale join are cheap. The two-step form stays.
  private[graft] def classesOf(docs: DataFrame): DataFrame = {
    val sigOf = md5(array_join(col("arr"), " "))
    val cls = docs.withColumn("sig", sigOf)
      .groupBy(col("sig"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("min_id"))
    // arr is functionally determined by sig, so dropDuplicates picks
    // a value-deterministic representative
    cls.join(
      docs.withColumn("sig", sigOf).select(col("sig"), col("arr"))
        .dropDuplicates("sig"), "sig")
  }

  /** Append one day's (doc_id, arr) docs into a frozen class
    * registry — the production append-only maintenance move the
    * incremental-ingest story requires: novel sigs INSERT, existing
    * sigs MERGE (cnt sums, min_id takes the least; arr is
    * functionally determined by sig, so any representative is the
    * value-deterministic one). One groupBy on sig; cost ∝ registry
    * classes + delta classes, never ∝ raw history rows. In
    * production the result is written band-partitioned (x76's layout
    * move) and x82's compaction planner folds the small per-band
    * delta files. X95RegistrySpec proves ingest(day2) against
    * appendRegistry(classesOf(day0), day1) equals ingest(day2)
    * against classesOf(day0 ∪ day1). */
  private[graft] def appendRegistry(reg: DataFrame,
      day: DataFrame): DataFrame =
    reg.select(col("sig"), col("cnt"), col("min_id"), col("arr"))
      .unionByName(classesOf(day)
        .select(col("sig"), col("cnt"), col("min_id"), col("arr")))
      .groupBy(col("sig"))
      .agg(sum(col("cnt")).as("cnt"), min(col("min_id")).as("min_id"),
        first(col("arr")).as("arr"))

  /** x86's engine, parameterized for fixtures: `reg` and `bat` are
    * (doc_id, arr) token-set tables (registry/history and today's
    * delta). Returns one row per batch doc: duplicate count, best
    * match by (jac_permille desc, reg_id asc), novelty flag; (-1, 0)
    * sentinels for novel docs. X86IngestSpec pins the semantics. */
  private[graft] def incrementalIngest(reg: DataFrame, bat: DataFrame,
      jacThresholdPct: Long = 90L): DataFrame =
    ingestAgainstClasses(classesOf(reg), bat, jacThresholdPct)

  /** Measured broadcast gate for the ingest verify sides: a side is
    * hinted for broadcast only when its MEASURED candidate-class
    * count fits (the count is two metadata-scale distinct jobs over
    * the already-persisted candidate table). Under the cap the side
    * is a bounded broadcast — the plan that holds the verify joins
    * map-side (13.9 s at sf1); over it — a dup-dense crawl where the
    * candidate-class set is unbounded — the join falls back to a
    * plain shuffleable equi-join on sig instead of a driver OOM.
    * 100k (sig, arr) class rows ≈ low hundreds of MB at crawl-shaped
    * token-array sizes. */
  private val IngestBcastClassCap = graft.Knobs.IngestBcastClassCapDefault

  /** [[incrementalIngest]] against an ALREADY-BUILT class registry
    * ([[classesOf]] output, possibly maintained across days by
    * [[appendRegistry]]) — the form a production daily-crawl job
    * runs, where the registry is at rest and only the delta is new.
    * `bcastClassCap` = the measured-broadcast bound
    * ([[IngestBcastClassCap]]); 0 disables the hint entirely
    * (X86PlanSpec pins both branches). */
  private[graft] def ingestAgainstClasses(regClasses: DataFrame,
      bat: DataFrame, jacThresholdPct: Long = 90L,
      bcastClassCap: Long = IngestBcastClassCap): DataFrame = {
    val sigOf = md5(array_join(col("arr"), " "))
    // Round-16 action fold (guide §1.2): regC and batC keep their
    // persists (two consumers each: a band side of the candidate
    // join plus a verify side) but are NOT counted eagerly — inside
    // the candidate job each is scanned exactly once (the band
    // sides read disjoint caches), so the sigCounts action below
    // materializes them race-free while doing the work the dropped
    // counts did. batMembers lost its persist outright: it is a
    // narrow projection consumed exactly once, by the final join.
    val regC = regClasses.persist()
    val batMembers = bat.withColumn("sig", sigOf)
      .select(col("doc_id"), col("sig"))
    val batC = bat.withColumn("sig", sigOf).select(col("sig"), col("arr"))
      .dropDuplicates("sig").persist()
    val regB = bandTableArr(regC.select(col("sig").as("rep"), col("arr")), "t:")
    val batB = bandTableArr(batC.select(col("sig").as("rep"), col("arr")), "t:")
    val joinCond = col("a.band") === col("b.band") &&
      (0 until BandRows).map(j => col(s"a.k$j") === col(s"b.k$j")).reduce(_ && _)
    // identical token sets agree on every band, so exact-duplicate
    // registry classes are candidates of the batch class by
    // construction — no same-sig special case needed
    val cand = batB.as("a").join(regB.as("b"), joinCond)
      .select(col("a.rep").as("bsig"), col("b.rep").as("rsig"))
      .distinct().persist()
    // Verify sides restrict to classes that appear in a candidate
    // pair (x04's candidate-semi-join pattern). An UNCONDITIONAL
    // broadcast hint here is a scale bug: the batch side is
    // delta-bounded, but the REGISTRY side is every history class a
    // candidate pair touches — unbounded on a dup-dense crawl (this
    // corpus already yields 3.6M verified links at sf1), and a
    // forced broadcast of millions of token arrays kills the driver.
    // AQE alone is not enough either: its 10MB default never
    // broadcasts these sides, and the shuffle fallback measured
    // 13.9→35.5 s at sf1. So the hint is MEASURED (see
    // IngestBcastClassCap): candidate-class counts are two tiny
    // distinct jobs over the persisted candidate table, and only a
    // side that provably fits gets hinted.
    // both measured class counts in ONE job over the persisted
    // candidate table (formerly two persisted distinct sides counted
    // by separate actions — round-15: the side sets are re-derived
    // from the cached candidates inside each verify join, so the
    // extra persists bought nothing but two more driver round-trips).
    // Round-16: this is now the ONLY eager action of the whole
    // ingest — it materializes cand and, transitively, regC and batC.
    val sigCounts = cand.agg(
      countDistinct(col("bsig")).as("na"),
      countDistinct(col("rsig")).as("nb")).head()
    val aSigs = cand.select(col("bsig").as("sig")).distinct()
    val bSigs = cand.select(col("rsig").as("sig")).distinct()
    def gated(side: DataFrame, classes: Long): DataFrame =
      if (bcastClassCap > 0L && classes <= bcastClassCap) broadcast(side)
      else side
    val aArr = gated(batC.join(aSigs, "sig")
      .select(col("sig").as("bsig"), col("arr").as("arr_a")),
      sigCounts.getLong(0))
    val bArr = gated(regC.join(bSigs, "sig")
      .select(col("sig").as("rsig"), col("arr").as("arr_b"),
        col("cnt"), col("min_id")), sigCounts.getLong(1))
    val inter = size(array_intersect(col("arr_a"), col("arr_b"))).cast("long")
    val uni = (size(col("arr_a")) + size(col("arr_b"))).cast("long") - inter
    val dups = cand.join(aArr, "bsig").join(bArr, "rsig")
      .withColumn("inter", inter).withColumn("uni", uni)
      .filter(col("inter") * 100 >= col("uni") * jacThresholdPct)
      .withColumn("jac_pm", expr("inter * 1000 div uni"))
    val summary = dups.groupBy(col("bsig"))
      .agg(sum(col("cnt")).as("n_dups"),
        max(struct(col("jac_pm"), (-col("min_id")).as("nreg"))).as("best"))
      .select(col("bsig").as("sig"), col("n_dups"),
        (-col("best.nreg")).as("best_reg"), col("best.jac_pm").as("best_jac_pm"))
    ordered(batMembers
      .join(summary, Seq("sig"), "left")
      .select(col("doc_id").as("new_id"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        coalesce(col("best_reg"), lit(-1L)).as("best_reg"),
        coalesce(col("best_jac_pm"), lit(0L)).as("best_jac_pm"))
      .withColumn("novel", col("n_dups") === 0L))
  }

  /** Shared oracle for x86 and x95: the doc-level replay of
    * incremental ingest with registry = doc_id % 4 != 0 and batch =
    * doc_id % 4 == 0. x95 produces the SAME result through the
    * appended-registry path (classesOf(day0) + appendRegistry(day1)
    * is exactly classesOf(day0 ∪ day1) — the equality X95RegistrySpec
    * pins at DataFrame level), so one SQL text serves both gates. */
  private lazy val ingestOracleSql: String = {
      val mhCols = (0 until NumMinhash).map { i =>
        s"MIN((h * ${mhA(i)} + ${mhB(i)}) % $Mod32) AS mh$i"
      }.mkString(", ")
      val bandSelects = (0 until NumBands).map { b =>
        val ks = (0 until BandRows)
          .map(j => s"mh${BandRows * b + j} AS k$j").mkString(", ")
        s"SELECT doc_id, $b AS band, $ks FROM mh"
      }.mkString(" UNION ALL ")
      val joinKeys = "a.band = b.band AND " +
        (0 until BandRows).map(j => s"a.k$j = b.k$j").mkString(" AND ")
      s"""WITH arrs AS (
            SELECT doc_id,
                   list_sort(list_distinct(string_split(text, ' '))) AS arr
            FROM documents),
          toks AS (
            SELECT doc_id, unnest(arr) AS tok FROM arrs),
          th AS (
            SELECT doc_id, ${duckHex32("md5('t:' || tok)")} AS h FROM toks),
          mh AS (SELECT doc_id, $mhCols FROM th GROUP BY doc_id),
          banded AS ($bandSelects),
          regb AS (SELECT * FROM banded WHERE doc_id % 4 != 0),
          batb AS (SELECT * FROM banded WHERE doc_id % 4 = 0),
          cand AS (
            SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS reg_id
            FROM batb a JOIN regb b ON $joinKeys),
          scored AS (
            SELECT c.new_id, c.reg_id,
              CAST(len(list_intersect(aa.arr, ba.arr)) AS BIGINT) AS inter,
              CAST(len(aa.arr) + len(ba.arr)
                   - len(list_intersect(aa.arr, ba.arr)) AS BIGINT) AS uni
            FROM cand c
            JOIN arrs aa ON aa.doc_id = c.new_id
            JOIN arrs ba ON ba.doc_id = c.reg_id),
          dups AS (
            SELECT new_id, reg_id, (inter * 1000) // uni AS jac_pm
            FROM scored WHERE inter * 10 >= uni * 9),
          summary AS (
            SELECT new_id, CAST(count(*) AS BIGINT) AS n_dups,
              CAST(max(jac_pm) AS BIGINT) AS best_jac_pm
            FROM dups GROUP BY 1),
          best AS (
            SELECT new_id, reg_id AS best_reg FROM (
              SELECT new_id, reg_id, row_number() OVER (
                PARTITION BY new_id ORDER BY jac_pm DESC, reg_id) AS rn
              FROM dups) WHERE rn = 1)
        SELECT b.doc_id AS new_id,
               coalesce(s.n_dups, 0) AS n_dups,
               coalesce(bb.best_reg, -1) AS best_reg,
               coalesce(s.best_jac_pm, 0) AS best_jac_pm,
               coalesce(s.n_dups, 0) = 0 AS novel
        FROM (SELECT doc_id FROM arrs WHERE doc_id % 4 = 0) b
        LEFT JOIN summary s ON s.new_id = b.doc_id
        LEFT JOIN best bb ON bb.new_id = b.doc_id
        ORDER BY 1,2,3,4,5"""
  }

  private val x86 = GateQuery(
    "x86_incremental_ingest",
    (s, d) => {
      // narrow repartition off the 1-split scan; persisted: registry
      // bands, batch bands and both verify sides all consume it
      val docArrs = Tables.documents(s, d)
        .repartition(col("doc_id"))
        .select(col("doc_id"), tokenSet(col("text")).as("arr"))
        .persist()
      docArrs.count()
      incrementalIngest(
        docArrs.filter(col("doc_id") % 4 =!= 0),
        docArrs.filter(col("doc_id") % 4 === 0))
    },
    Some(ingestOracleSql))

  // ---------------------------------------------------------------- x87
  // CCNet perplexity buckets: split each LANGUAGE's corpus into
  // head / middle / tail terciles by LM surprisal — CCNet's central
  // data-quality partition (head = most-fluent third, the slice that
  // trains; tail = the slice that gets dropped or down-weighted).
  // Surprisal is x68's whole-bit bigram-LM score collapsed to an
  // integer permille-bits-per-bigram (spb = bits_sum·1000 div n_bg),
  // and the per-lang tercile cut reuses x85's quantile-HISTOGRAM
  // move at coarser grain: spb div 100 buckets (≤ ~200 per lang),
  // t1/t2 = smallest bucket whose from-the-bottom cumulative count
  // reaches n/3 and 2n/3 (cum·3 ≥ n — pure integer, no division).
  // Bucket-aligned boundaries, same documented granularity trade as
  // x85. Docs with <2 tokens have no bigrams and no score — absent
  // on both engines.
  //
  // Scale shape: the LM scoring is x68's (vocabulary-sized count
  // tables, one corpus shuffle onto bg); the lang join is one
  // doc_id equi-join of two per-doc tables; the histogram is
  // langs×200 rows (metadata-scale window, the x82 contract) and
  // the two thresholds broadcast back into a stateless CASE.
  private[graft] val CcnetHb = 100L // deci-bit histogram granularity

  /** Per-lang tercile thresholds (lang, t1, t2) over a scored
    * (lang, hb) table — x87's quantile-histogram cut, exposed as the
    * frozen half of DocStreams.ccnetBucketStream's model. */
  private[graft] def ccnetThresholds(d: DataFrame): DataFrame = {
    val n = d.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val hist = d.groupBy(col("lang"), col("hb")).agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum(col("c")).over(Window.partitionBy(col("lang"))
        .orderBy(col("hb").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(n, "lang").persist() // t1 + t2 both consume it
    val t1 = cum.filter(col("cum") * 3 >= col("n"))
      .groupBy(col("lang")).agg(min(col("hb")).as("t1"))
    val t2 = cum.filter(col("cum") * 3 >= col("n") * 2)
      .groupBy(col("lang")).agg(min(col("hb")).as("t2"))
    t1.join(t2, "lang")
  }

  /** x87's engine, parameterized for fixtures: (doc_id, text, lang)
    * rows in, (doc_id, lang, spb, bucket) out. X87CcnetSpec pins the
    * tercile-order and quota properties. */
  private[graft] def ccnetBuckets(docs: DataFrame): DataFrame = {
    val d = lmDocBits(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .withColumn("spb", expr("bits_sum * 1000 div n_bg"))
      .withColumn("hb", expr(s"spb div $CcnetHb"))
      .persist() // histogram + final assignment both consume it
    d.count()
    ordered(d.join(broadcast(ccnetThresholds(d)), "lang")
      .select(col("doc_id"), col("lang"), col("spb"),
        when(col("hb") <= col("t1"), "head")
          .when(col("hb") <= col("t2"), "middle")
          .otherwise("tail").as("bucket")))
  }

  /** The trained LM's per-bigram whole-bit surprisal (bg, bits) —
    * the vocabulary-sized half of the frozen CCNet ingest model
    * (bits depend only on the bigram: its count, its context count,
    * and the context-vocabulary size). */
  private[graft] def lmBigramBits(docs: DataFrame): DataFrame = {
    val tk = docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
    val pos = tk.select(col("doc_id"),
      explode(zip_with(
        slice(col("tk"), lit(1), size(col("tk")) - 1),
        slice(col("tk"), lit(2), size(col("tk")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
    val docBg = pos.groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("tf"))
    val cBg = docBg.groupBy(col("bg")).agg(sum(col("tf")).as("c_bg"))
    val cW1 = docBg
      .select(split(col("bg"), " ").getItem(0).as("w1"), col("tf"))
      .groupBy(col("w1")).agg(sum(col("tf")).as("c_w1"))
    val vCtx = cW1.agg(count(lit(1)).as("v_ctx"))
    cBg.withColumn("w1", split(col("bg"), " ").getItem(0))
      .join(cW1, "w1")
      .crossJoin(broadcast(vCtx))
      .select(col("bg"), expr(wholeBitLog2Sql(
        "cast(c_w1 as decimal(38,0)) + v_ctx",
        "cast(c_bg as decimal(38,0)) + 1")).as("bits"))
  }

  private val x87 = GateQuery(
    "x87_ccnet_buckets",
    (s, d) => ccnetBuckets(Tables.documents(s, d)),
    Some(s"""WITH $duckLmCtes,
            d AS (
              SELECT l.doc_id, doc.lang,
                     (l.bits_sum * 1000) // l.n_bg AS spb,
                     ((l.bits_sum * 1000) // l.n_bg) // $CcnetHb AS hb
              FROM lm l JOIN documents doc ON doc.doc_id = l.doc_id),
            n AS (SELECT lang, count(*) AS n FROM d GROUP BY 1),
            hist AS (SELECT lang, hb, count(*) AS c FROM d GROUP BY 1, 2),
            cum AS (
              SELECT hist.lang, hb, n.n,
                sum(c) OVER (PARTITION BY hist.lang ORDER BY hb ASC) AS cum
              FROM hist JOIN n ON n.lang = hist.lang),
            t1 AS (
              SELECT lang, min(hb) AS t1 FROM cum
              WHERE cum * 3 >= n GROUP BY 1),
            t2 AS (
              SELECT lang, min(hb) AS t2 FROM cum
              WHERE cum * 3 >= 2 * n GROUP BY 1)
          SELECT d.doc_id, d.lang, CAST(d.spb AS BIGINT) AS spb,
                 CASE WHEN d.hb <= t1.t1 THEN 'head'
                      WHEN d.hb <= t2.t2 THEN 'middle'
                      ELSE 'tail' END AS bucket
          FROM d
          JOIN t1 ON t1.lang = d.lang
          JOIN t2 ON t2.lang = d.lang
          ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- x88
  // Repeated-span REMOVAL (the transform behind "deduplicate the
  // training set at the substring level", Lee et al. "Deduplicating
  // Training Data Makes Language Models Better"): x45 MEASURES
  // duplicated W-token spans; this gate REWRITES each document with
  // every token that any cross-doc-duplicated span covers removed.
  // A span duplicates when its hash occurs in ≥ 2 DISTINCT documents
  // (within-doc repeats alone don't trigger removal — they're x26's
  // signal); coverage is positional, so overlapping duplicated spans
  // merge naturally into one removed region.
  //
  // Scale shape: the positional span table is (doc_id, i, 32-hex
  // hash) — rows ∝ corpus token count, document text never shuffles
  // (x45's contract; positions ride along because the REWRITE needs
  // them, which distinct-hash SpanHashes cannot supply). The dup-span
  // set is corpus-scale, so its join with the positional table is a
  // deliberate shuffle equi-join on the hash (never a broadcast);
  // doc-side state is one start-position set ≤ doc length; the
  // rewrite itself is a stateless per-row HOF (per-token cost
  // O(|starts|), bounded by doc length). The dup flag aggregates
  // constant-buffer counts over per-doc-distinct (doc, sh) rows —
  // a stopword span never materializes a doc list (the spanEdges
  // hub-safety rule).
  private val ScrubW = SpanW // 8-token windows, x45's grain

  /** x88's engine, parameterized for fixtures: (doc_id, text) rows
    * in, (doc_id, n_tok, n_removed, clean) out. X88ScrubSpec pins
    * coverage merge, cross-doc-only triggering, and the short-doc
    * identity. */
  private[graft] def spanScrub(docs: DataFrame, w: Int = ScrubW): DataFrame = {
    // persisted: the span pass and the rebuild consume it; text rides
    // along for the fused native gram pass
    val tkd = docs
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("tk"))
      .persist()
    tkd.count()
    // positional w-token hashes in ONE native pass (GramHashes — no
    // per-window slice/join strings; bit-identical to the HOF
    // formulation the oracle replays, GramHashesSpec)
    val ps = tkd.select(col("doc_id"),
        explode(graft.functions.GramHashes.gramHashes(col("text"), w, w))
          .as("e"))
      .select(col("doc_id"), col("e")("i").as("i"), col("e")("g").as("sh"))
      .persist() // dup-set agg + start-position join both consume it
    ps.count()
    val dup = ps.select(col("doc_id"), col("sh")).distinct()
      .groupBy(col("sh")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2).select(col("sh"))
    val starts = ps.join(dup, "sh")
      .groupBy(col("doc_id")).agg(collect_set(col("i")).as("starts"))
    ordered(tkd.join(starts, Seq("doc_id"), "left")
      .withColumn("st", coalesce(col("starts"), array().cast("array<int>")))
      .withColumn("kept", filter(col("tk"), (t, p) =>
        not(exists(col("st"), s => s <= p && p <= s + (w - 1)))))
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n_tok"),
        (size(col("tk")) - size(col("kept"))).cast("long").as("n_removed"),
        concat_ws(" ", col("kept")).as("clean")))
  }

  // Round-15 NEGATIVE A/B (kept out of the tree, evidence in
  // tools/ScrubAbProbe + OPTIMIZATION_r15.md): fusing the scrub with
  // its input's spanDedupCounts — one positional table serving both
  // the rewrite and the per-doc statistics — measured 13.3 s vs the
  // unfused 6.4 s at sf0.1, same session, min of 4 alternating
  // passes. The "redundant" count pass rides the NATIVE per-row-
  // distinct SpanHashes expression (no shuffle to dedup), while the
  // fusion's shared per-doc-distinct table costs a corpus-wide
  // distinct + two extra joins on the (bigger) positional table.
  // Guide §1.1: the ideal-plan rewrite lost to the measured one.

  private val x88 = GateQuery(
    "x88_span_scrub",
    (s, d) => spanScrub(Tables.documents(s, d)),
    Some(s"""WITH tk AS (
              SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
            ps AS MATERIALIZED (
              SELECT doc_id, i,
                     md5(array_to_string(tk[i+1 : i+$ScrubW], ' ')) AS sh
              FROM tk,
                   unnest(range(0, GREATEST(len(tk) - ${ScrubW - 1}, 0))) AS u(i)),
            dup AS (
              SELECT sh FROM (SELECT DISTINCT doc_id, sh FROM ps)
              GROUP BY sh HAVING count(*) >= 2),
            st AS (
              SELECT ps.doc_id, list(i) AS starts
              FROM ps JOIN dup ON dup.sh = ps.sh
              GROUP BY 1),
            reb AS (
              SELECT t.doc_id,
                     CAST(len(t.tk) AS BIGINT) AS n_tok,
                     [t.tk[p + 1] FOR p IN range(0, len(t.tk))
                      IF len(list_filter(coalesce(st.starts, []),
                        s -> s <= p AND p <= s + ${ScrubW - 1})) = 0] AS kept
              FROM tk t LEFT JOIN st ON st.doc_id = t.doc_id)
          SELECT doc_id, n_tok,
                 n_tok - CAST(len(kept) AS BIGINT) AS n_removed,
                 -- DuckDB's array_to_string([]) is NULL, Spark's
                 -- concat_ws over an empty array is '' — coalesce to
                 -- the Spark value (fully-scrubbed docs hit this)
                 coalesce(array_to_string(kept, ' '), '') AS clean
          FROM reb ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- x89
  // Scrub-effectiveness audit — the transform-side member of the
  // audit family (x66 IVF recall, x73 LSH calibration, x74 PQ
  // distortion, x78 blocking recall, x83 IVFADC): run x45's
  // duplicated-span measurement BEFORE and AFTER x88's repeated-span
  // removal and report both per doc. Residual duplication after one
  // scrub pass is a real phenomenon (removal creates new token
  // adjacencies whose windows can coincide across docs — Lee et al.
  // iterate to a fixpoint), so the audit turns "the scrub worked"
  // into a measured number instead of an assumption.
  //
  // Scale shape: exactly the sum of its parts — x88's chain plus two
  // x45 passes (three corpus scans, every wide op an equi-shuffle on
  // fixed-width hashes or doc_id); nothing new materializes beyond
  // the shapes both components already price.
  /** The K most-duplicated spans as ONE broadcastable array row
    * (sharr), ranked (n_docs desc, sh) over per-doc-distinct span
    * hashes — x36's top-K shape at span grain. The frozen model for
    * [[scrubAgainst]] / DocStreams.boilerplateScrubStream: full-corpus
    * scrubbing stays batch (x88 — the dup set there is corpus-scale
    * and never broadcasts); at INGEST the production move is scrubbing
    * the hot boilerplate spans, a constant-K set. */
  private[graft] def topDupSpans(docs: DataFrame, k: Int,
      w: Int = ScrubW): DataFrame =
    docs.select(col("doc_id"),
        explode(graft.functions.SpanHashes.spanHashes(col("text"), w))
          .as("sh"))
      .groupBy(col("sh")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("sh")).limit(k)
      .agg(sort_array(collect_list(col("sh"))).as("sharr"))

  /** Scrub (doc_id, text, …) rows against a FROZEN one-row span-hash
    * array: per-row positional hashes + an exists-over-covering-
    * windows filter — zero shuffles, streaming-legal. With `sharr` =
    * the full cross-doc dup set this is bit-identical to [[spanScrub]]
    * (X88ScrubSpec pins the agreement); with [[topDupSpans]] it is the
    * bounded ingest-time boilerplate scrub. */
  private[graft] def scrubAgainst(docs: DataFrame, spanArr: DataFrame,
      w: Int = ScrubW): DataFrame = {
    val staged = docs.crossJoin(broadcast(spanArr))
      .withColumn("tk", split(col("text"), " "))
      .withColumn("phs", when(size(col("tk")) >= w,
        transform(sequence(lit(0), size(col("tk")) - w),
          i => md5(concat_ws(" ", slice(col("tk"), i + 1, lit(w))))))
        .otherwise(array().cast("array<string>")))
    // position p is covered iff some valid window start in
    // [p−w+1, p] ∩ [0, n−w] hashes into the dup set; for n < w the
    // phs array is empty and every token survives
    val kept = filter(col("tk"), (t, p) => not(exists(
      when(size(col("tk")) >= w,
        sequence(greatest(lit(0), p - (w - 1)),
          least(p, size(col("tk")) - w)))
        .otherwise(array().cast("array<int>")),
      s => array_contains(col("sharr"), element_at(col("phs"), s + 1)))))
    staged.select(col("doc_id"),
      size(col("tk")).cast("long").as("n_tok"),
      (size(col("tk")) - size(kept)).cast("long").as("n_removed"),
      concat_ws(" ", kept).as("clean"))
  }

  private val x89 = GateQuery(
    "x89_scrub_audit",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text")).persist()
      docs.count() // scrub + before-counts both consume it
      val before = spanDedupCounts(docs)
        .withColumnRenamed("n_spans", "n_spans_before")
        .withColumnRenamed("dup_spans", "dup_before")
      val clean = spanScrub(docs).select(col("doc_id"), col("clean").as("text"))
      val after = spanDedupCounts(clean)
        .withColumnRenamed("n_spans", "n_spans_after")
        .withColumnRenamed("dup_spans", "dup_after")
      ordered(before.join(after, "doc_id"))
    },
    Some(s"""WITH tk AS (
              SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
            ps AS MATERIALIZED (
              SELECT doc_id, i,
                     md5(array_to_string(tk[i+1 : i+$ScrubW], ' ')) AS sh
              FROM tk,
                   unnest(range(0, GREATEST(len(tk) - ${ScrubW - 1}, 0))) AS u(i)),
            dup AS (
              SELECT sh FROM (SELECT DISTINCT doc_id, sh FROM ps)
              GROUP BY sh HAVING count(*) >= 2),
            st AS (
              SELECT ps.doc_id, list(i) AS starts
              FROM ps JOIN dup ON dup.sh = ps.sh
              GROUP BY 1),
            ctk AS (
              SELECT t.doc_id,
                     [t.tk[p + 1] FOR p IN range(0, len(t.tk))
                      IF len(list_filter(coalesce(st.starts, []),
                        s -> s <= p AND p <= s + ${ScrubW - 1})) = 0] AS tk
              FROM tk t LEFT JOIN st ON st.doc_id = t.doc_id),
            bsp AS (SELECT DISTINCT doc_id, sh FROM ps),
            bps AS (SELECT sh, count(*) AS n_docs FROM bsp GROUP BY 1),
            bpd AS (
              SELECT s.doc_id, count(*) AS n_spans,
                     sum(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) AS dup_spans
              FROM bsp s JOIN bps c USING (sh) GROUP BY 1),
            asp AS (
              SELECT DISTINCT doc_id,
                     md5(array_to_string(tk[i+1 : i+$ScrubW], ' ')) AS sh
              FROM ctk,
                   unnest(range(0, GREATEST(len(tk) - ${ScrubW - 1}, 0))) AS u(i)),
            aps AS (SELECT sh, count(*) AS n_docs FROM asp GROUP BY 1),
            apd AS (
              SELECT s.doc_id, count(*) AS n_spans,
                     sum(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) AS dup_spans
              FROM asp s JOIN aps c USING (sh) GROUP BY 1)
          SELECT d.doc_id,
                 CAST(COALESCE(b.n_spans, 0) AS BIGINT) AS n_spans_before,
                 CAST(COALESCE(b.dup_spans, 0) AS BIGINT) AS dup_before,
                 CAST(COALESCE(a.n_spans, 0) AS BIGINT) AS n_spans_after,
                 CAST(COALESCE(a.dup_spans, 0) AS BIGINT) AS dup_after
          FROM documents d
          LEFT JOIN bpd b USING (doc_id)
          LEFT JOIN apd a USING (doc_id)
          ORDER BY 1,2,3,4,5"""))

  // ---------------------------------------------------------------- x90
  // Perceptual-hash image dedup: every document's synthetic 16×16
  // gradient PNG (off = id·31 mod 256 — ids ≡ mod 256 render
  // IDENTICAL images, nearby offsets render near-identical ones) is
  // encoded AND decoded through the real javax.imageio codec, hashed
  // with the integer-exact average-hash ([[graft.multimodal.Media
  // .averageHash]] — block-pooled raster, cross-multiplied threshold,
  // no floats), and near-duplicates found by the standard banded
  // join: 4×16-bit bands of the 64-bit hash, Hamming ≤ 3 verified on
  // candidates (pigeonhole: ≤ 3 differing bits across 4 bands leaves
  // ≥ 1 band exactly equal — the candidate generation is LOSSLESS for
  // the threshold). Output is the per-image summary (neighbor count,
  // min-id representative), never the pair list — output stays
  // corpus-sized at any scale.
  //
  // Scale shape: hashing is per-row mapPartitions codec work (x37's
  // contract). The banded self-join runs at HASH-CLASS level, not doc
  // level (x01's exact-collapse composed with x04's banding): docs
  // first collapse to distinct hashes — an identical-image class of
  // any size is ONE row in the join, so a million re-posts of one
  // meme cannot make a band bucket quadratic — and the verify is a
  // pure projection on the (ah, nb_ah) pair itself (both hashes ride
  // the candidate row; no third join). Class stats then rejoin docs
  // by ah — a shuffleable equi-join ∝ corpus, never a broadcast (the
  // class table is ∝ distinct perceptual hashes, unbounded in
  // general). The oracle replays the raster in closed form — a fake
  // or lossy decode cannot hash-match.
  private val PhashHamT = 3

  /** Classes-per-(band, k) bucket cap for the fingerprint band joins
    * — the SpanDfCap discipline applied to the perceptual-hash
    * substrate. Unlike x04's md5-derived MinHash bands (uniform by
    * construction), a 16-bit chunk of an average-hash / energy-hash
    * clusters HARD on real media (flat/dark/letterboxed images share
    * entire hash halves), so one hot (band, k) bucket can hold
    * millions of DISTINCT classes and a band self-join goes quadratic
    * in it. The cap is two-stage: a constant-buffer per-bucket
    * pre-count BEFORE anything joins; hot buckets SUB-SPLIT by the
    * next band's 16-bit chunk (a Hamming-≤3 pair agrees on ≥ 1 band
    * by pigeonhole and usually on several chunks, so the refinement
    * keeps every pair that also agrees on the secondary chunk);
    * sub-buckets still over the cap are DROPPED — the bound is hard
    * (candidates per bucket ≤ C(cap, 2)), the recall loss is the
    * documented trade (X90CapSpec measures it on a saturating
    * fixture), and the oracle replays the identical two-stage cap. */
  private val FpBandCap = graft.Knobs.FpBandCapDefault

  /** Class-level banded Hamming near-dup over (doc_id, ah) 64-bit
    * fingerprint rows — the x01-collapse + x04-banding composition
    * shared by the image (x90) and audio (x91) dedups: exact-hash
    * classes collapse first, the 4×16-bit band self-join runs over
    * distinct hashes only with the [[FpBandCap]] bucket cap, Hamming
    * ≤ hamT verifies as a pure projection on the candidate pair, and
    * class stats rejoin docs by ah. @return (doc_id, ah, n_near,
    * rep). */
  private[graft] def hashClassNearDup(hashed: DataFrame,
      hamT: Int, cap: Int = FpBandCap): DataFrame = {
    val classes = hashed.groupBy(col("ah"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("cmin"))
      .persist() // banding + near-agg + final join consume it
    classes.count()
    val banded = classes.select(col("ah"), posexplode(array(
      (0 until 4).map(b => expr(s"shiftright(ah, ${16 * b}) & 65535")): _*))
      .as(Seq("band", "k")))
    // the two-stage bucket cap (see FpBandCap): pre-count, sub-split
    // hot buckets by the next band's chunk, drop still-hot sub-buckets
    val bdf = banded.groupBy(col("band"), col("k"))
      .agg(count(lit(1)).as("bdf"))
    val sub = banded.join(bdf, Seq("band", "k"))
      .withColumn("k2", when(col("bdf") > cap,
        expr("shiftright(ah, cast(((band + 1) % 4) * 16 as int)) & 65535"))
        .otherwise(lit(0L)))
    val bdf2 = sub.groupBy(col("band"), col("k"), col("k2"))
      .agg(count(lit(1)).as("bdf2"))
    val keep = sub.join(bdf2, Seq("band", "k", "k2"))
      .filter(col("bdf2") <= cap)
      .select(col("ah"), col("band"), col("k"), col("k2"))
    val ver = keep.as("a").join(keep.as("b"),
        col("a.band") === col("b.band") && col("a.k") === col("b.k") &&
          col("a.k2") === col("b.k2") && col("a.ah") =!= col("b.ah"))
      .select(col("a.ah").as("ah"), col("b.ah").as("nb_ah"))
      .distinct()
      .filter(bit_count(col("ah").bitwiseXOR(col("nb_ah"))) <= hamT)
    val near = ver.join(classes.select(col("ah").as("nb_ah"),
        col("cnt").as("ncnt"), col("cmin").as("nmin")), "nb_ah")
      .groupBy(col("ah"))
      .agg(sum(col("ncnt")).as("near_cnt"), min(col("nmin")).as("near_min"))
    val classFull = classes.join(near, Seq("ah"), "left")
      .select(col("ah"), col("cnt"), col("cmin"),
        coalesce(col("near_cnt"), lit(0L)).as("near_cnt"),
        coalesce(col("near_min"), lit(Long.MaxValue)).as("near_min"))
    ordered(hashed.join(classFull, "ah")
      .select(col("doc_id"), col("ah"),
        (col("cnt") - 1 + col("near_cnt")).as("n_near"),
        least(col("cmin"), col("near_min")).as("rep")))
  }

  /** Exact-hash class table of a (doc_id, ah) fingerprint frame —
    * the frozen registry DocStreams.fingerprintMatchStream probes. */
  private[graft] def fingerprintClasses(hashed: DataFrame): DataFrame =
    hashed.groupBy(col("ah"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("cmin"))

  /** The 4×16-bit band keys of a 64-bit fingerprint, as an array. */
  private[graft] def fingerprintBandKeys(ah: Column): Column =
    array((0 until 4).map(b =>
      shiftright(ah, 16 * b).bitwiseAND(lit(65535L))): _*)

  /** The frozen registry's band rows under the [[FpBandCap]] two-stage
    * bucket cap, plus per-hash survival masks: `alive` bit b set iff
    * band b's (possibly sub-split) bucket survived the cap, `splitm`
    * bit b set iff band b's bucket was hot (the k2 refinement — the
    * NEXT band's 16-bit chunk — applies there). All registry-side
    * pre-counts are constant-buffer aggs over the STATIC class table,
    * computed once when the registry is frozen. */
  private[graft] def cappedRegistryBands(registry: DataFrame,
      cap: Int = FpBandCap): DataFrame = {
    val rb = registry
      .withColumn("rkeys", fingerprintBandKeys(col("ah")))
      .select(col("ah").as("reg_ah"), col("cnt"), col("cmin"),
        col("rkeys"), posexplode(col("rkeys")).as(Seq("band", "k")))
    val bdf = rb.groupBy(col("band"), col("k"))
      .agg(count(lit(1)).as("bdf"))
    val sub = rb.join(bdf, Seq("band", "k"))
      .withColumn("hot", col("bdf") > cap)
      .withColumn("k2", when(col("hot"),
        element_at(col("rkeys"), ((col("band") + 1) % 4).cast("int") + 1))
        .otherwise(lit(0L)))
    val bdf2 = sub.groupBy(col("band"), col("k"), col("k2"))
      .agg(count(lit(1)).as("bdf2"))
    val keep = sub.join(bdf2, Seq("band", "k", "k2"))
      .filter(col("bdf2") <= cap)
    val masks = keep.groupBy(col("reg_ah")).agg(
      expr("sum(shiftleft(1, band))").as("alive"),
      expr("sum(CASE WHEN hot THEN shiftleft(1, band) ELSE 0 END)")
        .as("splitm"))
    keep.join(masks, "reg_ah")
      .select(col("band"), col("k"), col("k2"), col("reg_ah"),
        col("cnt"), col("cmin"), col("rkeys"), col("alive"), col("splitm"))
  }

  /** Banded Hamming match of (id, ah) rows against a fingerprint
    * class table (ah, cnt, cmin): the registry explodes its 4 band
    * keys under the [[FpBandCap]] bucket cap ([[cappedRegistryBands]]
    * — so one hot perceptual-hash bucket can never make every
    * arrival's probe quadratic); arrivals emit a plain (band, k, 0)
    * key per band plus a (band, k, k2) refinement variant (the two
    * are disjoint in key space, so a pair joins at most once per
    * band); multi-band collisions dedupe with a first-SURVIVING-
    * agreeing-band filter (a projection over the pair's own keys and
    * the registry's survival masks — no distinct, so the plan stays
    * streaming-legal), and Hamming ≤ hamT verifies on the pair
    * itself. One row per (id, matched class); a pair whose every
    * agreeing band was capped away is dropped (the bounded-recall
    * trade X90CapSpec measures). Works identically on batch and
    * streaming arrivals — DocStreamsSpec pins the agreement. */
  private[graft] def fingerprintMatch(arrivals: DataFrame,
      registry: DataFrame, hamT: Int, cap: Int = FpBandCap): DataFrame = {
    val aRows = arrivals
      .withColumn("dkeys", fingerprintBandKeys(col("ah")))
      .select(col("id"), col("ah"), col("dkeys"),
        posexplode(col("dkeys")).as(Seq("band", "k")))
      .withColumn("k2c",
        element_at(col("dkeys"), ((col("band") + 1) % 4).cast("int") + 1))
    // the k2 refinement variant only when the chunk is nonzero — a
    // zero chunk's refinement key would collide with the plain
    // variant and double-join non-hot buckets
    val a = aRows.select(col("id"), col("ah"), col("dkeys"),
        col("band"), col("k"), lit(0L).as("k2"))
      .unionByName(aRows.filter(col("k2c") =!= 0L)
        .select(col("id"), col("ah"), col("dkeys"),
          col("band"), col("k"), col("k2c").as("k2")))
    val r = cappedRegistryBands(registry, cap)
    // first band that (a) survived the cap, (b) agrees on its chunk,
    // (c) if sub-split, agrees on the refinement chunk too — the one
    // band this pair is allowed to emit from
    val firstValid = expr(
      """array_min(filter(transform(sequence(0, 3), b ->
        |  CASE WHEN (shiftright(alive, b) & 1) = 1
        |        AND element_at(dkeys, b + 1) = element_at(rkeys, b + 1)
        |        AND ((shiftright(splitm, b) & 1) = 0 OR
        |             element_at(dkeys, (b + 1) % 4 + 1)
        |               = element_at(rkeys, (b + 1) % 4 + 1))
        |   THEN b ELSE 99 END), x -> x < 99))""".stripMargin)
    a.join(r, Seq("band", "k", "k2"))
      .filter(col("band") === firstValid)
      .withColumn("hamming",
        bit_count(col("ah").bitwiseXOR(col("reg_ah"))))
      .filter(col("hamming") <= hamT)
      .select(col("id"), col("reg_ah"), col("cnt"), col("cmin"),
        col("hamming"))
  }

  /** Oracle twin of [[hashClassNearDup]]: CTEs + final SELECT over a
    * preceding `bits(doc_id, ah)` CTE — replaying the identical
    * two-stage [[FpBandCap]] bucket cap. */
  private def duckClassNearDup(hamT: Int, cap: Int = FpBandCap): String =
    s"""classes AS (
              SELECT ah, CAST(count(*) AS BIGINT) AS cnt,
                     min(doc_id) AS cmin
              FROM bits GROUP BY 1),
            banded AS (
              SELECT ah, b.band, (ah >> CAST(16 * b.band AS INT)) & 65535 AS k
              FROM classes, unnest(range(4)) AS b(band)),
            bdf AS (SELECT band, k, count(*) AS bdf
                    FROM banded GROUP BY 1, 2),
            sub AS (
              SELECT b.ah, b.band, b.k,
                     CASE WHEN f.bdf > $cap
                       THEN (b.ah >> CAST(((b.band + 1) % 4) * 16 AS INT))
                            & 65535
                       ELSE 0 END AS k2
              FROM banded b JOIN bdf f USING (band, k)),
            bdf2 AS (SELECT band, k, k2, count(*) AS bdf2
                     FROM sub GROUP BY 1, 2, 3),
            keepb AS (
              SELECT s.ah, s.band, s.k, s.k2
              FROM sub s JOIN bdf2 f USING (band, k, k2)
              WHERE f.bdf2 <= $cap),
            ver AS (
              SELECT ah, nb_ah FROM (
                SELECT DISTINCT a.ah, b.ah AS nb_ah
                FROM keepb a JOIN keepb b
                  ON b.band = a.band AND b.k = a.k AND b.k2 = a.k2
                     AND b.ah != a.ah)
              WHERE bit_count(xor(ah, nb_ah)) <= $hamT),
            near AS (
              SELECT v.ah, CAST(sum(c.cnt) AS BIGINT) AS near_cnt,
                     min(c.cmin) AS near_min
              FROM ver v JOIN classes c ON c.ah = v.nb_ah
              GROUP BY 1)
          SELECT h.doc_id, h.ah,
                 c.cnt - 1 + coalesce(n.near_cnt, 0) AS n_near,
                 least(c.cmin,
                   coalesce(n.near_min, 9223372036854775807)) AS rep
          FROM bits h
          JOIN classes c ON c.ah = h.ah
          LEFT JOIN near n ON n.ah = h.ah
          ORDER BY 1,2,3,4"""

  private val x90 = GateQuery(
    "x90_image_phash",
    (s, d) => {
      import s.implicits._
      val hashed = Tables.documents(s, d).select(col("doc_id")).as[Long]
        .repartition(graft.Knobs.codecParts(
          Tables.documents(s, d).count())) // row-sized codec tasks
        .map { id =>
          val off = ((id * 31) % 256).toInt
          val png = graft.multimodal.Media.encodePng(16, 16, (x, y) => {
            val v = (off + y * 16 + x) % 256
            (v << 16) | (v << 8) | v
          })
          (id, graft.multimodal.Media.averageHash(png).get)
        }.toDF("doc_id", "ah").persist()
      hashed.count() // class agg + final doc join both consume it
      hashClassNearDup(hashed, PhashHamT)
    },
    Some(s"""WITH px AS (
              SELECT doc_id,
                     ((doc_id * 31) % 256 + u.p) % 256 AS v,
                     ((u.p // 16) // 2) * 8 + (u.p % 16) // 2 AS c
              FROM documents, unnest(range(256)) AS u(p)),
            cells AS (SELECT doc_id, c, sum(v) AS s FROM px GROUP BY 1, 2),
            tot AS (SELECT doc_id, sum(s) AS t FROM cells GROUP BY 1),
            bits AS (
              SELECT cells.doc_id,
                bit_or(CASE WHEN s * 256 >= t * 4 THEN
                  -- bit 63 spelled out (the duckMasksCte signed trick)
                  CASE WHEN c = 63 THEN CAST(-9223372036854775808 AS BIGINT)
                       ELSE CAST(1 AS BIGINT) << CAST(c AS INT) END
                  ELSE 0 END) AS ah
              FROM cells JOIN tot ON tot.doc_id = cells.doc_id
              GROUP BY 1),
            ${duckClassNearDup(PhashHamT)}"""))

  // ---------------------------------------------------------------- x91
  // Audio fingerprint dedup — the PCM sibling of x90, completing the
  // multimodal near-dup matrix (text spans x45/x88, token sets x04,
  // embeddings x13/x21/x29/x47, images x90, audio here): every
  // document's synthetic 128-frame WAV (sample_i = (off·97 + 31·i²)
  // mod 2^16 − 2^15 with off = id·7 mod 256 — ids ≡ mod 256 render
  // IDENTICAL clips) round-trips through the real javax.sound
  // codec, fingerprints with the integer-exact block-energy hash
  // ([[graft.multimodal.Media.energyHash]] — |sample| pooled onto 64
  // time blocks, cross-multiplied threshold, no floats), and dedups
  // through the same class-level banded join as x90
  // ([[hashClassNearDup]]). Same scale shape, same closed-form-oracle
  // property: a fake decode cannot hash-match.
  private val AudioHamT = 3

  private val x91 = GateQuery(
    "x91_audio_fingerprint",
    (s, d) => {
      import s.implicits._
      val hashed = Tables.documents(s, d).select(col("doc_id")).as[Long]
        .repartition(graft.Knobs.codecParts(
          Tables.documents(s, d).count())) // row-sized codec tasks
        .map { id =>
          val off = ((id * 7) % 256).toInt
          val samples = Array.tabulate(128)(i =>
            (((off * 97 + 31 * i * i) % 65536) - 32768).toShort)
          val wav = graft.multimodal.Media.encodeWav(samples, 8000)
          (id, graft.multimodal.Media.energyHash(wav).get)
        }.toDF("doc_id", "ah").persist()
      hashed.count() // class agg + final doc join both consume it
      hashClassNearDup(hashed, AudioHamT)
    },
    Some(s"""WITH en AS (
              SELECT doc_id,
                     abs(((doc_id * 7) % 256 * 97 + 31 * u.i * u.i) % 65536
                         - 32768) AS e,
                     u.i // 2 AS b
              FROM documents, unnest(range(128)) AS u(i)),
            blk AS (SELECT doc_id, b, sum(e) AS s FROM en GROUP BY 1, 2),
            tot AS (SELECT doc_id, sum(s) AS t FROM blk GROUP BY 1),
            bits AS (
              SELECT blk.doc_id,
                bit_or(CASE WHEN s * 128 >= t * 2 THEN
                  -- bit 63 spelled out (the duckMasksCte signed trick)
                  CASE WHEN b = 63 THEN CAST(-9223372036854775808 AS BIGINT)
                       ELSE CAST(1 AS BIGINT) << CAST(b AS INT) END
                  ELSE 0 END) AS ah
              FROM blk JOIN tot ON tot.doc_id = blk.doc_id
              GROUP BY 1),
            ${duckClassNearDup(AudioHamT)}"""))

  // ---------------------------------------------------------------- x92
  // Quality-aware canonical selection: within each exact token-set
  // class, keep the copy with the HIGHEST x16 quality score (ties to
  // the smallest doc_id) instead of x19's min-id convention — the
  // curation refinement real pipelines apply, because members of a
  // token-SET class can differ in raw text (ordering, repetition,
  // whitespace shape) and therefore in surface quality; dropping the
  // lowest-quality copies is free once the class key exists. Per doc:
  // its score, its class size, the class's elected best, and the keep
  // flag.
  //
  // Scale shape: x16's staged projection (tokenize once into integer
  // stats), the class election is ONE constant-buffer groupBy on the
  // signature (max of a 2-field struct — no member list, no window),
  // and the flag is an equi-join back on the signature. Exactly x01's
  // shuffle profile plus a broadcast-eligible election table.
  private val x92 = GateQuery(
    "x92_keep_best",
    (s, d) => {
      val scored = qualityScored(Tables.documents(s, d), carry = Seq("text"))
      val t = scored.select(col("doc_id"), col("quality_score"),
          graft.ops.Cols.tokenSetSig(col("text")).as("sig"))
        .persist() // election + flag join both consume it
      t.count()
      val best = t.groupBy(col("sig"))
        .agg(count(lit(1)).as("cls_n"),
          max(struct(col("quality_score"), (-col("doc_id")).as("nid")))
            .as("b"))
        .select(col("sig"), col("cls_n"), (-col("b.nid")).as("best_id"))
      ordered(t.join(best, "sig")
        .select(col("doc_id"), col("quality_score"), col("cls_n"),
          col("best_id"), (col("doc_id") === col("best_id")).as("keep")))
    },
    Some(s"""WITH $duckQualityCte,
            sigs AS (
              SELECT doc_id,
                md5(array_to_string(list_sort(list_distinct(
                  string_split(text, ' '))), ' ')) AS sig
              FROM documents),
            t AS (
              SELECT q.doc_id, q.quality_score, s.sig
              FROM qsc q JOIN sigs s ON s.doc_id = q.doc_id),
            best AS (
              SELECT sig, doc_id AS best_id FROM (
                SELECT sig, doc_id, row_number() OVER (
                  PARTITION BY sig
                  ORDER BY quality_score DESC, doc_id) AS rn
                FROM t) WHERE rn = 1),
            cnt AS (
              SELECT sig, CAST(count(*) AS BIGINT) AS cls_n
              FROM t GROUP BY 1)
          SELECT t.doc_id, t.quality_score, c.cls_n, b.best_id,
                 t.doc_id = b.best_id AS keep
          FROM t
          JOIN best b ON b.sig = t.sig
          JOIN cnt c ON c.sig = t.sig
          ORDER BY 1,2,3,4,5"""))

  // ---------------------------------------------------------------- x93
  // Cross-modal duplication report — the curation view none of the
  // single-modality gates give: per document, is its TEXT duplicated
  // (any cross-doc W-token span, x45's substrate), is its IMAGE an
  // exact perceptual twin (x90's aHash class has ≥ 2 members), is its
  // AUDIO one (x91's energy-hash class)? A doc whose text is unique
  // but whose image is a known meme — or scraped text re-posted under
  // fresh media — only shows up when the modalities are JOINED, which
  // is exactly three per-doc flag tables equi-joined on doc_id.
  //
  // Scale shape: the three component passes keep their own contracts
  // (span hashes: rows ∝ tokens; fingerprints: per-row codec +
  // class-count agg); the join is three corpus-sized (doc_id) equi-
  // joins of 1-flag tables. The oracle replays all three chains in
  // closed form.
  private val x93 = GateQuery(
    "x93_cross_modal",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        .persist()
      val nDocs = docs.count()
      val text = spanDedupCounts(docs)
        .select(col("doc_id"), (col("dup_spans") >= 1).as("text_dup"))
      val media = docs.select(col("doc_id")).as[Long]
        .repartition(graft.Knobs.codecParts(nDocs))
        .map { id =>
          val ioff = ((id * 31) % 256).toInt
          val png = graft.multimodal.Media.encodePng(16, 16, (x, y) => {
            val v = (ioff + y * 16 + x) % 256
            (v << 16) | (v << 8) | v
          })
          val aoff = ((id * 7) % 256).toInt
          val wav = graft.multimodal.Media.encodeWav(
            Array.tabulate(128)(i =>
              (((aoff * 97 + 31 * i * i) % 65536) - 32768).toShort), 8000)
          (id, graft.multimodal.Media.averageHash(png).get,
            graft.multimodal.Media.energyHash(wav).get)
        }.toDF("doc_id", "iah", "aah").persist()
      media.count()
      def classDup(c: String, flag: String) = {
        val cls = media.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        media.select(col("doc_id"), col(c))
          .join(cls, c).select(col("doc_id"), (col("cnt") >= 2).as(flag))
      }
      ordered(text
        .join(classDup("iah", "img_dup"), "doc_id")
        .join(classDup("aah", "aud_dup"), "doc_id"))
    },
    Some(s"""WITH staged AS (
              SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
            spans AS (
              SELECT DISTINCT doc_id,
                     md5(array_to_string(tk[i+1 : i+$SpanW], ' ')) AS sh
              FROM staged,
                   unnest(range(0, GREATEST(len(tk) - ${SpanW - 1}, 0))) AS u(i)),
            per_span AS (SELECT sh, count(*) AS n_docs FROM spans GROUP BY 1),
            tflag AS (
              SELECT d.doc_id,
                coalesce(max(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END), 0) = 1
                  AS text_dup
              FROM documents d
              LEFT JOIN spans s ON s.doc_id = d.doc_id
              LEFT JOIN per_span c ON c.sh = s.sh
              GROUP BY 1),
            ipx AS (
              SELECT doc_id,
                     ((doc_id * 31) % 256 + u.p) % 256 AS v,
                     ((u.p // 16) // 2) * 8 + (u.p % 16) // 2 AS c
              FROM documents, unnest(range(256)) AS u(p)),
            icells AS (SELECT doc_id, c, sum(v) AS s FROM ipx GROUP BY 1, 2),
            itot AS (SELECT doc_id, sum(s) AS t FROM icells GROUP BY 1),
            ibits AS (
              SELECT icells.doc_id,
                bit_or(CASE WHEN s * 256 >= t * 4 THEN
                  CASE WHEN c = 63 THEN CAST(-9223372036854775808 AS BIGINT)
                       ELSE CAST(1 AS BIGINT) << CAST(c AS INT) END
                  ELSE 0 END) AS ah
              FROM icells JOIN itot ON itot.doc_id = icells.doc_id
              GROUP BY 1),
            icls AS (SELECT ah, count(*) AS cnt FROM ibits GROUP BY 1),
            iflag AS (
              SELECT b.doc_id, c.cnt >= 2 AS img_dup
              FROM ibits b JOIN icls c ON c.ah = b.ah),
            aen AS (
              SELECT doc_id,
                     abs(((doc_id * 7) % 256 * 97 + 31 * u.i * u.i) % 65536
                         - 32768) AS e,
                     u.i // 2 AS b
              FROM documents, unnest(range(128)) AS u(i)),
            ablk AS (SELECT doc_id, b, sum(e) AS s FROM aen GROUP BY 1, 2),
            atot AS (SELECT doc_id, sum(s) AS t FROM ablk GROUP BY 1),
            abits AS (
              SELECT ablk.doc_id,
                bit_or(CASE WHEN s * 128 >= t * 2 THEN
                  CASE WHEN b = 63 THEN CAST(-9223372036854775808 AS BIGINT)
                       ELSE CAST(1 AS BIGINT) << CAST(b AS INT) END
                  ELSE 0 END) AS ah
              FROM ablk JOIN atot ON atot.doc_id = ablk.doc_id
              GROUP BY 1),
            acls AS (SELECT ah, count(*) AS cnt FROM abits GROUP BY 1),
            aflag AS (
              SELECT b.doc_id, c.cnt >= 2 AS aud_dup
              FROM abits b JOIN acls c ON c.ah = b.ah)
          SELECT t.doc_id, t.text_dup, i.img_dup, a.aud_dup
          FROM tflag t
          JOIN iflag i ON i.doc_id = t.doc_id
          JOIN aflag a ON a.doc_id = t.doc_id
          ORDER BY 1,2,3,4"""))

  // ---------------------------------------------------------------- x94
  // Scrub to fixpoint — x88 run ITERATED, the way Lee et al. actually
  // apply substring dedup: one removal pass creates new token
  // adjacencies whose windows can coincide across docs (x89 measures
  // that residual honestly), so production scrubbing repeats until no
  // cross-doc duplicated span remains. The gate runs a FIXED 2 rounds
  // (so the oracle replays the exact construction) and reports the
  // per-round audit: the residual after round r is the duplication
  // round r+1 will remove — X94FixpointSpec drives a fixture where
  // round 1's removal CREATES the duplication round 2 clears, and the
  // twin-doc case that reaches residual 0 in one round.
  //
  // Scale shape: exactly `rounds` × x88's chain plus `rounds + 1`
  // span-count passes — every pass keeps the component contracts
  // (positional span rows ∝ tokens, hub-safe constant-buffer dup
  // counts, stateless per-row rewrite); round r's corpus is never
  // larger than round r−1's.
  private val ScrubRounds = 2

  /** x94's engine, parameterized for fixtures: fixed-`rounds`
    * repeated-span scrub with the per-round residual audit —
    * (doc_id, dup_r0, rm_r1, dup_r1, …, rm_rN, dup_rN). */
  private[graft] def scrubRoundAudit(docs0: DataFrame,
      rounds: Int = ScrubRounds, w: Int = ScrubW): DataFrame = {
    var cur = docs0.select(col("doc_id"), col("text")).persist()
    cur.count()
    var outp = spanDedupCounts(cur, w)
      .select(col("doc_id"), col("dup_spans").as("dup_r0"))
    for (r <- 1 to rounds) {
      val sc = spanScrub(cur, w).persist()
      sc.count() // next round's corpus + the rm column both consume it
      val nxt = sc.select(col("doc_id"), col("clean").as("text"))
      outp = outp
        .join(sc.select(col("doc_id"), col("n_removed").as(s"rm_r$r")),
          "doc_id")
        .join(spanDedupCounts(nxt, w)
          .select(col("doc_id"), col("dup_spans").as(s"dup_r$r")), "doc_id")
      cur = nxt
    }
    ordered(outp)
  }

  /** Iterate [[spanScrub]] until no cross-doc duplicated span remains
    * or `maxRounds` passes ran — the convergence-driven library form
    * (the gate uses fixed rounds so the oracle can replay). Returns
    * the cleaned (doc_id, text) corpus and the per-round residual
    * totals (duplicated-span count AFTER each round — the sequence is
    * what a pipeline logs to show convergence). The per-round check
    * is ONE metadata-scale aggregate row, the same driver-action
    * discipline as the CC/k-core convergence counts. */
  private[graft] def spanScrubToFixpoint(docs: DataFrame, maxRounds: Int,
      w: Int = ScrubW): (DataFrame, Seq[Long]) = {
    var cur = docs.select(col("doc_id"), col("text"))
    val resid = Seq.newBuilder[Long]
    var r = 0
    var residual = -1L
    while (r < maxRounds && residual != 0L) {
      cur = spanScrub(cur, w)
        .select(col("doc_id"), col("clean").as("text")).persist()
      cur.count()
      residual = spanDedupCounts(cur, w)
        .agg(coalesce(sum(col("dup_spans")), lit(0L)))
        .head().getLong(0)
      resid += residual
      r += 1
    }
    (cur, resid.result())
  }

  /** One DuckDB scrub round: from token-list CTE `$in(doc_id, tk)`,
    * emit `$ps`(positional spans), `$d`(per-doc dup count, the
    * residual BEFORE this round's rewrite), `$out`(rebuilt token
    * lists + `rm_r$r`). */
  private def duckScrubRound(in: String, r: Int): String = {
    val w = ScrubW
    s"""ps$r AS MATERIALIZED (
              SELECT doc_id, i,
                     md5(array_to_string(tk[i+1 : i+$w], ' ')) AS sh
              FROM $in,
                   unnest(range(0, GREATEST(len(tk) - ${w - 1}, 0))) AS u(i)),
            sp$r AS (SELECT DISTINCT doc_id, sh FROM ps$r),
            ns$r AS (SELECT sh, count(*) AS n_docs FROM sp$r GROUP BY 1),
            d$r AS (
              SELECT s.doc_id,
                     CAST(sum(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END)
                       AS BIGINT) AS dup_r$r
              FROM sp$r s JOIN ns$r c USING (sh) GROUP BY 1),
            st${r + 1} AS (
              SELECT p.doc_id, list(i) AS starts
              FROM ps$r p JOIN (SELECT sh FROM ns$r WHERE n_docs >= 2) x
                USING (sh)
              GROUP BY 1),
            reb${r + 1} AS (
              SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n$r,
                     [t.tk[p + 1] FOR p IN range(0, len(t.tk))
                      IF len(list_filter(coalesce(st.starts, []),
                        s -> s <= p AND p <= s + ${w - 1})) = 0] AS tk
              FROM $in t LEFT JOIN st${r + 1} st ON st.doc_id = t.doc_id),
            rm${r + 1} AS (
              SELECT doc_id, n$r - CAST(len(tk) AS BIGINT) AS rm_r${r + 1}
              FROM reb${r + 1})"""
  }

  private val x94 = GateQuery(
    "x94_scrub_fixpoint",
    (s, d) => scrubRoundAudit(Tables.documents(s, d)),
    Some(s"""WITH reb0 AS (
              SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
            ${duckScrubRound("reb0", 0)},
            ${duckScrubRound("reb1", 1)},
            ps2 AS MATERIALIZED (
              SELECT doc_id, i,
                     md5(array_to_string(tk[i+1 : i+$ScrubW], ' ')) AS sh
              FROM reb2,
                   unnest(range(0, GREATEST(len(tk) - ${ScrubW - 1}, 0)))
                     AS u(i)),
            sp2 AS (SELECT DISTINCT doc_id, sh FROM ps2),
            ns2 AS (SELECT sh, count(*) AS n_docs FROM sp2 GROUP BY 1),
            d2 AS (
              SELECT s.doc_id,
                     CAST(sum(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END)
                       AS BIGINT) AS dup_r2
              FROM sp2 s JOIN ns2 c USING (sh) GROUP BY 1)
          SELECT d.doc_id,
                 coalesce(d0.dup_r0, 0) AS dup_r0,
                 coalesce(r1.rm_r1, 0) AS rm_r1,
                 coalesce(d1.dup_r1, 0) AS dup_r1,
                 coalesce(r2.rm_r2, 0) AS rm_r2,
                 coalesce(d2.dup_r2, 0) AS dup_r2
          FROM documents d
          LEFT JOIN d0 ON d0.doc_id = d.doc_id
          LEFT JOIN rm1 r1 ON r1.doc_id = d.doc_id
          LEFT JOIN d1 ON d1.doc_id = d.doc_id
          LEFT JOIN rm2 r2 ON r2.doc_id = d.doc_id
          LEFT JOIN d2 ON d2.doc_id = d.doc_id
          ORDER BY 1,2,3,4,5,6"""))

  // ---------------------------------------------------------------- x95
  // Registry maintenance for incremental ingest — the append/compact
  // move x86's production story requires: yesterday's frozen class
  // registry absorbs day-1's novel classes ([[appendRegistry]]: novel
  // sigs insert, existing sigs merge cnt/min_id — one groupBy on sig,
  // cost ∝ classes, never ∝ raw history), and day-2's delta then
  // ingests against the APPENDED registry. The gate's output is
  // definitionally equal to x86's batch form over the union history —
  // classesOf(day0) ⊕ day1 = classesOf(day0 ∪ day1) — so the oracle
  // is the same doc-level SQL; hash-green here means the append math
  // (count sums, min-id merges, novel inserts) is exact.
  private val x95 = GateQuery(
    "x95_registry_append",
    (s, d) => {
      val docArrs = Tables.documents(s, d)
        .repartition(col("doc_id"))
        .select(col("doc_id"), tokenSet(col("text")).as("arr"))
        .persist()
      docArrs.count()
      val day0 = docArrs.filter(
        col("doc_id") % 4 === 1 || col("doc_id") % 4 === 2)
      val day1 = docArrs.filter(col("doc_id") % 4 === 3)
      // the registry round-trips through its band-partitioned AT-REST
      // form (graft.RegistryStore): day0 written, day1 appended as
      // per-band delta files, the store COMPACTED (per-band fold of
      // the delta files + the classes LSM merge materialized), and
      // the class view read back from the compacted store — so
      // hash-green here proves the FULL storage lifecycle (append
      // files + compaction rewrite + read), not just the in-memory
      // appendRegistry math (RegistryStoreSpec separately proves the
      // probe reads one band partition, prunes within it by footer
      // stats, and that compaction preserves both properties)
      val root = java.nio.file.Files
        .createTempDirectory("graft_x95_registry")
      // scratch store: reclaim at JVM exit (readClasses is lazy — the
      // files must outlive this builder fn, not the process). ONE
      // shared hook drains a queue of roots: bench sweeps invoke this
      // builder dozens of times, and a hook-per-pass both leaks
      // threads and throws IllegalStateException if a pass races
      // JVM shutdown (TempReaper registers its hook once, lazily).
      TempReaper.register(root)
      graft.RegistryStore.write(classesOf(day0), root.toString)
      graft.RegistryStore.append(classesOf(day1), root.toString)
      graft.RegistryStore.compact(s, root.toString)
      ingestAgainstClasses(
        graft.RegistryStore.readClasses(s, root.toString),
        docArrs.filter(col("doc_id") % 4 === 0))
    },
    Some(ingestOracleSql))

  // ---------------------------------------------------------------- x96
  // Gopher repetition signals (Rae et al., "Scaling Language Models:
  // Methods, Analysis & Insights from Training Gopher", Table A1) —
  // the FULL repetition panel x26's single dup-bigram fraction
  // sketches: per document, the fraction of characters covered by
  // (a) the most frequent n-gram's occurrences for n ∈ {2, 3, 4}
  // ("top n-gram character fraction") and (b) ANY n-gram occurring
  // ≥ 2 times within the doc for n ∈ {5..10} ("duplicate n-gram
  // character fraction"). Coverage is a POSITIONAL UNION — Rae et
  // al.'s no-double-counting rule — computed with exactly x88's
  // covering-window machinery at per-doc grain; fractions are integer
  // permille of token characters (spaces excluded), so both engines
  // hash-match bit-for-bit. Ties for the top gram break to the
  // smallest gram hash (a total order both engines share).
  //
  // Scale shape: the batch form is the distributed one — ONE
  // positional explode over all 9 n values (rows ∝ 9 × corpus
  // tokens, fixed-width (doc_id, n, i, 32-hex hash)), per-(doc, n,
  // gram) counts with map-side partials, start-position sets ≤ doc
  // length collected per (doc, n), and a stateless per-row coverage
  // HOF — the x45/x88 contract; document text shuffles never. The
  // streaming twin ([[graft.streaming.DocStreams
  // .gopherRepetitionStream]]) computes the same signals per-row
  // (in-doc counts need no corpus state) with an O(len²)-per-doc
  // expression, the ingest-time trade documented there.
  private[graft] val GopherTopNs = Seq(2, 3, 4)
  private[graft] val GopherDupNs = Seq(5, 6, 7, 8, 9, 10)

  /** Mod-k winnow on the DUP side (n ∈ 5..10) — the x10/spanDedup row
    * reducer applied to x96's dominant cost (the six dup-n explode
    * rows are 2/3 of the 9×tokens positional table, and the sf1 sweep
    * read 58.9 s): keep only grams whose 32-bit hash ≡ 0 (mod k),
    * BEFORE the count/join/coverage chain. CONTENT-keyed and
    * all-or-nothing per gram identity (every occurrence of a gram
    * shares its hash), so a kept gram's in-doc count — and therefore
    * its duplicate status — is EXACT; what is sampled is which gram
    * identities contribute coverage. rep_5..rep_10 are therefore
    * deterministic 1/k-identity-sample LOWER BOUNDS of the full
    * coverage (kept starts ⊆ all dup starts, and positional union is
    * monotone — X96GopherSpec pins both the monotonicity and
    * flag-agreement with the full run on the corpus). The top side
    * (n ≤ 4) is never winnowed: its statistic is a per-doc argmax,
    * not a union, and sampling would change WHICH gram wins.
    *
    * Round 13: the PUBLIC API default is EXACT
    * ([[graft.Knobs.GopherDupWinnowExact]] = 1) — a consumer reading
    * rep_n gets the true Gopher Table A1 permilles unless they opt
    * into the estimator; the x96 GATE runs the documented mod-4
    * estimator explicitly (its oracle replays the same winnow). */
  private[graft] val GopherDupWinnow = graft.Knobs.GopherDupWinnowGate

  /** x96's engine, parameterized for fixtures: (doc_id, text) in;
    * (doc_id, n_chars, rep_2..rep_4, rep_5..rep_10) out — permille of
    * token characters covered by the top-(2..4)-gram / duplicated-
    * (5..10)-grams. X96GopherSpec pins coverage union, tie-breaks,
    * and batch/stream agreement.
    *
    * Round 15: every panel signal is an IN-DOC statistic, so the
    * engine is ONE native per-row pass
    * ([[graft.functions.GopherPanel]] — linear in 9 × doc tokens,
    * zero shuffle, zero exploded intermediate), replacing the
    * round-14 explode + count-shuffle + start-set-join chain that
    * made x96 the slowest sf1 gate. The exploded engine stays below
    * as [[gopherRepetitionExploded]], the distributed cross-check
    * the parity spec (GopherPanelSpec) runs against the same corpus;
    * the DuckDB oracle replays the exploded form independently. */
  private[graft] def gopherRepetition(docs: DataFrame,
      dupWinnow: Int = graft.Knobs.GopherDupWinnowExact): DataFrame = {
    require(dupWinnow >= 1, "dupWinnow >= 1")
    val p = graft.functions.GopherPanel.gopherPanel(col("text"), dupWinnow)
    ordered(docs
      .select(col("doc_id"), p.as("p"))
      .select(col("doc_id") +: col("p")("n_chars").as("n_chars") +:
        (GopherTopNs ++ GopherDupNs).map(k =>
          col("p")(s"rep_$k").as(s"rep_$k")): _*))
  }

  /** The round-14 DISTRIBUTED form of [[gopherRepetition]] — 9-n
    * positional explode, per-(doc,n,gram) counts, start-set joins,
    * coverage HOF — kept as the cross-check engine GopherPanelSpec
    * proves the native per-row panel against (same corpus, winnow 1
    * and 4). Prefer the per-row engine: a per-doc statistic never
    * needed the shuffle. */
  private[graft] def gopherRepetitionExploded(docs: DataFrame,
      dupWinnow: Int = graft.Knobs.GopherDupWinnowExact): DataFrame = {
    require(dupWinnow >= 1, "dupWinnow >= 1")
    val tkd = docs
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("tk"))
      .persist() // the gram pass and the coverage pass both consume it
    tkd.count()
    // positional n-grams for every n in ONE fused native pass
    // (graft.functions.GramHashes: tokens UTF-8-encoded once, digest
    // fed incrementally — no per-window slice/join strings;
    // GramHashesSpec pins bit-equality with the HOF formulation the
    // oracle replays): (doc_id, n, i, g). The dup side (n ≥ 5) is
    // mod-k winnowed HERE, before anything is persisted or counted —
    // see [[GopherDupWinnow]] (1 = exact full run, the spec knob).
    val posAll = tkd
      .select(col("doc_id"), explode(graft.functions.GramHashes
        .gramHashes(col("text"), GopherTopNs.min, GopherDupNs.max))
        .as("e"))
      .select(col("doc_id"), col("e")("n").as("n"),
        col("e")("i").as("i"), col("e")("g").as("g"))
    val pos = (if (dupWinnow == 1) posAll
      else posAll.filter(col("n") <= GopherTopNs.max ||
        pmod(hex32(col("g")), lit(dupWinnow.toLong)) === 0))
      .persist() // counts + both start-set joins consume it
    pos.count()
    val cnts = pos.groupBy(col("doc_id"), col("n"), col("g"))
      .agg(count(lit(1)).as("cnt"))
    // n <= 4: the single most frequent gram (ties -> smallest hash)
    val top = cnts.filter(col("n") <= GopherTopNs.max)
      .groupBy(col("doc_id"), col("n"))
      .agg(min(struct((-col("cnt")).as("nc"), col("g"))).as("b"))
      .select(col("doc_id"), col("n"), col("b")("g").as("g"))
    val topStarts = pos.join(top, Seq("doc_id", "n", "g"))
      .groupBy(col("doc_id"), col("n"))
      .agg(collect_set(col("i")).as("starts"))
    // n >= 5: every gram duplicated WITHIN the doc
    val dupStarts = pos
      .join(cnts.filter(col("n") >= GopherDupNs.min && col("cnt") >= 2)
        .select(col("doc_id"), col("n"), col("g")), Seq("doc_id", "n", "g"))
      .groupBy(col("doc_id"), col("n"))
      .agg(collect_set(col("i")).as("starts"))
    val starts = topStarts.unionByName(dupStarts)
    // positional-union coverage in token characters (spaces excluded)
    val covered = tkd.join(starts, Seq("doc_id"))
      .withColumn("chars", expr(
        "aggregate(transform(tk, (t, p) -> IF(exists(starts, " +
          "s -> s <= p AND p <= s + n - 1), length(t), 0)), " +
          "0L, (acc, x) -> acc + x)"))
      .select(col("doc_id"), col("n"), col("chars"))
    val nch = tkd.select(col("doc_id"),
      expr("aggregate(tk, 0L, (acc, t) -> acc + length(t))").as("n_chars"))
    val pivotCols = (GopherTopNs ++ GopherDupNs).map { k =>
      // zero-character docs (empty/all-space text) report 0, matching
      // the per-row panel — under ANSI a bare `div 0` would throw
      coalesce(max(when(col("n") === k,
        expr(s"IF(n_chars = 0, 0L, chars * 1000 div n_chars)"))),
        lit(0L)).as(s"rep_$k")
    }
    ordered(nch.join(covered, Seq("doc_id"), "left")
      .groupBy(col("doc_id"), col("n_chars"))
      .agg(pivotCols.head, pivotCols.tail: _*))
  }

  private val x96 = GateQuery(
    "x96_gopher_repetition",
    // the gate runs the documented mod-4 dup-side estimator (the
    // oracle's pos CTE replays the same winnow); the public API
    // default is exact — see GopherDupWinnow's scaladoc
    (s, d) => gopherRepetition(Tables.documents(s, d),
      dupWinnow = GopherDupWinnow),
    Some {
      val repSelects = (GopherTopNs ++ GopherDupNs).map { k =>
        s"coalesce(max(CASE WHEN c.n = $k THEN (c.chars * 1000) // nc.n_chars END), 0) AS rep_$k"
      }.mkString(",\n                 ")
      s"""WITH tkc AS (
              SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
            pos0 AS (
              SELECT doc_id, u.n, v.i,
                     md5(array_to_string(tk[v.i+1 : v.i+u.n], ' ')) AS g
              FROM tkc,
                   unnest(range(${GopherTopNs.min}, ${GopherDupNs.max + 1}))
                     AS u(n),
                   unnest(range(0, GREATEST(len(tk) - u.n + 1, 0))) AS v(i)),
            pos AS MATERIALIZED (
              SELECT * FROM pos0
              WHERE n <= ${GopherTopNs.max}
                 OR ${duckHex32("g")} % $GopherDupWinnow = 0),
            cnts AS (
              SELECT doc_id, n, g, count(*) AS cnt
              FROM pos GROUP BY 1, 2, 3),
            top AS (
              SELECT doc_id, n, g FROM (
                SELECT doc_id, n, g, row_number() OVER (
                  PARTITION BY doc_id, n ORDER BY cnt DESC, g) AS rn
                FROM cnts WHERE n <= ${GopherTopNs.max}) WHERE rn = 1),
            tstarts AS (
              SELECT p.doc_id, p.n, list(p.i) AS starts
              FROM pos p JOIN top t
                ON t.doc_id = p.doc_id AND t.n = p.n AND t.g = p.g
              GROUP BY 1, 2),
            dstarts AS (
              SELECT p.doc_id, p.n, list(p.i) AS starts
              FROM pos p JOIN (SELECT doc_id, n, g FROM cnts
                               WHERE n >= ${GopherDupNs.min} AND cnt >= 2) d
                ON d.doc_id = p.doc_id AND d.n = p.n AND d.g = p.g
              GROUP BY 1, 2),
            starts AS (SELECT * FROM tstarts UNION ALL SELECT * FROM dstarts),
            cov AS (
              SELECT t.doc_id, s.n,
                CAST(coalesce(list_sum(
                  [CASE WHEN len(list_filter(s.starts,
                     x -> x <= p AND p <= x + s.n - 1)) > 0
                   THEN length(t.tk[p+1]) ELSE 0 END
                   FOR p IN range(0, len(t.tk))]), 0) AS BIGINT) AS chars
              FROM tkc t JOIN starts s ON s.doc_id = t.doc_id),
            nchars AS (
              SELECT doc_id,
                CAST(coalesce(list_sum(
                  [length(x) FOR x IN tk]), 0) AS BIGINT) AS n_chars
              FROM tkc)
          SELECT nc.doc_id, nc.n_chars,
                 $repSelects
          FROM nchars nc
          LEFT JOIN cov c ON c.doc_id = nc.doc_id
          GROUP BY 1, 2
          ORDER BY 1,2,3,4,5,6,7,8,9,10,11"""
    })

  // ---------------------------------------------------------------- x97
  // END-TO-END training-pipeline gate: the stage COMPOSITION a real
  // user runs — [[graft.pipeline.TrainingPipeline.prepare]]'s
  // redact → exact-dedup → decontaminate → quality-filter →
  // stratified-sample → shuffle-into-shards → pack — over the
  // documents table, oracle-gated by unrolling the SAME stages as
  // CTEs (each stage's math is the per-stage gate's: x32, x01/x02,
  // x24, x26, x25, x27, x23). The per-stage gates prove each operator
  // alone; this gate proves their composition — ordering effects
  // (redaction BEFORE any hashing changes the dedup classes and the
  // placement keys), survivor-set plumbing, and the pipeline's
  // single-checkpoint plan (three wide ops: the sig window, the
  // stratum-count agg, the shard window — PipelineSpec pins the
  // count).
  //
  // The benchmark set is a FIXED literal (benchmarks are KB-MB by
  // nature — they ride with the plan, the corpus never shuffles for
  // decontamination).
  private val PipelineBenchBigrams =
    Seq("join hash", "scan slow", "batch window")
  private val x97 = GateQuery(
    "x97_training_pipeline",
    (s, d) => {
      val out = graft.pipeline.TrainingPipeline.prepare(
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("text")),
        graft.pipeline.TrainingPipeline.Config(
          benchBigrams = PipelineBenchBigrams))
      ordered(out.select(col("doc_id"), col("lang"), col("shard"),
        col("pos"), col("n_tok"), col("pack_seq"), col("pack_off")))
    },
    Some(s"""WITH red AS (
              SELECT doc_id, lang,
                regexp_replace(
                  regexp_replace(
                    regexp_replace(text, '$PiiEmail', '<EMAIL>', 'g'),
                    '$PiiUrl', '<URL>', 'g'),
                  '$PiiNum', '<NUM>', 'g') AS text
              FROM documents),
            tks AS (
              SELECT doc_id, lang, string_split(text, ' ') AS tk,
                md5(array_to_string(list_sort(list_distinct(
                  string_split(text, ' '))), ' ')) AS sig
              FROM red),
            ded AS (
              SELECT doc_id, lang, tk FROM (
                SELECT *, row_number() OVER (PARTITION BY sig
                  ORDER BY doc_id) AS rn
                FROM tks) WHERE rn = 1),
            bgd AS (
              SELECT doc_id, lang, tk, $duckBigrams AS bgs FROM ded),
            surv AS (
              SELECT doc_id, lang, CAST(len(tk) AS BIGINT) AS n_tok
              FROM bgd
              WHERE len(list_intersect(bgs,
                      [${PipelineBenchBigrams.map(b => s"'$b'").mkString(", ")}])) = 0
                AND len(tk) >= 2
                AND 1.0 - CAST(len(bgs) AS DOUBLE) / (len(tk) - 1) <= 0.3),
            rates AS (
              SELECT lang, CAST(LEAST(1000, CAST(FLOOR(100000.0 / count(*))
                AS BIGINT)) AS BIGINT) AS rate_pm
              FROM surv GROUP BY 1),
            sampled AS (
              SELECT s.doc_id, s.lang, s.n_tok
              FROM surv s JOIN rates r ON r.lang = s.lang
              WHERE ${duckHex32("md5('s:' || CAST(s.doc_id AS VARCHAR))")}
                % 1000 < r.rate_pm),
            keyed AS (
              SELECT doc_id, lang, n_tok,
                ${duckHex32("md5('sh:' || CAST(doc_id AS VARCHAR))")} AS skey
              FROM sampled),
            placed AS (
              SELECT doc_id, lang, CAST(skey % 32 AS BIGINT) AS shard, n_tok,
                CAST(row_number() OVER (PARTITION BY skey % 32
                  ORDER BY skey, doc_id) AS BIGINT) AS pos,
                CAST(SUM(n_tok) OVER (PARTITION BY skey % 32
                  ORDER BY skey, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  - n_tok AS start
              FROM keyed)
            SELECT doc_id, lang, shard, pos, n_tok,
                   CAST(start // 512 AS BIGINT) AS pack_seq,
                   CAST(start % 512 AS BIGINT) AS pack_off
            FROM placed ORDER BY 1,2,3,4,5,6,7"""))

  val all: Seq[GateQuery] = Seq(x01, x02, x03, x04, x05, x06, x07, x08, x09,
    x10, x11, x12, x13, x14, x15, x16, x17, x18, x19, x20, x21, x22, x23,
    x24, x25, x26, x27, x28, x29, x30, x31, x32, x33, x34, x35, x36, x37,
    x38, x39, x40, x41, x42, x43, x44, x45, x46, x47, x48, x49, x50, x51,
    x52, x53, x54, x55, x56, x57, x58, x59, x60, x61, x62, x63, x64, x65, x66,
    x67, x68, x69, x70, x71, x72, x73, x74, x75, x76, x77, x78, x79, x80,
    x81, x82, x83, x84, x85, x86, x87, x88, x89, x90, x91, x92, x93, x94,
    x95, x96, x97, x98, x99)
}
