package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{word_ngrams, xxhash64_seeded}

/** MinHash + LSH banding primitives, shared by the batch near-dup queries
  * (`graft.queries.DedupQueries`) and the streaming near-dup flagger
  * (`graft.streaming.EventStreams.nearDupFlags`) so both paths use the
  * identical hash family and banding scheme.
  *
  * Everything here is map-side: shingling, the 64-hash signature
  * (array_min over transform — no explode, no shuffle), and the band-key
  * explosion (one (band, band-hash) row per band per document). The only
  * shuffle in any consumer is the equi-join on (band, bh).
  */
object MinHash {

  val NumHashes = 64
  val BandRows  = 2 // 32 bands x 2 rows: P(miss | j>=0.8) ~ 6e-15
  val NumBands: Int = NumHashes / BandRows

  /** Distinct n-token shingles of a whitespace-tokenized text column —
    * the fused one-pass kernel, bit-identical to
    * `array_distinct(word_ngrams(split(text, " "), n))` (spec'd in
    * MinHashSpec; the composed form is interpreted end to end and was the
    * dominant CPU of the verification stage at pipeline scale). */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.word_ngrams_distinct(split(text, " "), n)

  /** Seed for the one-per-shingle base hash the signature family derives
    * from (distinct from the family seeds 0..63 and the band seeds
    * 1000+). */
  val BaseHashSeed = -9L

  /** Seed for VERIFICATION-stage shingle hashes (exact hashed-set Jaccard
    * over candidate pairs), deliberately DISTINCT from [[BaseHashSeed]]:
    * with a shared seed, a 64-bit collision that helped create a spurious
    * candidate would be the identical collision at verify time, making the
    * two stages' (already negligible) collision errors correlated instead
    * of independent. A distinct seed keeps exact verification an
    * independent check of candidate generation. */
  val VerifyHashSeed = -77L

  /** The 64 MinHash signature values of a shingle-array column: for hash
    * family i (seeded xxhash64), the min over the document's shingles.
    *
    * Family value i of a shingle is xxhash64(i, xxhash64(base, shingle)):
    * the STRING is hashed once and the 64 family hashes re-mix the 8-byte
    * result through XxHash64's long fast path — a few ns each vs a full
    * variable-length string hash. This is the standard minwise-family
    * construction (one strong base hash + derived family, as in
    * datasketch / Spark MLlib's MinHashLSH); family quality is a PRF over
    * the base value, and any family change only perturbs CANDIDATE
    * generation — every consumer exact-verifies pairs, so results are
    * identical as long as banded recall holds (32x2 at j >= 0.7: ~1e-14
    * miss probability, threshold-independent of the family).
    *
    * The base-hash array is materialized by [[bandKeys]] as its own
    * projection so the 64 family columns share ONE string-hash pass —
    * inlined, each of the 64 transforms would re-hash every string and
    * the optimization would silently vanish (HOFs are interpreted, not
    * codegen'd, so no common-subexpression reuse saves it). */
  def signature(shingleCol: Column): Seq[Column] =
    signatureFromHashes(transform(shingleCol,
      s => xxhash64_seeded(BaseHashSeed, s)))

  /** Signature over an already-hashed shingle array (array<long>). */
  def signatureFromHashes(hashCol: Column): Seq[Column] =
    (0 until NumHashes).map { i =>
      array_min(transform(hashCol, h => xxhash64_seeded(i.toLong, h)))
        .as(s"mh_$i")
    }

  /** One (band, bh) struct per band, hashing that band's signature rows
    * (read out of the fused signature array — see bandKeys). */
  private def bandStructs(sig: Column): Seq[Column] =
    (0 until NumBands).map { b =>
      struct(lit(b).as("band"),
        xxhash64_seeded(1000L + b,
          (0 until BandRows).map(r => sig.getItem(b * BandRows + r)): _*)
          .as("bh"))
    }

  /** Band bucket keys for every row of `df`: `carryCols` + (band, bh),
    * NumBands rows per input row. Rows with no shingles (< n tokens) are
    * dropped, matching the batch pipeline. Works on streaming frames too —
    * every step is a stateless projection. */
  def bandKeys(df: DataFrame, textCol: String, carryCols: Seq[String],
      n: Int = 3): DataFrame = {
    val sigs = df
      // Exactly `size(shingles) > 0`, but stated over the raw token count:
      // a doc has >= 1 n-shingle iff it has >= n whitespace tokens. The
      // distinction matters physically — Catalyst pushes this filter below
      // any downstream repartition into the scan stage, and there a
      // predicate over the shingle ARRAY would evaluate the whole
      // array_distinct(transform(...)) shingle pipeline once per row inside
      // the (often single-split) scan task, then recompute it again after
      // the exchange. The token-count form keeps the pushed-down predicate
      // a cheap split+size.
      .filter(size(split(col(textCol), " ")) >= n)
      // FUSED base-hash projection: one hash per n-token window straight
      // off the token array (word_ngram_hashes — bit-equal to hashing the
      // joined gram string, no gram-string materialization, no
      // array_distinct: the signature is a per-family MINIMUM, so
      // duplicate shingles cannot change it — min over a multiset equals
      // min over its set; spec'd in MinHashSpec), then the FUSED 64-family
      // signature: one codegen'd pass computing all minima, instead of 64
      // interpreted array_min(transform(...)) traversals per document
      // (HOFs never enter WholeStageCodegen — the column-per-family form
      // was the dominant map-side CPU of the candidate stage at pipeline
      // scale). The explicit select boundaries keep CollapseProject from
      // folding either non-cheap projection into its downstream consumers.
      .select(carryCols.map(col) :+
        graft.functions.word_ngram_hashes(split(col(textCol), " "), n,
          BaseHashSeed).as("__h"): _*)
      .select(carryCols.map(col) :+
        graft.functions.minhash_signatures(col("__h"), NumHashes).as("__sig"): _*)
    sigs
      .select(carryCols.map(col) :+
        explode(array(bandStructs(col("__sig")): _*)).as("bk"): _*)
      .select(carryCols.map(col) :+ col("bk.band").as("band") :+ col("bk.bh").as("bh"): _*)
  }

  /** [[bandKeys]] with the band ordinal carried ONLY inside the hash:
    * emits `carryCols + bh`, where bh is the same per-band seeded value
    * bandKeys produces (seed 1000+band), and the band COLUMN is never
    * materialized. Keying buckets by bh alone merges buckets across bands
    * only on a 64-bit cross-band collision (~1e-19 per bucket pair), and a
    * merged bucket only ADDS candidate pairs — which exact verification
    * discards — so results are identical to (band, bh) keying (the same
    * accepted class as every hashed key in the engine; CandsLap asserts
    * bit-equal candidate counts live on every probe run).
    *
    * Why it exists: the (doc_id, band, bh) row is a 32-byte UnsafeRow and
    * the candidate stage shuffles docs x 32 of them — the single largest
    * exchange in the data pipeline. (doc_id, bh) is 24 bytes (25% fewer
    * through the exchange) and the aggregation keys on ONE long instead of
    * (int, long). Measured 1.5x on the stage at 11.32 GB (CandsLap run 1,
    * interleaved same-window laps: 150.0/158.4 s vs 218.7/279.0). */
  def bandHashKeys(df: DataFrame, textCol: String, carryCols: Seq[String],
      n: Int = 3): DataFrame =
    bandHashKeysWith(df, textCol, carryCols, n,
      graft.functions.minhash_signatures(_, NumHashes))

  /** [[bandHashKeys]] with the ONE-PERMUTATION signature
    * ([[graft.functions.minhash_signatures_oph]]): each shingle hash is
    * routed to one of the 64 slots and each slot keeps its minimum
    * (rotation-densified), so the map side does ONE bin-route per shingle
    * instead of 64 seeded hashes — the k-family kernel's inner loop was
    * the dominant map-side CPU of the candidate stage. A DIFFERENT LSH
    * family: the candidate set differs from [[bandHashKeys]]' (higher
    * estimator variance on short documents, where most slots densify), so
    * only for consumers that exact-verify pairs — precision is untouched
    * and recall sits on the same 32x2 banding margin (statistical recall
    * spec in MinHashSpec; the pipeline's planted-dup gate witnesses it
    * live at every scale point). Selected by `SPARK_GRAFT_DP_SIG=oph`.
    *
    * ADJUDICATED AGAINST as a default (CandsLap, 11.32 GB corpus,
    * `candslap-oph-11p3g.json`): on this corpus's short-document mix the
    * densified slots correlate across non-similar docs and banding emits
    * 131.0 M candidates where the k-family emits 15.5 M (8.4x,
    * deterministic across reps) — 8.4x the verify work downstream — while
    * the map-side signature probe shows the k-family kernel was never the
    * bottleneck (mapfam 23-27 s of a 273 s stage, mapoph no cheaper at
    * 30-33 s: the fused 64-hash loop is in-register long-mixing, and OPH
    * pays the same shingle-hash stream plus a densification pass). Kept as
    * a probe lever for long-document corpora, where slots fill and the
    * variance argument actually applies. */
  def bandHashKeysOph(df: DataFrame, textCol: String, carryCols: Seq[String],
      n: Int = 3): DataFrame =
    bandHashKeysWith(df, textCol, carryCols, n,
      graft.functions.minhash_signatures_oph(_, NumHashes))

  private def bandHashKeysWith(df: DataFrame, textCol: String,
      carryCols: Seq[String], n: Int, sig: Column => Column): DataFrame = {
    val sigs = df
      .filter(size(split(col(textCol), " ")) >= n)
      .select(carryCols.map(col) :+
        graft.functions.word_ngram_hashes(split(col(textCol), " "), n,
          BaseHashSeed).as("__h"): _*)
      .select(carryCols.map(col) :+ sig(col("__h")).as("__sig"): _*)
    sigs.select(carryCols.map(col) :+
      explode(array((0 until NumBands).map { b =>
        xxhash64_seeded(1000L + b,
          (0 until BandRows).map(r => col("__sig").getItem(b * BandRows + r)): _*)
      }: _*)).as("bh"): _*)
  }

  /** Default per-bucket row cap for LSH candidate joins. Work inside one
    * bucket is quadratic in its size, and a single saturated key is
    * invisible to AQE skew handling (it is one KEY, not one partition) —
    * so on a boilerplate-heavy corpus (templated pages, licence headers)
    * an uncapped band join is the one plan that can go quadratic. 1000
    * bounds any single bucket's expansion at ~0.5M pairs. */
  val MaxBucketSize = 1000

  /** Drop buckets (distinct `keyCols` groups) holding more than `cap`
    * rows. This is the standard production guard for LSH candidate
    * generation: a bucket with thousands of members means near-identical
    * content that exact dedup (or a lower-threshold pass) already owns, so
    * dropping it bounds the join at no recall cost for the non-degenerate
    * pairs — every pair NOT in an oversized bucket still collides on its
    * other bands exactly as before (capping removes keys, never rows of
    * other keys).
    *
    * PLAN-PURE: this is pure plan construction — no job runs until the
    * consumer's own action (asserted with a job listener in
    * LshBucketCapSpec). The hot-keys frame is always `left_anti`-joined
    * (broadcast): in the normal no-hot-key case it is an empty broadcast,
    * which costs one key-only aggregation pass over `buckets` (8-byte
    * keys, map-side partial agg) and microseconds in the join itself.
    * The dropped-bucket count is surfaced at action time via
    * `Dataset.observe` (metric name `graft.lsh.cap.N`, fields
    * `hot_buckets`/`hot_rows`) and logged to stderr by a per-session
    * QueryExecutionListener whenever any bucket was dropped.
    */
  def capBuckets(buckets: DataFrame, keyCols: Seq[String],
      cap: Int = MaxBucketSize): DataFrame = {
    val keys = keyCols.map(col)
    val hot = buckets.groupBy(keys: _*).agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > cap)
      // observation names must be unique within a plan; one query may cap
      // several bucket tables (e.g. index + probe sides), hence the counter
      .observe(s"graft.lsh.cap.${capId.incrementAndGet()}",
        count(lit(1)).as("hot_buckets"),
        coalesce(sum(col("bucket_n")), lit(0L)).as("hot_rows"),
        first(lit(s"capBuckets(${keyCols.mkString(",")}) cap=$cap"))
          .as("cap_site"))
    registerCapLogger(buckets.sparkSession)
    buckets.join(broadcast(hot.select(keys: _*)), keyCols, "left_anti")
  }

  /** Candidate pairs from a bucket-keyed frame, capped, in ONE pass: group
    * rows by `keyCols`, collect the bucket's ids, drop oversized buckets,
    * and expand each surviving bucket's pairs IN-ROW (`least`/`greatest`
    * ordering, so (id_a < id_b) like the join formulation). Returns
    * (id_a, id_b) — callers `distinct()` across buckets.
    *
    * This is the scale shape for LSH candidate generation, replacing the
    * round-8 self-join: a self-join references the bucket pipeline on BOTH
    * sides (plus a third time in the cap's key-count pass), and Spark has
    * no reliable cross-branch sharing for it — persist() races when AQE
    * launches the branches concurrently (each computed the full pipeline
    * before any cache block landed), localCheckpoint() executes stages at
    * plan-construction time, and exchange reuse is defeated by optimizer
    * reordering around the cap's anti-join. Grouping instead references
    * the pipeline ONCE and shuffles it ONCE (map-side partial
    * collect_list, 8-byte ids), and the quadratic expansion is bounded by
    * `cap` (≤ cap²/2 in-row pairs per bucket, ~0.5M at the default —
    * bounded work per task, where an uncapped hot KEY would be invisible
    * to AQE skew splitting). Dropped-bucket counts surface at action time
    * via `Dataset.observe` (metric `graft.lsh.cap.N`), logged by the
    * per-session listener; dropping whole oversized buckets is the
    * standard LSH guard — their members are near-identical content exact
    * dedup owns, and every other pair keeps its remaining band collisions.
    *
    * Plan-pure: construction launches no jobs (LshBucketCapSpec asserts
    * with a job listener).
    *
    * Sizing: the collect_list aggregation is an ObjectHashAggregate with
    * sort-based fallback — callers should pin the partitioning of
    * `buckets` proportional to data (an explicit repartition on
    * `keyCols`, which this groupBy then reuses shuffle-free) so per-task
    * aggregation state spills a handful of files, not hundreds (the
    * spill-merge phase allocates one reader buffer per file). Because
    * the frame is consumed exactly ONCE here, callers need no
    * checkpoint/persist on it — at the 6.4M-doc pipeline scale the old
    * two-reference materialization cached 7.5 GB for nothing.
    */
  def bucketPairs(buckets: DataFrame, keyCols: Seq[String], idCol: String,
      cap: Int = MaxBucketSize): DataFrame =
    pairsFromGroups(bucketGroups(buckets, keyCols, idCol, cap))

  /** The aggregation half of [[bucketPairs]]: group `buckets` by `keyCols`,
    * collect each bucket's ids (bounded at cap+1 elements of state), drop
    * oversized buckets, return `keyCols ++ (__ids, __n)`. Split out so the
    * pipeline's lap mode can materialize/time the grouped frame separately
    * from the in-row pair expansion ([[pairsFromGroups]]); `bucketPairs`
    * composes the two unchanged. */
  def bucketGroups(buckets: DataFrame, keyCols: Seq[String], idCol: String,
      cap: Int = MaxBucketSize): DataFrame = {
    // The id collector must hold at most cap+1 elements of aggregation
    // state per group: a plain collect_list materializes a hot bucket's
    // ENTIRE id array before the size filter can drop it, which on the
    // motivating input (one key shared by 10^8+ boilerplate rows at corpus
    // scale) is an executor OOM, not a cap. collect_capped grows its buffer
    // lazily and stops appending at cap+1 — enough to prove oversize —
    // while the exact bucket_n count (O(1) state) drives the filter and the
    // drop metrics, and any SURVIVING bucket (n <= cap < cap+1) kept all
    // its ids, so results are identical to the unbounded collect. (The
    // previous bounded-heap top_k had the right bound but preallocated a
    // (cap+1)-slot boxed PriorityQueue per group — allocation churn on the
    // millions of near-singleton (band,bh) groups that dominate bucket
    // tables.) For effectively uncapped calls (cap near Int.MaxValue — the
    // spec's equivalence twin), cap+1 would overflow, so fall back to
    // collect_list.
    // SPARK_GRAFT_LSH_COLLECTOR=top_k re-selects the round-9 bounded-heap
    // collector — an A/B lever for measuring the two bounded collectors
    // against each other (results are identical either way: both hold at
    // most cap+1 elements, and any SURVIVING bucket kept all its ids;
    // equivalence spec'd in CollectCappedSpec / TopKSpec, pairs
    // bit-identical at pipeline scale under both).
    val collector =
      if (cap >= (1 << 20)) collect_list(col(idCol))
      else if (sys.env.get("SPARK_GRAFT_LSH_COLLECTOR").contains("top_k"))
        graft.functions.top_k(col(idCol), cap + 1, smallest = true)
      else graft.functions.collect_capped(col(idCol), cap + 1)
    // NULL key semantics must match the equality self-join this operator
    // replaced: a join emits nothing for NULL keys, while groupBy would
    // collect them into one group and emit pairs — drop them up front.
    // (Current callers' band keys are never null; this guards the general
    // contract.)
    require(keyCols.nonEmpty, "bucketPairs needs at least one key column")
    val nonNullKeys = buckets.filter(keyCols.map(col(_).isNotNull)
      .reduce(_ && _))
    val agged = nonNullKeys.groupBy(keyCols.map(col): _*)
      .agg(collector.as("__ids"), count(lit(1)).as("__n"))
      .observe(s"graft.lsh.cap.${capId.incrementAndGet()}",
        coalesce(sum(when(col("__n") > cap, 1L)), lit(0L)).as("hot_buckets"),
        coalesce(sum(when(col("__n") > cap, col("__n"))), lit(0L))
          .as("hot_rows"),
        first(lit(s"bucketPairs(${keyCols.mkString(",")}) cap=$cap"))
          .as("cap_site"))
    registerCapLogger(buckets.sparkSession)
    agged.filter(col("__n") <= cap)
  }

  /** The expansion half of [[bucketPairs]]: emit each surviving bucket's
    * unordered id pairs in-row from a [[bucketGroups]] frame. */
  def pairsFromGroups(groups: DataFrame): DataFrame = {
    val ids = col("__ids")
    groups
      // all unordered pairs of the bucket: for element i, pair it with
      // every LATER element (slice is 1-based; transform's index 0-based;
      // slice length size(ids) rather than `cap` — start+cap can overflow
      // Int for an effectively-uncapped call), ordered (least, greatest)
      // so id_a < id_b matches the join form
      .select(explode(flatten(transform(ids, (x, i) =>
        transform(slice(ids, i + lit(2), size(ids)), y =>
          struct(least(x, y).as("id_a"), greatest(x, y).as("id_b"))))))
        .as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      // guard the join-form contract (a.id < b.id) against a caller whose
      // bucket frame repeats an id under one key: least/greatest would
      // emit a self-pair there where the strict self-join emitted nothing
      .filter(col("id_a") =!= col("id_b"))
  }

  private val capId = new java.util.concurrent.atomic.AtomicLong()

  /** Sessions that already carry the cap-logging listener (weak keys so a
    * stopped session isn't pinned by this map). */
  private val capLoggerSessions = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, java.lang.Boolean]())

  /** Log dropped-bucket counts when any consumer of a capped frame runs:
    * reads the `graft.lsh.cap.*` observed metrics off the finished query
    * execution. Registered once per session. */
  private def registerCapLogger(s: org.apache.spark.sql.SparkSession): Unit =
    if (capLoggerSessions.putIfAbsent(s, java.lang.Boolean.TRUE) == null)
      s.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit =
            qe.observedMetrics.foreach { case (name, row) =>
              if (name.startsWith("graft.lsh.cap.") && row.getLong(0) > 0L) {
                val site = if (row.length > 2 && !row.isNullAt(2))
                  row.getString(2) else "?"
                System.err.println(
                  s"[graft] MinHash $site: dropped ${row.getLong(0)} " +
                    s"oversized bucket(s) (${row.getLong(1)} rows total) — " +
                    "members are near-identical content owned by exact dedup")
              }
            }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
}
