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

  /** Distinct n-token shingles of a whitespace-tokenized text column. */
  def shingles(text: Column, n: Int = 3): Column =
    array_distinct(word_ngrams(split(text, " "), n))

  /** Seed for the one-per-shingle base hash the signature family derives
    * from (distinct from the family seeds 0..63 and the band seeds
    * 1000+). */
  val BaseHashSeed = -9L

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

  /** One (band, bh) struct per band, hashing that band's signature rows. */
  private def bandStructs: Seq[Column] =
    (0 until NumBands).map { b =>
      struct(lit(b).as("band"),
        xxhash64_seeded(1000L + b,
          (0 until BandRows).map(r => col(s"mh_${b * BandRows + r}")): _*)
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
      .withColumn("__sh", shingles(col(textCol), n))
      // materialize the one-string-hash-per-shingle array as its own
      // projection: the 64 family columns then traverse an array<long>
      // (see signature's scaladoc — inlining would re-hash the strings
      // 64x). The explicit select boundaries keep CollapseProject from
      // folding the non-cheap transform into its 64 consumers.
      .select(carryCols.map(col) :+
        transform(col("__sh"),
          s => xxhash64_seeded(BaseHashSeed, s)).as("__h"): _*)
      .select(carryCols.map(col) ++ signatureFromHashes(col("__h")): _*)
    sigs
      .select(carryCols.map(col) :+ explode(array(bandStructs: _*)).as("bk"): _*)
      .select(carryCols.map(col) :+ col("bk.band").as("band") :+ col("bk.bh").as("bh"): _*)
  }

  /** Default per-bucket row cap for LSH candidate joins. Work inside one
    * bucket is quadratic in its size, and a single saturated key is
    * invisible to AQE skew handling (it is one KEY, not one partition) —
    * so on a boilerplate-heavy corpus (templated pages, licence headers)
    * an uncapped band join is the one plan that can go quadratic. 1000
    * bounds any single bucket's expansion at ~0.5M pairs. */
  val MaxBucketSize = 1000

  /** Drop buckets (distinct `keyCols` groups) holding more than `cap`
    * rows, logging how many buckets/rows were dropped. This is the
    * standard production guard for LSH candidate generation: a bucket
    * with thousands of members means near-identical content that exact
    * dedup (or a lower-threshold pass) already owns, so dropping it
    * bounds the join at no recall cost for the non-degenerate pairs —
    * every pair NOT in an oversized bucket still collides on its other
    * bands exactly as before (capping removes keys, never rows of other
    * keys).
    *
    * Cost when no bucket is hot (the normal case): one key-only
    * aggregation pass over `buckets` (8-byte keys, map-side partial agg)
    * plus a driver count of the empty hot frame — no change to the
    * candidate join's plan, since there is nothing to anti-join.
    */
  def capBuckets(buckets: DataFrame, keyCols: Seq[String],
      cap: Int = MaxBucketSize): DataFrame = {
    val keys = keyCols.map(col)
    val hot = buckets.groupBy(keys: _*).agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > cap)
      .localCheckpoint() // tiny by construction: only oversized keys
    val stats = hot.agg(count(lit(1)), coalesce(sum(col("bucket_n")), lit(0L)))
      .head()
    val (nHot, nRows) = (stats.getLong(0), stats.getLong(1))
    if (nHot == 0L) buckets
    else {
      System.err.println(
        s"[graft] MinHash.capBuckets: dropping $nHot oversized bucket(s) " +
          s"(> $cap rows; $nRows rows total) on (${keyCols.mkString(", ")}) " +
          "— members are near-identical content owned by exact dedup")
      buckets.join(broadcast(hot.select(keys: _*)), keyCols, "left_anti")
    }
  }
}
