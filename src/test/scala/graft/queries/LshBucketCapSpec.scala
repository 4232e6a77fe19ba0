package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.MinHash

/** The LSH bucket-size cap (`MinHash.capBuckets`), spec'd on a corpus with
  * a PLANTED hot bucket: a block of identical boilerplate documents large
  * enough that, uncapped, the band self-join would expand quadratically on
  * their shared keys. The contract under test:
  *
  *  1. the job completes with BOUNDED candidates — no in-bucket expansion
  *     ever exceeds cap² (asserted by counting the raw candidate pairs);
  *  2. recall on the NON-degenerate pairs is unchanged — every genuine
  *     near-dup pair outside the hot bucket is still found, because
  *     capping removes whole keys and those pairs still collide on their
  *     other bands;
  *  3. the dropped pairs are exactly the ones exact-dedup already owns
  *     (identical text ⇒ identical md5 ⇒ one q31 content group).
  */
class LshBucketCapSpec extends SparkSpec {
  import spark.implicits._

  private val boiler =
    "this document is auto generated boilerplate text repeated verbatim " +
      "across the whole mirror of the site with no variation at all"

  /** 120 identical boilerplate docs (the hot bucket: one signature, so all
    * 32 (band, bh) keys hold 120 rows each) + two genuine near-dup pairs
    * + unrelated singletons. */
  private lazy val docs = {
    val hot = (0L until 120L).map(i => (i, boiler))
    val nearDups = Seq(
      (200L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (201L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (202L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (203L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"))
    val singles = Seq(
      (300L, "completely unrelated content about databases and query planning"),
      (301L, "another standalone document covering distributed shuffle strategy"))
    (hot ++ nearDups ++ singles).toDF("doc_id", "text")
  }

  test("capBuckets drops exactly the oversized keys, keeps the rest") {
    val buckets = MinHash.bandKeys(docs, "text", Seq("doc_id"))
    val capped  = MinHash.capBuckets(buckets, Seq("band", "bh"), cap = 50)
    // Every one of the hot block's 32 keys holds 120 > 50 rows -> all
    // dropped; every other doc's keys hold <= a handful of rows -> kept.
    val survivors = capped.select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(!survivors.exists(_ < 120L),
      "hot-bucket members must lose all their (shared) keys")
    assert(Set(200L, 201L, 202L, 203L, 300L, 301L).subsetOf(survivors))
    // No surviving bucket exceeds the cap.
    val maxBucket = capped.groupBy("band", "bh").count()
      .agg(max("count")).as[Long].head()
    assert(maxBucket <= 50)
  }

  test("cap is a no-op when no bucket is oversized") {
    val quiet = docs.filter(col("doc_id") >= 200L)
    val buckets = MinHash.bandKeys(quiet, "text", Seq("doc_id"))
    assert(MinHash.capBuckets(buckets, Seq("band", "bh"), cap = 50)
      .count() === buckets.count())
  }

  test("planted hot bucket: job completes bounded, non-degenerate recall unchanged") {
    val cap = 50
    val capped = DedupQueries.lshVerifiedPairs(docs, 0.7, bucketCap = cap)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // (2) recall on non-degenerate pairs: both genuine near-dup pairs
    // survive — their keys were never oversized.
    assert(capped.contains((200L, 201L)) && capped.contains((202L, 203L)))
    // (1) bounded: the hot block's 120*119/2 = 7140 identical pairs are
    // gone; what remains is the genuine near-dup set. Compare against the
    // UNCAPPED run restricted to non-hot ids — identical.
    val uncapped = DedupQueries.lshVerifiedPairs(docs, 0.7, bucketCap = Int.MaxValue)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.count { case (a, b) => a < 120L && b < 120L } === 7140)
    assert(capped === uncapped.filterNot { case (a, b) => a < 120L && b < 120L })
    // (3) the dropped pairs are exact duplicates: every dropped pair's two
    // sides carry the same md5 digest — exact dedup (q31) owns them.
    val digests = docs.select(col("doc_id"), md5(col("text")).as("d"))
      .as[(Long, String)].collect().toMap
    val dropped = uncapped -- capped
    assert(dropped.nonEmpty &&
      dropped.forall { case (a, b) => digests(a) == digests(b) })
  }

  test("cosine bucket cap: hot embedding bucket dropped, distinct pairs kept") {
    // 80 identical 64-dim vectors (one direction, so every LSH table puts
    // them all in one bucket) plus a genuinely-similar DISTINCT-direction
    // pair whose buckets are their own.
    val base = Array.tabulate(64)(i => 1.0 / (i + 1))
    val alt  = Array.tabulate(64)(i => if (i % 2 == 0) 1.0 else -1.0)
    val near = alt.clone(); near(63) = -0.8 // cosine(alt, near) ~ 0.9996
    val vecs = (0L until 80L).map(i => (i, base)) ++
      Seq((100L, alt), (101L, near))
    val e = vecs.toDF("vec_id", "v")
    val capped = DedupQueries.cosineBucketedPairs(e, 0.9, bucketCap = 40)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!capped.exists { case (a, b) => a < 80L && b < 80L },
      "hot-bucket pairs must be dropped")
    assert(capped.contains((100L, 101L)),
      "pair outside the hot bucket must keep its collisions")
  }
}
