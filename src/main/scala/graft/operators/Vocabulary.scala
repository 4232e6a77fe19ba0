package graft.operators

import java.util.Arrays

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vocabulary construction and membership filtering (reference
  * `base.py:341-371` + `lookups/dawg.py`).
  *
  * The reference materializes the whole vocabulary on the driver as a list
  * of range-partitioned DAWG tries and broadcasts the pickle
  * (`dawg.py:107-117`, `base.py:364-367`) — workable at GB scale, a
  * driver-memory wall at 100 TB. Here membership is, by default, a
  * relational left-semi join (SemiJoinFilter): fully Catalyst-planned,
  * broadcast automatically when the vocabulary is small, shuffle-partitioned
  * when it is not, no driver materialization ever. BroadcastSetFilter keeps
  * the reference's shape (driver collect + broadcast + per-row membership
  * probe against a sorted array — binary search replaces the DAWG, which
  * the reference only ever uses for `__contains__`, `dawg.py:179-193`).
  */
object Vocabulary {

  /** Union phrases + collections, dedup, assign ids
    * (reference `base.py:341-355`; ids via monotonically_increasing_id are
    * non-contiguous there too and never consumed downstream).
    *
    * `preFilter = true` (default) drops null/blank tokens BEFORE the
    * vocabulary is written — a pinned divergence: the reference writes the
    * CSV unfiltered and only drops those rows inside the DAWG build
    * (`dawg.py:101-102`), so membership semantics are identical either
    * way. Pass `preFilter = false` for a byte-faithful reference artifact
    * on dirty input. */
  def build(phrases: DataFrame, collections: DataFrame,
      preFilter: Boolean = true): DataFrame = {
    val unioned = phrases.toDF("token").union(collections.toDF("token"))
    val cleaned =
      if (preFilter)
        unioned.na.drop().filter(length(trim(col("token"))) =!= 0)
      else unioned
    cleaned.distinct().withColumn("tokenid", monotonically_increasing_id())
  }

  sealed trait TokenFilter {
    /** Keep rows of `df` whose `tokenCol` passes the reference predicate:
      * unigrams (no space) always pass; multi-grams must be in the
      * vocabulary (`base.py:385-389`). */
    def apply(df: DataFrame, tokenCol: String): DataFrame
  }

  /** Default, scale path: ONE left join against the (distinct) vocabulary
    * marks membership, one filter keeps unigrams (bypass) or marked
    * multigrams, and the original column order is restored.
    *
    * History (round-12 stage laps): the previous shape — a UNION of a
    * unigram filter branch and a multigram left-semi branch — computed the
    * expensive upstream TWICE, because Spark shares no sub-plan across
    * union branches without an explicit cache, and the upstream here is
    * the full exploded n-gram pipeline (measured as 72% of the vspace
    * run's wall clock at 13 GB, paid once per branch). Semantics are
    * identical: the vocabulary is distinct'd before the join so the left
    * join cannot duplicate rows, and `unigram OR marked` is exactly
    * `unigram ∪ (multigram ⋉ vocabulary)` row-for-row (the oracle gate
    * and the filter-agreement spec pin it). At huge vocabularies the join
    * degrades to SMJ exactly like the semi-join did — the one-pass shape
    * then shuffles unigram rows too (~1/6 of ≤6-gram traffic), still far
    * cheaper than recomputing the gram pipeline per branch. */
  final case class SemiJoinFilter(vocabulary: DataFrame) extends TokenFilter {
    override def apply(df: DataFrame, tokenCol: String): DataFrame = {
      val marked = vocabulary.select(col("token").as(tokenCol)).distinct()
        .withColumn("__invocab", lit(true))
      df.join(marked, Seq(tokenCol), "left")
        .filter(!col(tokenCol).contains(" ") || col("__invocab"))
        .select(df.columns.map(col): _*)
    }
  }

  /** [[SemiJoinFilter]] for HASH-keyed gram frames
    * ([[graft.operators.Corpus.tokenCountHashesFromNormalized]] shape):
    * the same one-pass membership-marker left join, probing on the 8-byte
    * `h` column against `xxhash64(vocabulary.token)` instead of on gram
    * strings, with the unigram bypass read from the explicit gram order
    * `n` instead of from a contains-space test. */
  def hashedSemiJoinFilter(df: DataFrame, vocabulary: DataFrame): DataFrame = {
    val marked = vocabulary
      .select(xxhash64(col("token")).as("h")).distinct()
      .withColumn("__invocab", lit(true))
    df.join(marked, Seq("h"), "left")
      .filter(col("n") === 1 || col("__invocab"))
      .select(df.columns.map(col): _*)
  }

  /** Reference-shaped path: vocabulary collected once, broadcast as a
    * sorted array, probed per row by binary search. Bounded by driver
    * memory — use only when the vocabulary is known-small. */
  final class BroadcastSetFilter(bc: Broadcast[Array[String]]) extends TokenFilter {
    override def apply(df: DataFrame, tokenCol: String): DataFrame = {
      val localBc  = bc // avoid capturing non-serializable `this` in the UDF
      val contains = udf { t: String =>
        !t.contains(" ") || Arrays.binarySearch(localBc.value.asInstanceOf[Array[AnyRef]], t) >= 0
      }
      df.filter(contains(col(tokenCol)))
    }
  }

  /** Id-keyed lookup (reference `dawg.py:60-65,108-110` with
    * `has_index=True` — a variant the reference defines but never enables,
    * `base.py:366`): resolve token → tokenid. Scale path: a plain left
    * join against the vocabulary relation — Catalyst broadcasts it when
    * small, shuffles when not; OOV tokens keep a null id. */
  def resolveIds(df: DataFrame, tokenCol: String,
      vocabulary: DataFrame): DataFrame =
    df.join(
      vocabulary.select(col("token").as(tokenCol), col("tokenid")),
      Seq(tokenCol), "left")

  /** Reference-shaped id lookup: (token, tokenid) collected once, broadcast
    * as parallel sorted arrays, probed per row by binary search — the
    * id-keyed DAWG's `__getitem__` without the trie. Bounded by driver
    * memory, like [[BroadcastSetFilter]]. */
  final class BroadcastIdMap(bc: Broadcast[(Array[String], Array[Long])])
      extends Serializable {
    def attach(df: DataFrame, tokenCol: String,
        idCol: String = "tokenid"): DataFrame = {
      val localBc = bc
      val lookup = udf { t: String =>
        val (toks, ids) = localBc.value
        val i = Arrays.binarySearch(toks.asInstanceOf[Array[AnyRef]], t)
        if (i >= 0) Some(ids(i)) else None
      }
      df.withColumn(idCol, lookup(col(tokenCol)))
    }
  }

  object BroadcastIdMap {
    /** Same executor-side range-sort + driver re-sort discipline as
      * [[BroadcastSetFilter.apply]]; ids ride along with their tokens. */
    def apply(spark: SparkSession, vocabulary: DataFrame,
        numPartitions: Int = 20): BroadcastIdMap = {
      val pairs = vocabulary
        .select(col("token"), col("tokenid").cast("long"))
        .na.drop()
        .filter(length(trim(col("token"))) =!= 0)
        .repartitionByRange(numPartitions, col("token"))
        .sortWithinPartitions("token")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1) // UTF-16 re-sort, matches binarySearch's comparator
      new BroadcastIdMap(spark.sparkContext.broadcast(
        (pairs.map(_._1), pairs.map(_._2))))
    }
  }

  object BroadcastSetFilter {
    /** Range-partition + in-partition sort before collecting (the
      * reference's DAWG prep, `dawg.py:96-98`): executors do the sort work
      * and collect() preserves partition order, so the concatenated array
      * arrives globally ordered. The driver-side Arrays.sort then only
      * re-checks order under Java's UTF-16 comparator (binary UTF-8 and
      * UTF-16 order diverge for supplementary-plane chars) — near-linear
      * on already-sorted input. */
    def apply(spark: SparkSession, vocabulary: DataFrame,
        numPartitions: Int = 20): BroadcastSetFilter = {
      val sorted = vocabulary.select("token").na.drop()
        .repartitionByRange(numPartitions, col("token"))
        .sortWithinPartitions("token")
        .as(org.apache.spark.sql.Encoders.STRING)
        .collect()
      Arrays.sort(sorted.asInstanceOf[Array[AnyRef]])
      new BroadcastSetFilter(spark.sparkContext.broadcast(sorted))
    }
  }
}
