package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application (Sennrich et al.
  * 2016; the greedy rank-merge encoder is the GPT-2 variant) — the
  * subword-vocabulary step of a training-data pipeline.
  *
  * Scale shape: the ONLY corpus-scale pass is one word-frequency
  * aggregation (partial+final hash agg on the word). BPE's merge loop then
  * runs over that vocab-sized histogram — the textbook formulation (and
  * what reference trainers do after whitespace pre-tokenization): pair
  * statistics are weighted by word COUNTS, so a 100 TB corpus and its
  * 100 M-row histogram train identically. The histogram is capped at
  * `maxVocab` rows by (count desc, word asc) — a bounded-heap top-k, so
  * the driver holds at most maxVocab words regardless of corpus size —
  * and encoding broadcasts the merge ranks and memoizes per-partition
  * word→pieces (Zipf makes the memo hit rate the dedup rate of the
  * column), touching each row once.
  *
  * Determinism: merge selection breaks count ties on the lexicographically
  * smallest (left, right) pair, so the learned table is a pure function of
  * the histogram — identical across partitionings, cluster sizes, and
  * re-runs.
  */
object Bpe {

  /** Ordered merge table; rank = position. `merged(i) = left(i)+right(i)`. */
  final case class Model(merges: Vector[(String, String)]) {
    lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
  }

  /** One distributed word count, then the driver-side merge loop.
    *
    * @param nMerges      merge table size (the subword vocab budget)
    * @param minPairCount stop early when the best pair is rarer than this
    * @param maxVocab     cap on distinct words brought to the driver
    */
  def fit(docs: DataFrame, textCol: String = "text", nMerges: Int = 200,
      minPairCount: Long = 2L, maxVocab: Int = 1000000): Model = {
    val hist = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    fitFromHistogram(hist, nMerges, minPairCount)
  }

  /** The merge loop itself, over a (word, count) histogram. */
  def fitFromHistogram(hist: Array[(String, Long)], nMerges: Int,
      minPairCount: Long): Model = {
    // each word as its current symbol sequence, weighted by corpus count
    val words = hist.map { case (w, n) =>
      (mutable.ArrayBuffer(w.map(_.toString): _*), n)
    }
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var go = true
    while (go && round < nMerges) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) go = false
      else {
        // max count, ties to the lexicographically smallest pair
        val (best, bestN) = counts.minBy { case ((l, r), n) => (-n, l, r) }
        if (bestN < minPairCount) go = false
        else {
          merges += best
          val joined = best._1 + best._2
          words.foreach { case (syms, _) =>
            var i = 0
            while (i < syms.length - 1) {
              if (syms(i) == best._1 && syms(i + 1) == best._2) {
                syms(i) = joined
                syms.remove(i + 1)
              } else i += 1 // left-to-right, non-overlapping
            }
          }
          round += 1
        }
      }
    }
    Model(merges.result())
  }

  /** Greedy encode of one word: repeatedly merge the occurrence set of the
    * LOWEST-ranked adjacent pair present (the GPT-2 `bpe()` loop). */
  def encodeWord(word: String,
      ranks: Map[(String, String), Int]): Vector[String] = {
    val syms = mutable.ArrayBuffer(word.map(_.toString): _*)
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        // merge every occurrence of the best pair, left to right
        val pair = {
          var j = 0; var found: (String, String) = null
          while (found == null && j < syms.length - 1) {
            if (ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
                == bestRank) found = (syms(j), syms(j + 1))
            j += 1
          }
          found
        }
        val joined = pair._1 + pair._2
        var k = 0
        while (k < syms.length - 1) {
          if (syms(k) == pair._1 && syms(k + 1) == pair._2) {
            syms(k) = joined
            syms.remove(k + 1)
          } else k += 1
        }
        done = syms.length < 2
      }
    }
    syms.toVector
  }

  /** Distributed encode: broadcast ranks, one pass, per-partition
    * word→pieces memo. Returns (doc_id, bpe_tokens array). */
  def encode(docs: DataFrame, model: Model,
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model.ranks)
    docs.select(col("doc_id").cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ranks = bc.value
        val memo = mutable.HashMap.empty[String, Vector[String]]
        it.map { case (id, text) =>
          val pieces = text.split(" ").iterator.filter(_.nonEmpty)
            .flatMap(w => memo.getOrElseUpdate(w, encodeWord(w, ranks)))
            .toSeq
          (id, pieces)
        }
      }
      .toDF("doc_id", "bpe_tokens")
  }
}
