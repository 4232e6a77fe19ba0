package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece tokenizer (Schuster & Nakajima 2012; the BERT variant with
  * `##` continuation markers) — the likelihood-scored member of the
  * tokenizer family next to frequency-scored BPE (`operators.Bpe`) and the
  * probabilistic unigram LM (`operators.UnigramLm`).
  *
  * Training differs from BPE in ONE place: the merge criterion. BPE takes
  * the most FREQUENT adjacent pair; WordPiece takes the pair maximizing
  * the unigram-LM likelihood gain
  *
  *   score(a,b) = n(a,b) / (n(a) · n(b))
  *
  * so a pair of individually-rare symbols beats a frequent pair of
  * ubiquitous ones. Scores are ratios of exact integer counts and are
  * compared by BigInt cross-multiplication — no floating point anywhere in
  * training, so the learned vocab is a pure function of the histogram
  * (ties: higher pair count, then lexicographically smallest pair).
  *
  * Scale shape mirrors Bpe.fit: the ONLY corpus-scale pass is one
  * word-frequency aggregation; the merge loop runs over the vocab-sized
  * weighted histogram, so a 100 TB corpus and its histogram train
  * identically.
  *
  * Encoding is NOT merge replay (that's BPE): WordPiece encodes by greedy
  * longest-match-first against the final vocabulary, emitting `##`-marked
  * continuation pieces, with the whole word degrading to `[UNK]` when any
  * position has no match — the exact BERT `wordpiece_tokenize` contract.
  */
object WordPiece {

  val Unk = "[UNK]"

  /** @param vocab  final piece vocabulary (initial symbols + merge results;
    *               continuations carry the `##` prefix)
    * @param merges training trace: (left, right, merged, pairCount) per
    *               round, in merge order */
  final case class Model(vocab: Set[String],
      merges: Vector[(String, String, String, Long)]) {
    lazy val maxPieceLen: Int =
      if (vocab.isEmpty) 0
      else vocab.iterator.map(p => p.stripPrefix("##").length).max
  }

  /** Word split into WordPiece's initial symbol sequence: first codepoint
    * bare, the rest `##`-marked. */
  private def initialSymbols(w: String): mutable.ArrayBuffer[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    w.foreach { c =>
      out += (if (i == 0) c.toString else "##" + c)
      i += 1
    }
    out
  }

  private def join(l: String, r: String): String = l + r.stripPrefix("##")

  /** One distributed word count (identical plan shape to Bpe.fit), then
    * the driver-side likelihood-scored merge loop. */
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

  /** The merge loop over a (word, count) histogram. */
  def fitFromHistogram(hist: Array[(String, Long)], nMerges: Int,
      minPairCount: Long): Model = {
    val words = hist.map { case (w, n) => (initialSymbols(w), n) }
    val vocab = mutable.Set.empty[String]
    words.foreach { case (syms, _) => vocab ++= syms }
    val merges = Vector.newBuilder[(String, String, String, Long)]
    var round = 0
    var go = true
    while (go && round < nMerges) {
      val pairs = mutable.HashMap.empty[(String, String), Long]
      val units = mutable.HashMap.empty[String, Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length) {
          units.update(syms(i), units.getOrElse(syms(i), 0L) + n)
          if (i < syms.length - 1) {
            val p = (syms(i), syms(i + 1))
            pairs.update(p, pairs.getOrElse(p, 0L) + n)
          }
          i += 1
        }
      }
      if (pairs.isEmpty) go = false
      else {
        // argmax of n(a,b)/(n(a)·n(b)) by exact cross-multiplication;
        // ties: higher pair count, then lexicographically smallest pair
        var best: (String, String) = null
        var bestN = 0L
        var bestDen = BigInt(0)
        pairs.foreach { case (p @ (l, r), n) =>
          val den = BigInt(units(l)) * BigInt(units(r))
          val cmp =
            if (best == null) 1
            else {
              // n/den > bestN/bestDen  <=>  n*bestDen > bestN*den
              val c = (BigInt(n) * bestDen).compare(BigInt(bestN) * den)
              if (c != 0) c
              else if (n != bestN) java.lang.Long.compare(n, bestN)
              else {
                val o = Ordering.Tuple2(Ordering.String, Ordering.String)
                  .compare(best, p) // best > p -> positive -> take p
                o
              }
            }
          if (cmp > 0) { best = p; bestN = n; bestDen = den }
        }
        if (bestN < minPairCount) go = false
        else {
          val joined = join(best._1, best._2)
          merges += ((best._1, best._2, joined, bestN))
          vocab += joined
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
    Model(vocab.toSet, merges.result())
  }

  /** BERT's greedy longest-match-first: at each position take the longest
    * vocab piece (`##`-marked after position 0); any position with no
    * match degrades the WHOLE word to `[UNK]`. */
  def encodeWord(word: String, vocab: Set[String],
      maxPieceLen: Int): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    val out = Vector.newBuilder[String]
    var start = 0
    while (start < word.length) {
      val prefix = if (start == 0) "" else "##"
      var end = math.min(word.length, start + maxPieceLen)
      var found: String = null
      while (found == null && end > start) {
        val cand = prefix + word.substring(start, end)
        if (vocab.contains(cand)) found = cand else end -= 1
      }
      if (found == null) return Vector(Unk)
      out += found
      start = end
    }
    out.result()
  }

  /** Distributed encode: broadcast vocab, one pass, per-partition
    * word→pieces memo (Zipf makes the hit rate the column's dedup rate).
    * Returns (doc_id, wp_tokens array). */
  def encode(docs: DataFrame, model: Model,
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((model.vocab, model.maxPieceLen))
    docs.select(col("doc_id").cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val (vocab, maxLen) = bc.value
        val memo = mutable.HashMap.empty[String, Vector[String]]
        it.map { case (id, text) =>
          val pieces = text.split(" ").iterator.filter(_.nonEmpty)
            .flatMap(w => memo.getOrElseUpdate(w,
              encodeWord(w, vocab, maxLen)))
            .toSeq
          (id, pieces)
        }
      }
      .toDF("doc_id", "wp_tokens")
  }
}
