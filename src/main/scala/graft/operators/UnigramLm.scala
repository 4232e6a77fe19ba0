package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Unigram-language-model subword tokenizer trained by hard EM (the
  * SentencePiece unigram model, Kudo 2018, with Viterbi/hard counts in the
  * E-step) — the probabilistic member of the tokenizer family next to the
  * greedy-merge [[Bpe]]: segmentation maximizes the product of piece
  * probabilities instead of replaying a merge table, which is what makes
  * sampled segmentations / subword regularization possible.
  *
  * Scale shape: ONE corpus-scale pass builds the (word, count) histogram;
  * seeding and every EM epoch then run over that vocab-sized frame —
  * Zipf makes |distinct words| orders of magnitude smaller than the
  * corpus, and weighting by word counts trains bit-identically to a pass
  * over the raw text. The E-step is DISTRIBUTED (mapPartitions Viterbi
  * against the broadcast piece table; O(len x maxPieceLen) per word);
  * piece counts come back through a partial-agg'd sum, and only the
  * piece vocabulary (thousands of rows) is ever collected — the
  * model-sized collect, like KMeans' centroids and BPE's merge table.
  *
  * Determinism: candidate seeding breaks weighted-count ties on the
  * lexicographically smaller piece; Viterbi breaks equal-score ties by
  * fewer pieces, then by the longer final piece. The model is a pure
  * function of the histogram — identical across partitionings and
  * cluster sizes.
  */
object UnigramLm {

  /** Piece table with natural-log probabilities; `maxLen` bounds the DP
    * lookback. Characters absent from the table segment as single-char
    * pieces at `unkLogp`. */
  final case class Model(logp: Map[String, Double], maxLen: Int,
      unkLogp: Double = math.log(1e-10)) extends Serializable {

    /** Viterbi segmentation: the piece sequence maximizing summed logp.
      * Ties: fewer pieces, then longer last piece. Returns the pieces and
      * the path score. */
    def segment(word: String): (Seq[String], Double) = {
      val n = word.length
      if (n == 0) return (Nil, 0.0)
      val score = new Array[Double](n + 1)
      val nPieces = new Array[Int](n + 1)
      val back = new Array[Int](n + 1)
      var i = 1
      while (i <= n) {
        var bestS = Double.NegativeInfinity
        var bestC = Int.MaxValue
        var bestJ = -1
        var j = math.max(0, i - maxLen)
        while (j < i) {
          val lp =
            if (i - j == 1) logp.getOrElse(word.substring(j, i), unkLogp)
            else logp.getOrElse(word.substring(j, i), Double.NegativeInfinity)
          if (lp != Double.NegativeInfinity) {
            val s = score(j) + lp
            val c = nPieces(j) + 1
            // strictly better score, or equal score with fewer pieces;
            // on a full tie keep the FIRST candidate — j ascends, so the
            // longest last piece wins
            if (s > bestS || (s == bestS && c < bestC)) {
              bestS = s; bestC = c; bestJ = j
            }
          }
          j += 1
        }
        score(i) = bestS; nPieces(i) = bestC; back(i) = bestJ
        i += 1
      }
      val out = List.newBuilder[String]
      val rev = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var p = n
      while (p > 0) { rev += ((back(p), p)); p = back(p) }
      rev.reverseIterator.foreach { case (a, b) => out += word.substring(a, b) }
      (out.result(), score(n))
    }

    private def pieceLogp(word: String, j: Int, i: Int): Double =
      if (i - j == 1) logp.getOrElse(word.substring(j, i), unkLogp)
      else logp.getOrElse(word.substring(j, i), Double.NegativeInfinity)

    /** Subword regularization (Kudo 2018): SAMPLE a segmentation with
      * probability proportional to exp(alpha * path logp) via
      * forward-filtering / backward-sampling over the piece lattice.
      * alpha -> infinity recovers Viterbi; alpha = 0 is uniform over
      * segmentations. Randomness is hash-derived from (seed, word,
      * position) — bit-reproducible across runs, partitionings, and
      * cluster sizes, like every sampling operator in this engine. */
    def sampleSegment(word: String, seed: Long, alpha: Double = 1.0): Seq[String] = {
      val n = word.length
      if (n == 0) return Nil
      // forward pass: f(i) = log sum over segmentations of word[0,i)
      val f = new Array[Double](n + 1)
      var i = 1
      while (i <= n) {
        var acc = Double.NegativeInfinity
        var j = math.max(0, i - maxLen)
        while (j < i) {
          val lp = pieceLogp(word, j, i)
          if (lp != Double.NegativeInfinity) {
            val t = f(j) + alpha * lp
            // log-add-exp, keeping the max first for stability
            acc = if (acc == Double.NegativeInfinity) t
            else { val m = math.max(acc, t)
              m + math.log(math.exp(acc - m) + math.exp(t - m)) }
          }
          j += 1
        }
        f(i) = acc
        i += 1
      }
      // backward sample: P(last piece = word[j,i)) = exp(f(j)+a*lp-f(i))
      val rev = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var p = n
      while (p > 0) {
        val u = uniform(seed, word, p)
        var cum = 0.0
        var chosen = -1
        var j = math.max(0, p - maxLen)
        while (j < p && chosen < 0) {
          val lp = pieceLogp(word, j, p)
          if (lp != Double.NegativeInfinity) {
            cum += math.exp(f(j) + alpha * lp - f(p))
            if (u < cum) chosen = j
          }
          j += 1
        }
        if (chosen < 0) chosen = p - 1 // float slack: fall back to a single
        rev += ((chosen, p))
        p = chosen
      }
      rev.reverseIterator.map { case (a, b) => word.substring(a, b) }.toSeq
    }

    /** 53-bit hash uniform in [0,1): splitmix64 over (seed, word hash,
      * position). */
    private def uniform(seed: Long, word: String, pos: Int): Double = {
      var x = seed ^ (word.hashCode.toLong << 17) ^ (pos.toLong * 0x9E3779B97F4A7C15L)
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^= x >>> 31
      (x >>> 11).toDouble / (1L << 53).toDouble
    }
  }

  final case class EpochStat(epoch: Int, vocab: Int, nll: Double)

  /** One corpus pass -> word histogram. */
  def wordHistogram(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))

  /** Seed pieces: every substring up to `maxPieceLen`, weighted by word
    * count; the top `vocabSize` multi-char candidates by (weight desc,
    * piece asc) plus ALL single characters (coverage guarantee). */
  private def seed(words: Dataset[(String, Long)], maxPieceLen: Int,
      vocabSize: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val sub = words.flatMap { case (w, n) =>
      for {
        i <- 0 until w.length
        l <- 1 to math.min(maxPieceLen, w.length - i)
      } yield (w.substring(i, i + l), n)
    }.toDF("piece", "cnt")
      .groupBy(col("piece")).agg(sum(col("cnt")).as("cnt"))
    val singles = sub.filter(length(col("piece")) === 1)
    val multis = sub.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece")).limit(vocabSize)
    singles.unionByName(multis)
  }

  /** @return the trained model plus per-epoch (vocab size, corpus NLL in
    *         nats under the epoch's INPUT model — non-increasing under
    *         hard EM up to pruning). */
  def fit(docs: DataFrame, textCol: String = "text", vocabSize: Int = 500,
      maxPieceLen: Int = 4, epochs: Int = 4): (Model, Seq[EpochStat]) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = wordHistogram(docs, textCol).as[(String, Long)].cache()

    // sort before the float sum: collect() order varies run to run, and
    // determinism is a documented property of the trainer
    def normalize(counts: Array[(String, Double)]): Map[String, Double] = {
      val sorted = counts.sortBy(_._1)
      val tot = sorted.iterator.map(_._2).sum
      sorted.iterator.map { case (p, c) => p -> math.log(c / tot) }.toMap
    }

    var model = Model(normalize(
      seed(words, maxPieceLen, vocabSize)
        .collect().map(r => (r.getString(0), r.getLong(1).toDouble))),
      maxPieceLen)
    val stats = (1 to epochs).map { ep =>
      val bc = spark.sparkContext.broadcast(model)
      // distributed E-step: hard counts + per-word path NLL in one pass
      val seg = words.mapPartitions { it =>
        val m = bc.value
        it.map { case (w, n) =>
          val (pieces, s) = m.segment(w)
          (pieces, n, -s * n)
        }
      }.toDF("pieces", "n", "nll").localCheckpoint()
      val nll = seg.agg(sum(col("nll"))).head().getDouble(0)
      val counts = seg
        .select(explode(col("pieces")).as("piece"), col("n"))
        .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))
        .collect().map(r => (r.getString(0), r.getLong(1).toDouble))
      // M-step: re-normalize over surviving pieces; zero-count single
      // chars keep a 0.5 floor (coverage), zero-count multis are pruned
      val seen = counts.map(_._1).toSet
      val floors = model.logp.keysIterator
        .filter(p => p.length == 1 && !seen(p)).map(p => (p, 0.5)).toArray
      model = Model(normalize(counts ++ floors), maxPieceLen)
      EpochStat(ep, model.logp.size, nll)
    }
    words.unpersist()
    (model, stats)
  }

  /** Segment `textCol` (whitespace pre-tokenized) into pieces; adds
    * `pieces` (array) and `n_pieces` columns. Broadcast model, map-side,
    * no shuffle. */
  def encode(docs: DataFrame, model: Model, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val segUdf = udf { text: String =>
      val m = bc.value
      text.split(" ").iterator.filter(_.nonEmpty)
        .flatMap(w => m.segment(w)._1).toSeq
    }
    docs.withColumn("pieces", segUdf(col(textCol)))
      .withColumn("n_pieces", size(col("pieces")))
  }

  /** Sampled-segmentation encode (subword regularization): each word
    * occurrence draws its own segmentation from the lattice, seeded by
    * (seed, doc_id, word index) — a fresh `seed` per training epoch gives
    * the regularizing diversity, while any fixed seed is bit-reproducible.
    * Map-side like [[encode]]. */
  def encodeSampled(docs: DataFrame, model: Model, seed: Long,
      alpha: Double = 1.0, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val segUdf = udf { (docId: Long, text: String) =>
      val m = bc.value
      var wi = 0
      text.split(" ").iterator.filter(_.nonEmpty).flatMap { w =>
        wi += 1
        m.sampleSegment(w,
          seed ^ (docId * 0x9E3779B97F4A7C15L) ^ wi.toLong, alpha)
      }.toSeq
    }
    docs.withColumn("pieces", segUdf(col("doc_id").cast("long"), col(textCol)))
      .withColumn("n_pieces", size(col("pieces")))
  }
}
