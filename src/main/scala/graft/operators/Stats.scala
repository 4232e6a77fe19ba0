package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The stats spine (reference `compute_stats` +
  * `combine_corpus_with_sources`, `base.py:192-231`).
  *
  * Scale posture: the index->sources join broadcasts the small mapping
  * (reference hinted the same, `base.py:223`); corpus⋈map shuffles on
  * document_index once; both stats aggregations are partial+final hash
  * aggs on their grouping keys. The `explode(sources)` fan-out happens
  * AFTER the join, before the aggregation — one row per (doc, source),
  * identical to the reference's dataflow.
  */
object Stats {

  /** DF/TF/tdsum grouped by `grouping` over long-format token counts
    * `(document_index, wc, token, tf)`. DF counts docs containing the
    * token (long format has one row per (doc, token), so count(*) ==
    * reference's count over map keys). */
  def computeStats(tokenCounts: DataFrame, grouping: Seq[String]): DataFrame =
    tokenCounts
      .groupBy(grouping.map(col): _*)
      .agg(count(lit(1)).as("document_frequency"),
        sum(col("tf")).as("term_frequency"),
        sum(col("wc")).as("tdsum"))

  /** [[computeStats]] over the HASH-keyed gram frame
    * ([[graft.operators.Corpus.tokenCountHashesFromNormalized]] shape):
    * aggregate DF/TF/tdsum by `(h[, extra])` — the exchange carries 8-byte
    * keys instead of gram strings — then restore `token` at the
    * vocab-sized OUTPUT: unigram strings ride the aggregation itself
    * (`max(tok)`; non-null only on unigram rows, and all rows of one `h`
    * are the same gram), multigram strings come from the broadcast
    * vocabulary dictionary (post-filter multigrams are vocabulary members
    * by construction). Column names/order match [[computeStats]] exactly.
    *
    * Exactness caveat: two grams colliding on the full 64-bit
    * `xxhash64(gram)` would merge one stats row (~n²/2⁶⁵ odds); the
    * hashed path is certified per corpus by A/B output equality against
    * the string path (VspacePipelineSpec), not by construction. */
  def computeStatsHashed(countsHashed: DataFrame, vocabulary: DataFrame,
      extraGrouping: Seq[String]): DataFrame = {
    // Vocabulary-side hash collisions are DETECTABLE in one vocab-sized
    // aggregation (unlike the gram-stream side, which only the per-corpus
    // A/B certifies), so detect them: a silent dropDuplicates pick would
    // mislabel one token's stats with another's string. countDistinct on
    // the token (not count(*)) so duplicate vocabulary ROWS — same string
    // twice, legitimately deduped below — don't trip the guard.
    val card = vocabulary.agg(
      countDistinct(col("token")).as("t"),
      countDistinct(xxhash64(col("token"))).as("h")).head()
    if (card.getLong(0) != card.getLong(1))
      throw new IllegalStateException(
        s"computeStatsHashed: xxhash64 collision inside the vocabulary " +
        s"(${card.getLong(0)} distinct tokens -> ${card.getLong(1)} " +
        "distinct hashes) — the hashed stats path would mislabel a " +
        "token's stats; use the string path (hashedstats = false)")
    val dict = vocabulary
      .select(xxhash64(col("token")).as("h"), col("token").as("__vtok"))
      .dropDuplicates("h") // provably lossless: guard above ensures 1:1
    countsHashed
      .groupBy(("h" +: extraGrouping).map(col): _*)
      .agg(count(lit(1)).as("document_frequency"),
        sum(col("tf")).as("term_frequency"),
        sum(col("wc")).as("tdsum"),
        max(col("tok")).as("__utok"))
      .join(broadcast(dict), Seq("h"), "left")
      .select(coalesce(col("__utok"), col("__vtok")).as("token") +:
        (extraGrouping.map(col) ++
          Seq(col("document_frequency"), col("term_frequency"),
            col("tdsum"))): _*)
  }

  /** index ⋈ broadcast(sources) on subsource, then corpus ⋈ map on
    * document_index, then explode to one row per (doc, source). */
  def combineCorpusWithSources(corpus: DataFrame, index: DataFrame,
      sources: DataFrame): DataFrame = {
    val sourceDocumentMap = index
      .select(col("document_index"), col("subsource"))
      .join(broadcast(sources), Seq("subsource"))
      .drop("subsource")
    corpus
      .join(sourceDocumentMap, Seq("document_index"))
      .withColumn("source", explode(col("sources")))
      .drop("sources")
  }
}
