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
