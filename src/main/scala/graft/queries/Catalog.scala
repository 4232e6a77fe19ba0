package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One harness-visible query: a Spark plan builder over a testdata dir and,
  * where SQL-expressible, a DuckDB oracle producing the identical result
  * (same column names, same row set, doubles rounded identically, ordered
  * deterministically on both sides).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** headline queries run in Bench */
    bench: Boolean = false)

object Catalog {
  lazy val all: Seq[Q] =
    Relational.queries ++ TextQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ AnalysisQueries.queries ++
      EventQueries.queries ++ MultimodalQueries.queries

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
