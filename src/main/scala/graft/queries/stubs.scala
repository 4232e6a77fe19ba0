package graft.queries

// Placeholder modules — filled in by subsequent milestones.
object TextQueries       { val queries: Seq[Q] = Seq() }
object DedupQueries      { val queries: Seq[Q] = Seq() }
object SimilarityQueries { val queries: Seq[Q] = Seq() }
object AnalysisQueries   { val queries: Seq[Q] = Seq() }
object EventQueries      { val queries: Seq[Q] = Seq() }
