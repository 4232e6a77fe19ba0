package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Prefix-filtered set-similarity join (q159): the guarantee (no true
  * pair missed) on real data, the pruning effect (candidates strictly
  * fewer than the unfiltered shared-shingle join's pairs), and a
  * hand-built corner where only the RAREST token is shared — the pair a
  * frequency-ordered prefix must still catch. */
class PrefixFilterSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("exact equivalence with brute force at sf0.001") {
    val docs = graft.Tables(spark, dir, "documents")
    val fast = DedupQueries.prefixFilteredPairs(docs, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().sorted
    val sh = docs.select(col("doc_id"),
      graft.operators.MinHash.shingles(col("text")).as("s"))
    val slow = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        (size(array_intersect(col("a.s"), col("b.s"))).cast("double")
          / size(array_union(col("a.s"), col("b.s")))).as("jac"))
      .filter(col("jac") >= 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().sorted
    assert(fast.nonEmpty && (fast sameElements slow))
  }

  test("prefix filtering prunes the candidate space") {
    val docs = graft.Tables(spark, dir, "documents")
    val pruned = DedupQueries.prefixFilterCandidates(docs, 0.5).count()
    // unfiltered: pairs sharing ANY shingle
    val toks = docs.select(col("doc_id"),
      explode(graft.operators.MinHash.shingles(col("text"))).as("sh"))
    val full = toks.as("a")
      .join(toks.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    assert(pruned < full,
      s"prefix join should prune: $pruned candidates vs $full unfiltered")
    assert(pruned >= 25) // must still cover every true pair at sf0.001-scale
  }

  test("a pair sharing only its rarest tokens is still caught") {
    // two docs overlapping in 2 of 3 shingles; t = 0.5 => prefix keeps
    // |d| - ceil(0.5*|d|) + 1 = 2 of 3 shingles (the two rarest)
    val docs = Seq(
      (1L, "a b c d e"),   // shingles: "a b c","b c d","c d e"
      (2L, "a b c d x"),   // shares "a b c","b c d"
      (3L, "q r s t u"),
      (4L, "v w x y z")).toDF("doc_id", "text")
    val pairs = DedupQueries.prefixFilteredPairs(docs, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L))) // jac = 2/4 = 0.5, boundary inclusive
  }
}
