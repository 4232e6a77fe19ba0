package graft.operators

import graft.SparkSpec

/** The MinHash operator's contract, pinned independently of the dedup
  * queries that consume it. */
class MinHashSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e"),
    (2L, "a b c d e"),        // exact copy of 1
    (3L, "v w x y z"),        // disjoint tokens
    (4L, "a b"))              // < 3 tokens: no shingles
    .toDF("doc_id", "text")

  test("band keys: 32 bands per doc, shingle-less docs dropped") {
    val keys = MinHash.bandKeys(docs, "text", Seq("doc_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val perDoc = keys.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perDoc == Map(1L -> MinHash.NumBands, 2L -> MinHash.NumBands,
      3L -> MinHash.NumBands))
    assert(!perDoc.contains(4L)) // two tokens -> zero 3-shingles -> dropped
  }

  test("identical text collides on every band; disjoint text on none") {
    val keys = MinHash.bandKeys(docs, "text", Seq("doc_id")).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2))))
    val byDoc = keys.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byDoc(1L) == byDoc(2L))            // same signature, all 32 bands
    assert(byDoc(1L).intersect(byDoc(3L)).isEmpty) // no shared shingles
  }

  test("signature is deterministic across evaluations") {
    val a = MinHash.bandKeys(docs, "text", Seq("doc_id")).collect().toSet
    val b = MinHash.bandKeys(docs, "text", Seq("doc_id")).collect().toSet
    assert(a == b)
  }
}
