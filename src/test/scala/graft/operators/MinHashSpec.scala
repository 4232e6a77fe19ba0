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

  test("fused signature equals the column-per-family formulation") {
    import org.apache.spark.sql.functions._
    // real text: the harness documents at the smallest SF
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .filter(size(split(col("text"), " ")) >= 3)
      .withColumn("__h", transform(MinHash.shingles(col("text")),
        s => graft.functions.xxhash64_seeded(MinHash.BaseHashSeed, s)))
    val fused = real.select(col("doc_id"),
      graft.functions.minhash_signatures(col("__h"), MinHash.NumHashes).as("sig"))
    val perCol = real.select(col("doc_id") +: MinHash.signatureFromHashes(col("__h")): _*)
      .select(col("doc_id"),
        array((0 until MinHash.NumHashes).map(i => col(s"mh_$i")): _*).as("sig"))
    assert(fused.exceptAll(perCol).isEmpty && perCol.exceptAll(fused).isEmpty)

    // edge cases the real corpus can't produce: empty hash array (all-null
    // signature like array_min(empty)) and a null element (hashes to its
    // family seed, exactly xxhash64_seeded(i, null))
    val edge = Seq(
      (1L, Seq.empty[java.lang.Long]),
      (2L, Seq[java.lang.Long](42L, null, -7L)))
      .toDF("id", "__h")
    val fusedEdge = edge.select(col("id"),
      graft.functions.minhash_signatures(col("__h"), MinHash.NumHashes).as("sig"))
    val perColEdge = edge.select(col("id") +: MinHash.signatureFromHashes(col("__h")): _*)
      .select(col("id"),
        array((0 until MinHash.NumHashes).map(i => col(s"mh_$i")): _*).as("sig"))
    assert(fusedEdge.exceptAll(perColEdge).isEmpty &&
      perColEdge.exceptAll(fusedEdge).isEmpty)
  }
}
