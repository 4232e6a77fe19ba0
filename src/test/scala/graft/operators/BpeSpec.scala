package graft.operators

import graft.SparkSpec

/** BPE training pinned on the Sennrich et al. (2016) worked example
  * (hand-derived merge sequence, no end-of-word marker), plus encode
  * round-trip and distributed/driver agreement. */
class BpeSpec extends SparkSpec {

  // low×5, lower×2, newest×6, widest×3 — the paper's histogram
  private val hist = Array[(String, Long)](
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("merge sequence matches the hand-derived Sennrich example") {
    val m = Bpe.fitFromHistogram(hist, nMerges = 8, minPairCount = 2L)
    // hand derivation: (e,s)9 (tie with (s,t), lexicographic), (es,t)9,
    // (l,o)7 (tie with (o,w)), (lo,w)7, (e,w)6 (3-way tie), (ew,est)6,
    // (n,ewest)6, then (d,est)3 (3-way tie at count 3)
    assert(m.merges == Vector(
      ("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"),
      ("e", "w"), ("ew", "est"), ("n", "ewest"), ("d", "est")))
  }

  test("greedy encode applies learned ranks lowest-first") {
    val m = Bpe.fitFromHistogram(hist, nMerges = 8, minPairCount = 2L)
    // the paper's test word: "lowest" was never seen, still segments
    assert(Bpe.encodeWord("lowest", m.ranks) == Vector("low", "est"))
    assert(Bpe.encodeWord("newest", m.ranks) == Vector("newest"))
    assert(Bpe.encodeWord("widest", m.ranks) == Vector("w", "i", "dest"))
    assert(Bpe.encodeWord("x", m.ranks) == Vector("x"))
    assert(Bpe.encodeWord("", m.ranks) == Vector.empty)
  }

  test("encode round-trips: pieces concatenate back to the word") {
    val m = Bpe.fitFromHistogram(hist, nMerges = 8, minPairCount = 2L)
    for (w <- Seq("lowest", "newest", "widest", "lowlow", "snow", "zzz"))
      assert(Bpe.encodeWord(w, m.ranks).mkString == w)
  }

  test("minPairCount stops training on a flat histogram") {
    val flat = Array[(String, Long)](("ab", 1L), ("cd", 1L))
    assert(Bpe.fitFromHistogram(flat, 10, minPairCount = 2L).merges.isEmpty)
  }

  test("distributed fit equals the histogram fit on the same corpus") {
    import spark.implicits._
    // same multiset as `hist`, spread over docs and partitions
    val docs = Seq(
      "low low newest widest newest", "low lower newest",
      "newest low widest lower newest", "widest low newest")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").repartition(3)
    val m = Bpe.fit(docs, nMerges = 8, minPairCount = 2L)
    assert(m.merges ==
      Bpe.fitFromHistogram(hist, 8, minPairCount = 2L).merges)
  }

  test("distributed encode agrees with driver encode and round-trips") {
    import spark.implicits._
    val docs = Seq((1L, "lowest newest"), (2L, "widest low x"), (3L, ""))
      .toDF("doc_id", "text")
    val m = Bpe.fitFromHistogram(hist, 8, minPairCount = 2L)
    val got = Bpe.encode(docs, m).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("low", "est", "newest"))
    assert(got(2L) == Seq("w", "i", "dest", "low", "x"))
    assert(got(3L) == Seq.empty)
    // round trip at the doc level: concat(pieces) == text minus spaces
    got.foreach { case (id, pieces) =>
      val text = Map(1L -> "lowest newest", 2L -> "widest low x", 3L -> "")(id)
      assert(pieces.mkString == text.replace(" ", ""))
    }
  }
}
