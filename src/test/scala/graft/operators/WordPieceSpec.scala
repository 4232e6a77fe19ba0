package graft.operators

import graft.SparkSpec

/** WordPiece training and encoding, pinned on hand-computed fixtures:
  * the likelihood criterion must overrule BPE's frequency pick, merges
  * must respect `##` continuation semantics, and the encoder must be the
  * BERT greedy longest-match with whole-word [UNK] degradation. */
class WordPieceSpec extends SparkSpec {

  // "ab"×10 has the most frequent pair (a,##b: 10) but its parts are
  // ubiquitous (n(a)=110 via the standalone "a"×100); "cd"×5 is rarer but
  // its parts occur nowhere else, so the likelihood score picks it first:
  //   score(c,##d) = 5/(5·5) = 0.2  >  score(a,##b) = 10/(110·10) ≈ 0.009
  private val hist = Array(("ab", 10L), ("a", 100L), ("b", 90L), ("cd", 5L))

  test("likelihood criterion overrules BPE's frequency pick") {
    val wp = WordPiece.fitFromHistogram(hist, nMerges = 10, minPairCount = 2)
    assert(wp.merges.map(m => (m._1, m._2, m._3, m._4)) == Vector(
      ("c", "##d", "cd", 5L),
      ("a", "##b", "ab", 10L)))
    // same histogram, BPE's frequency criterion takes the frequent pair
    val bpe = Bpe.fitFromHistogram(hist, nMerges = 1, minPairCount = 2)
    assert(bpe.merges.head == (("a", "b")))
  }

  test("vocab holds initial symbols plus merge results") {
    val wp = WordPiece.fitFromHistogram(hist, nMerges = 10, minPairCount = 2)
    assert(wp.vocab == Set("a", "##b", "b", "c", "##d", "cd", "ab"))
    assert(wp.maxPieceLen == 2)
  }

  test("greedy longest-match encode with ## continuations and [UNK]") {
    val wp = WordPiece.fitFromHistogram(hist, nMerges = 10, minPairCount = 2)
    def enc(w: String) = WordPiece.encodeWord(w, wp.vocab, wp.maxPieceLen)
    assert(enc("ab") == Vector("ab"))           // longest match wins
    assert(enc("abb") == Vector("ab", "##b"))   // continuation marked
    assert(enc("cd") == Vector("cd"))
    assert(enc("a") == Vector("a"))
    assert(enc("ba") == Vector(WordPiece.Unk))  // no ##a -> whole-word UNK
    assert(enc("xy") == Vector(WordPiece.Unk))  // unseen chars
    assert(enc("") == Vector.empty)
  }

  test("fit is deterministic") {
    val a = WordPiece.fitFromHistogram(hist, 10, 2)
    val b = WordPiece.fitFromHistogram(hist, 10, 2)
    assert(a == b)
  }

  test("distributed encode round-trips the sf0.001 corpus") {
    import org.apache.spark.sql.functions._
    val d = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val model = WordPiece.fit(d, nMerges = 50)
    val enc = WordPiece.encode(d, model)
    val unk = array_contains(col("wp_tokens"), WordPiece.Unk)
    val r = d.select(col("doc_id"),
        regexp_replace(col("text"), " ", "").as("squash"))
      .join(enc, "doc_id")
      .agg(
        sum(when(!unk &&
            regexp_replace(concat_ws("", col("wp_tokens")), "##", "")
              =!= col("squash"), 1L).otherwise(0L)).as("fails"),
        avg(when(unk, 1.0).otherwise(0.0)).as("unk_rate"))
      .head()
    assert(r.getLong(0) == 0L, "non-UNK pieces must reassemble the text")
    assert(r.getDouble(1) < 0.5, "vocab should cover most synthetic docs")
  }
}
