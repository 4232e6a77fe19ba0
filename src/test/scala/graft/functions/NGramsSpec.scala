package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The n-gram Column builders vs hand-computed tables (reference
  * `everygrams` semantics, `base.py:128-152`). */
class NGramsSpec extends SparkSpec {

  private def grams(text: String, minN: Int, maxN: Int): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(everygrams(split(col("text"), " "), minN, maxN).as("g"))
      .as[Seq[String]].head()
  }

  test("bigrams of 4 tokens") {
    import spark.implicits._
    val out = Seq("a b c d").toDF("text")
      .select(word_ngrams(split(col("text"), " "), 2).as("g"))
      .as[Seq[String]].head()
    assert(out == Seq("a b", "b c", "c d"))
  }

  test("everygrams 1..3 matches hand-computed set") {
    assert(grams("a b c d", 1, 3) == Seq(
      "a", "b", "c", "d",
      "a b", "b c", "c d",
      "a b c", "b c d"))
  }

  test("n-grams longer than the doc yield nothing") {
    assert(grams("a b", 3, 5).isEmpty)
    assert(grams("a b", 1, 5) == Seq("a", "b", "a b"))
  }

  test("norm_tokens of empty text is an empty array") {
    import spark.implicits._
    val out = Seq("", "!!!", "one two").toDF("text")
      .select(norm_tokens(col("text")).as("t")).as[Seq[String]].collect()
    assert(out(0).isEmpty && out(1).isEmpty && out(2) == Seq("one", "two"))
  }

  test("reference off-by-one compat emits (maxNgrams+1)-grams") {
    import graft.operators.Corpus
    assert(Corpus.maxDepth(3, compatOffByOne = false) == 3)
    assert(Corpus.maxDepth(3, compatOffByOne = true) == 4)
  }

  test("in-row ngram_counts equals explode+groupBy on the same tokens") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the cat sat on the mat the cat"),
      (1L, "a"),
      (2L, ""),
      (3L, "x y x y x")).toDF("doc_id", "text")
      .select(col("doc_id"), ws_tokens(col("text")).as("toks"))
    val viaKernel = docs
      .select(col("doc_id"),
        explode(graft.functions.ngram_counts(col("toks"), 3)).as("e"))
      .select(col("doc_id"), col("e.token"), col("e.tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val viaShuffle = docs
      .select(col("doc_id"), explode(everygrams(col("toks"), 1, 3)).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).cast("int").as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(viaKernel == viaShuffle)
    assert(viaKernel.exists(_ == ((0L, "the cat", 2))))
  }

  test("hash-keyed ngram_count_hashes equals ngram_counts + xxhash64") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the cat sat on the mat the cat"),
      (1L, "a"),
      (2L, ""),
      (3L, "x y x y x"),
      (4L, "nferdoccount_7 real words here nferdoccount_7")).toDF("doc_id", "text")
      .select(col("doc_id"), ws_tokens(col("text")).as("toks"))
    val viaHashed = docs
      .select(col("doc_id"),
        explode(graft.functions.ngram_count_hashes(col("toks"), 3)).as("e"))
      .select(col("doc_id"), col("e.h"), col("e.n"), col("e.tf"), col("e.tok"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getInt(3), if (r.isNullAt(4)) null else r.getString(4)))
      .toMap
    val viaStrings = docs
      .select(col("doc_id"),
        explode(graft.functions.ngram_counts(col("toks"), 3)).as("e"))
      .select(col("doc_id"), col("e.token").as("token"), col("e.tf"),
        xxhash64(col("e.token")).as("h"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(3)) ->
        (r.getString(1), r.getInt(2))).toMap
    // same (doc, hash) key set; tf equal; n = the gram's token count;
    // tok carried exactly for unigrams (including the pseudo-token, whose
    // DROP happens in the Corpus plan filter, not the kernel)
    assert(viaHashed.keySet == viaStrings.keySet)
    viaStrings.foreach { case (k, (token, tf)) =>
      val (n, htf, tok) = viaHashed(k)
      assert(htf == tf, s"$token")
      assert(n == token.split(" ").length, s"$token")
      assert(if (n == 1) tok == token else tok == null, s"$token")
    }
  }
}
