package graft.operators

import graft.SparkSpec

/** Aho–Corasick pinned against a brute-force overlapping-occurrence
  * counter: overlapping matches, patterns that are prefixes/suffixes of
  * each other, fail-chain outputs, and the distributed scan. */
class AhoCorasickSpec extends SparkSpec {

  private def brute(text: String, patterns: Seq[String]): Array[Int] =
    patterns.map { p =>
      (0 to text.length - p.length).count(i => text.startsWith(p, i))
    }.toArray

  private def check(text: String, patterns: Seq[String]): Unit = {
    val got = AhoCorasick.build(patterns).matchCounts(text)
    assert(got.toSeq == brute(text, patterns).toSeq, s"text='$text'")
  }

  test("overlapping occurrences all count") {
    check("aaaa", Seq("aa"))            // 3 overlapping
    check("ababab", Seq("ab", "ba", "abab"))
  }

  test("patterns nested in each other fire through the fail chain") {
    // "he" ends inside "she"; "hers" shares the "he" prefix
    check("ushers", Seq("he", "she", "hers", "his"))
    check("shershers", Seq("he", "she", "hers", "ers", "s"))
  }

  test("single-char and full-text patterns") {
    check("mississippi", Seq("i", "ss", "issi", "mississippi", "ppi"))
  }

  test("no matches yields zero counts") {
    check("abcdef", Seq("xyz", "gh"))
  }

  test("random-ish fixtures agree with brute force") {
    val alphabet = "ab"
    val rng = new scala.util.Random(42)
    val patterns = Seq("a", "b", "ab", "ba", "aab", "bba", "abab")
    (1 to 50).foreach { _ =>
      val text = Seq.fill(30)(alphabet(rng.nextInt(2))).mkString
      check(text, patterns)
    }
  }

  test("distributed scan matches per-doc driver counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the table hash join beats the slow key scan"),
      (2L, "no banned phrases here"),
      (3L, "table hash table hash"),
      (4L, "")).toDF("doc_id", "text")
    val pats = Seq("table hash", "slow key", "hash tab")
    val got = AhoCorasick.scan(docs, pats).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 3: "table hash" x2 and the straddling "hash tab" x1
    assert(got == Map(1L -> ((2L, 2L)), 3L -> ((3L, 2L))))
  }
}
