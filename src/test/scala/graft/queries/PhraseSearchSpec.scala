package graft.queries

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** q106's postings-intersection phrase search, pinned on hand-built docs:
  * overlapping occurrences, repeated tokens inside the phrase, and
  * brute-force agreement on every phrase window of the fixture. */
class PhraseSearchSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def run(d: DataFrame, phrase: Seq[String]): Map[Long, (Int, Int)] =
    TextQueries.phraseSearch(d, phrase)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2))))
      .toMap

  /** Brute force over the tokenized text — the spec's oracle. */
  private def brute(rows: Seq[(Long, String)],
      phrase: Seq[String]): Map[Long, (Int, Int)] =
    rows.flatMap { case (id, text) =>
      val toks = text.split(" ")
      val starts = (0 to toks.length - phrase.length)
        .filter(i => phrase.indices.forall(j => toks(i + j) == phrase(j)))
      if (starts.isEmpty) None else Some(id -> ((starts.size, starts.min + 1)))
    }.toMap

  test("finds all occurrences with 1-based first position") {
    val rows = Seq(
      1L -> "x stream table hash y stream table hash",
      2L -> "stream table hash",
      3L -> "stream table nope hash table stream",
      4L -> "hash table stream")
    val got = run(docs(rows: _*), Seq("stream", "table", "hash"))
    assert(got == Map(1L -> ((2, 2)), 2L -> ((1, 1))))
    assert(got == brute(rows, Seq("stream", "table", "hash")))
  }

  test("overlapping matches of a self-overlapping phrase all count") {
    // "a a a a" contains "a a" at starts 1,2,3 (overlaps included)
    val rows = Seq(10L -> "a a a a", 11L -> "b a a b")
    val got = run(docs(rows: _*), Seq("a", "a"))
    assert(got == Map(10L -> ((3, 1)), 11L -> ((1, 2))))
    assert(got == brute(rows, Seq("a", "a")))
  }

  test("repeated token in the phrase reuses one postings row correctly") {
    val rows = Seq(
      20L -> "go stop go go stop go",
      21L -> "go stop stop go")
    // phrase "go stop go": doc 20 has starts 1 and 4; doc 21 none
    val got = run(docs(rows: _*), Seq("go", "stop", "go"))
    assert(got == Map(20L -> ((2, 1))))
    assert(got == brute(rows, Seq("go", "stop", "go")))
  }

  test("single-token phrase degenerates to term lookup") {
    val rows = Seq(30L -> "k a k", 31L -> "a b c")
    val got = run(docs(rows: _*), Seq("k"))
    assert(got == Map(30L -> ((2, 1))))
    assert(got == brute(rows, Seq("k")))
  }

  test("phrase absent everywhere returns an empty frame") {
    assert(run(docs(40L -> "a b c"), Seq("b", "a")).isEmpty)
  }
}
