package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Aho–Corasick multi-pattern string matching (Aho & Corasick 1975) — the
  * blocklist / compliance scan: find every occurrence of every pattern in
  * one pass over the text, O(|text| + matches), independent of pattern
  * count. The naive alternative (N `contains`/`rlike` columns) scans the
  * corpus N times; at 10k+ banned phrases only the automaton shape
  * survives.
  *
  * Scale shape: the automaton is built ONCE on the driver (pattern-list
  * sized — dictionaries are KBs–MBs) and broadcast; the corpus pass is
  * mapPartitions, payloads never shuffle. Matches count overlapping
  * occurrences (every pattern end position), the standard AC semantics.
  */
object AhoCorasick {

  /** Flat-array automaton (serializable, broadcast-friendly): per node a
    * sorted char→next edge list, a fail link, and the ids of patterns
    * ending here (via output links, pre-flattened). */
  final class Automaton private[AhoCorasick] (
      private[AhoCorasick] val edgeChars: Array[Array[Char]],
      private[AhoCorasick] val edgeNext: Array[Array[Int]],
      private[AhoCorasick] val fail: Array[Int],
      private[AhoCorasick] val outputs: Array[Array[Int]],
      val nPatterns: Int) extends Serializable {

    private def step(state: Int, c: Char): Int = {
      var s = state
      while (true) {
        val i = java.util.Arrays.binarySearch(edgeChars(s), c)
        if (i >= 0) return edgeNext(s)(i)
        if (s == 0) return 0
        s = fail(s)
      }
      0 // unreachable
    }

    /** Per-pattern overlapping occurrence counts in `text`. */
    def matchCounts(text: String): Array[Int] = {
      val counts = new Array[Int](nPatterns)
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        val out = outputs(s)
        var j = 0
        while (j < out.length) { counts(out(j)) += 1; j += 1 }
        i += 1
      }
      counts
    }
  }

  /** Build the goto/fail/output automaton from `patterns` (must be
    * non-empty strings; duplicates keep their own ids). */
  def build(patterns: Seq[String]): Automaton = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be non-empty strings")
    // trie
    val edges = mutable.ArrayBuffer(mutable.TreeMap.empty[Char, Int])
    val ends = mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, id) =>
      var s = 0
      p.foreach { c =>
        s = edges(s).getOrElseUpdate(c, {
          edges += mutable.TreeMap.empty[Char, Int]
          ends += Nil
          edges.length - 1
        })
      }
      ends(s) ::= id
    }
    // BFS fail links; outputs flattened through the fail chain
    val n = edges.length
    val fail = new Array[Int](n)
    val outs = new Array[List[Int]](n)
    outs(0) = ends(0)
    val queue = mutable.Queue.empty[Int]
    edges(0).foreach { case (_, v) => fail(v) = 0; outs(v) = ends(v); queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      edges(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !edges(f).contains(c)) f = fail(f)
        fail(v) = edges(f).get(c).filter(_ != v).getOrElse(0)
        outs(v) = ends(v) ::: outs(fail(v))
        queue += v
      }
    }
    new Automaton(
      edges.map(_.keys.toArray).toArray,
      edges.map(_.values.toArray).toArray,
      fail,
      outs.map(_.toArray),
      patterns.length)
  }

  /** Corpus scan: per doc the total overlapping hit count and the number
    * of distinct patterns present. Docs with no hits are dropped. */
  def scan(docs: DataFrame, patterns: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(build(patterns))
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ac = bc.value
        it.flatMap { case (id, text) =>
          val counts = ac.matchCounts(text)
          var hits = 0; var pats = 0; var i = 0
          while (i < counts.length) {
            hits += counts(i)
            if (counts(i) > 0) pats += 1
            i += 1
          }
          if (hits == 0) None else Some((id, hits.toLong, pats.toLong))
        }
      }
      .toDF("doc_id", "n_hits", "n_patterns")
  }
}
