package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TextRank: the distributed iteration must agree with an exact driver-side
  * power iteration of the same recurrence on the same graph, and the edge
  * builder must produce the symmetric adjacent-pair multigraph. */
class TextRankSpec extends SparkSpec {

  private val docs = Seq(
    (0L, "spark shuffles data across the cluster"),
    (1L, "the cluster shuffles data to executors"),
    (2L, "executors cache data partitions"),
    (3L, "single"))

  test("co-occurrence edges: symmetric, self-loop-free, pair-counted") {
    import spark.implicits._
    val e = TextRank.cooccurrenceEdges(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val m = e.map { case (s, d, w) => (s, d) -> w }.toMap
    // symmetry with equal weights
    e.foreach { case (s, d, w) => assert(m((d, s)) == w) }
    // "shuffles data" appears in docs 0 and 1 -> weight 2 each direction
    assert(m(("shuffles", "data")) == 2 && m(("data", "shuffles")) == 2)
    assert(!e.exists { case (s, d, _) => s == d })
    // the 1-token doc contributes no nodes
    assert(!e.exists { case (s, d, _) => s == "single" || d == "single" })
  }

  test("distributed ranks match exact driver power iteration to 1e-9") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val edges = TextRank.cooccurrenceEdges(df)
    val got = TextRank.ranks(edges, damping = 0.85, iters = 15)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    // exact reference: same recurrence, dense driver-side arithmetic
    val es = edges.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nodes = es.map(_._1).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val wdeg = es.groupBy(_._1).map { case (s, g) => s -> g.map(_._3).sum.toDouble }
    var r = Array.fill(nodes.length)(1.0)
    for (_ <- 1 to 15) {
      val next = Array.fill(nodes.length)(0.15)
      es.foreach { case (s, d, w) =>
        next(idx(d)) += 0.85 * r(idx(s)) * w / wdeg(s)
      }
      r = next
    }
    assert(got.size == nodes.length)
    nodes.foreach { t =>
      assert(math.abs(got(t) - r(idx(t))) < 1e-9, s"rank($t)")
    }
    // hub tokens outrank leaf tokens: "data" touches 4 distinct neighbors
    assert(got("data") > got("spark"))
  }
}
