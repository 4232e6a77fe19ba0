package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** q89's scale plan, pinned: the hash-keyed shared-window overlap (8-byte
  * xxhash64 keys through the corpus-wide shuffles + id-keyed string verify)
  * must produce EXACTLY the string-keyed twin's result. Equal strings always
  * hash equal, so the hash join admits no false negatives; collisions (false
  * candidates) are removed by the array_intersect verify — equivalence on
  * any input is the structural claim, checked here on a hand-built corpus
  * with known overlaps and on the real sf0.001 documents table. */
class SharedWindowSpec extends SparkSpec {

  private def overlap(docs: org.apache.spark.sql.DataFrame, w: Int,
      hashKeyed: Boolean): Seq[(Long, Long, Long)] =
    DedupQueries.sharedWindowOverlap(docs, w, hashKeyed)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("hash-keyed plan matches the string-keyed twin on a known corpus") {
    import spark.implicits._
    // w=3 windows; docs 0/1 share the run "b c d e" -> windows "b c d" and
    // "c d e" (2 shared); docs 0/2 share nothing; doc 3 repeats a window
    // in-doc (must count once — per-doc dedup); doc 4 is shorter than w
    // (no windows at all).
    val docs = Seq(
      (0L, "a b c d e f"),
      (1L, "x b c d e y"),
      (2L, "p q r s t u"),
      (3L, "b c d z b c d"),
      (4L, "k l")
    ).toDF("doc_id", "text")

    val hashed = overlap(docs, 3, hashKeyed = true)
    val strings = overlap(docs, 3, hashKeyed = false)
    assert(hashed == strings)
    // hand-computed: (0,1) share {b c d, c d e}; (0,3) and (1,3) share
    // {b c d} once each despite doc 3 repeating it
    assert(hashed == Seq((0L, 1L, 2L), (0L, 3L, 1L), (1L, 3L, 1L)))
  }

  test("hash-keyed plan matches the string-keyed twin on sf0.001 documents") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    assert(overlap(docs, 30, hashKeyed = true) ==
      overlap(docs, 30, hashKeyed = false))
  }

  test("window text never crosses a corpus-wide exchange in the hash plan") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val plan = DedupQueries.sharedWindowOverlap(docs, 30, hashKeyed = true)
      .queryExecution.optimizedPlan
    // every Exchange below the candidate self-join must carry (doc_id, h) —
    // assert no plan node shuffles a 'win' attribute: the window string
    // column may only appear inside per-row (map-side) expressions of the
    // verify stage, never as an exchange output
    val exchanges = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    val joinOrAggWithWin = exchanges.exists(_.output.exists(_.name == "win"))
    assert(!joinOrAggWithWin,
      "a shuffle boundary (join/agg) outputs the raw window string")
  }
}
