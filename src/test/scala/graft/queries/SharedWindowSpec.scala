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

  test("span merge: adjacent windows merge, gaps split, repeats collapse") {
    import spark.implicits._
    // w=3. Doc 0's windows sit at 1-based positions 1..8. Doc 1 contains
    // "b c d e" (doc-0 windows at pos 2,3 -> intervals [2,4],[3,5] merge
    // into span [2,5], 4 tokens) and, after a non-matching gap, "h i j"
    // (pos 8 -> span [8,10], 3 tokens): 2 spans, max 4, covered 7. Doc 2
    // repeats doc 0's "b c d" twice — b-side window SETS, so the repeat
    // can't add a position; one span of 3. Doc 3 shares nothing.
    val docs = Seq(
      (0L, "a b c d e f g h i j"),
      (1L, "b c d e x h i j"),
      (2L, "b c d z b c d"),
      (3L, "p q r s t u v w")
    ).toDF("doc_id", "text")
    val got = DedupQueries.sharedSpans(docs, w = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // pair (1,2) also shares "b c d" (one span of 3)
    assert(got == Seq(
      (0L, 1L, 2L, 4L, 7L),
      (0L, 2L, 1L, 3L, 3L),
      (1L, 2L, 1L, 3L, 3L)))
  }

  test("span covered_tokens never exceeds and is consistent with q89 counts") {
    // structural cross-check on real data: every q89 pair appears in q91
    // (same candidates, same verification strings) and n shared windows
    // >= n spans, covered tokens >= max span >= w
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val counts = DedupQueries.sharedWindowOverlap(docs, 30, hashKeyed = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val spans = DedupQueries.sharedSpans(docs, 30)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(spans.keySet == counts.keySet)
    spans.foreach { case (k, (n, mx, cov)) =>
      assert(n >= 1 && mx >= 30 && cov >= mx && counts(k) >= n)
    }
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
