package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bit-equality specs for the round-12 fused fold kernels (the MinHashSpec
  * mold): each kernel must equal the composed HOF form it replaces on real
  * corpus text PLUS constructed edges. The composed forms here are copied
  * verbatim from the catalog queries they came from (q57b / q53 / q199 /
  * q121 / q91), so a green spec means the kernel can be swapped into the
  * gated query without moving the oracle gate. */
class FoldKernelsSpec extends SparkSpec {
  import spark.implicits._

  private def realToks: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))

  private def assertSame(a: DataFrame, b: DataFrame, hint: String): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, hint)

  test("top_count equals the nested filter-count mode on real bigrams") {
    val bg = realToks.select(col("doc_id"),
      graft.functions.word_ngrams(col("toks"), 2).as("bg"))
    val composed = bg.select(col("doc_id"),
      array_max(transform(array_distinct(col("bg")), x =>
        size(filter(col("bg"), y => y === x)))).as("m"))
    val fused = bg.select(col("doc_id"),
      graft.functions.top_count(col("bg")).as("m"))
    assertSame(fused, composed, "real corpus bigrams")
  }

  test("top_count edges: empty, nulls, dups") {
    val rows: Seq[Seq[String]] = Seq(
      Seq.empty,                       // -> null (array_max of empty)
      Seq("a"),                        // -> 1
      Seq("a", "b", "a", "a", "b"),    // -> 3
      Seq(null, null),                 // distinct [null], count 0 -> 0
      Seq("x", null, "x"))             // max(2, 0) -> 2
    val df = rows.toDF("bg")
    val composed = df.select(
      array_max(transform(array_distinct(col("bg")), x =>
        size(filter(col("bg"), y => y === x)))).as("m"))
    val fused = df.select(graft.functions.top_count(col("bg")).as("m"))
    assertSame(fused, composed, "edge arrays")
    // pin the documented values directly too
    val got = df.select(graft.functions.top_count(col("bg"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(got.toSeq == Seq(None, Some(1), Some(3), Some(0), Some(2)))
  }

  test("window_mins equals the q53 slice-min fold on real shingle hashes") {
    val h = realToks.select(col("doc_id"),
      transform(graft.functions.word_ngrams(col("toks"), 3),
        g => graft.functions.rolling_hash(g)).as("hashes"))
    val composed = h.select(col("doc_id"),
      transform(
        sequence(lit(1), greatest(size(col("hashes")) - 3, lit(1))),
        i => array_min(slice(col("hashes"), i, lit(4)))).as("wins"))
    val fused = h.select(col("doc_id"),
      graft.functions.window_mins(col("hashes"), 4).as("wins"))
    assertSame(fused, composed, "real corpus winnow windows")
  }

  test("window_mins edges: short, exact-w, empty arrays") {
    val rows: Seq[Seq[java.lang.Long]] = Seq(
      Seq.empty,                                  // -> [null]
      Seq(5L),                                    // -> [5]
      Seq(9L, 2L, 7L),                            // shorter than w -> [2]
      Seq(9L, 2L, 7L, 5L),                        // == w -> [2]
      Seq(9L, 2L, 7L, 5L, 1L, 8L))                // sliding
    val df = rows.toDF("hashes")
    val composed = df.select(
      transform(
        sequence(lit(1), greatest(size(col("hashes")) - 3, lit(1))),
        i => array_min(slice(col("hashes"), i, lit(4)))).as("wins"))
    val fused = df.select(
      graft.functions.window_mins(col("hashes"), 4).as("wins"))
    assertSame(fused, composed, "edge arrays")
  }

  test("codepoint_energy equals the per-char ascii fold") {
    val frames = realToks
      .select(substring(concat_ws(" ", col("toks")), 1, 64).as("fb"))
      .filter(length(col("fb")) > 0)
      .union(Seq("", "a", "zz yy", "éł").toDF("fb")) // incl. 2-byte UTF-8
    val composed = frames.select(col("fb"),
      expr("""aggregate(transform(sequence(1, length(fb)),
             |  i -> cast(ascii(substr(fb, i, 1)) as double)),
             |  0D, (a, x) -> a + x * x)""".stripMargin).as("e"))
    val fused = frames.select(col("fb"),
      graft.functions.codepoint_energy(col("fb")).as("e"))
    assertSame(fused, composed, "frame energies")
  }

  test("best_cosine equals the q121 aggregate fold incl. rounding ties") {
    // deterministic vectors; a duplicated bench vector forces a rounded
    // TIE, pinning the lowest-id tie-break on both paths
    def vecs(n: Int, seed: Int): DataFrame =
      spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(15)), d =>
          (pmod(xxhash64(col("id"), d, lit(seed)), lit(2001L)) - lit(1000L))
            / lit(1000.0)).as("v"))
    val b0 = vecs(5, 7) // ids 0..4
    // duplicate bench id 2's vector as NEW id 5 -> guaranteed rounded tie
    val bench = b0.union(b0.filter(col("vec_id") === 2)
        .select(lit(5L).as("vec_id"), col("v")))
      .agg(sort_array(collect_list(
        struct(col("vec_id").as("id"), col("v").as("bv")))).as("bench"))
    val train = vecs(200, 13)
    val composed = train.crossJoin(broadcast(bench))
      .select(col("vec_id"),
        aggregate(col("bench"),
          struct(lit(-2.0).as("sim"), lit(-1L).as("id")),
          (acc, b) => {
            val sim = round(
              graft.functions.cosine_sim(col("v"), b.getField("bv")), 4)
            when(sim > acc.getField("sim"),
              struct(sim.as("sim"), b.getField("id").as("id")))
              .otherwise(acc)
          }).as("best"))
      .select(col("vec_id"), col("best.sim").as("sim"), col("best.id").as("id"))
    val fused = train.crossJoin(broadcast(bench))
      .select(col("vec_id"),
        graft.functions.best_cosine(col("v"), col("bench")).as("best"))
      .select(col("vec_id"), col("best.sim").as("sim"), col("best.id").as("id"))
    assertSame(fused, composed, "best cosine folds")
    // at least one train vector must have hit the duplicated pair (tie
    // really exercised): its winner is id 2, never 5
    val winners = fused.select(col("id")).distinct().as[Long].collect().toSet
    assert(!winners.contains(5L), "rounded tie must keep the lowest id")
  }

  test("shared_span_stats equals the q91 position scan + merge fold") {
    val w = 3
    // pairs built from real docs joined to themselves and to others,
    // plus constructed edges: disjoint, identical, adjacent/overlapping
    // spans, short arrays
    val real = realToks.limit(30)
      .select(graft.functions.word_ngrams(col("toks"), w).as("wa"))
    val pairs = real
      .crossJoin(realToks.limit(7)
        .select(array_distinct(
          graft.functions.word_ngrams(col("toks"), w)).as("wb")))
      .union(Seq(
        (Seq("a b c", "b c d", "x y z"), Seq("a b c", "x y z")),
        (Seq.empty[String], Seq("a b c")),
        (Seq("a b c"), Seq.empty[String]),
        (Seq("q q q"), Seq("q q q"))).toDF("wa", "wb"))
    def spanLen(st: Column): Column =
      when(st.getField("n") === 0, lit(0))
        .otherwise(st.getField("e") - st.getField("s") + 1)
    val init = struct(lit(0).as("n"), lit(0).as("s"), lit(-2).as("e"),
      lit(0).as("mx"), lit(0).as("cov"))
    val ps = filter(
      transform(col("wa"), (x, i) =>
        when(array_contains(col("wb"), x), i + 1).otherwise(-1)),
      p => p > 0)
    val folded = aggregate(ps, init,
      (st, p) => when(st.getField("n") === 0 || p > st.getField("e") + 1,
          struct((st.getField("n") + 1).as("n"), p.as("s"),
            (p + lit(w - 1)).as("e"),
            greatest(st.getField("mx"), spanLen(st)).as("mx"),
            (st.getField("cov") + spanLen(st)).as("cov")))
        .otherwise(struct(st.getField("n").as("n"), st.getField("s").as("s"),
          (p + lit(w - 1)).as("e"), st.getField("mx").as("mx"),
          st.getField("cov").as("cov"))),
      st => struct(st.getField("n").as("n"),
        greatest(st.getField("mx"), spanLen(st)).as("mx"),
        (st.getField("cov") + spanLen(st)).as("cov")))
    val composed = pairs.select(
      folded.getField("n").as("n"), folded.getField("mx").as("mx"),
      folded.getField("cov").as("cov"))
    val fused = pairs.select(
      graft.functions.shared_span_stats(col("wa"), col("wb"), w).as("sp"))
      .select(col("sp.n").as("n"), col("sp.mx").as("mx"), col("sp.cov").as("cov"))
    assertSame(fused, composed, "span folds")
  }

  test("word_ngram_top_count equals top_count over the gram array") {
    for (n <- Seq(1, 2, 5)) {
      val composed = realToks.select(col("doc_id"),
        graft.functions.top_count(
          graft.functions.word_ngrams(col("toks"), n)).as("m"))
      val fused = realToks.select(col("doc_id"),
        graft.functions.word_ngram_top_count(col("toks"), n).as("m"))
      assertSame(fused, composed, s"gram-free top count n=$n")
    }
    // short-array edge: fewer tokens than n -> null
    val short = Seq(Seq("a")).toDF("toks")
      .select(graft.functions.word_ngram_top_count(col("toks"), 3)).collect()
    assert(short.head.isNullAt(0))
  }

  test("word_ngram_rolling_hashes equals rolling_hash over the gram array") {
    for (n <- Seq(1, 3)) {
      val composed = realToks.select(col("doc_id"),
        transform(graft.functions.word_ngrams(col("toks"), n),
          g => graft.functions.rolling_hash(g)).as("h"))
      val fused = realToks.select(col("doc_id"),
        graft.functions.word_ngram_rolling_hashes(col("toks"), n).as("h"))
      assertSame(fused, composed, s"gram-free rolling hashes n=$n")
    }
    // edges: short, empty-string tokens, nulls (skipped separator-
    // correctly, like array_join), null input -> empty
    val edge = Seq(Seq("a"), Seq.empty[String], Seq("a", "", "b"),
        Seq("a", null, "b"), null.asInstanceOf[Seq[String]])
      .toDF("toks")
    val c = edge.select(transform(
      graft.functions.word_ngrams(col("toks"), 2),
      g => graft.functions.rolling_hash(g)).as("h"))
    val f = edge.select(
      graft.functions.word_ngram_rolling_hashes(col("toks"), 2).as("h"))
    assertSame(f, c, "edge arrays")
  }

  test("word_ngram_count equals size of the materialized gram array") {
    val edge = Seq(Seq("a"), Seq.empty[String], Seq("a", "b", "c"),
        null.asInstanceOf[Seq[String]])
      .toDF("toks")
    for (n <- Seq(1, 2, 10)) {
      val c = edge.select(
        size(graft.functions.word_ngrams(col("toks"), n)).as("n"))
      val f = edge.select(graft.functions.word_ngram_count(col("toks"), n).as("n"))
      assertSame(f, c, s"gram count n=$n")
    }
  }

  test("simhash64 equals the q34 nested majority fold") {
    val hs = realToks.select(col("doc_id"),
      transform(col("toks"), t =>
        graft.functions.xxhash64_seeded(7L, t)).as("hs"))
      .union(Seq(
        (-1L, Seq.empty[java.lang.Long]),                  // empty -> 0
        (-2L, Seq[java.lang.Long](5L, null)),              // any null -> 0
        (-3L, Seq[java.lang.Long](-1L)),                   // all bits set
        (-4L, Seq[java.lang.Long](1L, 1L, 2L)))            // mixed majority
        .toDF("doc_id", "hs"))
    val composed = hs.select(col("doc_id"), expr(
      """aggregate(sequence(0, 63), 0L, (acc, bit) ->
        |  acc + IF(aggregate(hs, 0L,
        |             (a, h) -> a + ((shiftrightunsigned(h, bit) & 1L) * 2 - 1)
        |           ) > 0,
        |           shiftleft(1L, bit), 0L))""".stripMargin).as("sig"))
    val fused = hs.select(col("doc_id"),
      graft.functions.simhash64(col("hs")).as("sig"))
    assertSame(fused, composed, "simhash signatures")
    // and the q34 token-hash projection: word_ngram_hashes at n=1 equals
    // the per-token transform it replaced
    val viaTransform = realToks.select(
      transform(col("toks"), t => graft.functions.xxhash64_seeded(7L, t)).as("h"))
    val viaKernel = realToks.select(
      graft.functions.word_ngram_hashes(col("toks"), 1, 7L).as("h"))
    assertSame(viaKernel, viaTransform, "unigram hash path")
  }

  test("fused query bodies match: sharedSpansFused == sharedSpans on sf0.001") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = graft.queries.DedupQueries.sharedSpans(docs, w = 10)
    val b = graft.queries.DedupQueries.sharedSpansFused(docs, w = 10)
    assertSame(b, a, "q91 full bodies")
  }
}
