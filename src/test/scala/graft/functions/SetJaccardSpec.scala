package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** set_jaccard must be value-identical to the built-in
  * size(array_intersect)/size(array_union) formulation it replaces —
  * including duplicate elements (set semantics) and null elements
  * (intersect only when present on both sides). Both-empty input is 0/0
  * and returns NULL, matching the non-ANSI integer-division built-in (a
  * NaN there would be ordered GREATER than every number and silently PASS
  * `jac >= threshold` filters on the SQL surface). The gated dedup
  * queries' oracles depend on this exact equality. */
class SetJaccardSpec extends SparkSpec {
  import spark.implicits._

  private def builtin = size(array_intersect(col("a"), col("b")))
    .cast("double") / size(array_union(col("a"), col("b")))

  test("matches the built-in formulation on generated arrays") {
    // deterministic pseudo-random arrays with duplicates and skewed overlap
    val df = spark.range(2000).select(
      transform(sequence(lit(0), pmod(col("id") * 7, lit(40))),
        i => concat(lit("t"), pmod(col("id") * 13 + i * i, lit(50)))).as("a"),
      transform(sequence(lit(0), pmod(col("id") * 11, lit(40))),
        i => concat(lit("t"), pmod(col("id") * 17 + i * 3, lit(50)))).as("b"))
    val diff = df.select(
        graft.functions.set_jaccard(col("a"), col("b")).as("fused"),
        builtin.as("ref"))
      .filter(!(col("fused") === col("ref") ||
        (isnan(col("fused")) && isnan(col("ref")))))
    assert(diff.isEmpty)
  }

  test("edge cases: nulls, empties, full overlap") {
    val rows: Seq[(Seq[String], Seq[String])] = Seq(
      (Seq("x", "y"), Seq("x", "y")),             // identical
      (Seq("x"), Seq("y")),                       // disjoint
      (Seq.empty, Seq("x")),                      // one empty
      (Seq("x", null, "x"), Seq(null, "z")),      // null in both + dup
      (Seq("x", null), Seq("x")),                 // null on one side only
      (Seq("x", "x", "x"), Seq("x")))             // dups collapse
    val df = rows.toDF("a", "b")
    val got = df.select(
        graft.functions.set_jaccard(col("a"), col("b")).as("fused"),
        builtin.as("ref"))
      .collect()
    got.foreach { r =>
      val (f, ref) = (r.getDouble(0), r.getDouble(1))
      assert(f == ref || (f.isNaN && ref.isNaN), s"$f != $ref")
    }
    // both-empty: 0/0. The non-ANSI integer-division built-in yields NULL
    // (ANSI raises DIVIDE_BY_ZERO); the fused kernel returns NULL, so a
    // downstream `jac >= threshold` filter REJECTS a both-empty pair just
    // like every built-in formulation. Callers' candidate shingle arrays
    // are never empty (bandKeys drops shingle-less docs before pairing).
    val e = Seq((Seq.empty[String], Seq.empty[String])).toDF("a", "b")
      .select(graft.functions.set_jaccard(col("a"), col("b")).as("j"))
      .collect()
    assert(e.head.isNullAt(0))
    // ...and specifically: a threshold filter must DROP the both-empty pair
    val admitted = Seq((Seq.empty[String], Seq.empty[String])).toDF("a", "b")
      .filter(graft.functions.set_jaccard(col("a"), col("b")) >= 0.7)
      .count()
    assert(admitted == 0L)
    // null input arrays -> null result, like the built-ins
    val n = Seq((Option.empty[Seq[String]], Option(Seq("x"))))
      .toDF("a", "b")
      .select(graft.functions.set_jaccard(col("a"), col("b")).as("j"))
      .collect()
    assert(n.head.isNullAt(0))
  }

  // ---- set_jaccard_hashes: the array<long> twin the pipeline verify
  // stage ships through its shuffles. Contract: hashing each string with
  // the SAME seed and taking set_jaccard_hashes equals set_jaccard on the
  // strings (injective modulo 64-bit collisions, absent on any test
  // corpus), and the long kernel matches the built-in formulation on raw
  // long arrays including duplicates, nulls, and the both-empty NULL.

  test("hashes twin: equals string set_jaccard through xxhash64 on generated arrays") {
    val df = spark.range(2000).select(
      transform(sequence(lit(0), pmod(col("id") * 7, lit(40))),
        i => concat(lit("t"), pmod(col("id") * 13 + i * i, lit(50)))).as("a"),
      transform(sequence(lit(0), pmod(col("id") * 11, lit(40))),
        i => concat(lit("t"), pmod(col("id") * 17 + i * 3, lit(50)))).as("b"))
    val diff = df.select(
        graft.functions.set_jaccard(col("a"), col("b")).as("s"),
        graft.functions.set_jaccard_hashes(
          transform(col("a"), x => xxhash64(x)),
          transform(col("b"), x => xxhash64(x))).as("h"))
      .filter(!(col("s") === col("h")))
    assert(diff.isEmpty)
  }

  test("hashes twin: built-in equivalence, dups, nulls, both-empty NULL") {
    val builtinL = size(array_intersect(col("a"), col("b")))
      .cast("double") / size(array_union(col("a"), col("b")))
    val rows: Seq[(Seq[java.lang.Long], Seq[java.lang.Long])] = Seq(
      (Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](2L, 3L, 4L)),
      (Seq[java.lang.Long](0L, Long.MinValue, Long.MaxValue),
        Seq[java.lang.Long](0L, Long.MaxValue)),     // sentinel-hostile values
      (Seq[java.lang.Long](5L, 5L, 5L), Seq[java.lang.Long](5L)), // dups collapse
      (Seq[java.lang.Long](1L, null, 1L), Seq[java.lang.Long](null, 9L)), // null both sides
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](1L)),   // null one side
      (Seq.empty[java.lang.Long], Seq[java.lang.Long](7L)))       // one empty
    val got = rows.toDF("a", "b").select(
        graft.functions.set_jaccard_hashes(col("a"), col("b")).as("fused"),
        builtinL.as("ref"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), s"${r.getDouble(0)} != ${r.getDouble(1)}")
    }
    val e = Seq((Seq.empty[java.lang.Long], Seq.empty[java.lang.Long])).toDF("a", "b")
      .select(graft.functions.set_jaccard_hashes(col("a"), col("b")).as("j"))
      .collect()
    assert(e.head.isNullAt(0))
  }

  test("hashes twin: pipeline shingle staging equals the string shingle path") {
    // the exact frames DataPipelineBench.run builds on each verify side:
    // string shingles (word_ngrams_distinct) vs
    // array_distinct(word_ngram_hashes) with the VERIFY seed (distinct
    // from the band keys' BaseHashSeed since r15, so the exact check's
    // collision class is independent of candidate generation's — any seed
    // yields the same Jaccard modulo 64-bit collisions; pin the one the
    // pipeline ships)
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy cat",
      "completely different text with no overlap at all",
      "the quick brown fox jumps over the lazy dog",  // exact dup
      "short one").toDF("text")
    val pairs = docs.crossJoin(docs.select(col("text").as("text2")))
    val diff = pairs.select(
        graft.functions.set_jaccard(
          graft.operators.MinHash.shingles(col("text")),
          graft.operators.MinHash.shingles(col("text2"))).as("s"),
        graft.functions.set_jaccard_hashes(
          array_distinct(graft.functions.word_ngram_hashes(
            split(col("text"), " "), 3, graft.operators.MinHash.VerifyHashSeed)),
          array_distinct(graft.functions.word_ngram_hashes(
            split(col("text2"), " "), 3, graft.operators.MinHash.VerifyHashSeed))).as("h"))
      .filter(!(col("s") <=> col("h")))
    assert(diff.isEmpty)
  }

  test("hashes twin: no-null fast path (containsNull=false schema) equals the general kernel") {
    // containsNull=false elements (sequence of a non-nullable lambda) route
    // SetJaccardHashes through setJaccardLongsNoNulls (bulk toLongArray
    // copy); re-typing the SAME arrays as nullable-element routes through
    // the general kernel. Values must be identical, duplicates included
    // (the fast path skips null checks, NOT the duplicate merge).
    // lambda bodies stay statically non-nullable (bitwiseAND/*/+ — pmod is
    // nullable in Catalyst, which would flip the arrays to containsNull=true
    // and dodge the fast path); `& 15` folds values into a small range so
    // duplicates and overlap both occur
    val df = spark.range(500).select(
      transform(sequence(lit(0), col("id").bitwiseAND(lit(31L))),
        i => (col("id") * 13 + i * i).bitwiseAND(lit(15L))).as("a"),
      transform(sequence(lit(0), (col("id") * 3).bitwiseAND(lit(31L))),
        i => (col("id") * 17 + i * 3).bitwiseAND(lit(15L))).as("b"))
    import org.apache.spark.sql.types.{ArrayType, LongType}
    assert(!df.schema("a").dataType.asInstanceOf[ArrayType].containsNull,
      "precondition: test frame must carry containsNull=false elements")
    val nullable = df.select(
      col("a").cast(ArrayType(LongType, containsNull = true)).as("a"),
      col("b").cast(ArrayType(LongType, containsNull = true)).as("b"))
    val fast = df.select(
      graft.functions.set_jaccard_hashes(col("a"), col("b")).as("j")).collect()
    val general = nullable.select(
      graft.functions.set_jaccard_hashes(col("a"), col("b")).as("j")).collect()
    fast.zip(general).foreach { case (f, g) =>
      assert(f.getDouble(0) == g.getDouble(0), s"${f.getDouble(0)} != ${g.getDouble(0)}")
    }
  }
}
