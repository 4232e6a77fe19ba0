package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The composed training-data pipeline on a hand-built corpus with known
  * structure: every stage's removal set is predictable, so the survivor
  * counts and the final output are asserted exactly. */
class DataPipelineSpec extends SparkSpec {

  test("pipeline removes exact dups, near-dups, and planted contamination") {
    import spark.implicits._
    // 40-token docs in per-doc token namespaces, so the ONLY shared
    // n-grams are the ones planted below (a shared cyclic vocabulary
    // would collide 7-token runs across unrelated docs)
    def doc(p: String): String = (0 until 40).map(i => s"$p$i").mkString(" ")

    val corpus = Seq(
      // exact-dup pair: 0 kept (lowest id), 1 dropped
      (0L, "s0", doc("a")),
      (1L, "s0", doc("a")),
      // near-dup pair (one appended token): higher word count wins the
      // keep-best policy => 3 kept, 2 dropped
      (2L, "s0", doc("b")),
      (3L, "s0", doc("b") + " extra"),
      // unique survivors
      (4L, "s1", doc("c")),
      (5L, "s1", doc("d")),
      // contaminated: shares a >= 7-token run with the benchmark doc
      (6L, "s1", doc("e") + " " + doc("q").split(" ").take(12).mkString(" ")),
      // too short for the quality floor (wc < 5)
      (7L, "s1", "a b c")
    ).toDF("doc_id", "source", "text")
    val benchmark = Seq((100L, doc("q"))).toDF("bench_id", "text")

    val out = graft.SparkSpec.tempDir("graft-dp-spec")
    val counts = DataPipelineBench.run(spark, corpus, benchmark, out).toMap

    assert(counts("docs_in") == 8L)
    assert(counts("after_quality") == 7L)      // doc 7 out
    assert(counts("after_exact_dedup") == 6L)  // doc 1 out
    assert(counts("after_near_dedup") == 5L)   // doc 2 out (3 kept: longer)
    assert(counts("after_decontam") == 4L)     // doc 6 out
    assert(counts("train") + counts("val") == 4L)

    val kept = spark.read.parquet(out).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 3L, 4L, 5L))
  }

  test("A/B witness legs are result-identical: keep-best union shape, string verify") {
    import spark.implicits._
    def doc(p: String): String = (0 until 40).map(i => s"$p$i").mkString(" ")
    val corpus = Seq(
      (0L, "s0", doc("a")), (1L, "s0", doc("a")),
      (2L, "s0", doc("b")), (3L, "s0", doc("b") + " extra"),
      (4L, "s1", doc("c")), (5L, "s1", doc("d")),
      (6L, "s1", doc("e") + " " + doc("q").split(" ").take(12).mkString(" ")),
      (7L, "s1", "a b c")).toDF("doc_id", "source", "text")
    val benchmark = Seq((100L, doc("q"))).toDF("bench_id", "text")
    def leg(name: String, keepbest: String = "bloom",
        verify: String = "hashed", cands: String = "bh",
        verifypre: String = "bloom", sig: String = "family",
        exact: String = "agg") = {
      val out = graft.SparkSpec.tempDir(s"graft-dp-ab-$name")
      val counts = DataPipelineBench.run(spark, corpus, benchmark, out,
        verifyMode = verify, keepBestMode = keepbest, exactMode = exact,
        candsMode = cands, verifyPre = verifypre, sigScheme = sig).toMap
      val kept = spark.read.parquet(out).select(col("doc_id"))
        .collect().map(_.getLong(0)).toSet
      (counts, kept)
    }
    // the default path vs the witness legs the big-scale paired A/Bs run
    // (SPARK_GRAFT_DP_KEEPBEST=union / SPARK_GRAFT_DP_VERIFY=string /
    // SPARK_GRAFT_DP_CANDS=bandbh|bloom): every stage count and the
    // survivor SET must be bit-identical — the legs differ only in how
    // many bytes cross which exchange
    val (cBase, kBase) = leg("base")
    val (cUnion, kUnion) = leg("union", keepbest = "union")
    val (cStr, kStr) = leg("strv", verify = "string")
    val (cBandBh, kBandBh) = leg("bandbh", cands = "bandbh")
    val (cBloom, kBloom) = leg("bloom", cands = "bloom")
    // the Bloom participant stagings: rows provably outside any duplicate
    // relation bypass the stage's exchange map-side; the survivor sets
    // must be IDENTICAL by construction. keep-best's bloom staging is the
    // DEFAULT since the r15 DedupLap adjudication, so `anti` is now the
    // witness leg here (exact dedup adjudicated the other way: agg stays
    // default, bloom is the lever).
    val (cExB, kExB) = leg("exbloom", exact = "bloom")
    val (cKbB, kKbB) = leg("kbanti", keepbest = "anti")
    // the unfiltered-verify witness leg reports no participant count, so
    // compare counts modulo that diagnostic key
    val (cVpOff, kVpOff) = leg("vpoff", verifypre = "off")
    assert(cUnion == cBase && kUnion == kBase)
    assert(cStr == cBase && kStr == kBase)
    assert(cBandBh == cBase && kBandBh == kBase)
    assert(cBloom == cBase && kBloom == kBase)
    assert(cExB == cBase && kExB == kBase)
    assert(cKbB == cBase && kKbB == kBase)
    assert((cVpOff - "verify_participants") == (cBase - "verify_participants")
      && kVpOff == kBase)
    assert(kBase == Set(0L, 3L, 4L, 5L))
    // the one-permutation signature leg (SPARK_GRAFT_DP_SIG=oph) is a
    // DIFFERENT LSH family — its candidate COUNT may legitimately differ —
    // but exact verification makes the verified pairs, and therefore every
    // survivor count and the final set, land identically on this corpus
    // (the near-dup pair is J~0.95, far above any family's banding noise)
    val (cOph, kOph) = leg("oph", sig = "oph")
    assert(kOph == kBase)
    assert(cOph("after_near_dedup") == cBase("after_near_dedup") &&
      cOph("after_decontam") == cBase("after_decontam") &&
      cOph("near_verified_pairs") == cBase("near_verified_pairs"))
  }
}
