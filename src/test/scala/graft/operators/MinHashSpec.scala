package graft.operators

import graft.SparkSpec

/** The MinHash operator's contract, pinned independently of the dedup
  * queries that consume it. */
class MinHashSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e"),
    (2L, "a b c d e"),        // exact copy of 1
    (3L, "v w x y z"),        // disjoint tokens
    (4L, "a b"))              // < 3 tokens: no shingles
    .toDF("doc_id", "text")

  test("band keys: 32 bands per doc, shingle-less docs dropped") {
    val keys = MinHash.bandKeys(docs, "text", Seq("doc_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val perDoc = keys.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perDoc == Map(1L -> MinHash.NumBands, 2L -> MinHash.NumBands,
      3L -> MinHash.NumBands))
    assert(!perDoc.contains(4L)) // two tokens -> zero 3-shingles -> dropped
  }

  test("identical text collides on every band; disjoint text on none") {
    val keys = MinHash.bandKeys(docs, "text", Seq("doc_id")).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2))))
    val byDoc = keys.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byDoc(1L) == byDoc(2L))            // same signature, all 32 bands
    assert(byDoc(1L).intersect(byDoc(3L)).isEmpty) // no shared shingles
  }

  test("signature is deterministic across evaluations") {
    val a = MinHash.bandKeys(docs, "text", Seq("doc_id")).collect().toSet
    val b = MinHash.bandKeys(docs, "text", Seq("doc_id")).collect().toSet
    assert(a == b)
  }

  test("word_ngram_hashes is bit-equal to hashing the joined gram strings") {
    import org.apache.spark.sql.functions._
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(split(col("text"), " ").as("toks"))
    for (n <- Seq(3, 7)) {
      val fused = real.select(graft.functions.word_ngram_hashes(
        col("toks"), n, MinHash.BaseHashSeed).as("h"))
      val viaStrings = real.select(transform(
        graft.functions.word_ngrams(col("toks"), n),
        g => graft.functions.xxhash64_seeded(MinHash.BaseHashSeed, g)).as("h"))
      assert(fused.exceptAll(viaStrings).isEmpty &&
        viaStrings.exceptAll(fused).isEmpty, s"n=$n")
    }
    // edges: fewer tokens than n -> empty; empty-string tokens (doubled
    // spaces) hash like the string path; a NULL token array -> empty
    // array, exactly like the composed form's when()-guard fallthrough
    val edge = Seq(Seq("a"), Seq.empty[String], Seq("a", "", "b", "c"),
        null.asInstanceOf[Seq[String]])
      .toDF("toks")
    val f = edge.select(graft.functions.word_ngram_hashes(col("toks"), 3, -9L).as("h"))
    val s = edge.select(transform(graft.functions.word_ngrams(col("toks"), 3),
      g => graft.functions.xxhash64_seeded(-9L, g)).as("h"))
    assert(f.exceptAll(s).isEmpty && s.exceptAll(f).isEmpty)
  }

  test("fused shingles equal array_distinct(word_ngrams(...)) bit-for-bit") {
    import org.apache.spark.sql.functions._
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(split(col("text"), " ").as("toks"))
    for (n <- Seq(1, 3, 5)) {
      val fused = real.select(
        graft.functions.word_ngrams_distinct(col("toks"), n).as("sh"))
      val composed = real.select(
        array_distinct(graft.functions.word_ngrams(col("toks"), n)).as("sh"))
      // exceptAll compares full arrays — ORDER included, so this pins
      // first-occurrence order, not just set equality
      assert(fused.exceptAll(composed).isEmpty &&
        composed.exceptAll(fused).isEmpty, s"n=$n")
    }
    // incl. a NULL token array -> empty array, like the composed form
    val edge = Seq(Seq("a", "b"), Seq.empty[String], Seq("a", "", "a", ""),
        null.asInstanceOf[Seq[String]])
      .toDF("toks")
    val f = edge.select(graft.functions.word_ngrams_distinct(col("toks"), 3).as("sh"))
    val c = edge.select(
      array_distinct(graft.functions.word_ngrams(col("toks"), 3)).as("sh"))
    assert(f.exceptAll(c).isEmpty && c.exceptAll(f).isEmpty)
  }

  test("bandKeys equals the round-10 shingle-string formulation") {
    import org.apache.spark.sql.functions._
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val now = MinHash.bandKeys(real, "text", Seq("doc_id"))
    // the old path: distinct shingle STRINGS -> per-shingle hash -> 64
    // column-per-family signature -> same band structs (distinct vs
    // multiset cannot matter: each family takes a MINIMUM)
    val old = real
      .filter(size(split(col("text"), " ")) >= 3)
      .withColumn("__h", transform(MinHash.shingles(col("text")),
        s => graft.functions.xxhash64_seeded(MinHash.BaseHashSeed, s)))
      .select(col("doc_id") +: MinHash.signatureFromHashes(col("__h")): _*)
      .select(col("doc_id"), explode(array((0 until MinHash.NumBands).map { b =>
        struct(lit(b).as("band"),
          graft.functions.xxhash64_seeded(1000L + b,
            col(s"mh_${b * MinHash.BandRows}"),
            col(s"mh_${b * MinHash.BandRows + 1}")).as("bh"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    assert(now.exceptAll(old).isEmpty && old.exceptAll(now).isEmpty)
  }

  test("fused signature equals the column-per-family formulation") {
    import org.apache.spark.sql.functions._
    // real text: the harness documents at the smallest SF
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .filter(size(split(col("text"), " ")) >= 3)
      .withColumn("__h", transform(MinHash.shingles(col("text")),
        s => graft.functions.xxhash64_seeded(MinHash.BaseHashSeed, s)))
    val fused = real.select(col("doc_id"),
      graft.functions.minhash_signatures(col("__h"), MinHash.NumHashes).as("sig"))
    val perCol = real.select(col("doc_id") +: MinHash.signatureFromHashes(col("__h")): _*)
      .select(col("doc_id"),
        array((0 until MinHash.NumHashes).map(i => col(s"mh_$i")): _*).as("sig"))
    assert(fused.exceptAll(perCol).isEmpty && perCol.exceptAll(fused).isEmpty)

    // edge cases the real corpus can't produce: empty hash array (all-null
    // signature like array_min(empty)) and a null element (hashes to its
    // family seed, exactly xxhash64_seeded(i, null))
    val edge = Seq(
      (1L, Seq.empty[java.lang.Long]),
      (2L, Seq[java.lang.Long](42L, null, -7L)))
      .toDF("id", "__h")
    val fusedEdge = edge.select(col("id"),
      graft.functions.minhash_signatures(col("__h"), MinHash.NumHashes).as("sig"))
    val perColEdge = edge.select(col("id") +: MinHash.signatureFromHashes(col("__h")): _*)
      .select(col("id"),
        array((0 until MinHash.NumHashes).map(i => col(s"mh_$i")): _*).as("sig"))
    assert(fusedEdge.exceptAll(perColEdge).isEmpty &&
      perColEdge.exceptAll(fusedEdge).isEmpty)
  }

  test("bandHashKeys equals bandKeys' bh column (band folded into the seeded hash)") {
    // the bh-only staging the pipeline's candidate stage shuffles: same
    // carry + bh MULTISET as bandKeys (each bh is already seeded by its
    // band ordinal), just without ever materializing the band column
    import org.apache.spark.sql.functions.col
    val a = MinHash.bandKeys(docs, "text", Seq("doc_id"))
      .select(col("doc_id"), col("bh"))
    val b = MinHash.bandHashKeys(docs, "text", Seq("doc_id"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(b.count() == 3L * MinHash.NumBands) // doc 4 still dropped
  }

  // --- one-permutation + rotation-densification signature (the oph
  //     candidate-stage lever: one bin-route per shingle vs 64 seeded
  //     hashes; a DIFFERENT LSH family, so the contract here is shape +
  //     estimator quality + banding recall, not equality with k-family) ---

  private def ophSig(xs: Seq[Long]): IndexedSeq[Long] = {
    val a = graft.functions.MinHashKernel.signaturesOph(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(xs.toArray),
      MinHash.NumHashes)
    (0 until MinHash.NumHashes).map(a.getLong)
  }

  test("oph signature: shape, determinism, dup/permutation invariance, edges") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(40)(rnd.nextLong())
    val s1 = ophSig(xs)
    assert(s1.length == MinHash.NumHashes)
    assert(s1 == ophSig(xs))                        // deterministic
    assert(s1 == ophSig(rnd.shuffle(xs)))           // order-insensitive
    assert(s1 == ophSig(xs ++ xs.take(13)))         // multiset = set (min)
    // empty input -> all-null signature, like the k-family kernel
    val empty = graft.functions.MinHashKernel.signaturesOph(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long]),
      MinHash.NumHashes)
    assert((0 until MinHash.NumHashes).forall(empty.isNullAt))
    // non-empty input -> fully densified, no nulls, even from ONE element
    val one = ophSig(Seq(42L))
    assert(one.distinct.length == MinHash.NumHashes) // hop offsets differ
  }

  test("oph signature: slot agreement estimates Jaccard (statistical)") {
    val rnd = new scala.util.Random(42)
    def randLongs(n: Int) = Seq.fill(n)(rnd.nextLong())
    // 200 pairs at J = 0.8 (120 shared / 15+15 own -> union 150); mean
    // slot-agreement over 64 slots must track J. 150 elements over 64
    // bins leaves few empty bins, so densification barely perturbs the
    // plain per-bin-minwise estimator here.
    val agrees = (1 to 200).map { _ =>
      val shared = randLongs(120)
      val (sa, sb) = (ophSig(shared ++ randLongs(15)),
        ophSig(shared ++ randLongs(15)))
      sa.zip(sb).count { case (x, y) => x == y } / 64.0
    }
    val mean = agrees.sum / agrees.size
    assert(math.abs(mean - 0.8) < 0.05, f"mean slot agreement $mean%.3f")
  }

  test("oph banding: high-J pairs collide on >=1 band, disjoint sets on none") {
    val rnd = new scala.util.Random(99)
    def randLongs(n: Int) = Seq.fill(n)(rnd.nextLong())
    def bands(sig: IndexedSeq[Long]): Set[(Int, (Long, Long))] =
      (0 until MinHash.NumBands)
        .map(b => (b, (sig(2 * b), sig(2 * b + 1)))).toSet
    // J = 0.9 at SMALL set size (36 shared / 2+2 own -> union 40): most of
    // the 64 bins are empty, so this exercises the densified slots — the
    // regime where oph recall is weakest. Every pair must still share a
    // band (per-band match ~J^2 = 0.81; P(all 32 miss) ~ 1e-23 if slots
    // were independent — correlation from shared donors only HELPS here,
    // since borrowed slots copy bins the sets agree on).
    val missed = (1 to 100).count { _ =>
      val shared = randLongs(36)
      val a = bands(ophSig(shared ++ randLongs(2)))
      val b = bands(ophSig(shared ++ randLongs(2)))
      a.intersect(b).isEmpty
    }
    assert(missed == 0, s"$missed/100 J=0.9 pairs missed every band")
    // disjoint sets share no band (64-bit slot equality is ~impossible)
    val d = (1 to 50).count { _ =>
      bands(ophSig(randLongs(40)))
        .intersect(bands(ophSig(randLongs(40)))).nonEmpty
    }
    assert(d == 0, s"$d/50 disjoint pairs collided on a band")
  }

  test("bandHashKeysOph: 32 keys per doc, identical docs collide on all, disjoint on none") {
    import org.apache.spark.sql.functions.col
    val keys = MinHash.bandHashKeysOph(docs, "text", Seq("doc_id"))
    assert(keys.count() == 3L * MinHash.NumBands) // doc 4 dropped (< 3 tokens)
    val byDoc = keys.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byDoc(1L) == byDoc(2L))                  // identical text
    assert(byDoc(1L).intersect(byDoc(3L)).isEmpty)  // disjoint tokens
    // deterministic across evaluations
    val again = MinHash.bandHashKeysOph(docs, "text", Seq("doc_id"))
    assert(keys.exceptAll(again).isEmpty && again.exceptAll(keys).isEmpty)
  }
}
