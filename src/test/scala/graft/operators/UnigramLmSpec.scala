package graft.operators

import graft.SparkSpec

class UnigramLmSpec extends SparkSpec {

  test("Viterbi picks the max-probability segmentation, ties to fewer pieces") {
    // p(ab) = 0.4, p(a) = p(b) = 0.3: "abab" as [ab,ab] scores
    // 2 ln 0.4 = -1.83 vs [a,b,a,b] 4 ln 0.3 = -4.82
    val m = UnigramLm.Model(
      Map("a" -> math.log(0.3), "b" -> math.log(0.3), "ab" -> math.log(0.4)),
      maxLen = 2)
    val (pieces, score) = m.segment("abab")
    assert(pieces == Seq("ab", "ab"))
    assert(math.abs(score - 2 * math.log(0.4)) < 1e-12)
    // p(ab) = p(a)*p(b) exactly: prefer the single piece (fewer pieces)
    val tied = UnigramLm.Model(
      Map("a" -> math.log(0.5), "b" -> math.log(0.5), "ab" -> math.log(0.25)),
      maxLen = 2)
    assert(tied.segment("ab")._1 == Seq("ab"))
  }

  test("characters outside the table fall back to single-char UNK pieces") {
    val m = UnigramLm.Model(Map("a" -> math.log(0.9)), maxLen = 3)
    val (pieces, score) = m.segment("axa")
    assert(pieces == Seq("a", "x", "a"))
    assert(score < 2 * math.log(0.9)) // unk floor dragged the path down
    assert(m.segment("") == (Nil, 0.0))
  }

  test("fit learns the dominant piece and NLL does not increase") {
    import spark.implicits._
    val docs = Seq.fill(20)("abab abab cdcd").toDF("text")
    val (model, stats) = UnigramLm.fit(docs, vocabSize = 10,
      maxPieceLen = 2, epochs = 3)
    // the corpus is two bigram loops: ab and cd must be in the vocab and
    // beat their constituent singles
    assert(model.logp.contains("ab") && model.logp.contains("cd"))
    assert(model.logp("ab") > model.logp("a"))
    // hard EM: corpus NLL under successive models is non-increasing
    assert(stats.sliding(2).forall {
      case Seq(x, y) => y.nll <= x.nll + 1e-9
      case _         => true
    })
    // single-char coverage never pruned
    for (c <- Seq("a", "b", "c", "d")) assert(model.logp.contains(c))
    // encode runs map-side over docs and reproduces the segmentation
    val enc = UnigramLm.encode(Seq("abab cdcd").toDF("text"), model)
      .select("pieces").as[Seq[String]].head()
    assert(enc == Seq("ab", "ab", "cd", "cd"))
  }

  test("sampled segmentation draws from the lattice distribution") {
    // "ab": paths [ab] (w=0.25) and [a,b] (w=0.25) => P = 0.5 each at a=1
    val m = UnigramLm.Model(
      Map("a" -> math.log(0.5), "b" -> math.log(0.5), "ab" -> math.log(0.25)),
      maxLen = 2)
    val draws = (0 until 2000).map(s => m.sampleSegment("ab", s.toLong))
    val fracWhole = draws.count(_ == Seq("ab")) / 2000.0
    assert(fracWhole > 0.45 && fracWhole < 0.55,
      s"P([ab]) should be ~0.5, got $fracWhole")
    // determinism: identical seed => identical draw
    assert(m.sampleSegment("ab", 7L) == m.sampleSegment("ab", 7L))
    // sharp alpha recovers Viterbi: [ab]=0.4 vs [a,b]=0.09, alpha=10
    // makes the ratio (0.4/0.09)^10 ~ 3e6
    val skew = UnigramLm.Model(
      Map("a" -> math.log(0.3), "b" -> math.log(0.3), "ab" -> math.log(0.4)),
      maxLen = 2)
    assert((0 until 500).forall(s =>
      skew.sampleSegment("ab", s.toLong, alpha = 10.0) == Seq("ab")))
  }

  test("encodeSampled is map-side, per-occurrence seeded, reproducible") {
    import spark.implicits._
    val docs = Seq((1L, "abab abab"), (2L, "abab abab")).toDF("doc_id", "text")
    val m = UnigramLm.Model(
      Map("a" -> math.log(0.5), "b" -> math.log(0.5), "ab" -> math.log(0.25)),
      maxLen = 2)
    val once = UnigramLm.encodeSampled(docs, m, seed = 42L)
      .select("doc_id", "pieces").as[(Long, Seq[String])].collect().toMap
    val again = UnigramLm.encodeSampled(docs, m, seed = 42L)
      .select("doc_id", "pieces").as[(Long, Seq[String])].collect().toMap
    assert(once == again)
    // every piece sequence still concatenates back to the text
    assert(once.values.forall(_.mkString == "abababab"))
    // different docs draw independently (seeds mix doc_id)
    assert(once(1L) != once(2L) ||
      UnigramLm.encodeSampled(docs, m, seed = 43L)
        .select("doc_id", "pieces").as[(Long, Seq[String])]
        .collect().toMap != once)
  }

  test("training is deterministic: two fits produce the identical model") {
    import spark.implicits._
    val docs = Seq("the quick brown fox", "the slow brown dog",
      "quick quick fox").toDF("text")
    val a = UnigramLm.fit(docs, vocabSize = 20, maxPieceLen = 3, epochs = 2)
    val b = UnigramLm.fit(docs, vocabSize = 20, maxPieceLen = 3, epochs = 2)
    assert(a._1 == b._1 && a._2 == b._2)
  }
}
