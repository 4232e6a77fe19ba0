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

  test("training is deterministic: two fits produce the identical model") {
    import spark.implicits._
    val docs = Seq("the quick brown fox", "the slow brown dog",
      "quick quick fox").toDF("text")
    val a = UnigramLm.fit(docs, vocabSize = 20, maxPieceLen = 3, epochs = 2)
    val b = UnigramLm.fit(docs, vocabSize = 20, maxPieceLen = 3, epochs = 2)
    assert(a._1 == b._1 && a._2 == b._2)
  }
}
