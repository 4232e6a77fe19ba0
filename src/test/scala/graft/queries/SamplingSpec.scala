package graft.queries

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The A-ES weighted-sampling law behind q104: selecting the min of
  * -ln(u_i)/w_i over md5-derived uniforms picks item i with probability
  * w_i / sum(w). Driver-side over many independent seeds — this pins the
  * FORMULA the oracled query ships. */
class WeightedSampleSpec extends AnyFunSuite {

  private def u(seed: Int, id: Int): Double = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed:$id".getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(13)
    (java.lang.Long.parseLong(hex, 16) + 1) / 4503599627370497.0
  }

  test("k=1 inclusion probability is proportional to weight") {
    val weights = Map(0 -> 1.0, 1 -> 2.0, 2 -> 4.0, 3 -> 8.0)
    val trials = 4000
    val wins = Array.fill(weights.size)(0)
    (1 to trials).foreach { seed =>
      val winner = weights.keys.minBy(i => -math.log(u(seed, i)) / weights(i))
      wins(winner) += 1
    }
    val total = weights.values.sum
    weights.foreach { case (i, w) =>
      val expected = w / total
      val got = wins(i).toDouble / trials
      // binomial std-err at n=4000 is <= 0.008; allow 4 sigma
      assert(math.abs(got - expected) < 0.032,
        s"item $i: got $got expected $expected")
    }
  }
}

/** q105's epoch shuffle: a deterministic seeded permutation, balanced
  * across shards, fully reordered by a seed change. */
class EpochShuffleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("permutation, balance, determinism, seed sensitivity") {
    val docs = graft.Tables(spark, dir, "documents")
    val n = docs.count()
    val a = AnalysisQueries.epochShuffle(docs, seed = 1L, nShards = 8)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    // permutation: every doc exactly once
    assert(a.map(_._3).distinct.length == n.toInt && a.length == n.toInt)
    // positions are 1..size within each shard
    a.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.sameElements(1 to rows.length))
    }
    // balance: no shard more than 2x the mean (xxhash64 is uniform)
    val sizes = a.groupBy(_._1).values.map(_.length)
    assert(sizes.max <= 2 * n.toInt / 8)
    // determinism: same seed, same permutation
    val b = AnalysisQueries.epochShuffle(docs, seed = 1L, nShards = 8)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(a.sameElements(b))
    // seed sensitivity: a new seed reassigns most docs to new slots
    val c = AnalysisQueries.epochShuffle(docs, seed = 2L, nShards = 8)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val moved = a.toSet.diff(c.toSet).size
    assert(moved > n * 0.8, s"only $moved of $n changed slot")
  }
}
