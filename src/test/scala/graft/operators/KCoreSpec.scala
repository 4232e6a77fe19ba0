package graft.operators

import graft.SparkSpec

/** The driver-checked k-core peel, on a PLANTED deep cascade: a 12-node
  * chain where each removal exposes the next node (one peel round per
  * node), terminating in a K4 clique — the true 3-core. A fixed 8-round
  * unroll returns a strict superset here; the convergence loop must not.
  */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  /** chain t ~ t+1 and t ~ t+2 (so interior degree 4), tail tied into the
    * K4 {100..103} so the cascade can only start at node 1. */
  private lazy val edges = {
    val chain = (1 to 11).map(t => (t.toLong, (t + 1).toLong)) ++
      (1 to 10).map(t => (t.toLong, (t + 2).toLong))
    val clique = Seq((100L, 101L), (100L, 102L), (100L, 103L),
      (101L, 102L), (101L, 103L), (102L, 103L))
    val tie = Seq((12L, 100L), (12L, 101L))
    val e = chain ++ clique ++ tie
    (e ++ e.map(_.swap)).toDF("u", "v")
  }

  test("deep cascade peels to the true core (12 rounds > any fixed unroll)") {
    val core = KCore.core(edges, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core.keySet === Set(100L, 101L, 102L, 103L))
    assert(core.values.forall(_ === 3L), "K4 in-core degrees are exactly 3")
  }

  test("maxIter too small returns a (warned) superset, never a subset") {
    val truncated = KCore.core(edges, 3, maxIter = 3).collect()
      .map(_.getLong(0)).toSet
    assert(Set(100L, 101L, 102L, 103L).subsetOf(truncated))
    assert(truncated.size > 4, "3 peels cannot finish a 12-round cascade")
  }

  test("graph that is already its own core converges in one checked round") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val e = (k4 ++ k4.map(_.swap)).toDF("u", "v")
    val core = KCore.core(e, 3).collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(core.toMap === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }
}
