package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.RangeJoin

/** Contract of the custom interval-stabbing join operator: exact
  * equivalence with the naive cross-join + filter on overlapping,
  * disjoint, nested, and boundary-touching intervals; inclusive bounds;
  * null handling; and the plan actually using RangePointJoinExec (not a
  * BroadcastNestedLoopJoin fallback). */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(points: org.apache.spark.sql.DataFrame,
      intervals: org.apache.spark.sql.DataFrame) =
    points.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))

  test("matches naive join on deterministic pseudo-random data") {
    val points = (0 until 2000)
      .map(i => (i.toLong, ((i * 2654435761L) % 1000).toDouble / 10.0))
      .toDF("pid", "p")
    // overlapping (stride 2, length 3), plus a nested giant interval
    val intervals = ((0 until 50).map(i => (i.toLong, i * 2.0, i * 2.0 + 3.0))
      :+ (99L, 10.0, 90.0)).toDF("iid", "lo", "hi")
    val fast = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi")
      .select("pid", "iid").as[(Long, Long)].collect().sorted
    val slow = naive(points, intervals)
      .select("pid", "iid").as[(Long, Long)].collect().sorted
    assert(fast.nonEmpty && (fast sameElements slow))
  }

  test("bounds are inclusive on both ends") {
    val points = Seq((1L, 5.0), (2L, 10.0), (3L, 4.999), (4L, 10.001))
      .toDF("pid", "p")
    val intervals = Seq((1L, 5.0, 10.0)).toDF("iid", "lo", "hi")
    val hits = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi")
      .select("pid").as[Long].collect().sorted
    assert(hits.toSeq === Seq(1L, 2L))
  }

  test("null points and null interval endpoints never match") {
    val points = Seq((1L, Some(5.0)), (2L, None)).toDF("pid", "p")
    val intervals = Seq((1L, Some(0.0), Some(10.0)), (2L, None, Some(10.0)))
      .toDF("iid", "lo", "hi")
    val hits = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi")
      .select("pid", "iid").as[(Long, Long)].collect()
    assert(hits.toSeq === Seq((1L, 1L)))
  }

  test("the plan runs RangePointJoinExec, not a nested-loop fallback") {
    val points = Seq((1L, 5.0)).toDF("pid", "p")
    val intervals = Seq((1L, 0.0, 10.0)).toDF("iid", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi")
      .queryExecution.executedPlan.toString
    assert(plan.contains("RangePointJoin"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("empty interval side yields an empty result") {
    val points = Seq((1L, 5.0)).toDF("pid", "p")
    val intervals = Seq.empty[(Long, Double, Double)].toDF("iid", "lo", "hi")
    assert(RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi")
      .count() === 0L)
  }
}
