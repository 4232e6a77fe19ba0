package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.plans.RangePointJoin

/** Public API of the interval-stabbing join (see [[graft.plans.RangePointJoin]]
  * for the operator's design and complexity contract).
  *
  * `points.rangeJoin(intervals)` semantics: inner join of every point row
  * with every interval row where `lo <= point <= hi` (inclusive). The
  * interval side must be broadcast-small (the same contract as the
  * BroadcastNestedLoopJoin this replaces); the point side streams — one
  * map pass, no shuffle, O(log m + hits) per point row.
  *
  * Requires the session to carry `GraftExtensions` (the planner strategy);
  * without it the custom logical node has no physical plan and analysis
  * fails fast.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String): DataFrame = {
    // Cast through stable helper columns so arbitrary numeric inputs
    // arrive at the exec node as DoubleType, then resolve the attributes
    // eagerly — the node enters analysis already resolved.
    val p2 = points.withColumn("__rj_point", col(pointCol).cast("double"))
    val i2 = intervals
      .withColumn("__rj_lo", col(loCol).cast("double"))
      .withColumn("__rj_hi", col(hiCol).cast("double"))
    val lp = Bridge.analyzed(p2)
    val rp = Bridge.analyzed(i2)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) = plan.output.find(_.name == name).get
    val joined = Bridge.ofRows(points.sparkSession,
      RangePointJoin(lp, rp,
        attr(lp, "__rj_point"), attr(rp, "__rj_lo"), attr(rp, "__rj_hi")))
    joined.drop("__rj_point", "__rj_lo", "__rj_hi")
  }

  /** Column-flavored overload: expressions are evaluated against the
    * respective side before the join (names must not collide). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      point: Column, lo: Column, hi: Column): DataFrame =
    pointInInterval(
      points.withColumn("__rj_p_in", point),
      intervals.withColumn("__rj_lo_in", lo).withColumn("__rj_hi_in", hi),
      "__rj_p_in", "__rj_lo_in", "__rj_hi_in")
      .drop("__rj_p_in", "__rj_lo_in", "__rj_hi_in")
}
