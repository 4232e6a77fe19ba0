package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.plans.{AsOfJoin => AsOfJoinPlan}

/** Public API of the native as-of join (see [[graft.plans.AsOfJoin]] for
  * the operator's design and complexity contract).
  *
  * `AsOfJoin.backward(probe, build, ...)` semantics: LEFT OUTER — every
  * probe row joined to the single build row with the same key and the
  * greatest timestamp ≤ the probe's (inclusive), optionally within
  * `toleranceSecs`; unmatched probe rows keep null build columns. The
  * build side must be collect-and-broadcast small (quotes, clicks,
  * config snapshots); the probe side streams with no shuffle and no sort.
  *
  * Requires the session to carry `GraftExtensions` (the planner strategy).
  */
object AsOfJoin {

  def backward(probe: DataFrame, build: DataFrame,
      probeKey: Column, probeTs: Column,
      buildKey: Column, buildTs: Column,
      toleranceSecs: Option[Double] = None): DataFrame = {
    // Stable helper columns (cast to the exec's Long/Double contract),
    // resolved eagerly so the custom node enters analysis resolved.
    val p2 = probe
      .withColumn("__aj_pk", probeKey.cast("long"))
      .withColumn("__aj_pt", probeTs.cast("double"))
    val b2 = build
      .withColumn("__aj_bk", buildKey.cast("long"))
      .withColumn("__aj_bt", buildTs.cast("double"))
    val lp = Bridge.analyzed(p2)
    val rp = Bridge.analyzed(b2)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) = plan.output.find(_.name == name).get
    Bridge.ofRows(probe.sparkSession,
      AsOfJoinPlan(lp, rp,
        attr(lp, "__aj_pk"), attr(lp, "__aj_pt"),
        attr(rp, "__aj_bk"), attr(rp, "__aj_bt"), toleranceSecs))
      .drop("__aj_pk", "__aj_pt", "__aj_bk", "__aj_bt")
  }
}
