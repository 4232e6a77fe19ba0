package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.AsOfJoin

/** Contract of the custom as-of join operator: backward inclusive match,
  * LEFT OUTER nulls on no-match, tolerance cutoff, null-key/ts handling,
  * exact equivalence with the composed window plan (q65's shape) on real
  * events data, and the plan actually using AsOfJoinExec. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val probe = Seq(
    (1L, 100L, 10.0), (2L, 100L, 5.0), (3L, 100L, 4.9),
    (4L, 200L, 50.0), (5L, 300L, 7.0))
    .toDF("pid", "k", "t")
  private val build = Seq(
    (100L, 5.0, "a"), (100L, 8.0, "b"), (200L, 60.0, "c"))
    .toDF("bk", "bt", "v")

  test("backward inclusive match with left-outer nulls") {
    val got = AsOfJoin.backward(probe, build,
        col("k"), col("t"), col("bk"), col("bt"))
      .select("pid", "v").as[(Long, Option[String])].collect().toMap
    assert(got === Map(
      1L -> Some("b"), // greatest bt <= 10 is 8
      2L -> Some("a"), // bt == t matches (inclusive)
      3L -> None,      // all build rows later
      4L -> None,      // build row at 60 > 50
      5L -> None))     // key absent from build side
  }

  test("tolerance bounds how far back a match may reach") {
    val got = AsOfJoin.backward(probe, build,
        col("k"), col("t"), col("bk"), col("bt"),
        toleranceSecs = Some(1.5))
      .select("pid", "v").as[(Long, Option[String])].collect().toMap
    assert(got(1L).isEmpty && got(2L).contains("a")) // 10-8=2 > 1.5; 5-5=0
  }

  test("null keys and timestamps never match, on either side") {
    val p = Seq((1L, Some(100L), Some(5.0)), (2L, None, Some(5.0)),
      (3L, Some(100L), None)).toDF("pid", "k", "t")
    val b = Seq((Some(100L), Some(4.0), "a"), (None, Some(1.0), "x"),
      (Some(100L), None, "y")).toDF("bk", "bt", "v")
    val got = AsOfJoin.backward(p, b, col("k"), col("t"),
        col("bk"), col("bt"))
      .select("pid", "v").as[(Long, Option[String])].collect().toMap
    assert(got === Map(1L -> Some("a"), 2L -> None, 3L -> None))
  }

  test("matches the composed window plan on real events") {
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts")).distinct()
    val native = AsOfJoin.backward(purchases, clicks,
        col("user_id"), col("ts"), col("c_user"), col("c_ts"))
      .select(col("event_id"), col("c_ts").as("last_click_ts"))
    // composed twin: max click ts at-or-before each purchase, per user
    // (INCLUSIVE frame — the operator's contract; q65 proper excludes
    // the current row, hence its own separate gate)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"))
      .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val composed = ev
      .withColumn("last_click_ts",
        max(when(col("event_type") === "click", col("ts"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("last_click_ts"))
    val a = native.as[(Long, Option[java.sql.Timestamp])].collect().sorted
    val b = composed.as[(Long, Option[java.sql.Timestamp])].collect().sorted
    assert(a.nonEmpty && (a sameElements b))
  }

  test("matches a naive reference on randomized keys/timestamps") {
    // deterministic pseudo-random frames: colliding keys, duplicate probe
    // timestamps, sparse build side — every match class exercised
    val probe2 = (0 until 500).map { i =>
      (i.toLong, (i * 2654435761L % 7).abs, ((i * 97) % 50).toDouble)
    }.toDF("pid", "k", "t")
    val build2 = (0 until 60).map { j =>
      (((j * 31) % 9).toLong, (j * 13 % 50).toDouble, s"p$j")
    }.toDF("bk", "bt", "v")
      .groupBy("bk", "bt").agg(min(col("v")).as("v")) // unique (key, ts)
    val fast = AsOfJoin.backward(probe2, build2,
        col("k"), col("t"), col("bk"), col("bt"))
      .select("pid", "v").as[(Long, Option[String])].collect().toMap
    // naive: for each probe row, argmax build ts <= t over the full build
    val buildRows = build2.as[(Long, Double, String)].collect()
    val slow = probe2.as[(Long, Long, Double)].collect().map {
      case (pid, k, t) =>
        val cands = buildRows.filter(b => b._1 == k && b._2 <= t)
        pid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(_._2)._3))
    }.toMap
    assert(fast.size == 500 && fast == slow)
  }

  test("plan executes AsOfJoinExec, not a nested-loop fallback") {
    val df = AsOfJoin.backward(probe, build,
      col("k"), col("t"), col("bk"), col("bt"))
    // TreeNode.nodeName strips the Exec suffix: the physical node prints
    // as "AsOfJoin" in the executed (physical) plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    assert(df.queryExecution.executedPlan.exists(_.isInstanceOf[AsOfJoinExec]))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
