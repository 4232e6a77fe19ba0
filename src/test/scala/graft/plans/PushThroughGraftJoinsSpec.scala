package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{AsOfJoin, RangeJoin}

/** The pushdown rule's contract: a probe-side filter written AFTER the
  * custom join lands below it (all the way into the parquet scan's
  * PushedFilters for file-backed probes), build-side/mixed conjuncts stay
  * above, and results equal the filter-first formulation. */
class PushThroughGraftJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def probe = Seq((1L, 100L, 10.0), (2L, 100L, 5.0),
    (3L, 200L, 7.0)).toDF("pid", "k", "t")
  private def build = Seq((100L, 4.0, "a"), (200L, 6.0, "b"))
    .toDF("bk", "bt", "v")

  test("probe-only conjuncts sink below AsOfJoin; mixed stay above") {
    val joined = AsOfJoin.backward(probe, build,
      col("k"), col("t"), col("bk"), col("bt"))
    val filtered = joined.filter(col("pid") > 1 && col("v") === "a")
    val opt = filtered.queryExecution.optimizedPlan
    // the custom node's probe child must carry the pid predicate...
    val node = opt.collectFirst { case j: AsOfJoin => j }.get
    assert(node.left.toString.contains("pid"),
      s"probe filter not pushed:\n$opt")
    // ...and the v predicate (build side) must remain above the join
    val above = opt.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.references.map(_.name).toSeq.contains("v") => f
    }
    assert(above.isDefined, s"build-side filter vanished:\n$opt")
    // semantics unchanged vs filter-first
    val expect = AsOfJoin.backward(probe.filter(col("pid") > 1), build,
        col("k"), col("t"), col("bk"), col("bt"))
      .filter(col("v") === "a")
      .select("pid", "v").collect().map(r => (r.getLong(0), r.getString(1)))
    val got = filtered.select("pid", "v").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.sorted.sameElements(expect.sorted) && got.nonEmpty)
  }

  test("pushed probe predicate reaches parquet PushedFilters") {
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), col("event_id"), col("value"))
    val intervals = Seq((1L, 0.0, 1000.0)).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(ev, intervals, "value", "lo", "hi")
      .filter(col("user_id") < 10)
    val physical = out.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [IsNotNull(user_id), LessThan(user_id,10)]")
      || physical.contains("LessThan(user_id,10)"),
      s"predicate did not reach the scan:\n$physical")
    assert(out.count() ==
      RangeJoin.pointInInterval(ev.filter(col("user_id") < 10), intervals,
        "value", "lo", "hi").count())
  }

  test("column pruning narrows the probe ReadSchema through the join") {
    // read the full 6-column events parquet, but project only event_id
    // after the as-of join: the scan must read just the columns the join
    // and the projection need
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    val clicks = Seq((100L, 5.0)).toDF("bk", "bt")
    val out = AsOfJoin.backward(ev, clicks,
        col("user_id"), col("value"), col("bk"), col("bt"))
      .select(col("event_id"), col("bt"))
    val scan = out.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).get
    assert(!scan.contains("props") && !scan.contains("event_type"),
      s"probe scan not pruned: $scan")
    assert(scan.contains("event_id") && scan.contains("user_id")
      && scan.contains("value"))
    assert(out.count() > 0)
  }
}
