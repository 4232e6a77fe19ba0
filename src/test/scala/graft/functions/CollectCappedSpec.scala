package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{collect_capped => collectCapped}

/** Contract of the size-capped collector: collect_list equivalence below
  * the cap, a hard size bound above it (across partial/merge paths), null
  * skipping, string elements, and the plan property — partial (map-side)
  * aggregation. */
class CollectCappedSpec extends SparkSpec {

  test("groups at or under the cap collect exactly collect_list's multiset") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("a", 2), ("b", 9)).toDF("g", "x")
    val got = df.groupBy(col("g")).agg(collectCapped(col("x"), 5).as("c"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).sorted).toMap
    assert(got("a") == Seq(1, 2, 2) && got("b") == Seq(9))
  }

  test("groups over the cap are truncated to exactly maxItems, never more") {
    import spark.implicits._
    // 10k rows in one group, many partitions, so the bound must hold
    // through partial buffers AND their merge
    val df = spark.range(10000).select(lit("g").as("g"), col("id"))
      .repartition(16)
    val got = df.groupBy(col("g")).agg(collectCapped(col("id"), 7).as("c"))
      .select(size(col("c"))).as[Int].head()
    assert(got === 7)
  }

  test("nulls are skipped, not collected and not counted against the cap") {
    import spark.implicits._
    val df = Seq(("a", Some(1)), ("a", None), ("a", Some(3)), ("a", None))
      .toDF("g", "x")
    val got = df.groupBy(col("g")).agg(collectCapped(col("x"), 3).as("c"))
      .select(col("c")).collect().head.getSeq[Int](0).sorted
    assert(got == Seq(1, 3))
  }

  test("string elements round-trip (buffer element copy, spill serializer)") {
    import spark.implicits._
    val df = (0 until 50).map(i => ("g", s"tok_$i")).toDF("g", "s")
      .repartition(8)
    val got = df.groupBy(col("g")).agg(collectCapped(col("s"), 100).as("c"))
      .select(col("c")).collect().head.getSeq[String](0).toSet
    assert(got === (0 until 50).map(i => s"tok_$i").toSet)
  }

  test("the plan partially aggregates map-side") {
    import spark.implicits._
    val df = Seq(("a", 1), ("b", 2)).toDF("g", "x")
    val plan = df.groupBy(col("g")).agg(collectCapped(col("x"), 3).as("c"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_collect_capped"),
      s"expected a partial aggregation stage:\n$plan")
  }
}
