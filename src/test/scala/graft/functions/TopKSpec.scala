package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{top_k => topK}

/** Contract of the bounded-heap top-k aggregate: value semantics (greatest/
  * least, sort order, ties), equivalence with row_number-over-window
  * ranking, and the plan property that justifies it — partial (map-side)
  * aggregation instead of a per-key window sort. */
class TopKSpec extends SparkSpec {

  private def nums = {
    import spark.implicits._
    Seq(("a", 5), ("a", 9), ("a", 1), ("a", 7), ("a", 3),
        ("b", 2), ("b", 8), ("b", 6)).toDF("g", "x")
  }

  test("top_k keeps the k greatest values sorted best-first") {
    val out = nums.groupBy(col("g")).agg(topK(col("x"), 3).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(out("a") == Seq(9, 7, 5), out("a"))
    assert(out("b") == Seq(8, 6, 2), out("b"))
  }

  test("top_k(smallest = true) keeps the k least values sorted best-first") {
    val out = nums.groupBy(col("g")).agg(topK(col("x"), 2, smallest = true).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(out("a") == Seq(1, 3), out("a"))
    assert(out("b") == Seq(2, 6), out("b"))
  }

  test("groups smaller than k return all their values") {
    val out = nums.groupBy(col("g")).agg(topK(col("x"), 10).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(out("b") == Seq(8, 6, 2))
  }

  test("struct ordering reproduces a (score desc, id asc) window ranking, ties included") {
    import spark.implicits._
    // duplicate scores across ids force the tie-break path
    val rows = (0 until 200).map(i => (i % 4, i.toLong, (i % 7).toDouble / 7.0))
    val df = rows.toDF("g", "id", "score")
    val viaWindow = df.withColumn("rank", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))))
      .filter(col("rank") <= 5)
      .select(col("g"), col("id"), col("score"), col("rank"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val viaTopK = df.groupBy(col("g"))
      .agg(topK(struct((-col("score")).as("ns"), col("id").as("id")), 5,
        smallest = true).as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("r0", "e")))
      .select(col("g"), col("e.id").as("id"), (-col("e.ns")).as("score"),
        (col("r0") + 1).cast("int").as("rank"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(viaTopK == viaWindow)
  }

  test("the plan partially aggregates map-side — no window, no per-key sort") {
    val plan = nums.groupBy(col("g")).agg(topK(col("x"), 3).as("t"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_collect_top_k") || plan.contains("partial_collecttopk"),
      s"expected a partial aggregation stage:\n$plan")
    assert(!plan.contains("Window"), plan)
  }
}
