package graft.operators

import graft.SparkSpec

/** Profile contract: exact null/distinct/row counts per column, and the
  * whole profile runs as ONE scan of the input (the multi-distinct
  * aggregate plans as a single Expand, not one pass per column). */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (Some(1L), Some("a")), (Some(1L), None), (Some(2L), Some("b")),
    (None, Some("b")), (None, None))
    .toDF("id", "s")

  test("null, distinct, and row counts are exact per column") {
    val got = Profile.profile(df, Seq("id", "s")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(
      "id" -> ((2L, 2L, 5L)),
      "s" -> ((2L, 2L, 5L))))
  }

  test("the profile is one scan, not one per column") {
    val plan = Profile.profile(df, Seq("id", "s"))
      .queryExecution.executedPlan.toString
    assert(plan.split("LocalTableScan").length - 1 === 1)
    assert(plan.contains("Expand"))
  }
}
