package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of the Bloom pre-filter pair: membership is NEVER
  * false-negative (the soundness property the prefilter+exact-verify
  * pattern rests on), the false-positive rate is in the configured
  * ballpark, and the build aggregates partially (map-side local filters,
  * blob-sized merge). */
class BloomSpec extends SparkSpec {

  test("every inserted value is found — no false negatives") {
    import spark.implicits._
    val keys = (0 until 5000).map(i => s"tok_$i")
    val df = keys.toDF("k")
    val bloom = graft.functions.bloom_build(df, col("k"), expectedItems = 5000)
    val misses = df.filter(!graft.functions.bloom_might_contain(bloom, col("k"))).count()
    assert(misses == 0L)
  }

  test("false-positive rate on a disjoint set stays near the configured fpp") {
    import spark.implicits._
    val inserted = (0 until 5000).map(i => s"in_$i").toDF("k")
    val bloom = graft.functions.bloom_build(inserted, col("k"),
      expectedItems = 5000, fpp = 0.03)
    val probes = (0 until 20000).map(i => s"out_$i").toDF("k")
    val fp = probes.filter(graft.functions.bloom_might_contain(bloom, col("k"))).count()
    val rate = fp.toDouble / 20000
    assert(rate < 0.03 * 3, s"false-positive rate $rate far above configured 0.03")
  }

  test("bloom pre-filter + exact semi-join equals the plain semi-join") {
    import spark.implicits._
    val corpus = (0 until 2000).map(i => (i.toLong, s"w${i % 211}")).toDF("id", "w")
    val keep = (0 until 40).map(i => s"w${i * 5}").toDF("w")
    val bloom = graft.functions.bloom_build(keep, col("w"), expectedItems = 64)
    val exact = corpus.join(keep, Seq("w"), "left_semi")
      .collect().map(_.getLong(1)).sorted
    val prefiltered = corpus
      .filter(graft.functions.bloom_might_contain(bloom, col("w")))
      .join(keep, Seq("w"), "left_semi")
      .collect().map(_.getLong(1)).sorted
    assert(prefiltered.sameElements(exact))
  }

  test("the build plan aggregates partially — local filters before the merge") {
    import spark.implicits._
    val df = (0 until 100).map(i => s"x$i").toDF("k")
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val agg = org.apache.spark.sql.graftbridge.Bridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        XxHash64(Seq(org.apache.spark.sql.graftbridge.Bridge.expression(col("k"))), 42L),
        Literal(100L), Literal(1024L), 0, 0).toAggregateExpression())
    val plan = df.select(agg.as("bf")).queryExecution.executedPlan.toString
    assert(plan.contains("partial_bloom_filter_agg") || plan.contains("partial_bloomfilter"),
      s"expected a partial aggregation stage:\n$plan")
  }
}
