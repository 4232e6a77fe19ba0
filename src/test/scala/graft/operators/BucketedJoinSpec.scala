package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Co-located join via write-side bucketing: with both tables bucketed on
  * the join key, the sort-merge join plans with no shuffle exchange at all
  * — the prep step a 100 TB pipeline pays once so every downstream join
  * and aggregation on that key is exchange-free.
  */
class BucketedJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables join and aggregate with zero exchanges") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Sinks.writeBucketed(
        Tables(spark, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        "orders_bkt", "o_custkey", 8)
      Sinks.writeBucketed(
        Tables(spark, dir, "customer").select("c_custkey", "c_mktsegment"),
        "customer_bkt", "c_custkey", 8)

      // join on the bucket key + aggregate on it: the bucketed scans
      // satisfy both the join's and the aggregation's distribution, so the
      // whole plan runs without a single exchange
      val joined = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"))
        .agg(round(sum(col("o_totalprice")), 2).as("spend"))
      val plan = joined.queryExecution.executedPlan.toString

      assert(!plan.contains("Exchange"), s"expected exchange-free plan:\n$plan")

      // and it computes the same numbers as the unbucketed plan
      val expected = Tables(spark, dir, "orders")
        .join(Tables(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"))
        .agg(round(sum(col("o_totalprice")), 2).as("spend"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == expected && got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}
