package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** q133's structural claim: the zone map must actually PRUNE (read fewer
  * files than the clustered copy holds) while the pruned scan returns
  * exactly what an unpruned scan of the same predicate returns. */
class ZoneMapSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val lo = lit("2024-01-10").cast("timestamp")
  private val hi = lit("2024-01-14").cast("timestamp")

  test("4 of 30 days survives with strictly fewer than the 8 written files") {
    val survivors = EventQueries.zoneMapSurvivors(spark, dir, lo, hi)
    assert(survivors.nonEmpty, "the window holds data — pruning to zero is a bug")
    assert(survivors.size < 8,
      s"zone map kept all ${survivors.size} files — no pruning happened")
  }

  test("pruned scan equals the unpruned scan on the same predicate") {
    val survivors = EventQueries.zoneMapSurvivors(spark, dir, lo, hi)
    val pruned = spark.read.parquet(survivors: _*)
      .filter(col("ts") >= lo && col("ts") < hi)
      .select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq
    val full = Tables(spark, dir, "events")
      .filter(col("ts") >= lo && col("ts") < hi)
      .select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(pruned == full)
  }
}
