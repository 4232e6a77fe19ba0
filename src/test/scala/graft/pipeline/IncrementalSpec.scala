package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental-runner contract: first run sees every partition, an
  * immediate re-run sees none, a newly landed partition is processed
  * alone, and a run whose work function throws leaves the ledger
  * untouched (so the retry reprocesses it). */
class IncrementalSpec extends SparkSpec {

  test("only unseen day partitions are processed, exactly once") {
    val base = graft.SparkSpec.tempDir("incr")
    val table = s"$base/events_by_day"
    val ledger = s"$base/ledger.txt"
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .withColumn("day", to_date(col("ts")))
    val days = ev.select("day").distinct().orderBy("day")
      .collect().map(_.getDate(0).toString)
    assert(days.length >= 3)
    // land all but the last day
    ev.filter(col("day") < lit(days.last))
      .write.partitionBy("day").parquet(table)

    var rowsSeen = 0L
    val first = Incremental.processNew(spark, table, ledger) { df =>
      rowsSeen = df.count()
    }
    assert(first == days.init.map(d => s"day=$d").toSeq)
    assert(rowsSeen == ev.filter(col("day") < lit(days.last)).count())

    // idempotent re-run
    assert(Incremental.processNew(spark, table, ledger)(_ => fail()).isEmpty)

    // the last day lands; only it is processed
    ev.filter(col("day") === lit(days.last))
      .write.mode("append").partitionBy("day").parquet(table)
    val second = Incremental.processNew(spark, table, ledger) { df =>
      rowsSeen = df.count()
      // the partition column must survive the path-scoped read
      assert(df.select("day").distinct().count() == 1)
    }
    assert(second == Seq(s"day=${days.last}"))
    assert(rowsSeen == ev.filter(col("day") === lit(days.last)).count())

    // a failing run must not advance the ledger
    val extra = s"$table/day=2030-01-01"
    ev.limit(10).drop("day").write.parquet(extra)
    intercept[RuntimeException] {
      Incremental.processNew(spark, table, ledger)(_ =>
        throw new RuntimeException("boom"))
    }
    assert(Incremental.newPartitions(table, ledger) == Seq("day=2030-01-01"))
  }
}
