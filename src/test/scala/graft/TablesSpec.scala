package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The events loader must produce an IDENTICAL session-TZ timestamp
  * column for every ts physical-type generation the driver's testdata has
  * shipped (raw-nanos BIGINT read under nanosAsLong, native
  * TIMESTAMP/NTZ micros, plain epoch long) — round 6 lost all 13 event
  * queries to exactly this drift. Writes the same instants in two
  * encodings and asserts the loaded frames are row-identical. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("BIGINT-ms and TIMESTAMP_NTZ events generations load identically") {
    val base = graft.SparkSpec.tempDir("graft-tables")
    val instantsMs = Seq(1700000000123L, 1700003600456L, 1700007200789L)
    val rows = instantsMs.zipWithIndex.map { case (ms, i) =>
      (i.toLong, ms, i.toLong % 2, "click", 1.5 + i, "{}")
    }

    // generation A: ts as epoch-ms BIGINT (the loader's LongType branch
    // divides by 1000 -> micros... nanos path: ts div 1000). The long
    // branch expects NANOS-as-long, so write nanos.
    val dirA = s"$base/a"
    rows.map { case (id, ms, u, t, v, p) => (id, ms * 1000000L, u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dirA/events.parquet")

    // generation B: ts as TIMESTAMP_NTZ micros of the same instants
    val dirB = s"$base/b"
    rows.map { case (id, ms, u, t, v, p) => (id, ms * 1000L, u, t, v, p) }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))
        .cast(org.apache.spark.sql.types.TimestampNTZType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dirB/events.parquet")

    val a = Tables(spark, dirA, "events")
      .select(col("event_id"), col("ts").cast("long").as("epoch_s"))
      .as[(Long, Long)].collect().sorted.toSeq
    val b = Tables(spark, dirB, "events")
      .select(col("event_id"), col("ts").cast("long").as("epoch_s"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(a === b)
    assert(a.map(_._2) === instantsMs.map(_ / 1000).sorted)
    // both loaders must yield session-TZ TimestampType, never NTZ
    assert(Tables(spark, dirA, "events").schema("ts").dataType
      === org.apache.spark.sql.types.TimestampType)
    assert(Tables(spark, dirB, "events").schema("ts").dataType
      === org.apache.spark.sql.types.TimestampType)
  }
}
