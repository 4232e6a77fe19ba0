package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet testdata access (driver contract, see TESTDATA.md). Plain
  * `spark.read.parquet` — scans get Catalyst predicate pushdown and column
  * pruning for free; never cache here (queries decide persistence).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // The events parquet's ts physical type has varied across testdata
      // generations: TIMESTAMP(NANOS) (Spark rejects by default — read
      // nanos as long, truncate to micros like DuckDB), plain TIMESTAMP
      // micros (use as-is, normalised to session-TZ-free semantics), or a
      // raw epoch BIGINT. Branch on the decoded Catalyst type so all three
      // generations produce an identical TIMESTAMP ts column.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          // DuckDB reads the same column as naive TIMESTAMP; cast through
          // to the session-TZ TimestampType our queries were written for,
          // pinning UTC semantics (Bench/Verify set session TZ = UTC).
          raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
