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
      // events.parquet carries TIMESTAMP(NANOS) which Spark rejects by
      // default; read nanos as long and truncate to micros (matches
      // DuckDB's nanos->micros truncation for positive epochs).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
