package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet testdata access (driver contract, see TESTDATA.md). Plain
  * `spark.read.parquet` — scans get Catalyst predicate pushdown and column
  * pruning for free; never cache here (queries decide persistence).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
