package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the table-maintenance pass every long-lived
  * 100 TB dataset needs (streaming ingests and over-partitioned writes
  * leave thousands of KB-sized parquet files; scans then pay per-file
  * open/footer cost and planning chokes on the listing).
  *
  * The rewrite is a REBALANCE hint, not a fixed `repartition(n)`: AQE
  * sizes the output partitions to `advisoryPartitionSizeInBytes` from the
  * ACTUAL shuffle statistics at runtime — no driver-side guess about how
  * many files the data needs, skewed partitions are split, small ones
  * coalesced. The advisory size is set on in-memory (pre-compression)
  * bytes; parquet files land smaller by the codec ratio.
  */
object Compaction {

  /** Rewrite `inDir`'s parquet as ~`targetShuffleBytes`-sized output
    * partitions at `outDir`; returns the output file count. The advisory
    * conf is scoped to the call and restored after. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetShuffleBytes: Long): Int = {
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, targetShuffleBytes.toString)
    try {
      spark.read.parquet(inDir)
        .hint("rebalance")
        .write.mode("overwrite").parquet(outDir)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
    new java.io.File(outDir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
  }

  /** Compact only if the directory's mean parquet file size is below
    * `minMeanFileBytes` (the idempotence guard a scheduled maintenance
    * job needs); returns Some(fileCount) if compacted. */
  def compactIfFragmented(spark: SparkSession, inDir: String, outDir: String,
      targetShuffleBytes: Long, minMeanFileBytes: Long): Option[Int] = {
    val files = new java.io.File(inDir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    if (files.nonEmpty && files.map(_.length).sum / files.length < minMeanFileBytes)
      Some(compact(spark, inDir, outDir, targetShuffleBytes))
    else None
  }
}
