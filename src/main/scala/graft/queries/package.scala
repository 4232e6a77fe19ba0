package graft

import org.apache.spark.sql.DataFrame

package object queries {

  /** Decouple compute parallelism from scan parallelism before CPU-heavy
    * per-row work (shingling, 64-way MinHash, vector math): parquet splits
    * at row-group granularity, so a small/compacted input can scan as a
    * handful of partitions and serialize the expensive map stage. One cheap
    * round-robin shuffle of the (pruned) input columns buys full-cluster
    * parallelism for everything downstream. At 100 TB the scan already
    * yields thousands of partitions and this becomes a near-no-op rebalance;
    * keep it ahead of any stage whose cost per row dwarfs a row's I/O.
    */
  private[queries] def fanout(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** JVM-scoped scratch root for on-disk index artifacts (the IVF-PQ
    * round-trip/append indexes, the q95 signature index): one temp root
    * per JVM, recursively deleted by a shutdown hook, so repeated
    * gate/bench runs leave /tmp flat instead of leaking one directory per
    * invocation. */
  private lazy val scratchRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft-scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(p.toFile)
    }))
    p
  }

  /** A fresh directory under [[scratchRoot]] (unique per call — concurrent
    * suites never collide; everything is reclaimed at JVM exit). */
  private[queries] def scratchDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(scratchRoot, prefix).toString
}
