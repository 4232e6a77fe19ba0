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
}
