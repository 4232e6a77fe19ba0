package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The IVF index's cluster-scale story made concrete: the assigned index
  * written `partitionBy(cell)` and probed with a cell filter must scan
  * ONLY the probed cells' files (partition pruning) — at 100 TB this is
  * what turns an nprobe=3 query into a 3-partition read instead of a full
  * index scan. */
class IvfIndexSpec extends SparkSpec {

  test("partitionBy(cell) index probe reads only the probed cells") {
    val dir = "/root/testdata/sf0.001"
    val all = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    val assigned = SimilarityQueries.ivfAssign(all, SimilarityQueries.ivfCentroids(all))
    // the assignment itself must be shuffle-free: model-as-literals argmin
    assert(!assigned.queryExecution.executedPlan.toString.contains("Exchange"),
      "IVF cell assignment must not shuffle")

    val idxDir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    assigned.write.mode("overwrite").partitionBy("cell").parquet(idxDir)

    // the partition column comes back via directory-name inference (int,
    // not the written long) — stay type-agnostic
    val cells = spark.read.parquet(idxDir).select("cell")
      .distinct().collect().map(_.getAs[Number](0).longValue).sorted
    assert(cells.length > 2, s"need >2 cells to show pruning, got ${cells.length}")

    val probed = cells.take(2)
    val probe = spark.read.parquet(idxDir)
      .filter(col("cell").isin(probed: _*))
    probe.collect() // execute so the scan metrics are populated
    // inputFiles lists the UNPRUNED relation; the scan node's metrics show
    // what was actually read after partition pruning
    val scan = probe.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metadata("PartitionFilters").nonEmpty)
    val filesRead      = scan.metrics("numFiles").value
    val partitionsRead = scan.metrics("numPartitions").value
    def filesUnder(cell: Long): Long = {
      val d = java.nio.file.Paths.get(idxDir, s"cell=$cell")
      java.nio.file.Files.list(d).filter(_.toString.endsWith(".parquet")).count()
    }
    assert(partitionsRead == probed.length.toLong,
      s"expected ${probed.length} pruned partitions, scan read $partitionsRead")
    assert(filesRead == probed.map(filesUnder).sum,
      s"scan read $filesRead files, probed dirs hold ${probed.map(filesUnder).sum}")
    // and the probe still returns exactly those cells' rows
    val full = spark.read.parquet(idxDir)
    assert(probe.count() ==
      full.filter(col("cell").isin(probed: _*)).count())
    assert(probe.count() < full.count())
  }

  test("exact re-rank recall dominates the raw IVF-PQ recall") {
    // the two-stage path re-scores the ADC shortlist with true cosine, so
    // per query it can only recover rank inversions, never lose hits
    val dir = "/root/testdata/sf0.001"
    def recallByQuery(name: String): Map[Long, Double] =
      Catalog.byName(name).fn(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val raw      = recallByQuery("q49b_ivfpq_recall")
    val reranked = recallByQuery("q49d_rerank_recall")
    assert(raw.keySet == reranked.keySet)
    raw.foreach { case (q, r) =>
      assert(reranked(q) >= r - 1e-9,
        s"query $q: rerank recall ${reranked(q)} < raw $r")
    }
    assert(reranked.values.sum >= raw.values.sum)
  }
}
