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

    val idxDir = graft.SparkSpec.tempDir("ivf_index")
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

  test("incremental append: base files untouched, retrieval == full rebuild") {
    val dir = "/root/testdata/sf0.001"
    val idxDir = graft.SparkSpec.tempDir("ivfpq_incr")

    // q49f's body writes the base index, appends the frozen-model-encoded
    // delta, and returns per-query (n_match, k) vs a single-shot encode of
    // the union — the self-verifying gate is n_match == k everywhere
    val res = SimilarityQueries.ivfPqIncrementalAppend(spark, dir,
      nQueries = 5, k = 10, nprobe = 3, indexDir = Some(idxDir)).collect()
    assert(res.length == 5)
    res.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"query ${r.getLong(0)}: post-append retrieval diverged from " +
          s"rebuild (${r.getLong(1)}/${r.getLong(2)})")
    }

    // the index holds exactly base ∪ delta, no row duplicated or dropped
    val back = spark.read.parquet(idxDir)
    val ids  = back.select("vec_id").collect().map(_.getLong(0)).toSet
    val expected = graft.Tables(spark, dir, "embeddings")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids == expected, "post-append index must hold base ∪ delta ids")
    val deltaIds = expected.filter(_ % 5 == 3)
    assert(deltaIds.nonEmpty && deltaIds.subsetOf(ids))
    assert(back.count() == expected.size)
  }

  test("the append never rewrites a base index file") {
    // maintenance cost must be batch-proportional: snapshot every data
    // file after the base write, append the frozen-model-encoded delta,
    // and require the old files back byte-for-byte (same path, size,
    // mtime) with only NEW files added
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val all = SimilarityQueries.unitVecs(spark, dir)
    val isDelta = col("vec_id") % 5 === 3
    val base  = all.filter(!isDelta)
    val cents = SimilarityQueries.ivfCentroids(base)
    val pq = graft.operators.PQ.fit(
      SimilarityQueries.ivfResiduals(base, cents), "rv", "vec_id",
      m = 16, k = 16, iters = 3)
    val idxDir = graft.SparkSpec.tempDir("ivfpq_files")
    SimilarityQueries.ivfPqEncode(base, cents, pq)
      .write.mode("overwrite").partitionBy("cell").parquet(idxDir)
    def snapshot(): Map[String, (Long, Long)] = {
      val out = scala.collection.mutable.Map[String, (Long, Long)]()
      java.nio.file.Files.walk(java.nio.file.Paths.get(idxDir)).forEach { p =>
        if (p.toString.endsWith(".parquet"))
          out(p.toString) = (java.nio.file.Files.size(p),
            java.nio.file.Files.getLastModifiedTime(p).toMillis)
      }
      out.toMap
    }
    val before = snapshot()
    assert(before.nonEmpty)
    SimilarityQueries.ivfPqEncode(all.filter(isDelta), cents, pq)
      .write.mode("append").partitionBy("cell").parquet(idxDir)
    val after = snapshot()
    before.foreach { case (f, stamp) =>
      assert(after.get(f).contains(stamp),
        s"append modified base file $f: ${before(f)} -> ${after.get(f)}")
    }
    assert(after.size > before.size, "append must add new files")
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
