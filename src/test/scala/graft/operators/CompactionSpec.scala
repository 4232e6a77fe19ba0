package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Compaction contract: a deliberately fragmented write (64 files for a
  * tiny table) collapses to a handful of AQE-sized files, row content is
  * untouched, and the fragmentation guard fires only below the mean-size
  * threshold. */
class CompactionSpec extends SparkSpec {

  private def tmp(): String =
    graft.SparkSpec.tempDir("compact")

  test("fragmented directory collapses to few files with identical rows") {
    val in = tmp() + "/frag"
    val out = tmp() + "/compacted"
    val src = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    src.repartition(64).write.parquet(in)
    val nIn = new java.io.File(in).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nIn == 64)
    val nOut = Compaction.compact(spark, in, out, 8L * 1024 * 1024)
    assert(nOut < 8, s"expected few compacted files, got $nOut")
    val a = spark.read.parquet(in).orderBy("event_id").collect()
    val b = spark.read.parquet(out).orderBy("event_id").collect()
    assert(a sameElements b)
  }

  test("the guard skips already-compacted directories") {
    val in = tmp() + "/ok"
    graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .coalesce(1).write.parquet(in)
    assert(Compaction.compactIfFragmented(spark, in, tmp() + "/o",
      8L * 1024 * 1024, minMeanFileBytes = 1024).isEmpty)
    assert(Compaction.compactIfFragmented(spark, in, tmp() + "/o2",
      8L * 1024 * 1024, minMeanFileBytes = Long.MaxValue).isDefined)
  }
}
