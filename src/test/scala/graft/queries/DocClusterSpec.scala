package graft.queries

import graft.SparkSpec

/** The hashed-TF featurizer behind q117: unit norm, fixed width,
  * determinism across partitionings, and hash-bucket agreement with a
  * driver-side recomputation. */
class DocClusterSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq((1L, "a b a c"), (2L, "d d d d"), (3L, "x y z a b"))
      .toDF("doc_id", "text")
  }

  test("vectors are unit-norm with the requested dimension") {
    val rows = AnalysisQueries.hashedTfVectors(fixture, dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rows.size == 3)
    rows.values.foreach { v =>
      assert(v.length == 16)
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
    }
  }

  test("bucket mass matches a driver-side recomputation") {
    import org.apache.spark.sql.functions._
    // ask the SAME hash family for each token's bucket, then rebuild doc 1
    val toks = Seq("a", "b", "c")
    import spark.implicits._
    val buckets = toks.toDF("t")
      .select(col("t"),
        pmod(graft.functions.xxhash64_seeded(7L, col("t")), lit(16L))
          .cast("int").as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val expected = Array.fill(16)(0.0)
    Seq("a", "b", "a", "c").foreach(t => expected(buckets(t)) += 1.0)
    val nrm = math.sqrt(expected.map(x => x * x).sum)
    val got = AnalysisQueries.hashedTfVectors(fixture, dim = 16)
      .filter(col("doc_id") === 1L).collect().head.getSeq[Double](1)
    expected.indices.foreach(i =>
      assert(math.abs(got(i) - expected(i) / nrm) < 1e-9))
  }

  test("vectors are invariant to input partitioning") {
    val a = AnalysisQueries.hashedTfVectors(fixture, dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = AnalysisQueries.hashedTfVectors(fixture.repartition(7), dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a == b)
  }

  test("q117 clusters cover every doc with cohesion in [0,1]") {
    val rows = Catalog.byName("q117_doc_clusters")
      .fn(spark, "/root/testdata/sf0.001").collect()
    val total = rows.map(_.getLong(1)).sum
    val nDocs = graft.Tables(spark, "/root/testdata/sf0.001", "documents").count()
    assert(total == nDocs)
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1e-9 && c <= 1.0 + 1e-9)
    }
  }
}
