package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product-quantization contract: codes are deterministic, in range, and
  * ADC distances preserve the neighborhood structure that matters (the
  * true nearest blob wins under ADC too). */
class PQSpec extends SparkSpec {

  // 60 vectors in 8-d: three tight blobs
  private def blobs = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val centers = Seq(
      Seq.fill(8)(0.0), Seq.fill(8)(5.0),
      (0 until 8).map(i => if (i % 2 == 0) -5.0 else 5.0).toSeq)
    (0 until 60).map { i =>
      val c = centers(i % 3)
      (i.toLong, i % 3, c.map(_ + rnd.nextGaussian() * 0.2))
    }.toDF("vec_id", "blob", "v")
  }

  test("codes are deterministic and within the codebook range") {
    val model = PQ.fit(blobs, "v", "vec_id", m = 4, k = 4, iters = 3)
    val out = blobs.select(col("vec_id"), PQ.encode(col("v"), model).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(out.values.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 4)))
    val again = blobs.select(col("vec_id"), PQ.encode(col("v"), model).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(out == again)
  }

  test("ADC distance ranks the true nearest blob first") {
    val model = PQ.fit(blobs, "v", "vec_id", m = 4, k = 4, iters = 3)
    val coded = blobs.select(col("vec_id"), col("blob"),
      PQ.encode(col("v"), model).as("codes"))
    // a probe near blob 1's center must rank blob-1 members closest
    val q = Array.fill(8)(5.1)
    val nearest = coded
      .select(col("blob"), PQ.adcDistance(col("codes"), model, q).as("d"))
      .orderBy(col("d")).limit(10).collect().map(_.getInt(0))
    assert(nearest.forall(_ == 1))
  }

  test("fit rejects a dimension not divisible by m") {
    intercept[IllegalArgumentException] {
      PQ.fit(blobs, "v", "vec_id", m = 3, k = 4, iters = 1)
    }
  }

  test("adcLookup over a COLUMN table matches the adcDistance literal path") {
    import spark.implicits._
    val model = PQ.fit(blobs, "v", "vec_id", m = 4, k = 4, iters = 3)
    val coded = blobs.select(col("vec_id"), PQ.encode(col("v"), model).as("codes"))
    // two query vectors, their ADC tables carried as an array<double> column
    // of a (broadcast) query frame — the scalable IVF-PQ shape
    val qs = Seq(Array.fill(8)(5.1), Array.fill(8)(0.2))
    val frame = qs.zipWithIndex
      .map { case (q, i) => (i.toLong, PQ.adcTable(model, q).toSeq) }
      .toDF("query_id", "adc_table")
    val viaColumn = coded.crossJoin(broadcast(frame))
      .select(col("query_id"), col("vec_id"),
        PQ.adcLookup(col("codes"), col("adc_table"), model).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val viaLiteral = qs.zipWithIndex.flatMap { case (q, i) =>
      coded.select(col("vec_id"), PQ.adcDistance(col("codes"), model, q).as("d"))
        .collect().map(r => (i.toLong, r.getLong(0)) -> r.getDouble(1))
    }.toMap
    assert(viaColumn == viaLiteral)
  }

  test("adcLookup raises on a table whose size disagrees with m*k") {
    import spark.implicits._
    val model = PQ.fit(blobs, "v", "vec_id", m = 4, k = 4, iters = 1)
    val coded = blobs.select(col("vec_id"), PQ.encode(col("v"), model).as("codes"))
    val bad = Seq((0L, Seq.fill(12)(1.0))).toDF("query_id", "adc_table")
    val ex = intercept[Exception] {
      coded.crossJoin(broadcast(bad))
        .select(PQ.adcLookup(col("codes"), col("adc_table"), model).as("d"))
        .collect()
    }
    val messages = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(messages.contains("adc_table size"),
      s"expected the size guard to fire, got: $messages")
  }
}
