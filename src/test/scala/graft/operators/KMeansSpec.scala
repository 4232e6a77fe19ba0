package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Lloyd-iteration contract: recovers well-separated blobs, monotonically
  * reduces inertia, keeps empty clusters' previous centroids, and is
  * deterministic from its id-ordered seeding. */
class KMeansSpec extends SparkSpec {

  // three tight blobs in 4-d around (0,0,0,0), (10,10,10,10), (-10,10,-10,10)
  private def blobs = {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val centers = Seq(
      Seq(0.0, 0.0, 0.0, 0.0),
      Seq(10.0, 10.0, 10.0, 10.0),
      Seq(-10.0, 10.0, -10.0, 10.0))
    (0 until 90).map { i =>
      val c = centers(i % 3)
      (i.toLong, i % 3, c.map(_ + rnd.nextGaussian() * 0.3))
    }.toDF("vec_id", "blob", "v")
  }

  test("fit recovers well-separated blobs") {
    val cents = KMeans.fit(blobs, "v", "vec_id", k = 3, iters = 5)
    val assigned = blobs
      .withColumn("cluster", KMeans.nearestCentroid(col("v"), cents))
      .select("blob", "cluster").collect()
      .map(r => r.getInt(0) -> r.getInt(1))
    // every blob lands wholly in one cluster, and the 3 clusters differ
    val byBlob = assigned.groupBy(_._1).map { case (b, xs) =>
      b -> xs.map(_._2).distinct
    }
    assert(byBlob.values.forall(_.size == 1))
    assert(byBlob.values.flatten.toSet.size == 3)
  }

  test("inertia decreases from seeds to fitted centroids") {
    val seeds = blobs.orderBy(col("vec_id")).limit(3)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    val fitted = KMeans.fit(blobs, "v", "vec_id", k = 3, iters = 5)
    val before = KMeans.inertia(blobs, "v", seeds)
    val after  = KMeans.inertia(blobs, "v", fitted)
    assert(after < before)
    // 90 points in tight (sigma=0.3, 4-d) blobs: inertia ~ 90*4*0.09 = 32
    assert(after < 100.0)
  }

  test("an empty cluster keeps its previous centroid") {
    import spark.implicits._
    // k=3 over two far-apart points: one centroid can never win a point
    val two = Seq((0L, Seq(0.0, 0.0)), (1L, Seq(100.0, 100.0)),
      (2L, Seq(0.1, 0.1))).toDF("vec_id", "v")
    val cents = KMeans.fit(two, "v", "vec_id", k = 3, iters = 3)
    assert(cents.length == 3)
    assert(cents.forall(_.length == 2))
    assert(cents.forall(_.forall(x => !x.isNaN)))
  }

  test("fit is deterministic across runs") {
    val a = KMeans.fit(blobs, "v", "vec_id", k = 3, iters = 3)
    val b = KMeans.fit(blobs, "v", "vec_id", k = 3, iters = 3)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }
}
