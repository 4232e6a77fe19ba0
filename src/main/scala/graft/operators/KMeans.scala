package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed Lloyd iterations over `array<double>` embedding columns —
  * the trained coarse quantizer the IVF index wants (q44's per-label cells
  * document themselves as a stand-in for exactly this).
  *
  * Scale shape per iteration: assignment is map-side (every vector scored
  * against k BROADCAST centroids with the codegen'd vec_dot kernel — the
  * |v|² term is dropped since it's constant per row), and the centroid
  * update is one partial+final hash aggregation over (cluster, dimension).
  * Only k×d aggregated doubles ever reach the driver per iteration — the
  * model, never the data. Seeding is deterministic (the k lowest-id
  * vectors), so runs are reproducible across cluster sizes; empty clusters
  * keep their previous centroid.
  */
object KMeans {

  /** Map-side nearest-centroid id for `v` (0-based index into
    * `centroids`). Ties break to the lowest index via the struct ordering. */
  def nearestCentroid(v: Column, centroids: Array[Array[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      // argmin of |v - c|² == argmin of (|c|² - 2·v·c); |v|² is row-constant
      val d = lit(c.map(x => x * x).sum) -
        lit(2.0) * graft.functions.vec_dot(v, typedLit(c.toSeq))
      struct(d.as("d"), lit(i).as("i"))
    }
    array_min(array(scored.toSeq: _*)).getField("i")
  }

  /** `iters` Lloyd rounds from deterministic seeds (k lowest-`idCol`
    * vectors). Returns the k centroids; pair with [[nearestCentroid]] to
    * assign. */
  def fit(vecs: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int): Array[Array[Double]] = {
    var centroids = vecs.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Double](0).toArray)
    val cached = vecs.select(col(vecCol).as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      (0 until iters).foreach { _ =>
        val updated = cached
          .withColumn("cluster", nearestCentroid(col("v"), centroids))
          .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy(col("cluster"), col("pos"))
          .agg(avg(col("x")).as("c"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (cl, rows) =>
            val dim = new Array[Double](rows.length)
            rows.foreach(r => dim(r.getInt(1)) = r.getDouble(2))
            cl -> dim
          }
        centroids = centroids.indices.map(i =>
          updated.getOrElse(i, centroids(i))).toArray
      }
      centroids
    } finally cached.unpersist()
  }

  /** Within-cluster sum of squared distances under an assignment — the
    * quantity Lloyd iterations minimize; exposed so quality is measurable
    * in-engine (specs assert it decreases). */
  def inertia(vecs: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): Double = {
    val v = col(vecCol)
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val d = lit(c.map(x => x * x).sum) -
        lit(2.0) * graft.functions.vec_dot(v, typedLit(c.toSeq))
      struct(d.as("d"), lit(i).as("i"))
    }
    vecs.select(
        (array_min(array(scored.toSeq: _*)).getField("d") +
          graft.functions.vec_dot(v, v)).as("d2"))
      .agg(sum(col("d2"))).head().getDouble(0)
  }
}
