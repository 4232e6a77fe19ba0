package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed PCA / whitening over `array<double>` embedding columns —
  * the dimensionality-reduction front end of an embedding store (project
  * to the top-k variance directions before ANN indexing; whiten before
  * cosine/L2 mixing). The reference has no linear-algebra surface; this is
  * extension territory like the IVF/PQ family it composes with.
  *
  * Scale shape: ONE pass over the data aggregates the exact sufficient
  * statistics [n, per-dim sums, upper-triangle second moments] as a single
  * `d(d+3)/2 + 1`-double buffer via a typed `Aggregator` — partial
  * aggregation runs map-side (each task folds its rows into one buffer;
  * only buffers cross the shuffle), so the driver receives one
  * O(d²)-sized array no matter the row count. The d×d eigensolve is
  * driver-side cyclic Jacobi (d is the embedding width — 64 here, rarely
  * beyond a few thousand; the DATA never moves). Projection is map-side:
  * k codegen'd `vec_dot`s against broadcast component literals.
  */
object PCA {

  /** Trained model: `mean` (d), `components` (k rows, each d — unit
    * eigenvectors of the covariance, eigenvalue-descending), ALL d
    * `eigenvalues` descending (so variance ratios don't depend on k). */
  final case class Model(mean: Array[Double],
      components: Array[Array[Double]], eigenvalues: Array[Double]) {
    def d: Int = mean.length
    def k: Int = components.length
    /** Fraction of total variance captured by the top `j` components. */
    def varianceRatio(j: Int): Double = {
      val tot = eigenvalues.sum
      if (tot <= 0) 0.0 else eigenvalues.take(j).sum / tot
    }
  }

  /** One-pass sufficient statistics. Buffer layout:
    * [count, sum_0..sum_{d-1}, xx_00, xx_01, .., xx_0{d-1}, xx_11, ..]
    * (row-major upper triangle of the raw second-moment matrix). reduce
    * and merge are both plain element-wise adds over a fixed-size array —
    * associative and commutative, so Spark's partial aggregation is exact
    * up to float summation order. */
  private final class GramAgg(d: Int)
      extends Aggregator[Seq[Double], Array[Double], Array[Double]] {
    override def zero: Array[Double] = new Array[Double](1 + d + d * (d + 1) / 2)
    override def reduce(b: Array[Double], x: Seq[Double]): Array[Double] = {
      require(x.length == d, s"expected dim $d, got ${x.length}")
      val xs = x.toArray
      b(0) += 1.0
      var i = 0
      var t = 1 + d
      while (i < d) {
        val xi = xs(i)
        b(1 + i) += xi
        var j = i
        while (j < d) { b(t) += xi * xs(j); t += 1; j += 1 }
        i += 1
      }
      b
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Double]): Array[Double] = r
    override def bufferEncoder: Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
  }

  /** Fit on `vecCol` (array<double>, constant width): one distributed
    * pass for the moments, then the driver-side eigensolve. Keeps the top
    * `k` components and all d eigenvalues. */
  def fit(vecs: DataFrame, vecCol: String, k: Int): Model = {
    val d = vecs.select(size(col(vecCol))).head().getInt(0)
    require(k >= 1 && k <= d, s"k=$k out of range for dim $d")
    val gram = udaf(new GramAgg(d), ExpressionEncoder[Seq[Double]]())
    val stats = vecs.select(gram(col(vecCol))).head().getSeq[Double](0).toArray
    val n = stats(0)
    require(n > 0, "PCA.fit on an empty frame")
    val mean = Array.tabulate(d)(i => stats(1 + i) / n)
    val cov = Array.ofDim[Double](d, d)
    var t = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = stats(t) / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        t += 1
        j += 1
      }
      i += 1
    }
    val (vals, vecsM) = jacobiEigSym(cov)
    Model(mean, vecsM.take(k), vals)
  }

  /** Map-side projection of `v` onto the model's components:
    * y_j = (v - mean) · c_j, computed as vec_dot(v, c_j) minus the
    * constant-folded mean offset. `whiten = true` scales component j by
    * 1/sqrt(lambda_j) so projected variances are ~1. Everything is
    * codegen'd scalar work against broadcast literals — no shuffle, no
    * UDF. */
  def project(v: Column, model: Model, whiten: Boolean = false): Column = {
    val comps = model.components
    array(comps.toSeq.zipWithIndex.map { case (c, j) =>
      val offset = c.zip(model.mean).map { case (a, b) => a * b }.sum
      val y = graft.functions.vec_dot(v, typedLit(c.toSeq)) - lit(offset)
      if (whiten) y / lit(math.sqrt(math.max(model.eigenvalues(j), 1e-12)))
      else y
    }: _*)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (textbook
    * two-sided rotations; deterministic: fixed sweep order, fixed
    * convergence threshold, sign normalized so each eigenvector's
    * largest-magnitude entry is positive). Returns (eigenvalues desc,
    * matching unit eigenvectors as rows). O(d³) per sweep on the DRIVER —
    * d is the embedding width, not the row count. */
  private[operators] def jacobiEigSym(
      aIn: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = aIn.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offDiag(): Double = {
      var s = 0.0
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) { s += a(p)(q) * a(p)(q); q += 1 }
        p += 1
      }
      s
    }
    val eps = 1e-22 * math.max(1.0, a.map(r => r.map(x => x * x).sum).sum)
    var sweep = 0
    while (sweep < 64 && offDiag() > eps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val tTan = math.signum(theta) match {
              case 0.0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
              case sg => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(tTan * tTan + 1.0)
            val s = tTan * c
            val app = a(p)(p)
            val aqq = a(q)(q)
            a(p)(p) = c * c * app - 2.0 * s * c * apq + s * s * aqq
            a(q)(q) = s * s * app + 2.0 * s * c * apq + c * c * aqq
            a(p)(q) = 0.0
            a(q)(p) = 0.0
            var r = 0
            while (r < d) {
              if (r != p && r != q) {
                val arp = a(r)(p)
                val arq = a(r)(q)
                a(r)(p) = c * arp - s * arq
                a(p)(r) = a(r)(p)
                a(r)(q) = s * arp + c * arq
                a(q)(r) = a(r)(q)
              }
              val vrp = v(r)(p)
              val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // columns of v are eigenvectors; sort by eigenvalue desc (stable:
    // ties keep original dimension order), normalize sign
    val order = (0 until d).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val rows = order.map { i =>
      val col = Array.tabulate(d)(r => v(r)(i))
      val m = col.indices.maxBy(r => math.abs(col(r)))
      if (col(m) < 0) col.map(x => -x) else col
    }.toArray
    (vals, rows)
  }
}
