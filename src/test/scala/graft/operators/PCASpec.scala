package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PCA: the one-pass moment aggregate, the driver-side Jacobi eigensolve,
  * and the map-side projection — checked against planted structure, not
  * against itself. */
class PCASpec extends SparkSpec {

  private def cosAbs(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    math.abs(dot) / (na * nb)
  }

  /** Deterministic anisotropic cloud in 8 dims: variance ~25 along e0,
    * ~4 along e3, ~0.01 everywhere else, mean shifted off the origin.
    * Pseudo-randomness from a hand-rolled LCG so the fixture is fixed. */
  private def planted(n: Int): Seq[(Long, Seq[Double])] = {
    var state = 12345L
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      // top 53 bits -> [0, 1) -> roughly N(0,1) by 12-sum CLT
      (0 until 12).map { _ =>
        state = state * 6364136223846793005L + 1442695040888963407L
        (state >>> 11).toDouble / (1L << 53).toDouble
      }.sum - 6.0
    }
    (0 until n).map { i =>
      val g0 = next() * 5.0
      val g3 = next() * 2.0
      val noise = Array.fill(8)(next() * 0.1)
      val x = noise.clone()
      x(0) += g0 + 3.0 // mean offset on dim 0
      x(3) += g3 - 1.0 // mean offset on dim 3
      (i.toLong, x.toSeq)
    }
  }

  test("jacobi solves a hand-built symmetric matrix") {
    // eigenvalues of [[2,1],[1,2]] are 3 and 1, vectors (1,1)/sqrt2 and
    // (1,-1)/sqrt2
    val (vals, vecs) = PCA.jacobiEigSym(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    assert(cosAbs(vecs(0), Array(1.0, 1.0)) > 1 - 1e-12)
    assert(cosAbs(vecs(1), Array(1.0, -1.0)) > 1 - 1e-12)
  }

  test("fit recovers planted axes, eigenvalues descend, ratios sum to 1") {
    import spark.implicits._
    val df = planted(2000).toDF("vec_id", "v")
    val m = PCA.fit(df, "v", k = 4)
    val e0 = Array(1.0, 0, 0, 0, 0, 0, 0, 0)
    val e3 = Array(0.0, 0, 0, 1.0, 0, 0, 0, 0)
    assert(cosAbs(m.components(0), e0) > 0.99, "top component ~ e0")
    assert(cosAbs(m.components(1), e3) > 0.99, "second component ~ e3")
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-9))
    assert(math.abs(m.varianceRatio(8) - 1.0) < 1e-9)
    // planted variances dominate: two components carry almost everything
    assert(m.varianceRatio(2) > 0.99)
    // the mean is recovered too (dims 0 and 3 offset, others ~0)
    assert(math.abs(m.mean(0) - 3.0) < 0.3 && math.abs(m.mean(3) + 1.0) < 0.3)
  }

  test("moment aggregate is partition-invariant (partial agg is exact)") {
    import spark.implicits._
    val rows = planted(500)
    val one = PCA.fit(rows.toDF("vec_id", "v").coalesce(1), "v", k = 3)
    val many = PCA.fit(rows.toDF("vec_id", "v").repartition(7), "v", k = 3)
    one.eigenvalues.zip(many.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-8)
    }
    one.components.zip(many.components).foreach { case (a, b) =>
      assert(cosAbs(a, b) > 1 - 1e-8)
    }
  }

  test("projection variance matches eigenvalues; whitening normalizes it") {
    import spark.implicits._
    val df = planted(2000).toDF("vec_id", "v")
    val m = PCA.fit(df, "v", k = 3)
    def variances(whiten: Boolean): Array[Double] = {
      val p = df.select(PCA.project(col("v"), m, whiten).as("y"))
      (0 until 3).map { j =>
        val c = col("y").getItem(j)
        p.agg((avg(c * c) - avg(c) * avg(c)).as("var")).head().getDouble(0)
      }.toArray
    }
    val raw = variances(whiten = false)
    raw.zip(m.eigenvalues.take(3)).foreach { case (got, lam) =>
      assert(math.abs(got - lam) < 1e-6 * math.max(1.0, lam),
        s"projected variance $got vs eigenvalue $lam")
    }
    val white = variances(whiten = true)
    white.foreach(v => assert(math.abs(v - 1.0) < 1e-6))
  }

  test("projection plan is map-side only — no exchange, no udf") {
    import spark.implicits._
    val df = planted(64).toDF("vec_id", "v")
    val m = PCA.fit(df, "v", k = 2)
    val plan = df.select(PCA.project(col("v"), m).as("y"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "projection must not shuffle")
    assert(!plan.toLowerCase.contains("batchevalpython"))
  }
}
