package graft.operators

import graft.SparkSpec

class PerceptronSpec extends SparkSpec {
  import Perceptron.EpochStat

  test("batch perceptron: epoch-1 update is the full label-weighted sum, " +
      "separable data converges and weights freeze") {
    import spark.implicits._
    // bias + one feature, linearly separable by sign of x1
    val feats = Seq(
      (1, 1L, 3L), (1, 1L, 2L), (-1, 1L, -2L), (-1, 1L, -3L))
      .toDF("y", "x0", "x1")
    val stats = Perceptron.fit(feats, Seq("x0", "x1"), "y", epochs = 3)
    // epoch 1: zero weights => margin 0 everywhere, every row updates:
    // w = sum(y*x) = (1+1-1-1, 3+2+2+3) = (0, 10)
    assert(stats(0) == EpochStat(1, Seq(0L, 10L), mistakes = 4, n = 4))
    // epochs 2,3: all margins strictly positive => no mistakes, w frozen
    assert(stats(1) == EpochStat(2, Seq(0L, 10L), mistakes = 0, n = 4))
    assert(stats(2) == EpochStat(3, Seq(0L, 10L), mistakes = 0, n = 4))
  }

  test("boundary rows (margin exactly 0) count as mistakes and keep updating") {
    import spark.implicits._
    // single row with x orthogonal to any learned w in the x0 direction:
    // y=+1, x=(0, 1): epoch1 w=(0,1); margin=1 > 0 afterwards.
    // Add y=-1, x=(1, 0): epoch1 w=(-1, 1); then margins: +1*(1)=1 ok,
    // -1*(-1)=1 ok => converged with both updates applied once.
    val feats = Seq((1, 0L, 1L), (-1, 1L, 0L)).toDF("y", "x0", "x1")
    val stats = Perceptron.fit(feats, Seq("x0", "x1"), "y", epochs = 2)
    assert(stats(0) == EpochStat(1, Seq(-1L, 1L), mistakes = 2, n = 2))
    assert(stats(1) == EpochStat(2, Seq(-1L, 1L), mistakes = 0, n = 2))
  }
}
