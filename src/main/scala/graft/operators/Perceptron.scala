package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed batch perceptron (Rosenblatt 1958) over INTEGER features —
  * the trained-classifier member of the model family (KMeans, PQ, PCA, BPE),
  * shaped like a quality/language gate a training-data pipeline trains on
  * corpus-derived counts.
  *
  * Batch rule with unit learning rate: per epoch, every row misclassified
  * under the current weights (y·(w·x) <= 0) contributes y·x to the update.
  * With integer features and integer init the weights stay EXACT BIGINTs,
  * so — unlike float gradient descent, whose accumulation order diverges
  * between engines — every epoch is bit-reproducible and the whole training
  * run can be verified against a SQL oracle with the epochs unrolled.
  *
  * Scale shape (100 TB): the caller materializes the feature frame once
  * (corpus scan #1 and only); each epoch is then ONE map-side partial-agg'd
  * integer aggregate over the tiny numeric frame — d+2 longs cross the
  * wire per partition, d+2 longs reach the driver (the model-sized collect,
  * like KMeans' k×d). Epochs are a driver loop over broadcast-able scalars;
  * nothing corpus-sized ever shuffles.
  */
object Perceptron {

  /** Weights AFTER the epoch's update; mistakes counted under the weights
    * the epoch STARTED with. */
  final case class EpochStat(epoch: Int, w: Seq[Long], mistakes: Long, n: Long)

  /** @param features one row per example; `xCols` integer-typed feature
    *                 columns (include a constant 1 column for the bias),
    *                 `yCol` a +1/-1 integer label. Should be persisted or
    *                 localCheckpoint'ed by the caller — it is scanned once
    *                 per epoch. */
  def fit(features: DataFrame, xCols: Seq[String], yCol: String,
      epochs: Int): Seq[EpochStat] = {
    val d = xCols.size
    var w = Vector.fill(d)(0L)
    (1 to epochs).map { ep =>
      val margin = xCols.zip(w)
        .map { case (c, wi) => col(c) * lit(wi) }
        .reduce(_ + _) * col(yCol)
      val mis = margin <= 0
      val aggs =
        xCols.map(c => sum(when(mis, col(yCol) * col(c)).otherwise(0L))) ++
          Seq(count(when(mis, lit(1))), count(lit(1)))
      val row = features.agg(aggs.head, aggs.tail: _*).head()
      w = Vector.tabulate(d)(i => w(i) + row.getLong(i))
      EpochStat(ep, w, row.getLong(d), row.getLong(d + 1))
    }
  }
}
