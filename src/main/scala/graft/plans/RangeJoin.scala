package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Interval-stabbing (range) join as a first-class operator — the §2.3
  * preference-ladder case (c): a whole-operator semantics Spark's built-ins
  * genuinely lack. A point-in-interval join with NO equi key is planned by
  * vanilla Spark as BroadcastNestedLoopJoin — every point row is tested
  * against every interval, O(points × intervals) (the reason Databricks
  * ships a dedicated range-join optimization). This operator broadcasts the
  * interval side SORTED by `lo` with a prefix-max over `hi`, and each point
  * row binary-searches the interval list and walks back only while the
  * prefix-max still admits a match — O(log m + hits) per row instead of
  * O(m).
  *
  * Contract: inner join, inclusive bounds (lo ≤ point ≤ hi); `point`, `lo`,
  * `hi` are DoubleType (the API layer casts); NULL point or NULL/NaN
  * interval endpoints never match. The interval side must be
  * collect-and-broadcast small — the same contract as Spark's own
  * BroadcastNestedLoopJoin, which this node replaces; at 100 TB the POINT
  * side is the unbounded one and stays fully distributed (one map pass,
  * zero shuffles).
  */
case class RangePointJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    point: Expression,
    lo: Expression,
    hi: Expression) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangePointJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[RangePointJoin]] as [[RangePointJoinExec]]; injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions). */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangePointJoin(l, r, p, lo, hi) =>
      RangePointJoinExec(planLater(l), planLater(r), p, lo, hi) :: Nil
    case _ => Nil
  }
}

case class RangePointJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    point: Expression,
    lo: Expression,
    hi: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // the point side streams in place (each row expands to its matches),
  // so its partitioning and per-partition order are preserved
  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering
      : Seq[org.apache.spark.sql.catalyst.expressions.SortOrder] =
    left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangePointJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    // Build the driver-side sorted interval index (small-side contract).
    val boundLo = BindReferences.bindReference(lo, right.output)
    val boundHi = BindReferences.bindReference(hi, right.output)
    val intervals = right.executeCollect().flatMap { r =>
      val l = boundLo.eval(r)
      val h = boundHi.eval(r)
      if (l == null || h == null) None
      else {
        val ld = l.asInstanceOf[Double]
        val hd = h.asInstanceOf[Double]
        if (ld.isNaN || hd.isNaN) None else Some((ld, hd, r.copy()))
      }
    }.sortBy(_._1)
    val los  = intervals.map(_._1)
    val his  = intervals.map(_._2)
    val rows = intervals.map(_._3)
    // prefix max of hi: the walk-back bound — once maxHi(j) < p no
    // interval at or before j can contain p
    val maxHi = new Array[Double](his.length)
    var m = Double.NegativeInfinity
    var i = 0
    while (i < his.length) { m = math.max(m, his(i)); maxHi(i) = m; i += 1 }
    val bc = sparkContext.broadcast((los, his, maxHi, rows))

    val boundPoint = BindReferences.bindReference(point, left.output)
    val outAttrs = output
    left.execute().mapPartitions { iter =>
      val (los, his, maxHi, rows) = bc.value
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      iter.flatMap { lrow =>
        val pv = boundPoint.eval(lrow)
        if (pv == null) Iterator.empty
        else {
          val p = pv.asInstanceOf[Double]
          // first index with lo > p; idx-1 is the last candidate
          var a = 0
          var b = los.length
          while (a < b) {
            val mid = (a + b) >>> 1
            if (los(mid) <= p) a = mid + 1 else b = mid
          }
          var j = a - 1
          val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
          while (j >= 0 && maxHi(j) >= p) {
            if (his(j) >= p) buf += proj(joined(lrow, rows(j))).copy()
            j -= 1
          }
          buf.reverseIterator // ascending lo order, deterministic
        }
      }
    }
  }
}
