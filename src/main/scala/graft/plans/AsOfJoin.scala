package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of (backward temporal) join as a first-class operator — the second
  * §2.3 preference-ladder case (c) after [[RangePointJoin]]: for each probe
  * row, the single build row with the same key and the GREATEST timestamp
  * ≤ the probe's (optionally within `toleranceSecs`). Spark's built-ins
  * cannot express this join shape directly: the composed plan (q65) is a
  * max-over-preceding-window, which shuffles and sorts the PROBE side per
  * key; pandas-on-Spark's merge_asof plans a union + repartition + window
  * over both sides. DuckDB/QuestDB/kdb ship it natively — this node does
  * the Spark-native equivalent.
  *
  * Physical shape: the build side (the small, dimension-like stream —
  * quotes, clicks, config snapshots) is collected and broadcast as per-key
  * ts-sorted arrays; each probe row hash-looks-up its key and binary
  * searches — O(log m) per row, the probe side never shuffles and never
  * sorts (the 100 TB side). LEFT OUTER semantics: a probe row with no
  * in-tolerance match emits null build columns, so the node's output marks
  * the build attributes nullable.
  *
  * Contract: `probeTs`/`buildTs` are DoubleType (the API layer casts —
  * timestamps arrive as epoch seconds; micro precision survives a double
  * until far beyond any real epoch), keys are LongType, inclusive match
  * (buildTs ≤ probeTs), NULL key or ts never matches. Build rows with
  * identical (key, ts) are reduced to the LAST collected one — callers
  * that care dedupe upstream (the q173 query distincts its build side).
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    probeKey: Expression,
    probeTs: Expression,
    buildKey: Expression,
    buildTs: Expression,
    toleranceSecs: Option[Double]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]; injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, pk, pt, bk, bt, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), pk, pt, bk, bt, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    probeKey: Expression,
    probeTs: Expression,
    buildKey: Expression,
    buildTs: Expression,
    toleranceSecs: Option[Double]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // one probe row in, one joined row out, in place: the probe side's
  // partitioning and per-partition order survive, so downstream stages
  // keyed the same way need no new exchange
  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering
      : Seq[org.apache.spark.sql.catalyst.expressions.SortOrder] =
    left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val boundBk = BindReferences.bindReference(buildKey, right.output)
    val boundBt = BindReferences.bindReference(buildTs, right.output)
    // Driver-side build index: key -> (sorted ts array, parallel row array).
    // Same (key, ts) collapses to the last row collected (contract above).
    val grouped = right.executeCollect().flatMap { r =>
      val k = boundBk.eval(r)
      val t = boundBt.eval(r)
      if (k == null || t == null) None
      else {
        val td = t.asInstanceOf[Double]
        if (td.isNaN) None
        else Some((k.asInstanceOf[Long], td, r.copy()))
      }
    }.groupBy(_._1).map { case (k, rows) =>
      val dedup = rows.groupBy(_._2).map(_._2.last).toArray.sortBy(_._2)
      k -> (dedup.map(_._2), dedup.map(_._3))
    }
    val bc = sparkContext.broadcast(grouped)

    val boundPk = BindReferences.bindReference(probeKey, left.output)
    val boundPt = BindReferences.bindReference(probeTs, left.output)
    val nRightCols = right.output.size
    val tol = toleranceSecs
    val outAttrs = output
    left.execute().mapPartitions { iter =>
      val index = bc.value
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight: InternalRow = new GenericInternalRow(nRightCols)
      iter.map { lrow =>
        val kv = boundPk.eval(lrow)
        val tv = boundPt.eval(lrow)
        var matched: InternalRow = null
        if (kv != null && tv != null) {
          val p = tv.asInstanceOf[Double]
          index.get(kv.asInstanceOf[Long]).foreach { case (tss, rows) =>
            // greatest index with ts <= p
            var a = 0
            var b = tss.length
            while (a < b) {
              val mid = (a + b) >>> 1
              if (tss(mid) <= p) a = mid + 1 else b = mid
            }
            val j = a - 1
            if (j >= 0 && tol.forall(d => p - tss(j) <= d))
              matched = rows(j)
          }
        }
        proj(joined(lrow, if (matched == null) nullRight else matched))
      }
    }
  }
}
