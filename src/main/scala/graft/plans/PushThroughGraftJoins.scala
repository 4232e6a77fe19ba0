package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Predicate pushdown THROUGH the custom join nodes — the optimizer
  * integration a custom operator owes the rest of the planner: Catalyst's
  * `PushDownPredicates` stops at any `LogicalPlan` node it doesn't know,
  * so without this rule a probe-side filter written after
  * `AsOfJoin.backward(...)` / `RangeJoin.pointInInterval(...)` sits ABOVE
  * the join and the parquet scan reads every row group.
  *
  * Probe-side conjuncts always commute with both joins: each probe row is
  * processed independently (AsOfJoin is per-row left-outer lookup,
  * RangePointJoin expands each row to its matches), so dropping a probe
  * row before or after the join yields the same rows. Build-side and
  * mixed conjuncts stay above. Injected into the operator-optimization
  * batch (GraftExtensions), so it interleaves to fixed point with the
  * built-in rules: they carry the filter down through projects to the
  * join, this rule hops it over the join, and they carry it onward into
  * the scan's PushedFilters.
  */
object PushThroughGraftJoins extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, j: AsOfJoin) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic &&
          p.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
    case f @ Filter(cond, j: RangePointJoin) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic &&
          p.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Column pruning THROUGH the custom join nodes — the other half of the
  * optimizer blindness [[PushThroughGraftJoins]] fixes for predicates:
  * built-in `ColumnPruning` won't narrow the children of a node it
  * doesn't know, so `select(one_column)` after a custom join still scans
  * every probe column. When a parent Project needs fewer attributes than
  * a child provides, insert a Project on that child keeping only the
  * parent's references plus the join's own key/timestamp expressions;
  * the built-in rules then merge it downward until the parquet
  * ReadSchema narrows. Fires only when it strictly shrinks a child, so
  * the batch stays fixed-point-safe. */
object PruneThroughGraftJoins extends Rule[LogicalPlan] {

  private def prune(child: LogicalPlan, required: AttributeSet)
      : Option[LogicalPlan] = {
    val kept = child.output.filter(required.contains)
    if (kept.size < child.output.size) Some(Project(kept, child)) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case p @ Project(_, j: AsOfJoin) =>
      val required = AttributeSet(p.references ++
        j.probeKey.references ++ j.probeTs.references ++
        j.buildKey.references ++ j.buildTs.references)
      val newL = prune(j.left, required)
      val newR = prune(j.right, required)
      if (newL.isEmpty && newR.isEmpty) p
      else p.copy(child = j.copy(left = newL.getOrElse(j.left),
        right = newR.getOrElse(j.right)))
    case p @ Project(_, j: RangePointJoin) =>
      val required = AttributeSet(p.references ++
        j.point.references ++ j.lo.references ++ j.hi.references)
      val newL = prune(j.left, required)
      val newR = prune(j.right, required)
      if (newL.isEmpty && newR.isEmpty) p
      else p.copy(child = j.copy(left = newL.getOrElse(j.left),
        right = newR.getOrElse(j.right)))
  }
}
