package graft.queries

import graft.SparkSpec

/** Physical-plan hygiene gate for every BENCH HEADLINER: the scale red
  * flags PlanAudit reports interactively, pinned as a test so a regression
  * (a join degrading to a cartesian/nested-loop, or a new headliner
  * shipping one) fails CI instead of surfacing in a 100x-scale run.
  *
  * Plans are built at sf0.001 — plan SHAPE is scale-independent here
  * because every headliner's strategy is forced by the query itself
  * (explicit broadcast()/localCheckpoint, equi-join keys), not by size
  * estimates that could flip between sf0.001 and production.
  */
class BenchPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Documented broadcast-nested-loop allowances — every entry is a
    * crossJoin against a broadcast SCALAR/tiny frame (a 1-row grand total
    * or a collected query/benchmark set), which is the one shape where a
    * nested loop is the right plan at any scale. Counts are exact: a new
    * BNLJ sneaking into these queries still fails. */
  private val allowedBnlj = Map(
    "q98_pmi_cooccur" -> 2, // 1-row n_bi and n_uni grand-total frames
    "q121_embed_decontaminate" -> 1, // 1-row collected benchmark array
    "q40_knn_bruteforce" -> 1) // broadcast query set (bounded baseline)

  test("no bench headliner plans a cartesian product or nested-loop join") {
    val offenders = Catalog.all.filter(_.bench).flatMap { q =>
      val plan = q.fn(spark, dir).queryExecution.executedPlan.toString
      val cart = "CartesianProduct".r.findAllIn(plan).length
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
      if (cart > 0 || bnlj != allowedBnlj.getOrElse(q.name, 0))
        Some(s"${q.name} (cartesian=$cart, bnlj=$bnlj, " +
          s"allowed=${allowedBnlj.getOrElse(q.name, 0)})")
      else None
    }
    assert(offenders.isEmpty, s"scale red flags in bench plans: $offenders")
  }
}
