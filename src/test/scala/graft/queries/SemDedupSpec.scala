package graft.queries

import graft.SparkSpec

/** SemDeDup (q90) contract: multi-assignment candidate generation can only
  * ADD pairs over single assignment (every single-assignment pair shares
  * the primary cell, which multi-assignment also keys), and since both are
  * exact-verified at the same threshold, the pair set — hence dedup recall
  * — dominates. Also pins the q32/q38 shuffle discipline: vectors never
  * enter the cell self-join. */
class SemDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def pairs(assign: Int): Set[(Long, Long)] =
    DedupQueries.semDedupPairs(spark, dir, threshold = 0.4, assign = assign)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("2-cell assignment finds a superset of the single-assignment pairs") {
    val single = pairs(1)
    val multi  = pairs(2)
    assert(single.subsetOf(multi),
      s"missing from multi: ${(single -- multi).take(5)}")
    assert(multi.size > single.size,
      "boundary pairs should make dominance strict on this corpus")
  }

  test("the cell self-join carries (vec_id, cell) only, never vectors") {
    val plan = DedupQueries.semDedupPairs(spark, dir, threshold = 0.4)
      .queryExecution.optimizedPlan
    val joinsWithVecs = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.exists(_.references.exists(_.name == "cell")) => j
    }.filter(_.children.exists(_.output.exists(_.name == "v")))
    assert(joinsWithVecs.isEmpty,
      "a cell-keyed join side exposes the raw vector column")
  }
}
