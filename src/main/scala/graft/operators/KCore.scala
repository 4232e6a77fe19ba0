package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling, with a DRIVER-CHECKED
  * convergence loop (the same discipline as
  * [[Dedup.connectedComponents]]): each round drops nodes whose degree
  * within the surviving subgraph is < k, and the loop exits when a round
  * removes nobody — never on a fixed round count, which on a deep enough
  * peel cascade (a chain where each removal exposes the next) silently
  * returns a non-fixpoint superset of the core.
  *
  * Scale shape: each round is two semi-joins of the edge list against the
  * node-sized survivor set plus one degree agg — edge-list-sized work per
  * round. The survivor frame is localCheckpoint'ed every round because
  * both semi-join sides reference it (without materializing, the logical
  * plan doubles per round), and checkpointing makes the convergence count
  * a node-set-sized job. Convergence is checked by COUNT: survivor sets
  * shrink monotonically, so equal cardinality implies equal sets implies
  * fixpoint.
  */
object KCore {

  /** (u, core_degree) for every node of the k-core of `edges`
    * (symmetric directed edge list with columns u, v). */
  def core(edges: DataFrame, k: Int, maxIter: Int = 100): DataFrame = {
    var surv = edges.groupBy(col("u")).agg(count(lit(1)).as("d"))
      .filter(col("d") >= k)
      .localCheckpoint()
    var n       = surv.count()
    var changed = true
    var iter    = 0
    while (changed && iter < maxIter) {
      val next = edges
        .join(surv.select(col("u")), Seq("u"), "left_semi")
        .join(surv.select(col("u").as("v")), Seq("v"), "left_semi")
        .groupBy(col("u")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
        .localCheckpoint()
      val m = next.count()
      // monotone shrink: m == n implies the sets are equal, and then the
      // degrees just computed were taken WITHIN the final set — they are
      // the core degrees, so no extra pass is needed after the loop.
      changed = m != n
      surv = next
      n = m
      iter += 1
    }
    if (changed)
      System.err.println(
        s"[graft] KCore.core: NOT converged after $maxIter peels — " +
          "returned set is a superset of the true core; raise maxIter")
    surv.select(col("u"), col("d").as("core_degree"))
  }
}
