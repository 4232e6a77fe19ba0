package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Literal, Size, StringSplit}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TokenCount

/** Optimizer rewrite: `size(split(s, " ", -1))` → [[TokenCount]].
  *
  * The left side — the whitespace token-count idiom behind word counts,
  * fertility denominators, and length features across the catalog —
  * regex-splits every row into an array of token UTF8Strings only to take
  * its length: O(tokens) allocations per row on the hot path of a corpus
  * scan. The rewrite computes the identical value with one allocation-free
  * byte scan (a 0x20 byte never occurs inside a UTF-8 multi-byte
  * sequence), and stays inside WholeStageCodegen.
  *
  * Deliberately narrow: it fires ONLY for the literal single-space
  * pattern with the default limit -1, where `count(' ') + 1` provably
  * equals the split length under Java regex semantics (leading/interior/
  * trailing empties are all kept with a negative limit). Any other
  * pattern, a non-literal pattern, or an explicit limit is left alone.
  * Registered via `SparkSessionExtensions.injectOptimizerRule`, so SQL
  * and Column-API users get it identically.
  */
object TokenCountRewrite extends Rule[LogicalPlan] {
  private val Space = UTF8String.fromString(" ")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(StringSplit(str, Literal(p: UTF8String, StringType),
          Literal(-1, _)), false) if p == Space =>
        TokenCount(str)
    }
}
