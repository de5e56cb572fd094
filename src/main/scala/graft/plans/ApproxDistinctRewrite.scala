package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Demonstrative optimizer extension (SURVEY.md §4.3 item 4): behind the
  * session flag `spark.graft.approxCountDistinct=true`, rewrite exact
  * `count(DISTINCT x)` into HyperLogLog++ — trading exactness for the
  * removal of the distinct's extra shuffle/expand, the standard
  * dashboard-query tradeoff at 100 TB.
  *
  * Deliberately narrow: single-argument, un-filtered COUNT DISTINCT
  * only; grouping keys, multi-arg distincts, and FILTER clauses pass
  * through untouched. Off by default — never on the correctness path
  * (the driver's oracle gate runs with the flag unset).
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.approxCountDistinct", "false").toBoolean) plan
    else plan.transformAllExpressions {
      case ae @ AggregateExpression(Count(Seq(child)), _, true, None, _) =>
        ae.copy(aggregateFunction = HyperLogLogPlusPlus(child), isDistinct = false)
    }
}
