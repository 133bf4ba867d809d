package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in approximation mode — a Catalyst optimizer rule (injected by
  * [[graft.GraftExtensions]]) that rewrites exact single-column
  * `count(DISTINCT x)` into HyperLogLog++ when the session sets
  *
  * {{{ spark.conf.set("spark.graft.approx.distinct", "true") }}}
  *
  * Why a rule, not a code change: at 100 TB the exact distinct's
  * Expand+double-aggregate is often the dominant shuffle, and the switch
  * belongs to the RUNNER of a query (dev sampling run vs production
  * exactness), not its AUTHOR. The rewrite happens after analysis, so any
  * query — SQL, DataFrame, or a `SparkEntry.queries` entry — flips to the
  * sketch without source changes. Off by default; the DuckDB-oracle
  * correctness path never enables it.
  *
  * Scope guard: only single-argument COUNT(DISTINCT x) with no filter
  * clause is rewritten — multi-column distinct tuples and filtered
  * aggregates keep exact semantics.
  */
case class ApproxDistinctRewrite() extends Rule[LogicalPlan] {

  private val Flag = "spark.graft.approx.distinct"
  private val SdFlag = "spark.graft.approx.distinct.relativeSD"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(Flag, "false").toBoolean) plan
    else {
      val sd = conf.getConfString(SdFlag, "0.05").toDouble
      plan.transformAllExpressions {
        case ae @ AggregateExpression(Count(Seq(child)), mode, true, None, _) =>
          AggregateExpression(
            HyperLogLogPlusPlus(child, relativeSD = sd),
            mode, isDistinct = false, filter = None, ae.resultId)
      }
    }
  }
}
