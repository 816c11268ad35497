package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Rewrite `sum(literal)` in a *grouped* aggregate to `count(1) * literal`.
  *
  * Semantics of the reference rule (`DruidLogicalOptimizer.scala:245-302`):
  * a literal sum blocks pushdown of the whole aggregate (an OLAP index has
  * no "sum of a constant" aggregator) while `count` is always available;
  * the rewrite also lets a pre-aggregated rollup serve the query (`count`
  * merges as `sum(count)`, a literal sum does not). Restricted to grouped
  * aggregates: every group has >= 1 row there, so `sum(lit) = count * lit`
  * holds; a global aggregate over zero rows yields NULL for sum but 0 for
  * count, where the rewrite would be wrong.
  */
object SumOfLiteralRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    RewriteStats.counted("sumOfLiteralRewrite", plan)(_.transformDown {
    case agg @ Aggregate(gs, _, _, _) if gs.nonEmpty =>
      agg.transformExpressionsDown {
        case ae @ AggregateExpression(s: Sum, _, false, None, _) =>
          s.child match {
            case l: Literal if l.value != null =>
              val cnt = ae.copy(aggregateFunction = Count(Literal(1)))
              val resultType = s.dataType
              Cast(Multiply(Cast(cnt, resultType), Cast(l, resultType)), resultType)
            case _ => ae
          }
      }
    })
}
