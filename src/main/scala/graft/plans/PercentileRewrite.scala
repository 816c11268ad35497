package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Serve plain `percentile(col, p)` aggregates from
  * [[org.apache.spark.sql.graft.PercentileExactExpr]] — the primitive-map
  * exact-percentile aggregate — and COALESCE every percentile of one column
  * into a single buffer.
  *
  * Spark's `Percentile` buffers boxed doubles in an `OpenHashMap[AnyRef,
  * Long]` and pays one independent map per aggregate expression; a query
  * asking `percentile(x, 0.5), percentile(x, 0.9)` builds, serializes and
  * merges two of them. The rewrite groups all plain percentiles by their
  * (canonicalized) child, replaces each group with ONE array-returning
  * aggregate plus per-output `GetArrayItem` projections — the SAME
  * AggregateExpression instance is shared across outputs so physical
  * planning deduplicates it to one buffer.
  *
  * Bit-identical results: PercentileExactExpr reproduces
  * `PercentileBase.getPercentile`'s arithmetic exactly (see its scaladoc;
  * PercentileExactSpec asserts bitwise equality on randomized inputs).
  * Narrow by design — only non-reverse, unfiltered, non-distinct,
  * frequency-1 percentiles of a DoubleType child with a foldable double
  * percentage in [0,1] rewrite; everything else (incl. the rollup route's
  * sketch-served percentile, which replaces the `Percentile` node before
  * this rule sees it in the rule list) is untouched.
  */
object PercentileRewrite extends Rule[LogicalPlan] {

  /** (child, percentage) of a rewritable percentile. */
  private def plain(p: Percentile): Option[(Expression, Double)] = {
    val freqIsOne = p.frequencyExpression match {
      case Literal(v, _) => v == 1L
      case _             => false
    }
    val pct = p.percentageExpression match {
      case Literal(d: Double, DoubleType) if d >= 0.0 && d <= 1.0 => Some(d)
      case _ => None
    }
    if (!p.reverse && freqIsOne && p.child.dataType == DoubleType &&
        p.child.resolved) pct.map(d => (p.child, d))
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    RewriteStats.counted("percentileRewrite", plan)(_.transformDown {
      case a: Aggregate if a.resolved =>
        // collect rewritable percentiles grouped by canonicalized child
        val pctsByChild =
          mutable.LinkedHashMap[Expression, mutable.LinkedHashSet[Double]]()
        val childFor = mutable.HashMap[Expression, Expression]()
        a.aggregateExpressions.foreach(_.foreach {
          case AggregateExpression(p: Percentile, _, false, None, _) =>
            plain(p).foreach { case (c, d) =>
              childFor.getOrElseUpdate(c.canonicalized, c)
              pctsByChild.getOrElseUpdate(c.canonicalized,
                mutable.LinkedHashSet[Double]()) += d
            }
          case _ =>
        })
        if (pctsByChild.isEmpty) a
        else {
          // ONE shared AggregateExpression instance per child group
          val aggFor: Map[Expression, (AggregateExpression, Seq[Double])] =
            pctsByChild.map { case (canon, ps) =>
              val seq = ps.toSeq
              val agg = org.apache.spark.sql.graft
                .PercentileExactExpr(childFor(canon), seq)
                .toAggregateExpression()
              canon -> ((agg, seq))
            }.toMap
          val newAggExprs = a.aggregateExpressions.map(_.transform {
            case ae @ AggregateExpression(p: Percentile, _, false, None, _)
                if plain(p).isDefined =>
              val (c, d) = plain(p).get
              val (agg, seq) = aggFor(c.canonicalized)
              GetArrayItem(agg, Literal(seq.indexOf(d)))
          }.asInstanceOf[NamedExpression])
          a.copy(aggregateExpressions = newAggExprs)
        }
    })
}
