package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

import graft.cube.{CubeCatalog, Interval, IntervalSet, TpchCube}

/** Derive partition-bucket predicates from time-dimension predicates on a
  * materialized cube scan.
  *
  * Spark-native analog of the reference's interval extraction + segment
  * pruning (`SparkIntervalConditionExtractor`, `DateTimeExtractor.scala:
  * 374-436`; `QueryIntervals.scala:40-132`): comparisons between the cube's
  * time column and literals intersect into an interval set; the interval
  * set becomes a range predicate on the cube's partition column
  * (months-since-epoch), which Catalyst partition-prunes at scan planning —
  * the same effect as Druid scanning only covered segments. A provably
  * empty interval set folds the scan to an empty `LocalRelation` (the
  * reference's "null scan", `ExprUtil.scala:156-183`).
  */
case class TimeBucketPruning(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (CubeCatalog.isEmpty) return plan
    if (!spark.conf.get("spark.graft.timeBucketPruning.enabled", "true").toBoolean)
      return plan
    RewriteStats.counted("timeBucketPruning", plan)(_.transformDown {
      case f @ Filter(cond, lr: LogicalRelation) =>
        CubeCatalog.cubeOfRelation(lr).map { cube =>
          val bucketCol = cube.info.timeBucketColumn
          val timeCol = cube.info.timeColumn
          val conjuncts = splitConjunctivePredicates(cond)
          val alreadyPruned =
            conjuncts.exists(_.references.exists(_.name.equalsIgnoreCase(bucketCol)))
          val bucketAttr = lr.output.find(_.name.equalsIgnoreCase(bucketCol))
          val timeAttr = lr.output.find(_.name.equalsIgnoreCase(timeCol))
          if (alreadyPruned || bucketAttr.isEmpty || timeAttr.isEmpty) f
          else {
            val ivs = intervalsOf(conjuncts, timeAttr.get)
            // intersect with the cube's covered interval (the reference's
            // QueryIntervals vs index intervals): a predicate range disjoint
            // from the DATA folds to the null scan even when the predicates
            // are mutually consistent
            val clamped = cube.info.timeIntervalMicros match {
              case Some((lo, hi)) => ivs.intersect(IntervalSet(Interval(lo, hi + 1)))
              case None           => ivs
            }
            if (clamped.isEmpty) LocalRelation(f.output)
            else if (ivs == IntervalSet.All) f // no time predicate to prune on
            else {
              // derive bucket predicates from the CLAMPED set: the data
              // interval both tightens loose bounds (t >= 1990 on a cube
              // starting 1995 prunes to 1995's bucket) and closes the open
              // side of one-sided predicates
              val preds = bucketPredicates(clamped, bucketAttr.get)
              if (preds.isEmpty) f
              else Filter((conjuncts ++ preds).reduce(And), lr)
            }
          }
        }.getOrElse(f)
    })
  }

  /** Intersect all time-column comparisons into an interval set (epoch
    * micros, half-open).
    */
  private def intervalsOf(conjuncts: Seq[Expression], timeAttr: Attribute)
      : IntervalSet = {
    def litMicros(l: Literal): Option[Long] = l.dataType match {
      case TimestampType | TimestampNTZType => Some(l.value.asInstanceOf[Long])
      case DateType => Some(l.value.asInstanceOf[Int].toLong * 86400000000L)
      case _        => None
    }
    // The time attribute, possibly cast between timestamp flavors (a
    // TIMESTAMP_NTZ parquet column compared to a TIMESTAMP literal arrives
    // as Cast(col) before UnwrapCastInBinaryComparison runs). With the
    // session in UTC the cast is an identity on the epoch value.
    def isTime(e: Expression): Boolean = e match {
      case a: Attribute => a.exprId == timeAttr.exprId
      case Cast(a: Attribute, TimestampType | TimestampNTZType, _, _) =>
        a.exprId == timeAttr.exprId
      case _ => false
    }
    conjuncts.foldLeft(IntervalSet.All) { (acc, c) =>
      val ivs = c match {
        case LessThan(t, l: Literal) if isTime(t)           => litMicros(l).map(IntervalSet.ofComparison("<", _))
        case LessThanOrEqual(t, l: Literal) if isTime(t)    => litMicros(l).map(IntervalSet.ofComparison("<=", _))
        case GreaterThan(t, l: Literal) if isTime(t)        => litMicros(l).map(IntervalSet.ofComparison(">", _))
        case GreaterThanOrEqual(t, l: Literal) if isTime(t) => litMicros(l).map(IntervalSet.ofComparison(">=", _))
        case EqualTo(t, l: Literal) if isTime(t)            => litMicros(l).map(IntervalSet.ofComparison("=", _))
        case LessThan(l: Literal, t) if isTime(t)           => litMicros(l).map(IntervalSet.ofComparison(">", _))
        case LessThanOrEqual(l: Literal, t) if isTime(t)    => litMicros(l).map(IntervalSet.ofComparison(">=", _))
        case GreaterThan(l: Literal, t) if isTime(t)        => litMicros(l).map(IntervalSet.ofComparison("<", _))
        case GreaterThanOrEqual(l: Literal, t) if isTime(t) => litMicros(l).map(IntervalSet.ofComparison("<=", _))
        case EqualTo(l: Literal, t) if isTime(t)            => litMicros(l).map(IntervalSet.ofComparison("=", _))
        case _                                              => None
      }
      ivs.map(acc.intersect).getOrElse(acc)
    }
  }

  /** Convert a bounded interval set to predicates on the bucket column. */
  private def bucketPredicates(ivs: IntervalSet, bucketAttr: Attribute)
      : Seq[Expression] = {
    val lo = ivs.min.filter(_ != Long.MinValue).map(TpchCube.bucketOfMicros)
    val hi = ivs.max.filter(_ != Long.MaxValue).map(us => TpchCube.bucketOfMicros(us - 1))
    (lo, hi) match {
      case (Some(l), Some(h)) if l == h =>
        Seq(EqualTo(bucketAttr, Literal(l)))
      case _ =>
        lo.map(l => GreaterThanOrEqual(bucketAttr, Literal(l))).toSeq ++
          hi.map(h => LessThanOrEqual(bucketAttr, Literal(h))).toSeq
    }
  }
}
