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
            val ivs = intervalsOf(conjuncts, timeAttr.get, cube.info, lr.output)
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
              val preds = bucketPredicates(clamped, bucketAttr.get,
                cube.info.timeIntervalMicros)
              if (preds.isEmpty) f
              else Filter((conjuncts ++ preds).reduce(And), lr)
            }
          }
        }.getOrElse(f)
    })
  }

  /** Intersect all time-column comparisons into an interval set (epoch
    * micros, half-open) — plus the intervals IMPLIED by comparisons on
    * declared-and-measured time-correlated columns: with the build-time
    * proof that `time - c ∈ [lagMin, lagMax]` for every row (and that the
    * time column has no NULLs), `c ≥ L` implies `time ≥ L + lagMin` and
    * `c ≤ U` implies `time ≤ U + lagMax`. The original predicate stays in
    * the plan; the implied bound only prunes buckets — so a TPC-H Q5-shape
    * `o_orderdate` slice prunes the `l_shipdate`-partitioned cube
    * (zone-map-style correlation pruning; Druid has no analog).
    */
  private def intervalsOf(conjuncts: Seq[Expression], timeAttr: Attribute,
                          info: graft.cube.CubeInfo, output: Seq[Attribute])
      : IntervalSet = {
    def litMicros(l: Literal): Option[Long] = l.dataType match {
      case TimestampType | TimestampNTZType => Some(l.value.asInstanceOf[Long])
      case DateType => Some(l.value.asInstanceOf[Int].toLong * 86400000000L)
      case _        => None
    }
    // The time attribute, possibly cast between timestamp flavors (a
    // TIMESTAMP_NTZ parquet column compared to a TIMESTAMP literal arrives
    // as Cast(col) before UnwrapCastInBinaryComparison runs). ONLY in a
    // UTC session is that cast an identity on the epoch value — under any
    // other zone it shifts the instant, so the unwrap is gated and only
    // bare-attribute comparisons extract (still instant-correct).
    val tzServable = graft.Graft.sessionIsUtc(spark)
    def isTime(e: Expression): Boolean = e match {
      case a: Attribute => a.exprId == timeAttr.exprId
      case Cast(a: Attribute, TimestampType | TimestampNTZType, _, _) =>
        tzServable && a.exprId == timeAttr.exprId
      case _ => false
    }
    // exprId -> measured (lagMin, lagMax) of the correlated columns; the
    // implication needs the zero-NULL-time proof
    val lagOf: Map[ExprId, (Long, Long)] =
      if (!info.timeNullFree) Map.empty
      else output.flatMap(a =>
        info.timeLagBounds.get(a.name).orElse(
          info.timeLagBounds.get(a.name.toLowerCase)).map(a.exprId -> _)).toMap
    // NOTE: only timestamp-flavor casts unwrap (epoch identity under the
    // UTC session). Cast-to-DATE truncates, so `CAST(c AS DATE) <= D`
    // admits c up to D 23:59:59 — deriving a bound from the cast value
    // would be unsound for upper bounds.
    def lagged(e: Expression): Option[(Long, Long)] = e match {
      case a: Attribute => lagOf.get(a.exprId)
      case Cast(a: Attribute, TimestampType | TimestampNTZType, _, _)
          if tzServable =>
        lagOf.get(a.exprId)
      case _ => None
    }
    // saturating add: date literals near the Long range must not wrap
    def plus(a: Long, b: Long): Long =
      try Math.addExact(a, b) catch {
        case _: ArithmeticException => if (a > 0) Long.MaxValue else Long.MinValue
      }
    def implied(op: String, us: Long, lag: (Long, Long)): IntervalSet =
      op match {
        case ">=" => IntervalSet.ofComparison(">=", plus(us, lag._1))
        case ">"  => IntervalSet.ofComparison(">", plus(us, lag._1))
        case "<=" => IntervalSet.ofComparison("<=", plus(us, lag._2))
        case "<"  => IntervalSet.ofComparison("<", plus(us, lag._2))
        case "=" => IntervalSet.ofComparison(">=", plus(us, lag._1))
          .intersect(IntervalSet.ofComparison("<=", plus(us, lag._2)))
      }
    // one comparison -> interval set (time-column comparisons directly,
    // correlated-column comparisons through the measured lag implication)
    def cmpIvs(c: Expression): Option[IntervalSet] = c match {
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
      // implied bounds from correlated columns (literal on either side)
      case LessThan(e, l: Literal)           => for { lg <- lagged(e); us <- litMicros(l) } yield implied("<", us, lg)
      case LessThanOrEqual(e, l: Literal)    => for { lg <- lagged(e); us <- litMicros(l) } yield implied("<=", us, lg)
      case GreaterThan(e, l: Literal)        => for { lg <- lagged(e); us <- litMicros(l) } yield implied(">", us, lg)
      case GreaterThanOrEqual(e, l: Literal) => for { lg <- lagged(e); us <- litMicros(l) } yield implied(">=", us, lg)
      case EqualTo(e, l: Literal)            => for { lg <- lagged(e); us <- litMicros(l) } yield implied("=", us, lg)
      case LessThan(l: Literal, e)           => for { lg <- lagged(e); us <- litMicros(l) } yield implied(">", us, lg)
      case LessThanOrEqual(l: Literal, e)    => for { lg <- lagged(e); us <- litMicros(l) } yield implied(">=", us, lg)
      case GreaterThan(l: Literal, e)        => for { lg <- lagged(e); us <- litMicros(l) } yield implied("<", us, lg)
      case GreaterThanOrEqual(l: Literal, e) => for { lg <- lagged(e); us <- litMicros(l) } yield implied("<=", us, lg)
      case EqualTo(l: Literal, e)            => for { lg <- lagged(e); us <- litMicros(l) } yield implied("=", us, lg)
      case _                                 => None
    }
    // boolean trees over translatable comparisons: Druid's `intervals` is a
    // LIST — `t < a OR t >= b` selects two segment ranges, so OR maps to
    // interval union (every operand must translate, else the whole tree is
    // untranslatable and contributes nothing)
    def treeIvs(c: Expression): Option[IntervalSet] = c match {
      case Or(l, r)  => for { a <- treeIvs(l); b <- treeIvs(r) } yield a.union(b)
      // an AND with one untranslatable side soundly uses the other: dropping
      // a conjunct only WIDENS the branch's interval (over-covering is fine)
      case And(l, r) => (treeIvs(l), treeIvs(r)) match {
        case (Some(a), Some(b)) => Some(a.intersect(b))
        case (one, other)       => one.orElse(other)
      }
      case other     => cmpIvs(other)
    }
    conjuncts.foldLeft(IntervalSet.All) { (acc, c) =>
      treeIvs(c).map(acc.intersect).getOrElse(acc)
    }
  }

  /** Convert a bounded interval set to predicates on the bucket column.
    * Bounds that do not narrow below the data's own bucket coverage are
    * dropped — they would prune nothing and only add plan noise (implied
    * correlation bounds are often vacuous when the measured lag is wide).
    * A MULTI-interval set (disjunctive time predicates — Druid's interval
    * LIST) emits an OR of per-interval bucket ranges so the gap between
    * ranges prunes too; the caller clamps against the data interval first,
    * so every member interval is finite.
    */
  private def bucketPredicates(ivs: IntervalSet, bucketAttr: Attribute,
                               dataInterval: Option[(Long, Long)])
      : Seq[Expression] = {
    def rangeOf(startUs: Long, endUs: Long): Expression = {
      val l = TpchCube.bucketOfMicros(startUs)
      val h = TpchCube.bucketOfMicros(endUs - 1)
      if (l == h) EqualTo(bucketAttr, Literal(l))
      else And(GreaterThanOrEqual(bucketAttr, Literal(l)),
        LessThanOrEqual(bucketAttr, Literal(h)))
    }
    if (ivs.intervals.size >= 2 && ivs.intervals.size <= 16 &&
        ivs.min.exists(_ != Long.MinValue) && ivs.max.exists(_ != Long.MaxValue))
      return Seq(ivs.intervals.map(iv => rangeOf(iv.startUs, iv.endUs))
        .reduceLeft[Expression](Or(_, _)))
    val lo = ivs.min.filter(_ != Long.MinValue).map(TpchCube.bucketOfMicros)
    val hi = ivs.max.filter(_ != Long.MaxValue).map(us => TpchCube.bucketOfMicros(us - 1))
    val dataLo = dataInterval.map(d => TpchCube.bucketOfMicros(d._1))
    val dataHi = dataInterval.map(d => TpchCube.bucketOfMicros(d._2))
    val loN = lo.filter(l => !dataLo.exists(l <= _))
    val hiN = hi.filter(h => !dataHi.exists(h >= _))
    (loN, hiN) match {
      case (Some(l), Some(h)) if l == h =>
        Seq(EqualTo(bucketAttr, Literal(l)))
      case _ =>
        loN.map(l => GreaterThanOrEqual(bucketAttr, Literal(l))).toSeq ++
          hiN.map(h => LessThanOrEqual(bucketAttr, Literal(h))).toSeq
    }
  }
}
