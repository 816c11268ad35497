package graft.cube

/** Half-open time interval arithmetic on epoch microseconds (Spark's
  * TimestampType unit). Re-expresses the reference's `QueryIntervals`
  * accumulation (`/root/reference/src/main/scala/org/sparklinedata/druid/
  * QueryIntervals.scala:40-132`): predicates on the time dimension intersect
  * down to the set of index intervals actually scanned; a disjoint result
  * means a null scan.
  */
final case class Interval(startUs: Long, endUs: Long) {
  def isEmpty: Boolean = startUs >= endUs
  def intersect(o: Interval): Interval =
    Interval(math.max(startUs, o.startUs), math.min(endUs, o.endUs))
  def contains(us: Long): Boolean = us >= startUs && us < endUs
}

object Interval {
  val All: Interval = Interval(Long.MinValue, Long.MaxValue)
  val Empty: Interval = Interval(0L, 0L)
}

/** A normalized (sorted, disjoint, non-empty) set of intervals. */
final case class IntervalSet private (intervals: Vector[Interval]) {
  def isEmpty: Boolean = intervals.isEmpty

  def intersect(o: IntervalSet): IntervalSet = {
    val pairs = for {
      a <- intervals
      b <- o.intervals
      c = a.intersect(b) if !c.isEmpty
    } yield c
    IntervalSet(pairs: _*)
  }

  def union(o: IntervalSet): IntervalSet =
    IntervalSet(intervals ++ o.intervals: _*)

  def min: Option[Long] = intervals.headOption.map(_.startUs)
  def max: Option[Long] = intervals.lastOption.map(_.endUs)
}

object IntervalSet {
  val All: IntervalSet = IntervalSet(Interval.All)
  val Empty: IntervalSet = new IntervalSet(Vector.empty)

  def apply(ivs: Interval*): IntervalSet = {
    val sorted = ivs.filterNot(_.isEmpty).sortBy(_.startUs)
    val merged = sorted.foldLeft(Vector.empty[Interval]) { (acc, iv) =>
      acc.lastOption match {
        case Some(last) if iv.startUs <= last.endUs =>
          acc.init :+ Interval(last.startUs, math.max(last.endUs, iv.endUs))
        case _ => acc :+ iv
      }
    }
    new IntervalSet(merged)
  }

  /** Accumulate a comparison `timeCol <op> literal` into an interval
    * (reference `IntervalConditionExtractor`, `DateTimeExtractor.scala:
    * 85-100` / `SparkIntervalConditionExtractor` `:374-436`).
    */
  def ofComparison(op: String, us: Long): IntervalSet = op match {
    case "<"  => IntervalSet(Interval(Long.MinValue, us))
    case "<=" => IntervalSet(Interval(Long.MinValue, succ(us)))
    case ">"  => IntervalSet(Interval(succ(us), Long.MaxValue))
    case ">=" => IntervalSet(Interval(us, Long.MaxValue))
    case "="  => if (us == Long.MaxValue) All // point at the end sentinel:
                 else IntervalSet(Interval(us, succ(us))) // degrade, don't prune
    case _    => All
  }

  // Saturating successor: the universe is half-open with Long.MaxValue as
  // its end sentinel (Interval.All), so an upper bound at MaxValue (e.g. a
  // saturated lag implication) must degrade to the full interval — a wrapped
  // `us + 1` would instead produce an EMPTY interval and a wrong null scan.
  private def succ(us: Long): Long =
    if (us == Long.MaxValue) Long.MaxValue else us + 1
}
