package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spatial predicates over plain coordinate columns.
  *
  * The reference attaches R-tree-style spatial indexes to dimension pairs
  * and pushes `SpatialFilterSpec(RectangularBound)` filters
  * (`DruidQuerySpec.scala:255-281`, bounds intersection
  * `QuerySpecTransforms.scala:180-223`). Spark has no spatial index; the
  * Spark-native equivalent is a pair of range predicates per axis — they
  * push down to parquet min/max stats and (if the table is sorted/z-ordered
  * by the coordinates) prune row groups, which is what the spatial index
  * bought. Bounds intersection is plain interval math here, pre-plan.
  */
object SpatialFunctions {

  /** Half-open rectangular bound on two axes. */
  final case class Rect(xLo: Double, xHi: Double, yLo: Double, yHi: Double) {
    require(xLo <= xHi && yLo <= yHi, s"degenerate rect: $this")

    /** Intersection with another rect, if non-empty (the reference's
      * `CombineSpatialFilters` semantics).
      */
    def intersect(o: Rect): Option[Rect] = {
      val (a, b) = (math.max(xLo, o.xLo), math.min(xHi, o.xHi))
      val (c, d) = (math.max(yLo, o.yLo), math.min(yHi, o.yHi))
      if (a <= b && c <= d) Some(Rect(a, b, c, d)) else None
    }
  }

  /** Containment of point (x, y) in `rect` — two pushdown-friendly range
    * predicates per axis.
    */
  def rectContains(x: Column, y: Column, rect: Rect): Column =
    x >= rect.xLo && x < rect.xHi && y >= rect.yLo && y < rect.yHi

  /** Containment in the intersection of several rects; provably empty
    * intersections fold to `false` (the reference's null-scan).
    */
  def rectsContain(x: Column, y: Column, rects: Seq[Rect]): Column =
    if (rects.isEmpty) lit(true)
    else rects.tail.foldLeft(Option(rects.head))((acc, r) => acc.flatMap(_.intersect(r)))
      .map(rectContains(x, y, _)).getOrElse(lit(false))
}
