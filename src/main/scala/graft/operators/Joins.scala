package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal / range join operators the reference cannot express (its join
  * surface is inner equi-join star collapse only, `JoinTransform.scala:307`)
  * but that a training-data / event pipeline needs constantly. Both are
  * composed from Spark's own shuffle machinery — no custom physical
  * operator, no cross product — so they inherit AQE, codegen and spill
  * behavior for free.
  */
object Joins {

  /** Backward as-of join: for every left row, the single right row with the
    * same key and the greatest `rightTs <= leftTs` (inclusive), i.e. "the
    * most recent right observation at or before this left event".
    *
    * Implementation is the scalable union-window form, NOT a join: tag both
    * sides, union them, and carry the latest right payload forward with a
    * running `last(ignoreNulls)` window per key. ONE shuffle on the key,
    * O(n log n) per key for the sort — where a join + filter + max would
    * shuffle twice and blow up quadratically on hot keys. At 100 TB the
    * window sort is the same work any as-of engine must do.
    *
    * Ties: a right row AT the left timestamp is visible (right sorts before
    * left at equal ts), matching DuckDB/kdb `ASOF JOIN ... ON l.ts >= r.ts`
    * semantics. Rows of the right side must be unique per (key, ts) — with
    * several right rows at the same instant "the most recent one" is
    * ill-defined; dedup upstream (see [[Dedup.exactDedup]]).
    *
    * Output: every left column, then `rightVals` columns (renamed via
    * `outName`) from the matched right row (NULL when no right row precedes
    * — filter `IsNotNull` for inner-asof semantics).
    */
  def asofJoin(left: DataFrame, leftKey: String, leftTs: String,
               right: DataFrame, rightKey: String, rightTs: String,
               rightVals: Seq[(String, String)]): DataFrame = {
    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val rStruct = struct(rightVals.map { case (c, out) => col(c).as(out) }: _*)
    val lTagged = left.select(col(leftKey).as("g_k"), col(leftTs).as("g_t"),
      lit(1).as("g_isl"), lStruct.as("g_l"), lit(null).as("g_r_pre"))
    val rTagged = right.select(col(rightKey).as("g_k"), col(rightTs).as("g_t"),
      lit(0).as("g_isl"), lit(null).as("g_l_pre"), rStruct.as("g_r"))
    // align the two null-typed struct columns by position (unionByName would
    // reject the differing null types)
    val rPayloadType = right.select(rStruct).schema.head.dataType
    val lPayloadType = left.select(lStruct).schema.head.dataType
    val u = lTagged
      .withColumn("g_r", col("g_r_pre").cast(rPayloadType)).drop("g_r_pre")
      .unionByName(
        rTagged.withColumn("g_l", col("g_l_pre").cast(lPayloadType)).drop("g_l_pre"))
    val w = Window.partitionBy("g_k").orderBy(col("g_t"), col("g_isl"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u.withColumn("g_asof", last(col("g_r"), ignoreNulls = true).over(w))
      .filter(col("g_isl") === 1)
    val outCols = left.columns.map(c => col("g_l").getField(c).as(c)) ++
      rightVals.map { case (_, out) => col("g_asof").getField(out).as(out) }
    matched.select(outCols.toIndexedSeq: _*)
  }

  /** Interval/range join: left rows matched to every right interval
    * `[loCol, hiCol]` (inclusive) containing `valueCol`.
    *
    * Spark's own planner turns an inequality-only join into a broadcast
    * nested loop — fine for a handful of intervals, catastrophic for many.
    * This operator bins the domain: each right interval replicates to the
    * fixed-width bins it overlaps, each left row computes its single bin,
    * and the match becomes a shuffled **equi-join on the bin** plus an
    * exact range filter. A left row lands in exactly one bin, so no
    * dedup is needed. `binWidth` trades replication (wide intervals span
    * many bins) against join fan-in (coarse bins put many intervals in
    * one bucket); set it near the median interval width.
    */
  def rangeJoin(left: DataFrame, valueCol: String,
                right: DataFrame, loCol: String, hiCol: String,
                binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def binOf(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    val binned = right.withColumn("g_bin",
      explode(sequence(binOf(col(loCol)), binOf(col(hiCol)))))
    left.withColumn("g_bin", binOf(col(valueCol)))
      .join(binned, "g_bin")
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("g_bin")
  }
}
