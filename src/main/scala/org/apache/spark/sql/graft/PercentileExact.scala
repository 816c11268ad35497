package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Exact interpolated percentile, bit-identical to Spark's
  * `percentile(child, p)` at a fraction of its cost.
  *
  * Spark's `Percentile` buffers an `OpenHashMap[AnyRef, Long]` — every
  * update boxes the double key, every partial serializes boxed entries
  * row-by-row, and a query asking three percentiles of two columns pays
  * for three independent maps (measured: the l_extendedprice percentile
  * alone was 1.09 s of q_percentile's 1.24 s at sf0.1). This aggregate
  * keeps an open-addressed primitive (doubleToLongBits -> count) map, one
  * buffer serves ANY number of percentages of one column, and serialization
  * is a flat long array.
  *
  * Result equality is pinned to the bytecode of
  * `PercentileBase.getPercentile` (spark-catalyst 4.1.2), NOT re-derived:
  *   position    = percentage * (total - 1)
  *   lower/higher = floor/ceil(position).toLong
  *   lowerKey    = key at first cumulative count >= lower + 1
  *   if (higher == lower) lowerKey
  *   else higherKey = key at first cumulative >= higher + 1
  *        if (higherKey == lowerKey) lowerKey
  *        else (higher - position) * lowerKey + (position - lower) * higherKey
  * with keys sorted by java.lang.Double.compare (-0.0 < 0.0 strictly, NaN
  * greatest) and key identity = doubleToLongBits (same as boxed Double
  * equality). Known, unmatchable corner (r20 ADVICE): Spark 4.1.2 sorts
  * with SQLOrderingUtil.compareDoubles, which returns 0 for -0.0 vs 0.0 —
  * when BOTH zeros are present as keys their relative order in Spark's
  * sort is hash-map-iteration-order dependent, so if a percentile lands
  * exactly on one of those ranks Spark's own answer is nondeterministic
  * and no deterministic sort can always match it bitwise (the two answers
  * differ only in the sign bit of a zero). Everywhere else the orderings
  * agree.
  * PercentileExactSpec asserts bitwise equality against Spark's aggregate
  * over randomized multisets and percentages.
  */
object PercentileExact {

  /** Column form, for direct DataFrame use and specs. */
  def of(c: org.apache.spark.sql.Column, pcts: Seq[Double]): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(
      PercentileExactExpr(
        org.apache.spark.sql.classic.ExpressionUtils.expression(c), pcts)
        .toAggregateExpression())

  /** Open-addressed long->long counter map (key = doubleToLongBits). */
  final class Counts(initialCapacity: Int = 1 << 10) extends Serializable {
    private var mask = initialCapacity - 1
    private var keys = new Array[Long](initialCapacity)
    private var vals = new Array[Long](initialCapacity)
    private var used = new Array[Boolean](initialCapacity)
    private var n = 0

    def size: Int = n

    private def grow(): Unit = {
      val ok = keys; val ov = vals; val ou = used
      mask = mask * 2 + 1
      keys = new Array[Long](mask + 1)
      vals = new Array[Long](mask + 1)
      used = new Array[Boolean](mask + 1)
      n = 0
      var i = 0
      while (i < ok.length) {
        if (ou(i)) add(ok(i), ov(i))
        i += 1
      }
    }

    def add(key: Long, cnt: Long): Unit = {
      if (n * 2 >= mask + 1) grow()
      var i = (scala.util.hashing.byteswap64(key) & mask).toInt
      while (used(i) && keys(i) != key) i = (i + 1) & mask
      if (!used(i)) { used(i) = true; keys(i) = key; vals(i) = cnt; n += 1 }
      else vals(i) += cnt
    }

    def foreachEntry(f: (Long, Long) => Unit): Unit = {
      var i = 0
      while (i < keys.length) {
        if (used(i)) f(keys(i), vals(i))
        i += 1
      }
    }
  }

  /** Percentile values per getPercentile's exact arithmetic. `null` when
    * the buffer is empty (matching Spark's empty-map eval).
    */
  private[graft] def evalCounts(buf: Counts,
                                percentages: Seq[Double]): GenericArrayData = {
    if (buf.size == 0) return null
    val n = buf.size
    val ks = new Array[Double](n)
    val cs = new Array[Long](n)
    var i = 0
    buf.foreachEntry { (k, c) =>
      ks(i) = java.lang.Double.longBitsToDouble(k); cs(i) = c; i += 1
    }
    // sort (key, count) pairs by double ordering
    val idx = Array.range(0, n).map(Integer.valueOf)
    java.util.Arrays.sort(idx, (a: Integer, b: Integer) =>
      java.lang.Double.compare(ks(a), ks(b)))
    val sk = new Array[Double](n)
    val cum = new Array[Long](n)
    var acc = 0L
    i = 0
    while (i < n) {
      sk(i) = ks(idx(i)); acc += cs(idx(i)); cum(i) = acc; i += 1
    }
    val total = acc
    def firstAtLeast(target: Long): Int = {
      val r = java.util.Arrays.binarySearch(cum, 0, n, target)
      if (r < 0) -(r + 1) else r
    }
    val out = new Array[Any](percentages.length)
    i = 0
    while (i < percentages.length) {
      val position = percentages(i) * (total - 1).toDouble
      val lower = math.floor(position).toLong
      val higher = math.ceil(position).toLong
      val lowerKey = sk(firstAtLeast(lower + 1))
      out(i) =
        if (higher == lower) lowerKey
        else {
          val higherKey = sk(firstAtLeast(higher + 1))
          // boxed-Double equality == bit equality here (keys are distinct
          // bit patterns by construction)
          if (java.lang.Double.doubleToLongBits(higherKey) ==
              java.lang.Double.doubleToLongBits(lowerKey)) lowerKey
          else (higher.toDouble - position) * lowerKey +
            (position - lower.toDouble) * higherKey
        }
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class PercentileExactExpr(child: Expression, percentages: Seq[Double],
                               mutableAggBufferOffset: Int = 0,
                               inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PercentileExact.Counts]
    with UnaryLike[Expression] {

  require(percentages.nonEmpty &&
    percentages.forall(p => p >= 0.0 && p <= 1.0),
    s"percentages must be in [0, 1], got $percentages")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "percentile_exact"

  override def createAggregationBuffer(): PercentileExact.Counts =
    new PercentileExact.Counts()

  override def update(buf: PercentileExact.Counts,
                      input: InternalRow): PercentileExact.Counts = {
    val v = child.eval(input)
    if (v != null)
      buf.add(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]), 1L)
    buf
  }

  override def merge(buf: PercentileExact.Counts,
                     other: PercentileExact.Counts): PercentileExact.Counts = {
    other.foreachEntry((k, c) => buf.add(k, c))
    buf
  }

  override def eval(buf: PercentileExact.Counts): Any =
    PercentileExact.evalCounts(buf, percentages)

  override def serialize(buf: PercentileExact.Counts): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreachEntry((k, c) => { bb.putLong(k); bb.putLong(c) })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PercentileExact.Counts = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new PercentileExact.Counts(
      math.max(16, Integer.highestOneBit(math.max(1, n * 2)) * 2))
    var i = 0
    while (i < n) { buf.add(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): PercentileExactExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): PercentileExactExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): PercentileExactExpr =
    copy(child = c)
}
