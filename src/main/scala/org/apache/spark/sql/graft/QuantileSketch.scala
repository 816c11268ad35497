package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Exactness-gated quantile sketch: a mergeable per-group value buffer that
  * serves EXACT linear-interpolation percentiles from a pre-aggregated
  * rollup — or explicitly refuses (NULL) once the group outgrows the gate.
  *
  * Same design contract as [[KmvSketch]]'s exact-below-k distinct serving:
  *   - below `k` values the buffer holds the group's full value multiset,
  *     so the merged percentile is bit-identical to computing
  *     `percentile(col, p)` over the raw rows (DuckDB `quantile_cont`
  *     oracle-testable);
  *   - at `k` the buffer *saturates*: it drops its values (a saturated
  *     sketch costs bytes, not megabytes) and every merge containing it is
  *     saturated too, so serving returns NULL and the caller falls back to
  *     the fact table — truncation can never masquerade as an answer.
  *
  * Why this shape at 100 TB: dimension values are Zipf-distributed — the
  * long tail of groups (most of them) stays under any reasonable `k` and
  * gets percentiles for free from the rollup; the few heavy heads are
  * exactly the groups cheap to answer exactly anyway (they dominate the
  * scan whatever you do). A lossy mergeable summary (KLL/t-digest) could
  * serve the heads approximately; that is a different accuracy contract and
  * deliberately not silently substituted here.
  *
  * SQL surfaces (registered by `Graft.install`):
  *   - `qsk_sketch(col[, k])`            — binary sketch for a rollup build
  *   - `qsk_union(sketch[, k])`          — cascade a node into a coarser one
  *   - `qsk_percentile(sketch, p)`       — merge stored sketches → exact
  *                                         percentile, NULL if saturated
  */
object QuantileSketch {

  val DefaultK = 65536

  /** Growable value buffer with a saturation gate. */
  final class QBuffer(val k: Int) {
    var values = new java.util.ArrayList[java.lang.Double]()
    var saturated = false

    def add(v: Double): Unit =
      if (!saturated) {
        if (values.size >= k) { saturated = true; values = new java.util.ArrayList() }
        else { values.add(v); () }
      }

    def merge(other: QBuffer): QBuffer = {
      if (other.saturated) { saturated = true; values = new java.util.ArrayList() }
      else {
        val it = other.values.iterator()
        while (it.hasNext && !saturated) add(it.next())
      }
      this
    }

    /** Linear-interpolation percentile at fraction `p` — index `p*(n-1)`,
      * interpolated as `(hi-pos)*lower + (pos-lo)*higher`: the EXACT
      * floating arithmetic of Spark's `Percentile.getPercentile` (which
      * bit-matches DuckDB's `quantile_cont` on the oracle gate; the
      * algebraically-equal `lo + frac*(hi-lo)` form drifts by 1 ulp).
      * NULL when saturated or empty.
      */
    def percentile(p: Double): Any =
      if (saturated || values.isEmpty) null
      else {
        val arr = new Array[Double](values.size)
        var i = 0
        while (i < arr.length) { arr(i) = values.get(i); i += 1 }
        java.util.Arrays.sort(arr)
        val pos = p * (arr.length - 1)
        val lo = math.floor(pos).toLong
        val hi = math.ceil(pos).toLong
        if (hi == lo) arr(lo.toInt)
        else (hi - pos) * arr(lo.toInt) + (pos - lo) * arr(hi.toInt)
      }

    def serialize: Array[Byte] = {
      val bb = ByteBuffer.allocate(9 + 8 * values.size)
      bb.putInt(k).put(if (saturated) 1.toByte else 0.toByte).putInt(values.size)
      values.forEach(v => { bb.putDouble(v); () })
      bb.array()
    }
  }

  def deserialize(bytes: Array[Byte]): QBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new QBuffer(bb.getInt)
    buf.saturated = bb.get() == 1
    var n = bb.getInt
    while (n > 0) { buf.add(bb.getDouble); n -= 1 }
    buf
  }

  abstract class QAgg extends TypedImperativeAggregate[QBuffer] {
    def child: Expression
    def k: Int
    override def nullable: Boolean = true
    override def createAggregationBuffer(): QBuffer = new QBuffer(k)
    override def merge(b: QBuffer, o: QBuffer): QBuffer = b.merge(o)
    override def serialize(b: QBuffer): Array[Byte] = b.serialize
    override def deserialize(bytes: Array[Byte]): QBuffer = QuantileSketch.deserialize(bytes)
  }

  /** `qsk_sketch(col, k)` — collect numeric values into a gated sketch. */
  case class QskSketchAgg(child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends QAgg {
    override def children: Seq[Expression] = Seq(child)
    override def dataType: DataType = BinaryType
    override def prettyName: String = "qsk_sketch"
    override def update(b: QBuffer, row: InternalRow): QBuffer = {
      val v = child.eval(row)
      if (v != null) b.add(v.asInstanceOf[Number].doubleValue())
      b
    }
    override def eval(b: QBuffer): Any = b.serialize
    override def withNewMutableAggBufferOffset(o: Int): QskSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): QskSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QskSketchAgg =
      copy(child = c.head)
  }

  /** `qsk_union(sketch, k)` — merge stored sketches into one sketch. */
  case class QskUnionAgg(child: Expression, k: Int = DefaultK,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends QAgg {
    override def children: Seq[Expression] = Seq(child)
    override def dataType: DataType = BinaryType
    override def prettyName: String = "qsk_union"
    override def update(b: QBuffer, row: InternalRow): QBuffer = {
      val v = child.eval(row)
      if (v != null) b.merge(QuantileSketch.deserialize(v.asInstanceOf[Array[Byte]]))
      b
    }
    override def eval(b: QBuffer): Any = b.serialize
    override def withNewMutableAggBufferOffset(o: Int): QskUnionAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): QskUnionAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QskUnionAgg =
      copy(child = c.head)
  }

  /** `qsk_percentile(sketch, p)` — merge stored sketches, evaluate the
    * exact percentile; NULL once any contributing sketch saturated.
    */
  case class QskPercentile(child: Expression, p: Expression, k: Int = DefaultK,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends QAgg {
    override def children: Seq[Expression] = Seq(child, p)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "qsk_percentile"
    private lazy val frac: Double = {
      val v = p.eval().asInstanceOf[Number].doubleValue()
      require(v >= 0.0 && v <= 1.0, s"percentile fraction must be in [0,1], got $v")
      v
    }
    override def update(b: QBuffer, row: InternalRow): QBuffer = {
      val v = child.eval(row)
      if (v != null) b.merge(QuantileSketch.deserialize(v.asInstanceOf[Array[Byte]]))
      b
    }
    override def eval(b: QBuffer): Any = b.percentile(frac)
    override def withNewMutableAggBufferOffset(o: Int): QskPercentile =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): QskPercentile =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QskPercentile =
      copy(child = c.head, p = c(1))
  }

  private def checkK(k: Int): Int = {
    require(k >= 16, s"quantile sketch needs k >= 16, got $k"); k
  }

  private def kArg(name: String, args: Seq[Expression], at: Int): Int =
    if (args.size <= at) DefaultK
    else if (args(at).foldable && args(at).dataType == IntegerType)
      checkK(args(at).eval().asInstanceOf[Int])
    else throw new IllegalArgumentException(
      s"$name: k must be an int literal")

  /** Register the SQL functions into a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    registry.createOrReplaceTempFunction("qsk_sketch",
      args => QskSketchAgg(args.head, kArg("qsk_sketch", args, 1)), "built-in")
    registry.createOrReplaceTempFunction("qsk_union",
      args => QskUnionAgg(args.head, kArg("qsk_union", args, 1)), "built-in")
    registry.createOrReplaceTempFunction("qsk_percentile",
      args => QskPercentile(args.head, args(1), kArg("qsk_percentile", args, 2)),
      "built-in")
  }

  // ---- Column API (for DataFrame callers and the rollup builder) ----
  def qskSketch(c: Column, k: Int = DefaultK): Column =
    ExpressionUtils.column(
      QskSketchAgg(ExpressionUtils.expression(c), checkK(k)).toAggregateExpression())
  def qskUnion(c: Column, k: Int = DefaultK): Column =
    ExpressionUtils.column(
      QskUnionAgg(ExpressionUtils.expression(c), checkK(k)).toAggregateExpression())
  def qskPercentile(c: Column, p: Double, k: Int = DefaultK): Column =
    ExpressionUtils.column(
      QskPercentile(ExpressionUtils.expression(c),
        org.apache.spark.sql.catalyst.expressions.Literal(p),
        checkK(k)).toAggregateExpression())
}
