package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** KMV ("k minimum values") distinct-count sketch — the theta-sketch
  * capability of the reference re-expressed as native Spark aggregates.
  *
  * The reference maps a source column to a pre-built Druid theta-sketch
  * metric (`metadata/DruidRelationColumn.scala:41,70-83`) and answers
  * `count(distinct col)` approximately from it (`AggregateTransform.scala:
  * 454-479`). A theta sketch IS a KMV structure: keep the `k` smallest
  * 64-bit hashes ever seen; the union of two sketches is the k smallest of
  * the merged sets, and the distinct estimate is `(k-1) / θ` where `θ` is
  * the k-th smallest hash as a fraction of the hash space. Two properties
  * make it the right cube metric at 100 TB:
  *   - **mergeable**: partial aggregation, shuffle-combine and
  *     rollup-serving all reduce to sketch union (associative,
  *     order-independent);
  *   - **exact below k**: while fewer than `k` distinct values have been
  *     seen the sketch holds every hash, so the estimate equals the true
  *     distinct count — which also makes it oracle-testable at small SF.
  *
  * Three SQL surfaces (registered by `Graft.install`):
  *   - `kmv_distinct(col[, k])`       — distinct estimate, direct
  *   - `kmv_sketch(col[, k])`         — binary sketch, for materializing in
  *                                      a rollup cube
  *   - `kmv_merge_estimate(sketch)`   — union stored sketches → estimate
  */
object KmvSketch {

  val DefaultK = 16384
  private val Seed = 42L

  /** Bounded set of the k smallest (unsigned-compared) hashes. */
  final class Buffer(val k: Int) {
    val set = new java.util.TreeSet[java.lang.Long](
      (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b))

    def add(h: Long): Unit = {
      if (set.size < k) { set.add(h); () }
      else if (java.lang.Long.compareUnsigned(h, set.last()) < 0) {
        if (set.add(h)) set.pollLast()
        ()
      }
    }

    def merge(other: Buffer): Buffer = {
      val it = other.set.iterator()
      while (it.hasNext) add(it.next())
      this
    }

    /** Exact count below k; `(k-1)/θ` beyond. */
    def estimate: Long =
      if (set.size < k) set.size.toLong
      else {
        // θ = k-th smallest hash as a fraction of [0, 2^64)
        val kth = set.last().longValue()
        val theta = ((kth >>> 11).toDouble + 0.5) / (1L << 53).toDouble
        math.round((k - 1).toDouble / theta)
      }

    def serialize: Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + 8 * set.size)
      bb.putInt(k).putInt(set.size)
      set.forEach(h => { bb.putLong(h); () })
      bb.array()
    }
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buffer(bb.getInt)
    var n = bb.getInt
    while (n > 0) { buf.add(bb.getLong); n -= 1 }
    buf
  }

  abstract class KmvAgg extends TypedImperativeAggregate[Buffer] {
    def child: Expression
    def k: Int
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def createAggregationBuffer(): Buffer = new Buffer(k)
    override def merge(b: Buffer, o: Buffer): Buffer = b.merge(o)
    override def serialize(b: Buffer): Array[Byte] = b.serialize
    override def deserialize(bytes: Array[Byte]): Buffer = KmvSketch.deserialize(bytes)
  }

  /** `kmv_distinct(col, k)` — hash raw values, return the estimate. */
  case class KmvDistinct(child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends KmvAgg {
    override def dataType: DataType = LongType
    override def prettyName: String = "kmv_distinct"
    override def update(b: Buffer, row: InternalRow): Buffer = {
      val v = child.eval(row)
      if (v != null) b.add(XxHash64Function.hash(v, child.dataType, Seed))
      b
    }
    override def eval(b: Buffer): Any = b.estimate
    override def withNewMutableAggBufferOffset(o: Int): KmvDistinct =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KmvDistinct =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvDistinct =
      copy(child = c.head)
  }

  /** `kmv_sketch(col, k)` — hash raw values, return the sketch bytes. */
  case class KmvSketchAgg(child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends KmvAgg {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "kmv_sketch"
    override def update(b: Buffer, row: InternalRow): Buffer = {
      val v = child.eval(row)
      if (v != null) b.add(XxHash64Function.hash(v, child.dataType, Seed))
      b
    }
    override def eval(b: Buffer): Any = b.serialize
    override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvSketchAgg =
      copy(child = c.head)
  }

  /** `kmv_merge_estimate(sketchCol)` — union stored sketches → estimate.
    * `k` is taken from the stored sketches themselves.
    */
  case class KmvMergeEstimate(child: Expression, k: Int = DefaultK,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends KmvAgg {
    override def dataType: DataType = LongType
    override def prettyName: String = "kmv_merge_estimate"
    override def update(b: Buffer, row: InternalRow): Buffer = {
      val v = child.eval(row)
      if (v != null) b.merge(KmvSketch.deserialize(v.asInstanceOf[Array[Byte]]))
      b
    }
    override def eval(b: Buffer): Any = b.estimate
    override def withNewMutableAggBufferOffset(o: Int): KmvMergeEstimate =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KmvMergeEstimate =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvMergeEstimate =
      copy(child = c.head)
  }

  // validated here (and in the Column API), NOT in the class constructor:
  // executor-side Java deserialization instantiates the case class with
  // zeroed fields before populating them, so a constructor require would
  // fail on perfectly valid instances
  private def checkK(k: Int): Int = {
    require(k >= 16, s"kmv sketch needs k >= 16, got $k"); k
  }

  /** `kmv_union(sketchCol)` — union stored sketches → sketch bytes (for
    * cascading one rollup into a coarser one).
    */
  case class KmvUnionAgg(child: Expression, k: Int = DefaultK,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends KmvAgg {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "kmv_union"
    override def update(b: Buffer, row: InternalRow): Buffer = {
      val v = child.eval(row)
      if (v != null) b.merge(KmvSketch.deserialize(v.asInstanceOf[Array[Byte]]))
      b
    }
    override def eval(b: Buffer): Any = b.serialize
    override def withNewMutableAggBufferOffset(o: Int): KmvUnionAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KmvUnionAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvUnionAgg =
      copy(child = c.head)
  }

  /** Theta-style set-operation estimate over two sketches (Druid theta
    * sketches expose exactly these as post-aggregations; KMV carries the
    * same structure). Semantics:
    *   - both sketches unsaturated → the sets ARE the full hash sets, so
    *     `|A ∩ B|` / `|A \ B|` are the exact distinct counts (the same
    *     exact-below-k property the estimate has);
    *   - any side saturated → cut both at θ = min(θA, θB) (the stricter
    *     k-th-smallest bound) and scale the surviving-overlap count by 1/θ
    *     — the standard theta intersection / AnotB estimator.
    */
  private[graft] def setOpEstimate(a: Buffer, b: Buffer, intersect: Boolean): Long = {
    def boundOf(s: Buffer): Option[Long] =
      if (s.set.size >= s.k) Some(s.set.last().longValue()) else None
    val bounds = Seq(boundOf(a), boundOf(b)).flatten
    def count(cut: Long => Boolean): Long = {
      var n = 0L
      val it = a.set.iterator()
      while (it.hasNext) {
        val h = it.next()
        if (cut(h) && b.set.contains(h) == intersect) n += 1
      }
      n
    }
    if (bounds.isEmpty) count(_ => true)
    else {
      val bound = bounds.reduce((x, y) =>
        if (java.lang.Long.compareUnsigned(x, y) < 0) x else y)
      val theta = ((bound >>> 11).toDouble + 0.5) / (1L << 53).toDouble
      val n = count(h => java.lang.Long.compareUnsigned(h, bound) < 0)
      math.round(n.toDouble / theta)
    }
  }

  /** `kmv_intersect_estimate(skA, skB)` / `kmv_difference_estimate(skA, skB)`
    * — scalar set-operation estimators over two stored sketches.
    */
  case class KmvSetOp(left: Expression, right: Expression, intersect: Boolean)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
    override def dataType: DataType = LongType
    override def prettyName: String =
      if (intersect) "kmv_intersect_estimate" else "kmv_difference_estimate"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      setOpEstimate(
        KmvSketch.deserialize(a.asInstanceOf[Array[Byte]]),
        KmvSketch.deserialize(b.asInstanceOf[Array[Byte]]),
        intersect)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): KmvSetOp =
      copy(left = newLeft, right = newRight)
  }

  private def kArg(name: String, args: Seq[Expression]): Int = args match {
    case Seq(_) => DefaultK
    case Seq(_, l) if l.foldable && l.dataType == IntegerType =>
      checkK(l.eval().asInstanceOf[Int])
    case _ => throw new IllegalArgumentException(
      s"$name expects (col[, k: int literal]), got ${args.size} args")
  }

  /** Register the three functions into a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    registry.createOrReplaceTempFunction("kmv_distinct",
      args => KmvDistinct(args.head, kArg("kmv_distinct", args)), "built-in")
    registry.createOrReplaceTempFunction("kmv_sketch",
      args => KmvSketchAgg(args.head, kArg("kmv_sketch", args)), "built-in")
    registry.createOrReplaceTempFunction("kmv_merge_estimate",
      args => KmvMergeEstimate(args.head, kArg("kmv_merge_estimate", args)), "built-in")
    registry.createOrReplaceTempFunction("kmv_union",
      args => KmvUnionAgg(args.head, kArg("kmv_union", args)), "built-in")
    registry.createOrReplaceTempFunction("kmv_intersect_estimate",
      args => KmvSetOp(args(0), args(1), intersect = true), "built-in")
    registry.createOrReplaceTempFunction("kmv_difference_estimate",
      args => KmvSetOp(args(0), args(1), intersect = false), "built-in")
  }

  // ---- Column API (for DataFrame callers and the rollup builder) ----
  def kmvDistinct(c: Column, k: Int = DefaultK): Column =
    ExpressionUtils.column(
      KmvDistinct(ExpressionUtils.expression(c), checkK(k)).toAggregateExpression())
  def kmvSketch(c: Column, k: Int = DefaultK): Column =
    ExpressionUtils.column(
      KmvSketchAgg(ExpressionUtils.expression(c), checkK(k)).toAggregateExpression())
  def kmvMergeEstimate(c: Column, k: Int = DefaultK): Column =
    ExpressionUtils.column(
      KmvMergeEstimate(ExpressionUtils.expression(c), checkK(k)).toAggregateExpression())
  def kmvUnion(c: Column, k: Int = DefaultK): Column =
    ExpressionUtils.column(
      KmvUnionAgg(ExpressionUtils.expression(c), checkK(k)).toAggregateExpression())
  def kmvIntersectEstimate(a: Column, b: Column): Column =
    ExpressionUtils.column(KmvSetOp(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), intersect = true))
  def kmvDifferenceEstimate(a: Column, b: Column): Column =
    ExpressionUtils.column(KmvSetOp(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), intersect = false))
}
