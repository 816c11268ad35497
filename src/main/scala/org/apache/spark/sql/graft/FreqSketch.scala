package org.apache.spark.sql.graft

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters ("frequent items") sketch — the mergeable
  * counterpart of the reference's approximate TopN query
  * (`DruidQuerySpec.scala:767-868`, rewrite `QuerySpecTransforms.scala:
  * 279-332`). Druid answers "top dimension values by count" approximately,
  * one pass, bounded memory; Misra-Gries is the same capability as a
  * *metric*: k counters per group, decrement-on-overflow, with the classic
  * guarantee that any item with true count > n/(k+1) survives and every
  * stored count is within `err` (the cumulative decrement) of the truth.
  *
  * Two properties make it the right cube metric at 100 TB:
  *   - **mergeable** (Agarwal et al., "Mergeable Summaries", PODS'12):
  *     summing counters then subtracting the (k+1)-th largest keeps the
  *     bound additive, so partial aggregation, shuffle combine, rollup
  *     materialization and lattice cascade are all the same union algebra
  *     as the KMV/HLL metrics;
  *   - **exact while unsaturated**: until a decrement happens the counters
  *     ARE the exact per-item counts and `err = 0` — which both makes the
  *     sketch oracle-testable at small SF and means a dimension whose NDV
  *     is below k (the common "top domains / top licenses" case) is served
  *     exactly at any data scale.
  *
  * SQL surfaces (registered by `Graft.install`):
  *   - `freq_items(col[, k])`       — array<struct<item,cnt,err>>, heaviest
  *                                    first (ties broken by item asc)
  *   - `freq_sketch(col[, k])`      — binary sketch, for materializing in a
  *                                    rollup cube
  *   - `freq_merge(sketchCol)`      — union stored sketches → sketch bytes
  *                                    (cascade a fine rollup into a coarser)
  *   - `freq_merge_items(sketchCol)`— union stored sketches → item array
  */
object FreqSketch {

  val DefaultK = 4096

  val ItemType: StructType = StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false)))

  /** k counters over string items; `err` = total decremented per surviving
    * counter upper bound (global for the sketch: every stored count c means
    * a true count in [c, c + err]).
    */
  final class Buffer(val k: Int) {
    val counts = new java.util.HashMap[String, Long]()
    var err: Long = 0L

    def add(item: String, by: Long = 1L): Unit = {
      val cur = counts.get(item)
      if (cur != 0L || counts.containsKey(item)) counts.put(item, cur + by)
      else if (counts.size < k) counts.put(item, by)
      else decrementAll(by, item)
      ()
    }

    /** Misra-Gries overflow step, batched: adding `by` occurrences of a
      * novel item to a full sketch removes `d = min(by, min-count)` from
      * every counter; if the novel item's remainder survives it enters with
      * the leftover. Equivalent to `by` unit decrements, O(k) once.
      */
    private def decrementAll(by: Long, item: String): Unit = {
      var minC = Long.MaxValue
      val it0 = counts.values().iterator()
      while (it0.hasNext) minC = math.min(minC, it0.next())
      val d = math.min(by, minC)
      err += d
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - d
        if (nv <= 0L) it.remove() else e.setValue(nv)
      }
      if (by > d) add(item, by - d)
    }

    /** Mergeable-summaries union: sum counters pairwise, then restore the
      * k-bound by subtracting the (k+1)-th largest combined count.
      */
    def merge(other: Buffer): Buffer = {
      err += other.err
      other.counts.forEach { (item, c) =>
        val cur = counts.get(item)
        if (cur != 0L || counts.containsKey(item)) counts.put(item, cur + c)
        else counts.put(item, c)
      }
      if (counts.size > k) {
        val vals = new Array[Long](counts.size)
        var i = 0
        val it0 = counts.values().iterator()
        while (it0.hasNext) { vals(i) = it0.next(); i += 1 }
        java.util.Arrays.sort(vals)
        val cut = vals(vals.length - k - 1) // (k+1)-th largest
        err += cut
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val nv = e.getValue - cut
          if (nv <= 0L) it.remove() else e.setValue(nv)
        }
      }
      this
    }

    /** (item, cnt, err) heaviest-first, ties by item — deterministic. */
    def sorted: Array[(String, Long)] = {
      val arr = new Array[(String, Long)](counts.size)
      var i = 0
      counts.forEach { (item, c) => arr(i) = (item, c); i += 1 }
      scala.util.Sorting.stableSort(arr,
        (a: (String, Long), b: (String, Long)) =>
          a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
      arr
    }

    def serialize: Array[Byte] = {
      val items = sorted
      var size = 4 + 8 + 4
      items.foreach { case (s, _) =>
        size += 4 + s.getBytes(StandardCharsets.UTF_8).length + 8
      }
      val bb = ByteBuffer.allocate(size)
      bb.putInt(k).putLong(err).putInt(items.length)
      items.foreach { case (s, c) =>
        val b = s.getBytes(StandardCharsets.UTF_8)
        bb.putInt(b.length).put(b).putLong(c)
      }
      bb.array()
    }
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buffer(bb.getInt)
    buf.err = bb.getLong
    var n = bb.getInt
    while (n > 0) {
      val len = bb.getInt
      val sb = new Array[Byte](len)
      bb.get(sb)
      val c = bb.getLong
      buf.counts.put(new String(sb, StandardCharsets.UTF_8), c)
      n -= 1
    }
    buf
  }

  private def toArrayData(b: Buffer): ArrayData =
    new GenericArrayData(b.sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c, b.err)
    }.toArray[Any])

  abstract class FreqAgg extends TypedImperativeAggregate[Buffer] {
    def child: Expression
    def k: Int
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def createAggregationBuffer(): Buffer = new Buffer(k)
    override def merge(b: Buffer, o: Buffer): Buffer = b.merge(o)
    override def serialize(b: Buffer): Array[Byte] = b.serialize
    override def deserialize(bytes: Array[Byte]): Buffer = FreqSketch.deserialize(bytes)
  }

  abstract class FreqRawAgg extends FreqAgg
      with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def update(b: Buffer, row: InternalRow): Buffer = {
      val v = child.eval(row)
      if (v != null) b.add(v.asInstanceOf[UTF8String].toString)
      b
    }
  }

  abstract class FreqMergeAggBase extends FreqAgg {
    override def update(b: Buffer, row: InternalRow): Buffer = {
      val v = child.eval(row)
      if (v != null) b.merge(FreqSketch.deserialize(v.asInstanceOf[Array[Byte]]))
      b
    }
  }

  /** `freq_items(col, k)` — count raw values, return the item array. */
  case class FreqItems(child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends FreqRawAgg {
    override def dataType: DataType = ArrayType(ItemType, containsNull = false)
    override def prettyName: String = "freq_items"
    override def eval(b: Buffer): Any = toArrayData(b)
    override def withNewMutableAggBufferOffset(o: Int): FreqItems =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): FreqItems =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FreqItems =
      copy(child = c.head)
  }

  /** Exact micros of a double weight, matching Spark's
    * `CAST(w AS DECIMAL(28,6))` semantics bit for bit (canonical decimal
    * form of the double, HALF_UP at scale 6): a weighted sketch built with
    * this merges into sums equal to the engine's DECIMAL sum convention —
    * `long → double` and `decimal(38,6) → double` are both correctly-
    * rounded conversions of the same rational, so the final doubles are
    * identical.
    */
  private[graft] def microsOf(w: Double): Long =
    java.math.BigDecimal.valueOf(w)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .movePointRight(6).longValueExact()

  /** `freq_sketch_by(col, weight, k)` — weighted heavy hitters: each
    * occurrence adds its weight (as exact micros) instead of 1, so the
    * merged "counts" are per-item weighted sums (Druid topN over an
    * arbitrary sum metric). NULL weights contribute nothing (Sum
    * semantics); exactness below k needs a null-free metric, which the
    * rollup build verifies.
    */
  case class FreqSketchWeighted(child: Expression, weight: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends FreqAgg
      with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
    override def children: Seq[Expression] = Seq(child, weight)
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType, DoubleType)
    override def dataType: DataType = BinaryType
    override def prettyName: String = "freq_sketch_by"
    override def update(b: Buffer, row: InternalRow): Buffer = {
      val v = child.eval(row)
      val w = weight.eval(row)
      if (v != null && w != null)
        b.add(v.asInstanceOf[UTF8String].toString,
          microsOf(w.asInstanceOf[Double]))
      b
    }
    override def eval(b: Buffer): Any = b.serialize
    override def withNewMutableAggBufferOffset(o: Int): FreqSketchWeighted =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): FreqSketchWeighted =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FreqSketchWeighted =
      copy(child = c(0), weight = c(1))
  }

  /** `freq_sketch(col, k)` — count raw values, return sketch bytes. */
  case class FreqSketchAgg(child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends FreqRawAgg {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "freq_sketch"
    override def eval(b: Buffer): Any = b.serialize
    override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FreqSketchAgg =
      copy(child = c.head)
  }

  /** `freq_merge(sketchCol)` — union stored sketches → sketch bytes. */
  case class FreqMergeAgg(child: Expression, k: Int = DefaultK,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends FreqMergeAggBase {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "freq_merge"
    override def eval(b: Buffer): Any = b.serialize
    override def withNewMutableAggBufferOffset(o: Int): FreqMergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): FreqMergeAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FreqMergeAgg =
      copy(child = c.head)
  }

  /** `freq_merge_items(sketchCol)` — union stored sketches → item array. */
  case class FreqMergeItems(child: Expression, k: Int = DefaultK,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends FreqMergeAggBase {
    override def dataType: DataType = ArrayType(ItemType, containsNull = false)
    override def prettyName: String = "freq_merge_items"
    override def eval(b: Buffer): Any = toArrayData(b)
    override def withNewMutableAggBufferOffset(o: Int): FreqMergeItems =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): FreqMergeItems =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FreqMergeItems =
      copy(child = c.head)
  }

  // validated here (and in the Column API), NOT in the class constructor:
  // executor-side Java deserialization instantiates the case class with
  // zeroed fields before populating them (same caveat as KmvSketch)
  private def checkK(k: Int): Int = {
    require(k >= 8, s"freq sketch needs k >= 8, got $k"); k
  }

  private def kArg(name: String, args: Seq[Expression]): Int = args match {
    case Seq(_) => DefaultK
    case Seq(_, l) if l.foldable && l.dataType == IntegerType =>
      checkK(l.eval().asInstanceOf[Int])
    case _ => throw new IllegalArgumentException(
      s"$name expects (col[, k: int literal]), got ${args.size} args")
  }

  /** Register the functions into a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    registry.createOrReplaceTempFunction("freq_items",
      args => FreqItems(args.head, kArg("freq_items", args)), "built-in")
    registry.createOrReplaceTempFunction("freq_sketch",
      args => FreqSketchAgg(args.head, kArg("freq_sketch", args)), "built-in")
    registry.createOrReplaceTempFunction("freq_sketch_by",
      {
        case Seq(c, w)    => FreqSketchWeighted(c, w, DefaultK)
        case Seq(c, w, l) if l.foldable && l.dataType == IntegerType =>
          FreqSketchWeighted(c, w, checkK(l.eval().asInstanceOf[Int]))
        case args => throw new IllegalArgumentException(
          s"freq_sketch_by expects (col, weight[, k: int literal]), got ${args.size} args")
      }, "built-in")
    registry.createOrReplaceTempFunction("freq_merge",
      args => FreqMergeAgg(args.head, kArg("freq_merge", args)), "built-in")
    registry.createOrReplaceTempFunction("freq_merge_items",
      args => FreqMergeItems(args.head, kArg("freq_merge_items", args)), "built-in")
  }

  // ---- Column API (for DataFrame callers and the rollup builder) ----
  def freqItems(c: Column, k: Int = DefaultK): Column =
    ExpressionUtils.column(
      FreqItems(ExpressionUtils.expression(c), checkK(k)).toAggregateExpression())
  def freqSketch(c: Column, k: Int = DefaultK): Column =
    ExpressionUtils.column(
      FreqSketchAgg(ExpressionUtils.expression(c), checkK(k)).toAggregateExpression())
  def freqSketchBy(c: Column, weight: Column, k: Int = DefaultK): Column =
    ExpressionUtils.column(
      FreqSketchWeighted(ExpressionUtils.expression(c),
        ExpressionUtils.expression(weight), checkK(k)).toAggregateExpression())
  def freqMerge(c: Column, k: Int = DefaultK): Column =
    ExpressionUtils.column(
      FreqMergeAgg(ExpressionUtils.expression(c), checkK(k)).toAggregateExpression())
  def freqMergeItems(c: Column, k: Int = DefaultK): Column =
    ExpressionUtils.column(
      FreqMergeItems(ExpressionUtils.expression(c), checkK(k)).toAggregateExpression())
}
