package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native random-hyperplane signature for embedding LSH.
  *
  * The composed higher-order-function form evaluates `nBits` independent
  * `aggregate(zip_with(...))` passes per row — each re-walking the vector
  * and boxing every element. This expression computes all `nBits` plane
  * dots in ONE pass over the primitive float array, deriving plane
  * components from the same splitmix64 formula as
  * `graft.operators.Vectors.planeMatrix`, so signatures are bit-identical
  * to the composed version (same values, same index-order double
  * accumulation) while the plan carries no 8k-element plane literal at all.
  */
object VectorExprs {

  val MaxPlaneDim = 256

  /** splitmix64 plane component — MUST match Vectors.planeMatrix. */
  @inline private def plane(seed: Int, b: Int, d: Int): Double = {
    var z = seed.toLong * 0x100000001L + b.toLong * 65537L + d + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    ((z ^ (z >>> 31)).toDouble / 9.223372036854776e18) / 2.0
  }

  case class RhpSignatureExpr(child: Expression, nBits: Int, seed: Int)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

    override def inputTypes: Seq[AbstractDataType] =
      Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "rhp_signature"

    private lazy val elemIsFloat: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      require(n <= MaxPlaneDim,
        s"embedding dimension $n exceeds MaxPlaneDim=$MaxPlaneDim")
      val v = new Array[Double](n)
      var d = 0
      while (d < n) {
        v(d) = if (elemIsFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
        d += 1
      }
      val bits = new Array[Int](nBits)
      var b = 0
      while (b < nBits) {
        var acc = 0.0
        d = 0
        while (d < n) { acc += v(d) * plane(seed, b, d); d += 1 }
        bits(b) = if (acc >= 0) 1 else 0
        b += 1
      }
      new GenericArrayData(bits)
    }

    override protected def withNewChildInternal(c: Expression): RhpSignatureExpr =
      copy(child = c)
  }

  def rhpSignature(v: Column, nBits: Int, seed: Int): Column =
    ExpressionUtils.column(
      RhpSignatureExpr(ExpressionUtils.expression(v), nBits, seed))

  /** Cosine similarity in one pass over both primitive arrays.
    *
    * Bit-identical to the composed `aggregate(zip_with(...))` form (and to
    * DuckDB's sequential `list_sum` fold, which the differential oracle
    * relies on): all three accumulators fold products in index order in
    * double, and the final expression is `ab / (sqrt(aa) * sqrt(bb))` with
    * the same all-zero guard. The composed form walked the arrays ~9 times
    * per pair through boxed lambdas — this is THE hot operation of
    * embedding dedup verification and k-NN re-ranking.
    */
  case class CosineExpr(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with ExpectsInputTypes with CodegenFallback {

    override def inputTypes: Seq[AbstractDataType] = Seq(
      TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
      TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_sim"

    private def isFloat(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    @transient private lazy val lFloat = isFloat(left)
    @transient private lazy val rFloat = isFloat(right)

    override def nullable: Boolean = true
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      // length mismatch -> NULL, matching the composed zip_with form
      // (null padding propagates through the fold there)
      if (x.numElements() != y.numElements()) return null
      val n = x.numElements()
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      var i = 0
      while (i < n) {
        val xi = if (lFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val yi = if (rFloat) y.getFloat(i).toDouble else y.getDouble(i)
        ab += xi * yi; aa += xi * xi; bb += yi * yi
        i += 1
      }
      val denom = math.sqrt(aa) * math.sqrt(bb)
      if (denom == 0.0) 0.0 else ab / denom
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineExpr =
      copy(left = l, right = r)
  }

  def cosine(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** 0-based index of the squared-L2-nearest centroid — the composed form
    * (`transform(typedLit(centroids), c => sqDist(vec, c))` then
    * `array_position(ds, array_min(ds)) - 1`) evaluated k x dim interpreted
    * lambda steps PER ROW; this is one primitive pass with the identical
    * arithmetic: per-centroid distance is the index-order double fold of
    * `(v_i - c_i)^2` from 0.0, ties keep the first centroid reaching the
    * minimum (array_position-of-min semantics), a length-mismatched
    * centroid contributes no distance (null in the composed form), and an
    * all-mismatched row yields null.
    */
  case class AssignCentroidExpr(child: Expression, centroids: Seq[Seq[Double]])
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

    override def inputTypes: Seq[AbstractDataType] = Seq(
      TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def prettyName: String = "assign_centroid"

    @transient private lazy val elemIsFloat: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    @transient private lazy val cents: Array[Array[Double]] =
      centroids.map(_.toArray).toArray

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = v.numElements()
      val vec = new Array[Double](n)
      var i = 0
      while (i < n) {
        vec(i) = if (elemIsFloat) v.getFloat(i).toDouble else v.getDouble(i)
        i += 1
      }
      var best = -1
      var bestD = 0.0
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        if (cent.length == n) {
          var d = 0.0
          var j = 0
          while (j < n) { val e = vec(j) - cent(j); d += e * e; j += 1 }
          // strict < keeps the FIRST index achieving the minimum — the
          // array_position(ds, array_min(ds)) tie rule
          if (best < 0 || java.lang.Double.compare(d, bestD) < 0) {
            best = c; bestD = d
          }
        }
        c += 1
      }
      if (best < 0) null else Integer.valueOf(best)
    }

    override protected def withNewChildInternal(c: Expression): AssignCentroidExpr =
      copy(child = c)
  }

  def assignCentroid(vec: Column, centroids: Seq[Seq[Double]]): Column =
    ExpressionUtils.column(
      AssignCentroidExpr(ExpressionUtils.expression(vec), centroids))
}
