package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column algebra over `array<float>`/`array<double>` columns,
  * built from the codegen-friendly higher-order array functions
  * (`zip_with` / `aggregate`) — no UDFs, no MLlib dependency, evaluates
  * per-row inside the executor with zero serialization overhead.
  */
object Vectors {

  /** Dot product of two equal-length numeric array columns, accumulated in
    * double in index order. Deterministic across partitionings (a per-row
    * scalar, not an aggregation) and bit-identical to any engine that folds
    * the products sequentially (DuckDB's `list_sum` does), which is what
    * the differential oracle relies on.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Squared L2 distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    }), lit(0.0), (acc, x) => acc + x)

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a symmetric value in [-0.5, 0.5) derived from xxhash64 — reproducible
    * on every executor with no broadcast of RNG state.
    */
  private def planeComponent(plane: Column, dim: Column, seed: Int): Column =
    (pmod(xxhash64(plane.cast("string"), dim.cast("string"), lit(seed)), lit(1000000L))
      .cast("double") / 1000000.0) - 0.5

  /** Dot product of vector column `v` with pseudo-random hyperplane `plane`. */
  def hyperplaneDot(v: Column, plane: Column, seed: Int): Column =
    aggregate(
      zip_with(v, sequence(lit(0), size(v) - 1),
        (x, i) => x.cast("double") * planeComponent(plane, i, seed)),
      lit(0.0), (acc, x) => acc + x)

  /** Random-hyperplane signature of `v`: `nBits` sign bits as an int array. */
  def rhpSignature(v: Column, nBits: Int, seed: Int): Column =
    transform(sequence(lit(0), lit(nBits - 1)),
      b => when(hyperplaneDot(v, b, seed) >= 0, lit(1)).otherwise(lit(0)))

  /** Pack a bit array (little-endian) into a single long. */
  def packBits(bits: Column): Column =
    aggregate(
      zip_with(bits, sequence(lit(0), size(bits) - 1),
        (bit, i) => call_function("shiftleft", bit.cast("long"), i)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
}
