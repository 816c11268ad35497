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

  /** Cosine similarity; 0.0 when either vector is all-zero. Served by the
    * native single-pass expression
    * ([[org.apache.spark.sql.graft.VectorExprs.CosineExpr]]) — identical
    * values (same index-order double accumulation) to the composed
    * `aggregate(zip_with(...))` form at a fraction of the cost.
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExprs.cosine(a, b)

  /** Squared L2 distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    }), lit(0.0), (acc, x) => acc + x)

  /** Maximum supported embedding dimension for hyperplane signatures. */
  val MaxPlaneDim = 256

  /** Deterministic pseudo-random hyperplane matrix (splitmix64-derived,
    * symmetric in [-0.5, 0.5)), embedded in the plan as ONE literal — the
    * signature then costs only multiply-adds per row, no hashing, no
    * per-element allocation, and every executor sees the same planes with
    * no broadcast.
    */
  private def planeMatrix(nBits: Int, seed: Int): Seq[Seq[Double]] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Seq.tabulate(nBits, MaxPlaneDim) { (b, d) =>
      (mix(seed.toLong * 0x100000001L + b.toLong * 65537L + d).toDouble /
        9.223372036854776e18) / 2.0
    }
  }

  /** `size(v)`, failing the query at runtime if the vector is wider than
    * the plane matrix. Without this, `slice` would truncate the plane to
    * [[MaxPlaneDim]] elements, `zip_with` would pad with NULLs, every dot
    * would be NULL and every signature all-zero — valid-looking output
    * that degenerates LSH bucketing into a near cross-join. `assert_true`
    * is NULL on success, so `coalesce(cast(...), 0)` adds nothing.
    */
  private def checkedSize(v: Column): Column =
    size(v) + coalesce(
      assert_true(size(v) <= MaxPlaneDim,
        concat(lit("embedding dimension "), size(v).cast("string"),
          lit(s" exceeds Vectors.MaxPlaneDim=$MaxPlaneDim"))).cast("int"),
      lit(0))

  /** Dot product of vector column `v` with hyperplane `plane` (0-based
    * Column index into the literal plane matrix).
    */
  def hyperplaneDot(v: Column, plane: Column, seed: Int,
                    nBits: Int = 32): Column = {
    val planes = typedLit(planeMatrix(nBits, seed))
    aggregate(
      zip_with(v, slice(element_at(planes, plane.cast("int") + 1), lit(1), checkedSize(v)),
        (x, p) => x.cast("double") * p),
      lit(0.0), (acc, x) => acc + x)
  }

  /** Random-hyperplane signature of `v`: `nBits` sign bits as an int array.
    * Served by the native single-pass expression
    * ([[org.apache.spark.sql.graft.VectorExprs.RhpSignatureExpr]]); the
    * plane values derive from the same splitmix64 formula as
    * [[planeMatrix]], so signatures are identical to the composed
    * higher-order-function form (which [[hyperplaneDot]] still uses).
    */
  def rhpSignature(v: Column, nBits: Int, seed: Int): Column =
    org.apache.spark.sql.graft.VectorExprs.rhpSignature(v, nBits, seed)

  /** Pack a bit array (little-endian) into a single long. */
  def packBits(bits: Column): Column =
    aggregate(
      zip_with(bits, sequence(lit(0), size(bits) - 1),
        (bit, i) => call_function("shiftleft", bit.cast("long"), i)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))

  /** L2-normalized copy of `v` as `array<double>` (all-zero vectors pass
    * through unchanged). Normalizing once at ingest makes every downstream
    * cosine a plain dot product — at corpus scale that halves the ANN
    * inner-loop cost and lets pre-normalized int8 vectors ([[quantizeInt8]])
    * serve similarity search directly.
    */
  def l2normalize(v: Column): Column =
    graft.functions.TextFunctions.let1(norm(v)) { n =>
      when(n === 0.0, transform(v, x => x.cast("double")))
        .otherwise(transform(v, x => x.cast("double") / n))
    }

  /** Symmetric per-vector int8 quantization:
    * `struct(scale double, q array<int>)` with
    * `scale = max|v_i| / 127` and `q_i = floor(v_i/scale + 0.5)` clamped to
    * [-127, 127] (`floor(x + 0.5)` instead of `round` — floor has identical
    * semantics in every engine, so the differential oracle is tie-free).
    * All-zero vectors get `scale = 0`, `q = 0...`.
    *
    * Scale rationale: 4 bytes → 1 byte per component cuts the shuffle and
    * storage footprint of a 100 TB embedding corpus 4×, and the integer dot
    * product ([[dotInt]]) is exact — cosine over quantized vectors equals
    * cosine over [[dequantize]]d ones (the scales cancel).
    */
  def quantizeInt8(v: Column): Column =
    graft.functions.TextFunctions.let1(
      array_max(transform(v, x => abs(x.cast("double")))) / 127.0) { s =>
      struct(s.as("scale"),
        when(s === 0.0, transform(v, _ => lit(0)))
          .otherwise(transform(v, x =>
            greatest(lit(-127), least(lit(127),
              floor(x.cast("double") / s + 0.5).cast("int"))))).as("q"))
    }

  /** Reconstruct doubles from an int8-quantized vector. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Exact integer dot product of two quantized vectors (fits a long for
    * any realistic dimension: 127² × dim).
    */
  def dotInt(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Per-key mean vector — class prototypes / centroids over an embedding
    * column. Shape: one (key, dimension) shuffle with map-side partial
    * sums (never a collect of vectors), means re-assembled per key by a
    * sorted collect over |dims| rows — the k-means update step as a
    * standalone operator. Sums route through wide decimal so the per-dim
    * mean is partitioning- and engine-independent (the [[graft.Tables.dsum]]
    * discipline applied per dimension); count is rows per key.
    * Output: (keyCol, n_vecs, mean: array<double>).
    */
  def meanByKey(df: org.apache.spark.sql.DataFrame, keyCol: String,
                vecCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(keyCol), posexplode(col(vecCol)).as(Seq("g_d", "g_x")))
      .groupBy(col(keyCol), col("g_d"))
      .agg(count(lit(1)).as("g_n"),
        (graft.Tables.dsum(col("g_x")) / count(lit(1)).cast("double"))
          .as("g_m"))
      .groupBy(col(keyCol))
      .agg(max(col("g_n")).as("n_vecs"),
        transform(array_sort(collect_list(struct(col("g_d"), col("g_m")))),
          s => s.getField("g_m")).as("mean"))
}
