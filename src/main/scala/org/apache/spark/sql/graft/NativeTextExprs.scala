package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType, StringType}

/** Native Catalyst expressions for the hash-sketch hot path.
  *
  * The composed higher-order-function versions re-hash every shingle string
  * once per signature component (64×) because each `array_min(transform(…))`
  * is an independent pass; these single-pass expressions hash each string
  * ONCE and derive the per-component values with cheap long-mixing —
  * bit-identical results (same `XxHash64Function` chain as
  * `xxhash64(s, lit(i))`) at a fraction of the cost. This is the extension
  * tier the reference reserves for its JS codegen
  * (`jscodegen/JSAggGenerator.scala`), re-expressed as a first-class
  * Catalyst `Expression`. Codegen note: higher-order functions don't
  * participate in whole-stage codegen either, so `CodegenFallback` here
  * gives up nothing while the interpreted loop works on primitive arrays.
  *
  * Lives under `org.apache.spark.sql` because `AbstractDataType` /
  * `ExpressionUtils` are `private[sql]` — the same packaging the reference
  * uses for its Spark-internal extension points
  * (`src/main/scala/org/apache/spark/sql/sources/druid/`).
  */
object NativeTextExprs {

  private val Seed = 42L

  /** MinHash signature over a pre-computed shingle array: component `i` is
    * `min over shingles of xxhash64(shingle, i)`; empty input yields all
    * `Long.MaxValue` (matching the composed implementation).
    */
  case class MinHashSignatureExpr(child: Expression, numHashes: Int)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_signature"

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val mins = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val s = arr.getUTF8String(i)
        if (s != null) {
          val base = XxHash64Function.hash(s, StringType, Seed)
          var j = 0
          while (j < numHashes) {
            // primitive path of xxhash64(int, seed) — identical values to
            // XxHash64Function.hash(j, IntegerType, base), no boxing
            val h = XXH64.hashInt(j, base)
            if (h < mins(j)) mins(j) = h
            j += 1
          }
        }
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(mins)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** 64-bit SimHash over a token array: bit `b` is set iff more token
    * hashes have bit `b` set than clear (ties -> 0, matching the composed
    * `ones * 2 > n` form where `n` counts all tokens).
    */
  case class SimHash64Expr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val counts = new Array[Int](64)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        if (s != null) {
          val h = XxHash64Function.hash(s, StringType, Seed)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1
            b += 1
          }
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) {
        if (counts(b) * 2 > n) out |= (1L << b)
        b += 1
      }
      out
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** 62-bit SQL-portable SimHash over a token array — the single-pass
    * evaluation of [[graft.functions.TextFunctions.simhashPoly62]]'s
    * composed form (which remains the spec reference): per token a base-31
    * polynomial hash of the UTF-16 code units mod 2^31-1 (matching the
    * `split(t,"") -> ascii` column chain and DuckDB's `ord`), two Lehmer²
    * mixes (salts 1/2), 31-bit majority votes (ties SET the bit, `>=`),
    * packed `low + high * 2^31`. Integer arithmetic only — bit-identical
    * to the oracle restatement by construction.
    */
  case class SimHashPoly62Expr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash_poly62"

    private val M = 2147483647L

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n == 0) return 0L
      val c1 = new Array[Int](31)
      val c2 = new Array[Int](31)
      var i = 0
      var counted = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        if (s != null) {
          val str = s.toString
          var h = 0L
          var j = 0
          // code points, not chars: split(t,"") keeps surrogate pairs
          // together (Java regex splits between code points) and ascii()
          // returns codePointAt(0) — as does DuckDB's ord()
          while (j < str.length) {
            val cp = str.codePointAt(j)
            h = (h * 31L + cp) % M
            j += Character.charCount(cp)
          }
          val t1 = ((h + 1L) * 48271L % M) * 48271L % M
          val t2 = ((h + 2L) * 48271L % M) * 48271L % M
          var b = 0
          while (b < 31) {
            if (((t1 >>> b) & 1L) == 1L) c1(b) += 1
            if (((t2 >>> b) & 1L) == 1L) c2(b) += 1
            b += 1
          }
          counted += 1
        }
        i += 1
      }
      // the composed form's size(th) counts every array slot; tokens()
      // never yields nulls, so counted == n in practice — still vote
      // against n for exact parity with the column chain
      var lo = 0L
      var hi = 0L
      var b = 0
      while (b < 31) {
        if (c1(b) * 2 >= n) lo |= (1L << b)
        if (c2(b) * 2 >= n) hi |= (1L << b)
        b += 1
      }
      lo + hi * 2147483648L
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Order-sensitive 64-bit rolling fingerprint of a token array:
    * `h = xxhash64(h, token)` folded over the tokens from `h = 0` —
    * bit-identical to `aggregate(tokens, 0L, (acc, t) => xxhash64(acc, t))`
    * (each step re-seeds with the accumulator: hash(t, hashLong(acc, 42))),
    * evaluated in one primitive loop instead of a per-element lambda frame.
    */
  case class Fingerprint64Expr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = LongType
    override def prettyName: String = "fingerprint64"

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      var acc = 0L
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val s = arr.getUTF8String(i)
        // xxhash64(acc, t) = fold over the two children from seed 42; a
        // NULL child leaves the running hash unchanged (Spark semantics)
        val seeded = XXH64.hashLong(acc, Seed)
        acc = if (s == null) seeded else XxHash64Function.hash(s, StringType, seeded)
        i += 1
      }
      acc
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Distinct hashed word-`k`-shingles of a token array, as longs — the
    * shuffle-ready form of the shingle set. Window hashes chain the
    * per-token xxhash64 values (k fold steps per window, order-sensitive)
    * instead of materializing the joined shingle string, so a document
    * costs n token hashes + n*k long mixes and ZERO string allocation.
    * Set semantics match the string shingle set barring 64-bit collisions
    * within one document pair (~(shingles/doc)^2 / 2^64 — negligible).
    * Same windowing as `TextFunctions.shingles`: n <= k tokens form one
    * whole-text shingle; empty input yields an empty array.
    */
  case class ShingleHashSetExpr(child: Expression, k: Int)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "shingle_hash_set"

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n == 0) return new GenericArrayData(Array.empty[Long])
      val th = new Array[Long](n)
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        th(i) = if (s == null) Seed else XxHash64Function.hash(s, StringType, Seed)
        i += 1
      }
      val width = if (n <= k) n else k
      val out = new java.util.HashSet[java.lang.Long]()
      var start = 0
      val last = n - width
      while (start <= last) {
        var h = Seed
        var j = 0
        while (j < width) { h = XXH64.hashLong(th(start + j), h); j += 1 }
        out.add(h)
        start += 1
      }
      val res = new Array[Long](out.size)
      val it = out.iterator()
      i = 0
      while (it.hasNext) { res(i) = it.next(); i += 1 }
      new GenericArrayData(res)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Language ID heuristic in one pass: any CJK ideograph → "zh";
    * otherwise the language (in declaration order) whose function-word
    * marker set hits the most lowercased whitespace tokens; zero hits →
    * "und". Exactly the semantics of the composed `TextFunctions.langId`
    * column algebra (which re-walked the token array once per language).
    */
  case class LangIdExpr(child: Expression, markers: Seq[(String, Seq[String])])
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def prettyName: String = "lang_id"

    @transient private lazy val sets: Array[(String, java.util.HashSet[String])] =
      markers.map { case (l, ws) =>
        val s = new java.util.HashSet[String]()
        ws.foreach(s.add)
        l -> s
      }.toArray
    @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

    override protected def nullSafeEval(input: Any): Any = {
      val text = input.toString
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        if (c >= 0x4e00 && c <= 0x9fff)
          return org.apache.spark.unsafe.types.UTF8String.fromString("zh")
        i += 1
      }
      // ROOT locale: matching Spark's lower(), immune to e.g. Turkish-I
      val trimmed = text.trim.toLowerCase(java.util.Locale.ROOT)
      val scores = new Array[Int](sets.length)
      if (trimmed.nonEmpty) {
        val toks = ws.split(trimmed)
        var t = 0
        while (t < toks.length) {
          var l = 0
          while (l < sets.length) {
            if (sets(l)._2.contains(toks(t))) scores(l) += 1
            l += 1
          }
          t += 1
        }
      }
      var best = 0
      var bestIdx = -1
      var l = 0
      while (l < sets.length) {
        if (scores(l) > best) { best = scores(l); bestIdx = l }
        l += 1
      }
      org.apache.spark.unsafe.types.UTF8String.fromString(
        if (bestIdx < 0) "und" else sets(bestIdx)._1)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Single-vote 31-bit poly SimHash — the
    * [[graft.functions.TextFunctions.simhashPoly]] chain in one primitive
    * pass (per-token base-31 code-point polynomial mod 2^31−1, then a
    * 31-bit majority vote against the token count; ties set the bit,
    * empty → 0). Bit-identical to the composed HOF chain, which the
    * DuckDB oracle restates; this evaluation avoids its per-character
    * 1-element string arrays and 31 re-folds of the hash list.
    */
  case class SimHashPoly31Expr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash_poly31"

    private val M = 2147483647L

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n == 0) return 0L
      val c = new Array[Int](31)
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        if (s != null) {
          val str = s.toString
          var h = 0L
          var j = 0
          while (j < str.length) {
            val cp = str.codePointAt(j)
            h = (h * 31L + cp) % M
            j += Character.charCount(cp)
          }
          var b = 0
          while (b < 31) {
            if (((h >>> b) & 1L) == 1L) c(b) += 1
            b += 1
          }
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 31) {
        if (c(b) * 2 >= n) out |= (1L << b)
        b += 1
      }
      out
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Order-sensitive chain fingerprint over poly token hashes — the
    * [[graft.functions.TextFunctions.chainFingerprintPoly]] chain
    * (`a = (a*131 + h) mod 2^31−1` over the per-token polynomials) in one
    * pass; empty → 0. Bit-identical to the composed form the oracle
    * restates.
    */
  case class ChainFingerprintPolyExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = LongType
    override def prettyName: String = "chain_fingerprint_poly"

    private val M = 2147483647L

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var acc = 0L
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        var h = 0L
        if (s != null) {
          val str = s.toString
          var j = 0
          while (j < str.length) {
            val cp = str.codePointAt(j)
            h = (h * 31L + cp) % M
            j += Character.charCount(cp)
          }
        }
        acc = (acc * 131L + h) % M
        i += 1
      }
      acc
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Gopher word-n-gram repetition statistics
    * ([[graft.operators.Quality.ngramRepetitionCols]]) in ONE pass: the
    * composed column-algebra form walked the gram array through five
    * interpreted higher-order folds (sort fold, best-run fold, dup-collect
    * fold, then an O(m·n·|dups|) coverage scan with per-step expression-tree
    * evaluation); this expression computes the identical statistics with
    * primitive loops — same gram construction (space-joined token slices),
    * same binary-order sort (UTF8String.compareTo == array_sort), same
    * strictly-greater best-run update (ties keep the lexicographically
    * smallest gram), same position-coverage union, same double arithmetic
    * — so results are bit-identical.
    */
  case class NgramRepetitionExpr(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("top_ngram_char_frac",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("dup_ngram_char_frac",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    override def prettyName: String = "ngram_repetition"

    // NON-null-propagating (r20 ADVICE): the composed column algebra this
    // replaced fell through its when/otherwise branches to struct(0.0, 0.0)
    // for a null token array, so a null-text document scores zero and
    // PASSES a <=-threshold gopher filter instead of being silently dropped
    override def nullable: Boolean = false
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(input)
      if (v == null)
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](0.0, 0.0))
      else nullSafeEval(v)
    }

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val m = arr.numElements()
      val toks = new Array[org.apache.spark.unsafe.types.UTF8String](m)
      var total = 0L
      var i = 0
      while (i < m) {
        val s = arr.getUTF8String(i)
        toks(i) = s
        if (s != null) total += s.numChars()
        i += 1
      }
      val g = if (m >= n) m - (n - 1) else 0
      val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
      val ngs = new Array[org.apache.spark.unsafe.types.UTF8String](g)
      i = 0
      while (i < g) {
        ngs(i) = org.apache.spark.unsafe.types.UTF8String
          .concatWs(sep, java.util.Arrays.copyOfRange(toks, i, i + n): _*)
        i += 1
      }
      val sorted = ngs.clone()
      // UTF8String.compareTo is binary order — identical to array_sort
      java.util.Arrays.sort(sorted.asInstanceOf[Array[Object]])
      var bestCnt = 0L
      var bestNg: org.apache.spark.unsafe.types.UTF8String = null
      var dups: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = null
      var run = 0L
      var prev: org.apache.spark.unsafe.types.UTF8String = null
      i = 0
      while (i < g) {
        val x = sorted(i)
        run = if (prev != null && x.equals(prev)) run + 1 else 1L
        if (run > bestCnt) { bestCnt = run; bestNg = x }
        if (run == 2L) {
          if (dups == null)
            dups = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
          dups.add(x)
        }
        prev = x
        i += 1
      }
      var cov = 0L
      if (total > 0 && dups != null) {
        val isDup = new Array[Boolean](g)
        i = 0
        while (i < g) { isDup(i) = dups.contains(ngs(i)); i += 1 }
        var p = 0 // 0-based token position; covered iff a duplicated gram
        var q0 = 0 //   starts in [p-n+1, p] clamped to valid starts
        while (p < m) {
          q0 = math.max(0, p - (n - 1))
          val qHi = math.min(p, g - 1)
          var hit = false
          var q = q0
          while (!hit && q <= qHi) { hit = isDup(q); q += 1 }
          if (hit && toks(p) != null) cov += toks(p).numChars()
          p += 1
        }
      }
      val top =
        if (total > 0 && bestCnt > 0)
          math.min(1.0,
            (bestCnt * (bestNg.numChars() - (n - 1)).toLong).toDouble /
              total.toDouble)
        else 0.0
      val dup = if (total > 0) cov.toDouble / total.toDouble else 0.0
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](top, dup))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def ngramRepetition(tokenArray: Column, n: Int): Column =
    ExpressionUtils.column(
      NgramRepetitionExpr(ExpressionUtils.expression(tokenArray), n))

  /** Pair-emission predicate for [[PairExpandExpr]] — which (i, j) pairs of
    * a posting list survive the in-list expansion.
    */
  sealed trait PairPredicate extends Serializable
  /** Every positional pair (plain bucket expansion). */
  case object AllPairs extends PairPredicate
  /** Size-ratio prune on packed (id << szBits | size) entries:
    * `min(szA, szB) >= max(szA, szB) * t` — pairs that cannot reach
    * Jaccard `t` are never emitted (same double arithmetic as the
    * composed `least(...).cast(double) >= greatest(...) * t`).
    */
  case class SizeRatio(threshold: Double, szBits: Int) extends PairPredicate
  /** Delta-index predicate on (id << (szBits+1) | isNew << szBits | size)
    * entries: at least one side new, plus the size-ratio prune.
    */
  case class DeltaSizeRatio(threshold: Double, szBits: Int) extends PairPredicate

  /** Positional in-list pair expansion (i < j) over a packed-long posting
    * list in ONE primitive pass: the composed
    * `flatten(transform(docs, (a,i) => transform(filter(slice(...)...))))`
    * chain runs interpreted (higher-order functions don't participate in
    * whole-stage codegen) and dominated the inverted-index dedup family
    * (measured ~0.5 s of each ~1.2 s sf0.1 gate). Emits
    * `struct(<aName> = least(a,b), <bName> = greatest(a,b))` exactly like
    * the composed form, so downstream unpack/count logic is unchanged.
    */
  // `maxInputLen` (when set) is the caller's posting-list cap, re-asserted
  // here: the expansion materializes all n(n-1)/2 surviving pairs of one
  // list in a single eval, so an unpruned bucket that slipped past the
  // upstream `size(...) <= cap` filter would be an O(n²) allocation inside
  // one expression call — fail fast with the list length instead.
  case class PairExpandExpr(child: Expression, aName: String, bName: String,
                            pred: PairPredicate,
                            maxInputLen: Option[Int] = None)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(aName, LongType, nullable = false),
        org.apache.spark.sql.types.StructField(bName, LongType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "pair_expand"

    override protected def nullSafeEval(input: Any): Any = {
      val docs = input.asInstanceOf[ArrayData].toLongArray()
      val n = docs.length
      maxInputLen.foreach(cap => require(n <= cap,
        s"pair_expand: posting list of $n entries exceeds the declared cap " +
          s"$cap — the upstream df-cap filter must run before expansion"))
      val out = new scala.collection.mutable.ArrayBuffer[Any]()
      var i = 0
      while (i < n) {
        val a = docs(i)
        var j = i + 1
        while (j < n) {
          val b = docs(j)
          val ok = pred match {
            case AllPairs => true
            case SizeRatio(t, szBits) =>
              val mask = (1L << szBits) - 1
              val sa = a & mask
              val sb = b & mask
              math.min(sa, sb).toDouble >= math.max(sa, sb).toDouble * t
            case DeltaSizeRatio(t, szBits) =>
              val mask = (1L << szBits) - 1
              val newA = (a >>> szBits) & 1L
              val newB = (b >>> szBits) & 1L
              val sa = a & mask
              val sb = b & mask
              (newA + newB >= 1L) &&
                math.min(sa, sb).toDouble >= math.max(sa, sb).toDouble * t
          }
          if (ok)
            out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              Array[Any](math.min(a, b), math.max(a, b)))
          j += 1
        }
        i += 1
      }
      new GenericArrayData(out.toArray)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** In-bucket SimHash pair expansion over `array<struct<id: long,
    * sig: long>>`: emits `(idA, idB, hamming)` with `idA = least(id, id)`,
    * `idB = greatest`, `hamming = bit_count(sigA ^ sigB)` — the composed
    * nested-transform form, in one primitive pass.
    */
  case class SimhashPairExpandExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("idA", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("idB", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("hamming", IntegerType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "simhash_pair_expand"

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val ids = new Array[Long](n)
      val sigs = new Array[Long](n)
      var i = 0
      while (i < n) {
        val r = arr.getStruct(i, 2)
        ids(i) = r.getLong(0)
        sigs(i) = r.getLong(1)
        i += 1
      }
      val out = new Array[Any](n * (n - 1) / 2)
      var k = 0
      i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](math.min(ids(i), ids(j)), math.max(ids(i), ids(j)),
              java.lang.Long.bitCount(sigs(i) ^ sigs(j))))
          k += 1
          j += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** [[SimhashPairExpandExpr]] over a FLAT interleaved `[id0, sig0, id1,
    * sig1, ...]` long array (the [[CollectLongPairsExpr]] buffer layout):
    * same emitted `(idA, idB, hamming)` rows, without the per-element
    * struct access on the way in.
    */
  case class SimhashPairExpandFlatExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("idA", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("idB", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("hamming", IntegerType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "simhash_pair_expand_flat"

    override protected def nullSafeEval(input: Any): Any = {
      val flat = input.asInstanceOf[ArrayData].toLongArray()
      val n = flat.length / 2
      val out = new Array[Any](n * (n - 1) / 2)
      var k = 0
      var i = 0
      while (i < n) {
        val idI = flat(2 * i)
        val sigI = flat(2 * i + 1)
        var j = i + 1
        while (j < n) {
          val idJ = flat(2 * j)
          out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](math.min(idI, idJ), math.max(idI, idJ),
              java.lang.Long.bitCount(sigI ^ flat(2 * j + 1))))
          k += 1
          j += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def simhashPairExpandFlat(flatArray: Column): Column =
    ExpressionUtils.column(
      SimhashPairExpandFlatExpr(ExpressionUtils.expression(flatArray)))

  /** LSH band buckets of a long signature in one pass: band `b`'s bucket is
    * `xxhash64(concat_ws(",", <band components as strings>, b))` — byte-
    * identical to the composed `xxhash64(concat_ws(",", transform(slice(sig,
    * b*r+1, r), cast string), cast(b as string)))` (same decimal rendering,
    * same separator, same seed-42 hash), without the per-band interpreted
    * lambda + string-expression tree.
    */
  case class BandBucketsExpr(child: Expression, bands: Int, rowsPerBand: Int)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

    override def inputTypes: Seq[AbstractDataType] = Seq(
      org.apache.spark.sql.types.TypeCollection(
        ArrayType(LongType), ArrayType(IntegerType)))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "band_buckets"

    @transient private lazy val elemIsInt: Boolean = child.dataType match {
      case ArrayType(IntegerType, _) => true
      case _                         => false
    }

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      // int and long elements render the same decimal digits via cast to
      // string, so one long-path covers both signature element types
      val sig = if (elemIsInt) arr.toIntArray().map(_.toLong)
                else arr.toLongArray()
      require(sig.length >= bands * rowsPerBand,
        s"band_buckets: signature of ${sig.length} elements is shorter than " +
          s"bands*rowsPerBand = ${bands * rowsPerBand}")
      val out = new Array[Long](bands)
      val sb = new java.lang.StringBuilder(rowsPerBand * 21 + 4)
      var b = 0
      while (b < bands) {
        sb.setLength(0)
        var j = 0
        while (j < rowsPerBand) {
          if (j > 0) sb.append(',')
          sb.append(sig(b * rowsPerBand + j))
          j += 1
        }
        sb.append(',').append(b)
        out(b) = XxHash64Function.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString),
          StringType, Seed)
        b += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Per-start window hashes of a token array in ONE pass: token `i` is
    * hashed once (`xxhash64(token)`), window `s` is the xxhash64 fold of
    * its `k` token hashes — byte-identical to the composed
    * `transform(sequence(1, n-k+1), i => xxhash64(slice(th, i, k)))` over
    * `th = transform(toks, xxhash64)` (same seed-42 chain, same null
    * skipping), without the interpreted per-window lambda + slice
    * allocation. Empty result when fewer than `k` tokens.
    */
  case class SpanWindowHashesExpr(child: Expression, k: Int)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "span_window_hashes"

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n < k) return new GenericArrayData(Array.empty[Long])
      val th = new Array[Long](n)
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        th(i) = if (s == null) Seed else XxHash64Function.hash(s, StringType, Seed)
        i += 1
      }
      val out = new Array[Long](n - k + 1)
      var start = 0
      while (start <= n - k) {
        var h = Seed
        var j = 0
        while (j < k) { h = XXH64.hashLong(th(start + j), h); j += 1 }
        out(start) = h
        start += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Rebuild a document's uncovered text in ONE pass:
    * `concat_ws(" ", <tokens whose 0-based position is NOT in cov>)` —
    * exactly the composed
    * `when(size(toks) = 0, "") otherwise concat_ws(" ",
    * transform(array_except(sequence(0, size-1), coalesce(cov, [])),
    * p -> element_at(toks, p+1)))`, without allocating the position
    * sequence, the except result, and the transformed array per document
    * (the interpreted chain's allocation rate made the span rebuild
    * anti-scale 32-vs-8 cores at 500k documents). Null/empty token array
    * → "" (concat_ws over a null array yields "" in the composed form);
    * null cov (no covered window joined) → full text; null tokens are
    * skipped exactly like concat_ws does.
    */
  case class KeptTextExpr(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {

    override def dataType: DataType = StringType
    override def nullable: Boolean = false
    override def prettyName: String = "kept_text"

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val toksV = left.eval(input)
      if (toksV == null)
        return org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
      val toks = toksV.asInstanceOf[ArrayData]
      val n = toks.numElements()
      if (n == 0)
        return org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
      val covered = new Array[Boolean](n)
      val covV = right.eval(input)
      if (covV != null) {
        val cov = covV.asInstanceOf[ArrayData]
        var i = 0
        val m = cov.numElements()
        while (i < m) {
          val c = cov.getInt(i)
          if (c >= 0 && c < n) covered(c) = true
          i += 1
        }
      }
      val kept =
        new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var i = 0
      var k = 0
      while (i < n) {
        if (!covered(i)) {
          val s = toks.getUTF8String(i)
          if (s != null) { kept(k) = s; k += 1 }
        }
        i += 1
      }
      org.apache.spark.unsafe.types.UTF8String.concatWs(
        org.apache.spark.unsafe.types.UTF8String.fromString(" "),
        java.util.Arrays.copyOf(kept, k): _*)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def keptText(tokenArray: Column, coveredPositions: Column): Column =
    ExpressionUtils.column(
      KeptTextExpr(ExpressionUtils.expression(tokenArray),
        ExpressionUtils.expression(coveredPositions)))

  def spanWindowHashes(tokenArray: Column, k: Int): Column =
    ExpressionUtils.column(
      SpanWindowHashesExpr(ExpressionUtils.expression(tokenArray), k))

  def pairExpand(packedArray: Column, aName: String, bName: String,
                 pred: PairPredicate,
                 maxInputLen: Option[Int] = None): Column =
    ExpressionUtils.column(
      PairExpandExpr(ExpressionUtils.expression(packedArray), aName, bName,
        pred, maxInputLen))

  def simhashPairExpand(docsArray: Column): Column =
    ExpressionUtils.column(
      SimhashPairExpandExpr(ExpressionUtils.expression(docsArray)))

  def bandBuckets(sigArray: Column, bands: Int, rowsPerBand: Int): Column =
    ExpressionUtils.column(
      BandBucketsExpr(ExpressionUtils.expression(sigArray), bands, rowsPerBand))

  def langIdNative(text: Column, markers: Seq[(String, Seq[String])]): Column =
    ExpressionUtils.column(LangIdExpr(ExpressionUtils.expression(text), markers))

  def minhashSignature(shingleArray: Column, numHashes: Int): Column =
    ExpressionUtils.column(
      MinHashSignatureExpr(ExpressionUtils.expression(shingleArray), numHashes))

  def shingleHashSet(tokenArray: Column, k: Int): Column =
    ExpressionUtils.column(
      ShingleHashSetExpr(ExpressionUtils.expression(tokenArray), k))

  def simhash64(tokenArray: Column): Column =
    ExpressionUtils.column(SimHash64Expr(ExpressionUtils.expression(tokenArray)))

  def simhashPoly62(tokenArray: Column): Column =
    ExpressionUtils.column(SimHashPoly62Expr(ExpressionUtils.expression(tokenArray)))

  def simhashPoly31(tokenArray: Column): Column =
    ExpressionUtils.column(SimHashPoly31Expr(ExpressionUtils.expression(tokenArray)))

  def chainFingerprintPoly(tokenArray: Column): Column =
    ExpressionUtils.column(
      ChainFingerprintPolyExpr(ExpressionUtils.expression(tokenArray)))

  def fingerprint64(tokenArray: Column): Column =
    ExpressionUtils.column(Fingerprint64Expr(ExpressionUtils.expression(tokenArray)))
}
