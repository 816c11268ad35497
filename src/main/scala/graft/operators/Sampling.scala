package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines:
  * uniform row sampling, per-stratum sampling, and train/val/test split
  * assignment — all driven by a Lehmer (Park–Miller) hash of a stable row
  * key instead of an RNG.
  *
  * Why hash-based and not `df.sample`/`rand()`:
  *   - **Reproducible** across runs, engines, partitionings and retries — a
  *     task retry under `rand()` resamples different rows (breaks
  *     exactly-once semantics of a 100 TB pipeline run); a key hash never
  *     does.
  *   - **Cross-engine restatable**: the bucket arithmetic is plain integer
  *     modular math, so the exact sample membership is reproducible in any
  *     SQL engine (the DuckDB oracle re-derives it independently).
  *   - **Embarrassingly parallel**: a per-row filter expression — no
  *     shuffle, no state, survives predicate pushdown (Catalyst pushes the
  *     filter to the scan), and composes with every other operator.
  *
  * The reference engine has no sampling surface (its closest feature is the
  * approximate TopN rewrite, `QuerySpecTransforms.scala:279-332`); this is
  * part of the beyond-parity training-data layer.
  */
object Sampling {

  /** Modulus of the bucket space: 2^31 - 1 (prime, so the multiplier walks
    * the full residue ring and low-order key patterns don't alias into
    * bucket patterns).
    */
  val Modulus: Long = 2147483647L

  /** Park–Miller MINSTD multiplier, applied twice: a single round of
    * `k * 48271 mod M` never wraps for keys below ~44k (the bucket would
    * just be `44k × key` — all small), while the composed two-round
    * multiplier `48271² mod M = 182,605,794` wraps for every key ≥ 12. Each
    * intermediate stays well under 2^63, so the arithmetic is exact in any
    * engine with 64-bit integers.
    *
    * This is multiplicative (Weyl-style) hashing: equidistributed over any
    * key range, but linear — adjacent keys map to buckets ~0.085·M apart,
    * not independently. Good for sampling by synthetic ids; for adversarial
    * or structured keys, hash first (e.g.
    * [[graft.functions.TextFunctions.fingerprint]]) and bucket that.
    */
  val Multiplier: Long = 48271L

  /** Pseudo-random bucket in `[0, Modulus)` for a non-negative long key.
    * Distinct salts give distinct samples (resampling, multiple epochs);
    * the `+ salt + 1` seeds the generator off zero so key 0 still mixes.
    */
  def bucket(key: Column, salt: Long = 0L): Column = {
    val seeded = pmod(key.cast("long"), lit(Modulus)) + lit(salt + 1L)
    pmod(pmod(seeded * lit(Multiplier), lit(Modulus)) * lit(Multiplier),
      lit(Modulus))
  }

  /** The same bucket arithmetic as ANSI SQL over a non-negative key
    * expression (DuckDB `%` matches `pmod` for non-negative operands).
    */
  def bucketSql(keyExpr: String, salt: Long = 0L): String =
    s"(((($keyExpr) % $Modulus + ${salt + 1L}) * $Multiplier) % $Modulus) " +
      s"* $Multiplier % $Modulus"

  /** Bucket threshold for a fraction in [0, 1]. */
  def thresholdOf(fraction: Double): Long =
    math.round(fraction * Modulus)

  /** Keep a deterministic `fraction` of rows, keyed by `key`. The predicate
    * is a scan-pushable filter: at 100 TB a 1% sample reads all row groups
    * but materializes and shuffles only the sampled 1%.
    */
  def sample(df: DataFrame, key: Column, fraction: Double,
             salt: Long = 0L): DataFrame =
    df.filter(bucket(key, salt) < lit(thresholdOf(fraction)))

  /** Per-stratum sampling: rows whose `stratum` value maps to a fraction in
    * `fractions` are sampled at that rate, everything else at
    * `defaultFraction`. One pass, no shuffle — unlike
    * `DataFrameStatFunctions.sampleBy` this is deterministic and needs no
    * stratum-size pre-pass; rebalancing a skewed corpus (e.g. downsample
    * English to 10%, keep low-resource languages whole) is the typical use.
    */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
                       fractions: Map[String, Double],
                       defaultFraction: Double, salt: Long = 0L): DataFrame = {
    val threshold = fractions.foldLeft(lit(thresholdOf(defaultFraction))) {
      case (acc, (value, f)) =>
        when(stratum === lit(value), lit(thresholdOf(f))).otherwise(acc)
    }
    df.filter(bucket(key, salt) < threshold)
  }

  /** Quality-weighted (importance) sampling: keep each row with
    * probability `clamp(weight, 0, 1)`, decided only by its key — the
    * weight is typically a per-document quality score, so high-quality
    * text survives at a higher rate while membership stays deterministic
    * under reruns, repartitioning, and appends (unlike `rand()`-gated
    * filters). Still a scan-pushable one-pass filter: no shuffle, and at
    * 100 TB only the kept rows materialize past the scan.
    *
    * Rounding is explicit `floor` (not a cast) because engines disagree on
    * double→int casts (Spark truncates, DuckDB rounds half-even);
    * `floor` + the shared bucket arithmetic make the kept set bit-equal
    * across engines ([[importanceSampleSql]]).
    */
  def importanceSample(df: DataFrame, key: Column, weight: Column,
                       salt: Long = 0L): DataFrame = {
    val clamped = least(greatest(weight.cast("double"), lit(0.0)), lit(1.0))
    df.filter(bucket(key, salt) <
      floor(clamped * lit(Modulus.toDouble)).cast("long"))
  }

  /** The same keep-predicate as ANSI SQL (oracle restatement). */
  def importanceSampleSql(keyExpr: String, weightExpr: String,
                          salt: Long = 0L): String =
    s"(${bucketSql(keyExpr, salt)}) < CAST(floor(" +
      s"least(greatest(CAST($weightExpr AS DOUBLE), 0.0), 1.0) * " +
      s"$Modulus.0) AS BIGINT)"

  /** Deterministic split assignment (e.g. train/val/test). `weights` are
    * (name, weight) pairs; each row lands in exactly one split with
    * probability weight/total, decided only by its key — so membership is
    * stable under reruns, re-partitioning, and incremental appends (a new
    * row never moves an old row between splits, the failure mode of
    * `randomSplit` on growing data).
    */
  def assignSplit(key: Column, weights: Seq[(String, Double)],
                  salt: Long = 0L): Column = {
    require(weights.nonEmpty, "assignSplit needs at least one split")
    val total = weights.map(_._2).sum
    val cuts = weights.scanLeft(0.0)(_ + _._2).tail
      .map(c => thresholdOf(c / total))
    val b = bucket(key, salt)
    // last split takes the remainder so the cuts always cover [0, Modulus)
    weights.init.zip(cuts).foldRight(lit(weights.last._1): Column) {
      case (((name, _), cut), acc) => when(b < lit(cut), lit(name)).otherwise(acc)
    }
  }

  /** The split-assignment expression as ANSI SQL (for the oracle and for
    * engines without the Column API).
    */
  def assignSplitSql(keyExpr: String, weights: Seq[(String, Double)],
                     salt: Long = 0L): String = {
    val total = weights.map(_._2).sum
    val cuts = weights.scanLeft(0.0)(_ + _._2).tail
      .map(c => thresholdOf(c / total))
    val b = bucketSql(keyExpr, salt)
    val whens = weights.init.zip(cuts)
      .map { case ((name, _), cut) => s"WHEN $b < $cut THEN '$name'" }
      .mkString(" ")
    s"CASE $whens ELSE '${weights.last._1}' END"
  }

  /** Leakage-safe train/val/test split: every member of a near-duplicate
    * cluster lands in the SAME split. Splitting by document id leaks
    * near-duplicates across the train/eval boundary (the eval-inflation
    * failure Lee et al. 2022 §6 measure); keying the split hash on the
    * cluster REPRESENTATIVE (own id when unclustered) makes the boundary
    * respect duplicate structure while staying deterministic and
    * append-stable like [[assignSplit]].
    *
    * `clusters` is [[Dedup.connectedComponents]] output — (node,
    * component) pairs, one row per clustered document. It is proportional
    * to the DUPLICATE count, orders of magnitude smaller than the corpus,
    * so the lookup broadcasts; the corpus side flows through unshuffled.
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, clusters: DataFrame,
                       weights: Seq[(String, Double)],
                       salt: Long = 0L): DataFrame = {
    val reps = clusters.select(col("node").as("g_n"), col("component").as("g_rep"))
    df.join(broadcast(reps), df(idCol) === col("g_n"), "left")
      .withColumn("split",
        assignSplit(coalesce(col("g_rep"), col(idCol)), weights, salt))
      .drop("g_n", "g_rep")
  }

  /** Deterministic weighted mix of corpora: each source is hash-sampled at
    * its own rate and tagged with its name — the "data mixture" step of a
    * training pipeline (e.g. 50% web, 30% code, 20% books), reproducible
    * row-for-row. Sources must share the projected schema of `select`.
    */
  def weightedMix(sources: Seq[(String, DataFrame, Double)], key: String,
                  select: Seq[String], salt: Long = 0L): DataFrame = {
    require(sources.nonEmpty, "weightedMix needs at least one source")
    sources.map { case (name, df, fraction) =>
      sample(df, col(key), fraction, salt)
        .select(lit(name).as("mix_source") +: select.map(col): _*)
    }.reduce(_.unionAll(_))
  }

  /** TOKEN-budget sampling: keep documents from each group (source /
    * language) in a deterministic pseudo-random order until the group's
    * token budget is exhausted — the mixture-building step of a real
    * training run specifies budgets in TOKENS ("200B web, 30B code"),
    * not row fractions, and per-document token counts vary by orders of
    * magnitude. A row is kept iff the EXCLUSIVE running token sum of the
    * rows ordered before it (portable [[bucket]] order, id tiebreak) is
    * still below the group's budget — so a positive budget always keeps
    * at least one document, and the kept token total overshoots by at
    * most one document. Groups without a configured budget use
    * `defaultBudget`. Membership is deterministic under reruns and
    * repartitioning; unlike [[sample]], it is a SNAPSHOT decision — an
    * appended document can hash into the kept prefix of the order and
    * displace the tail, so pin a corpus version when stability across
    * appends matters.
    *
    * Scale shape (the two-phase distributed prefix sum of
    * [[Corpus.packSequences]], keyed by group): range-partition by
    * (group, order) so every partition holds a contiguous slice of the
    * global per-group order; one partition-local streaming fold computes
    * local exclusive sums (resetting at group boundaries); the
    * per-(partition, group) totals — at most #partitions + #groups rows —
    * collect to the driver for cross-partition exclusive offsets, which
    * broadcast back as the final filter. No per-group single-task window
    * (the classic scale trap: `sum() OVER (PARTITION BY group)` funnels a
    * group's whole corpus through one task), no corpus-wide sort.
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, groupCol: String,
                        tokens: Column, budgets: Map[String, Long],
                        defaultBudget: Long = 0L,
                        salt: Long = 0L): DataFrame = {
    require(budgets.values.forall(_ >= 0L) && defaultBudget >= 0L,
      "budgets must be non-negative")
    val spark = df.sparkSession
    val base = graft.Tables.unrebalanced(df)
      .withColumn("g_ord", bucket(col(idCol), salt))
      .withColumn("g_tok", coalesce(tokens.cast("long"), lit(0L)))
    val ranged = base
      .repartitionByRange(col(groupCol), col("g_ord"), col(idCol))
      .sortWithinPartitions(col(groupCol), col("g_ord"), col(idCol))
    val outSchema = org.apache.spark.sql.types.StructType(
      ranged.schema.fields :+
        org.apache.spark.sql.types.StructField("g_pid",
          org.apache.spark.sql.types.IntegerType, nullable = false) :+
        org.apache.spark.sql.types.StructField("g_local",
          org.apache.spark.sql.types.LongType, nullable = false))
    val gIdx = ranged.schema.fieldIndex(groupCol)
    val tIdx = ranged.schema.fieldIndex("g_tok")
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // Drop to ONE RDD lineage for both the totals job and the serving
    // job. Two Dataset actions each re-plan and create their own
    // ShuffleDependency, so the corpus would be scanned and
    // range-shuffled twice; the DAG scheduler only skips a map stage for
    // the SAME RDD instance. With a single `.rdd`, the scan + range
    // exchange run once (in the totals job below) and the serving job
    // reuses the shuffle files — the only repeated work is the
    // post-shuffle partition-local sort + fold, not the 100-TB input
    // read. No corpus-sized persist/localCheckpoint needed, which would
    // pin input-sized executor storage.
    val rangedRdd = ranged
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .rdd
    val local = classic.createDataFrame(
      rangedRdd.mapPartitionsWithIndex { (pid, it) =>
        var cur: Any = null
        var started = false
        var acc = 0L
        it.map { r =>
          val g = r.get(gIdx)
          if (!started || g != cur) { cur = g; acc = 0L; started = true }
          val out = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ pid :+ acc)
          acc += r.getLong(tIdx)
          out
        }
      }, outSchema)
    // per-(partition, group) totals -> cross-partition exclusive offsets.
    // Partitions arrive sorted by (group, ord), so totals stream in one
    // pass with a group-boundary reset — at most #partitions + #groups
    // rows collect to the driver.
    val totals = rangedRdd.mapPartitionsWithIndex { (pid, it) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Any, Long)]
      var cur: Any = null
      var started = false
      var acc = 0L
      it.foreach { r =>
        val g = r.get(gIdx)
        if (!started) { cur = g; started = true }
        else if (g != cur) { out += ((pid, cur, acc)); cur = g; acc = 0L }
        acc += r.getLong(tIdx)
      }
      if (started) out += ((pid, cur, acc))
      out.iterator
    }.collect()
    val offsets = totals.groupBy(_._2).toSeq.flatMap { case (g, rows) =>
      val sorted = rows.sortBy(_._1)
      sorted.map(_._1).zip(sorted.map(_._3).scanLeft(0L)(_ + _))
        .map { case (pid, off) => (pid, g, off) }
    }
    import classic.implicits._
    val offDf = offsets
      .map { case (pid, g, off) =>
        (pid, Option(g).map(String.valueOf).orNull, off)
      }
      .toDF("g_pid", "g_grp", "g_offset")
    val budgetCol = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (value, b)) =>
        when(col(groupCol) === lit(value), lit(b)).otherwise(acc)
    }
    local
      .join(broadcast(offDf),
        local("g_pid") === offDf("g_pid") &&
          local(groupCol).cast("string") <=> offDf("g_grp"))
      .filter(col("g_local") + col("g_offset") < budgetCol)
      .select(df.columns.map(col) :+ col("g_tok").as("n_tok"): _*)
  }
}
