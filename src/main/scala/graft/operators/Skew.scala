package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins whose key distribution has heavy
  * hitters (the classic 100 TB failure mode: one hot key lands an entire
  * shuffle partition on one executor).
  *
  * [[saltedJoin]] is the explicit form of what AQE's skew-join split does
  * at runtime. Which lever to reach for:
  *
  *  - **AQE subsumes salting** for a shuffled sort-merge join when
  *    `spark.sql.adaptive.enabled` and
  *    `spark.sql.adaptive.skewJoin.enabled` are on (both default true)
  *    AND the skewed partition trips both runtime thresholds
  *    (`skewedPartitionFactor`, default 5× the median partition size, and
  *    `skewedPartitionThresholdInBytes`, default 256 MB).
  *    `OptimizeSkewedJoin` then splits the hot partition into sub-reads
  *    and replicates the matching partition of the other side — same
  *    mechanism as salting, decided from measured map output sizes, no
  *    code change. Prefer it when it applies: zero plan clutter, reacts
  *    to skew you did not predict.
  *  - **Reach for [[saltedJoin]]** when AQE cannot or will not act:
  *    (a) the hot partition is below 256 MB but still 100× the others —
  *    under the byte threshold AQE leaves it alone, yet one straggler
  *    task can still dominate a small stage; (b) stream-static joins and
  *    other continuous paths AQE does not re-plan; (c) the skewed join
  *    feeds an operator AQE will not split through (e.g. it must
  *    preserve a required child distribution); (d) the plan must be
  *    deterministic across runs (benchmark comparability, plan-locked
  *    tests) — AQE's split depends on runtime sizes. Measure first with
  *    [[keySkewProfile]]; salt ≈ hot-key rows / target partition rows.
  *
  * SkewAndConfSpec locks the salted path with AQE's skew-join DISABLED,
  * so the explicit lever is verified independent of the runtime one.
  */
object Skew {

  /** Inner equi-join of a skewed `large` table to a `small` table on
    * `key`, salted: each `large` row gets a random salt in [0, salt);
    * `small` is exploded `salt`-fold so every (key, salt) bucket finds its
    * match. The hot key's rows thus spread over `salt` shuffle partitions
    * instead of one. Row multiset is identical to the plain inner join
    * (each large row matches exactly the same small rows — the salt column
    * pairs 1:1).
    *
    * Cost model: `small` is replicated `salt`-fold — choose `salt` around
    * (hot-key rows / target partition rows), and keep `small` genuinely
    * small (a dimension, not a fact).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salt: Int = 16): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val saltedLarge = large.withColumn("g_salt",
      (rand(seed = 42) * salt).cast("int"))
    val saltedSmall = small.withColumn("g_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "g_salt")).drop("g_salt")
  }

  /** Frequency profile of a join key: the top-`n` heaviest keys and the
    * share of rows they cover — the measurement that decides whether
    * salting (and which salt factor) is warranted.
    *
    * Single input pass: the grand total is the SUM of the per-key counts,
    * so both consumers — the top-n branch and the total branch — sit on
    * the IDENTICAL groupBy subtree and ReuseExchange dedupes its shuffle
    * within the one plan (a separate `df.count()` would re-scan the
    * input — two jobs over 100 TB for a diagnostic; a `sum() OVER ()`
    * window would funnel every distinct key through one task). The total
    * branch only re-reads the shuffled per-key counts (#keys rows) and
    * joins back as a broadcast scalar.
    */
  def keySkewProfile(df: DataFrame, key: Column, n: Int = 10): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("rows"))
    val total = counts.agg(sum("rows").cast("double").as("g_total"))
    counts
      // key tiebreak: deterministic top-n membership under count ties
      .orderBy(col("rows").desc, col("key"))
      .limit(n)
      .crossJoin(broadcast(total))
      .withColumn("share", col("rows") / col("g_total"))
      .drop("g_total")
      // row order is not guaranteed THROUGH a join — re-assert the
      // heaviest-first contract on the n surviving rows (trivial sort)
      .orderBy(col("rows").desc, col("key"))
  }
}
