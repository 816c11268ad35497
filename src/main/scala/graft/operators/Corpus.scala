package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-level term statistics: vocabulary building, document frequency,
  * and TF-IDF scoring — the wordcount family at training-data scale.
  *
  * Shape and scale notes (the classic 100 TB wordcount):
  *   - `explode(tokens)` is a generator inside whole-stage codegen — no
  *     shuffle until the aggregation.
  *   - [[termFrequencies]] first groups by (doc, term), so the global term
  *     shuffle carries one row per document-term *pair*, never one per
  *     token occurrence; partial (map-side) aggregation collapses the heavy
  *     Zipf head of the vocabulary before anything crosses the network.
  *   - [[vocabulary]] and [[tfIdf]] both derive from that single exploded
  *     aggregation — one tokenizer, one code path.
  *
  * The reference engine has no text layer; this extends the beyond-parity
  * training-data surface ([[graft.functions.TextFunctions]]).
  */
object Corpus {

  /** Lower-cased whitespace tokens ([[TextFunctions.tokens]] semantics,
    * case-folded) — the shared tokenizer of the vocabulary/TF-IDF family.
    */
  def terms(text: Column): Column = TextFunctions.tokens(lower(text))

  /** Per-document term frequencies: (id, term, tf). */
  def termFrequencies(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    docs.select(col(idCol), explode(terms(col(textCol))).as("term"))
      .groupBy(idCol, "term")
      .agg(count(lit(1)).as("tf"))

  /** Corpus vocabulary: one row per distinct term with its total occurrence
    * count (`tf`) and document frequency (`df` — each document counts once
    * however often it repeats the term).
    */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    termFrequencies(docs, idCol, textCol)
      .groupBy("term")
      .agg(sum("tf").as("tf"), count(lit(1)).as("df"))

  /** TF-IDF scores per (document, term). The IDF here is the raw inverse
    * ratio `N/df` (not its logarithm): the ranking is the same monotone
    * order, and the score stays in exactly-rounded IEEE arithmetic
    * (one multiply + one divide), so any engine reproduces it bit-for-bit —
    * `log` is correctly rounded in neither libm nor the JVM and would leak
    * last-ulp drift into a differential oracle. Pass the result through
    * `log` downstream if the damped scale is wanted.
    *
    * Join shape: the df table is vocabulary-sized (small next to the corpus
    * — broadcast), N is a 1-row broadcast, and the big per-document tf side
    * flows through without a further shuffle.
    */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    // df = how many documents contain each term. Dedup WITHIN the document
    // in the array domain (array_distinct before explode): the branch then
    // needs only ONE shuffle — map-side partial counts keyed by term,
    // vocabulary-sized per partition — instead of shuffling every exploded
    // (doc, term) row twice (once to dedup, once to count). At corpus scale
    // the (doc, term) shuffle is the branch's whole cost; this removes it.
    val df_ = docs
      .select(explode(array_distinct(terms(col(textCol)))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
    // count-only branch: the scan-parallelism rebalance would shuffle the
    // full table just to count rows — strip it (the count reads no columns)
    val n = graft.Tables.unrebalanced(docs).select(count(lit(1)).as("n_docs"))
    tf.join(broadcast(df_), Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf").cast("double") * col("n_docs").cast("double")) /
          col("df").cast("double"))
  }

  /** Split each document into token-window chunks of `chunkTokens` words
    * advancing by `chunkTokens - overlap` — the context-window preparation
    * step of a training pipeline. Pure generator + array ops (explode of a
    * computed start sequence, `slice` + `array_join` on the token array):
    * stays inside whole-stage codegen, shuffles nothing, and parallelism is
    * per-document — the shape that holds at billions of documents. A final
    * short chunk is kept iff it adds tokens beyond the previous window
    * (every token appears in ≥1 chunk; no chunk is a pure suffix repeat).
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got $overlap / $chunkTokens")
    val stride = chunkTokens - overlap
    val toks = terms(col(textCol))
    // starts: 0, stride, 2*stride, ... while start + overlap < n_tokens
    // (a start at or past n - overlap would only repeat the previous tail)
    val nStarts = greatest(lit(1),
      ceil((size(toks).cast("long") - lit(overlap)) / lit(stride.toDouble))
        .cast("int"))
    docs
      .withColumn("g_toks", toks)
      .withColumn("g_start",
        explode(transform(sequence(lit(0), nStarts - 1),
          i => i * stride)))
      .select(col(idCol),
        (col("g_start") / stride).cast("long").as("chunk_id"),
        array_join(slice(col("g_toks"), col("g_start") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"),
        least(size(col("g_toks")) - col("g_start"), lit(chunkTokens))
          .cast("long").as("n_tokens"))
  }

  /** Assign documents to fixed-capacity bins by running token count —
    * striped sequence packing: in `orderCol` order, a document's bin is
    * `floor(exclusive-prefix-token-sum / capacity)`. Bins fill to capacity
    * on average; a boundary document may straddle (a greedy
    * reset-on-overflow packer is inherently sequential — this is its
    * distributed analog, and the assignment depends only on the order
    * column, never on physical partitioning).
    *
    * The global prefix sum is the two-phase pattern (what Spark's own
    * zipWithIndex does): range-partition by the order column, per-partition
    * running sums from a *partitioned* window (no single-partition global
    * window — that serializes 10⁹ rows through one task), then add each
    * partition's starting offset, computed from the per-partition totals
    * (#partitions rows — a driver-side scan of a tiny aggregate, broadcast
    * back).
    */
  def packSequences(docs: DataFrame, orderCol: String, textCol: String,
                    capacity: Long): DataFrame =
    packByCount(docs, orderCol, size(terms(col(textCol))).cast("long"),
      capacity)

  /** [[packSequences]] generalized to an arbitrary per-document token-count
    * expression — e.g. [[Bpe.bpeTokenCount]] over a learned merge table, so
    * bins fill against the REAL training-token budget rather than the
    * whitespace proxy. Same two-phase prefix sum, same
    * partitioning-independence guarantee.
    */
  def packByCount(docs: DataFrame, orderCol: String, countExpr: Column,
                  capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    // the range repartition below is this operator's own shuffle — a
    // round-robin rebalance directly upstream (Tables.rebalanced's scan
    // parallelism guard) would be a second, pure-overhead exchange
    val base = graft.Tables.unrebalanced(docs)
    // Materialize the counted input ONCE (eager localCheckpoint): the
    // operator issues three downstream actions — the range partitioner's
    // sampling pass, the per-partition totals aggregate, and the final
    // assignment — and each would otherwise re-evaluate the full upstream
    // subtree (for the BPE-counted pack query that subtree is the
    // word-table encode join: measured 24 jobs / 2.6 s per run before,
    // upstream evaluated 3x per action set). Callers pass narrow
    // (orderCol, count-source) frames, so the checkpoint holds ~16 B/row
    // of per-document metadata — the guide-§8 "decide on a lightweight
    // proxy" table, never the corpus body.
    // Checkpoint mode (r20 verdict item 1): `localCheckpoint` blocks are
    // NOT recomputable — on a real cluster one executor loss during or
    // after the checkpoint kills the query (lineage is truncated). The
    // frames checkpointed here are narrow (~16 B/row of per-document
    // metadata), but a deployment that cannot absorb that blast radius
    // sets `spark.graft.pack.checkpoint=reliable` (with
    // `sparkContext.setCheckpointDir` pointing at replicated storage) and
    // pays a write+read of the narrow frame for executor-loss survival.
    val spark = docs.sparkSession
    val reliableCkpt =
      spark.conf.get("spark.graft.pack.checkpoint", "local") == "reliable"
    def ckpt(df: DataFrame): DataFrame =
      if (reliableCkpt) df.checkpoint(true) else df.localCheckpoint(true)
    val counted0 = base
      .withColumn("n_tokens", countExpr.cast("long"))
    // the checkpoint hides the upstream scans from the final plan; report
    // them for the bench's scan-drift adjudication (no-op outside the
    // bench's IO pass)
    org.apache.spark.sql.graft.ScanBytes.recordAux(counted0)
    val counted = ckpt(counted0)
    val ranged = counted
      .repartitionByRange(col(orderCol))
      .sortWithinPartitions(col(orderCol))
    // per-partition exclusive running sum as an order-preserving fold: a
    // Window.partitionBy(spark_partition_id) would re-SHUFFLE every row by
    // the very key they are already partitioned on — mapPartitions keeps
    // the range layout and streams once
    val outSchema = org.apache.spark.sql.types.StructType(
      ranged.schema.fields :+
        org.apache.spark.sql.types.StructField("g_pid",
          org.apache.spark.sql.types.IntegerType, nullable = false) :+
        org.apache.spark.sql.types.StructField("g_local",
          org.apache.spark.sql.types.LongType, nullable = false))
    val nIdx = ranged.schema.fieldIndex("n_tokens")
    // per-partition totals ride OUT of the fold on an accumulator: the
    // eager checkpoint below is already an action over every partition, so
    // the totals cost zero extra jobs, exchanges or passes (previously a
    // separate aggregate action re-ran the range exchange). A retried or
    // speculative task re-adds the SAME (pid, total) pair — the map build
    // below keys by pid, so duplicates are harmless.
    // each task reports (pid, total, numPartitions): the partition count
    // rides the same accumulator so the coverage assert below needs no
    // extra .rdd plan derivation on the driver (a getNumPartitions probe
    // here measured ~0.1 s per pack query inside the timed path)
    val totalsAcc = spark.sparkContext
      .collectionAccumulator[(Int, Long, Int)]("g_pack_totals")
    val local = ranged
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .mapPartitions { it =>
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        var acc = 0L
        it.map { r =>
          val out = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ pid :+ acc)
          acc += r.getLong(nIdx)
          out
        } ++ { totalsAcc.add((pid, acc, tc.numPartitions())); Iterator.empty }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      .toDF()
    // second (and last) materialization: the final assignment consumes
    // the range-shuffled running sums and must not re-run the exchange +
    // fold (SQL plans do not reuse shuffles across separate actions;
    // measured +0.3-0.4 s per pack query without this checkpoint) — and
    // its completion is what makes the totals accumulator final
    val localCk = ckpt(local)
    import scala.jdk.CollectionConverters._
    // The totals' finality is load-bearing and only holds because the
    // eager checkpoint above drained every partition (r20 ADVICE): assert
    // it instead of silently mis-binning — every pid of the ranged layout
    // must have reported, and a duplicate (retried/speculative task) must
    // have reported the SAME total.
    val rawTotals = totalsAcc.value.asScala.toSeq
    val byPid = rawTotals.groupBy(_._1)
    require(byPid.forall { case (_, vs) => vs.map(_._2).distinct.size == 1 },
      s"packByCount: conflicting per-partition totals " +
        s"${byPid.filter(_._2.map(_._2).distinct.size > 1).keys.toSeq.sorted} " +
        "— non-deterministic recomputation of the counted input?")
    val nParts = if (rawTotals.isEmpty) 0 else rawTotals.map(_._3).max
    require(byPid.keySet == (0 until nParts).toSet,
      s"packByCount: totals cover pids ${byPid.keySet.toSeq.sorted} but the " +
        s"ranged layout has $nParts partitions — the checkpoint did not " +
        "drain every partition")
    val offsets = byPid.view.mapValues(_.head._2).toSeq.sortBy(_._1)
    val offDf = {
      val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      import classic.implicits._
      offsets.map(_._1).zip(offsets.map(_._2).scanLeft(0L)(_ + _))
        .toDF("g_pid", "g_offset")
    }
    localCk.join(broadcast(offDf), Seq("g_pid"))
      .withColumn("bin_id",
        floor((col("g_local") + col("g_offset")) / capacity))
      .drop("g_pid", "g_local", "g_offset")
  }

  /** Line-level corpus dedup (CCNet-style boilerplate removal): drop every
    * line that occurs at least `minDf` times across the whole corpus
    * (navigation chrome, cookie banners, license headers), keeping each
    * document's surviving lines in their original order. Output:
    * `(idCol, text_clean, n_kept, n_dropped)` — one row per input document,
    * including documents scrubbed to empty.
    *
    * Shape at scale: lines explode inside codegen (no shuffle); ONE shuffle
    * counts occurrences per line hash; the boilerplate set — only lines
    * with `count >= minDf`, normally a tiny fraction of distinct lines —
    * joins back as a left-anti membership test. The join strategy is left
    * to AQE: on a normal corpus the runtime size of the boilerplate side is
    * small and AQE converts to broadcast (the corpus side never shuffles);
    * on a pathological corpus where most distinct lines meet `minDf`, the
    * set can exceed driver/broadcast memory, and AQE keeps the shuffled
    * join instead of failing the job on a forced hint. One final shuffle on
    * the document id reassembles ordered survivors. Lines travel as 8-byte xxhash64 keys, never as
    * strings, on both shuffles. A 64-bit collision could only *drop* an
    * innocent line that collides with boilerplate (~n_distinct/2^64 — the
    * standard trade, same as the shingle pipeline).
    */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
                 minDf: Int): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    val lines = docs.select(col(idCol).as("g_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("g_pos", "g_line")))
      .withColumn("g_h", xxhash64(col("g_line")))
    val boiler = lines.groupBy("g_h")
      .agg(count(lit(1)).as("g_n"))
      .filter(col("g_n") >= minDf)
      .select("g_h")
    // LEFT join with a boilerplate marker instead of an anti-join: the
    // surviving lines and the per-document total then come out of ONE
    // grouped pass (collect_list skips the nulled boilerplate entries, the
    // count keeps them) — no second scan of `docs` and no re-attach join.
    // Every document has >= 1 line row (split yields at least one
    // element), so all-boilerplate documents still appear, empty.
    val marked = lines.join(boiler.withColumn("g_b", lit(1)), Seq("g_h"), "left_outer")
    // one primitive reassembly aggregate (KeptLinesExpr) instead of
    // sort_array(collect_list(struct)) + two interpreted HOFs: same joined
    // text, same counts, no per-line struct boxing in the reduce stage
    marked.groupBy("g_id")
      .agg(
        org.apache.spark.sql.graft.PrimitiveCollects.keptLines(
          col("g_pos"), when(col("g_b").isNull, col("g_line"))).as("g_k"),
        count(lit(1)).as("g_total"))
      .select(col("g_id").as(idCol),
        col("g_k.text_clean").as("text_clean"),
        col("g_k.n_kept").cast("long").as("n_kept"),
        (col("g_total") - col("g_k.n_kept")).as("n_dropped"))
  }
}
