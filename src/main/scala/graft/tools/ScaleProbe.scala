package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: measure how the heaviest PIPELINE operators scale with data —
  * time each at two scale factors (default sf0.01 and sf0.1, a 10× data
  * step) and report the per-query scaling exponent
  * `log10(t_big / t_small)`. An exponent ≈ 1 is linear-in-data (the
  * 100 TB design claim); ≫ 1 flags a super-linear operator (quadratic
  * candidate generation, skew collapse) that small-scale correctness
  * gates cannot see; ≈ 0 on a serve path means the serve cost is
  * index-bounded, not corpus-bounded. Noop-sink timing for queries (the
  * Bench discipline — `.count()` would elide final sorts via
  * EliminateSorts); first evaluation per (target, sf) is an untimed
  * warmup so one-time artifact builds (pair index, span store, IVF
  * store, trained models) don't pollute the trend.
  *
  * Families covered: dedup/corpus (the round-10 set), ANN
  * (`q_knn_join`, `q_ann_store`, and a post-ingest/post-compaction IVF
  * store probe), event funnel/retention, and the span-store streaming
  * ingest (timed per batch against a GROWING store — flat reps are the
  * evidence that ingest is batch-bounded, not history-bounded).
  *
  * Usage: runMain graft.tools.ScaleProbe [outPath] [smallDir] [bigDir] [reps]
  * Writes one JSON object (committed per round as SCALE_PROBE_r<N>.json).
  */
object ScaleProbe {

  /** prepare() runs untimed setup for one (target, sf) and returns the
    * thunk the probe times (run once more untimed as warmup, then
    * min-of-reps).
    */
  private case class Target(name: String,
                            prepare: (SparkSession, String) => (() => Unit))

  private def entryTarget(name: String) = Target(name, (spark, dir) => {
    val fn = graft.SparkEntry.queries(name)
    () => fn(spark, dir).write.mode("overwrite").format("noop").save()
  })

  private def rmRf(path: String): Unit = {
    val f = new java.io.File(path)
    if (f.exists()) org.apache.commons.io.FileUtils.deleteDirectory(f)
  }

  /** IVF store serve after the full maintenance cycle (build → streamed
    * ingest append → compaction): the timed thunk is the locked probe a
    * production reader runs. Expect a near-flat exponent — probe cost is
    * nprobe buckets of the store, not the corpus.
    */
  private val annStorePostCompact =
    Target("ann_store_probe_postcompact", (spark, dir) => {
      import graft.operators.Similarity
      import org.apache.spark.sql.functions.col
      val embs = graft.Tables.t(spark, dir, "embeddings")
      val cents = Similarity.trainKmeansCentroids(embs, "embedding",
        k = 16, iters = 2)
      val q = embs.filter(col("vec_id") === 0L)
        .select("embedding").head().getSeq[Float](0)
      val path = "/root/repo/target/indexes/ivf_scaleprobe_" +
        new java.io.File(dir).getName
      rmRf(path)
      Similarity.materializedIvfIndex(embs, "vec_id", "embedding", cents, path)
      val batch = embs.filter(col("vec_id") < 64)
      Similarity.withIvfKmeansBucket(batch, "embedding", cents)
        .write.mode("append").partitionBy("g_ivf_bucket").parquet(path)
      Similarity.ivfCompact(spark, path)
      () => {
        Similarity.ivfStoreProbe(spark, path, "vec_id", "embedding", q,
          k = 10, cents, nprobe = 2)
        ()
      }
    })

  /** Span-store streaming ingest: each timed rep appends one more batch's
    * count partials to the SAME store, so the rep spread doubles as a
    * history-independence check (cost ∝ batch, never ∝ store).
    */
  private val spanIngestBatch = Target("span_ingest_batch", (spark, dir) => {
    import graft.operators.Dedup
    val docs = graft.Tables.t(spark, dir, "documents")
    val path = "/root/repo/target/indexes/span_scaleprobe_" +
      new java.io.File(dir).getName
    rmRf(path)
    () => Dedup.spanCountsIngest(docs, "doc_id", "text", k = 8, path)
  })

  private val targets = Seq(
    // dedup / corpus (round-10 set)
    entryTarget("q_pack_bpe"), entryTarget("q_span_dedup"),
    entryTarget("q_dedup_containment"), entryTarget("q_line_dedup"),
    entryTarget("q_decontaminate"), entryTarget("q_dedup_ngram"),
    // ANN
    entryTarget("q_knn_join"), entryTarget("q_ann_store"),
    entryTarget("q_ann_store_batch"), annStorePostCompact,
    // events
    entryTarget("q_events_funnel"), entryTarget("q_events_retention"),
    // streaming span ingest
    spanIngestBatch)

  def main(args: Array[String]): Unit = {
    val outPath = if (args.length > 0) args(0) else "SCALE_PROBE_LATEST.json"
    val small = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val big = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val reps = if (args.length > 3) args(3).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.install(spark)

    def timeAt(t: Target, dir: String): Double = {
      val run = t.prepare(spark, dir)
      run() // warmup: artifact builds, file-index caches, codegen
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    val rows = targets.map { t =>
      val tS = timeAt(t, small)
      val tB = timeAt(t, big)
      val exp = math.log10(tB / tS)
      println(f"[scale] ${t.name}%-28s small=$tS%.3f s big=$tB%.3f s exponent=$exp%.2f")
      f""" "${t.name}":{"t_small":$tS%.3f,"t_big":$tB%.3f,"exponent":$exp%.2f}"""
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      s"""{"small":"$small","big":"$big","data_factor":10,"reps":$reps,"timing":"noop-sink min-of-$reps after warmup","queries":{
         |${rows.mkString(",\n")}
         |}}
         |""".stripMargin)
    println(s"[scale] wrote $outPath")
    spark.stop()
  }
}
