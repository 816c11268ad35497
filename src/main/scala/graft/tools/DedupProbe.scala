package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: cumulative timing of the inverted-index dedup sub-pipeline
  * (tokenize -> shingle -> explode -> postings -> pair expansion) to
  * attribute the family's cost to one stage.
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.shuffle.sort.bypassMergeThreshold",
        graft.Graft.shuffleWriterThreshold)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", graft.Graft.sparkLocalDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    sys.env.get("PROBE_OHA_FALLBACK").foreach(v =>
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v))
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.install(spark)
    val docs = graft.Tables.t(spark, sfDir, "documents")
    import org.apache.spark.sql.graft.NativeTextExprs
    def toks = graft.functions.TextFunctions.tokens(lower(col("text")))
    val variants: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "scan only" -> docs.select(col("doc_id")),
      "scan+text" -> docs.select(col("doc_id"), col("text")),
      "tokens" -> docs.select(col("doc_id"), toks.as("t")),
      "shingles" -> docs.select(col("doc_id"),
        NativeTextExprs.shingleHashSet(toks, 3).as("g_sh")),
      "explode" -> docs.select(col("doc_id"), size(
          NativeTextExprs.shingleHashSet(toks, 3)).as("g_sz"),
        explode(NativeTextExprs.shingleHashSet(toks, 3)).as("g_shingle")),
      "postings" -> docs.select(col("doc_id"), size(
          NativeTextExprs.shingleHashSet(toks, 3)).as("g_sz"),
        explode(NativeTextExprs.shingleHashSet(toks, 3)).as("g_shingle"))
        .select(col("g_shingle"), (col("doc_id") * (1L << 20) + col("g_sz")).as("g_doc"))
        .groupBy("g_shingle").agg(collect_list(col("g_doc")).as("g_docs")),
      "pairs-full" -> graft.operators.Dedup.ngramJaccardDupPairs(
        docs, "doc_id", "text", threshold = 0.8)
    )
    for ((nm, df) <- variants) {
      df.write.mode("overwrite").format("noop").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[dedupprobe] ${nm}%-12s min=${ts.min}%.3f reps=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
