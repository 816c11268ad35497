package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: measure BPE training cost vs merge count, bounded chain vs
  * naive full replay — the evidence behind `Bpe.learnMerges`'s
  * `rematerializeEvery` default (quadratic replay becomes the dominant
  * cost as the merge table grows; the bounded chain stays ~linear).
  *
  * Usage: runMain graft.tools.BpeTrainProbe [sfDir] [nMerges] [chunk] [minFreq]
  * Prints per-variant wall seconds; `chunk=0` means naive (never
  * rematerialize).
  */
object BpeTrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val nMerges = if (args.length > 1) args(1).toInt else 192
    val chunk = if (args.length > 2) args(2).toInt else 64
    val minFreq = if (args.length > 3) args(3).toLong else 2L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.t(spark, sfDir, "documents")
    docs.count() // warm scan

    def time(label: String, every: Int): Seq[(String, String)] = {
      val t0 = System.nanoTime()
      val merges = graft.operators.Bpe.learnMerges(docs, "text", nMerges,
        minFreq = minFreq,
        rematerializeEvery = if (every <= 0) Int.MaxValue else every)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[bpe-train] $label%-18s nMerges=$nMerges learned=${merges.size} ${secs}%.1f s")
      merges
    }
    val bounded = time(s"bounded(every=$chunk)", chunk)
    val naive = time("naive(full replay)", 0)
    println(s"[bpe-train] equal merge tables: ${bounded == naive}")
    // the job-count lever for 32k-vocabulary runs: one count round per
    // BATCH of disjoint merges instead of per merge
    for (b <- Seq(8, 32)) {
      val t0 = System.nanoTime()
      val m = graft.operators.Bpe.learnMergesBatched(docs, "text", nMerges,
        minFreq = minFreq, rematerializeEvery = chunk, batch = b)
      val secs = (System.nanoTime() - t0) / 1e9
      val label = s"batched(b=$b)"
      println(f"[bpe-train] $label%-18s nMerges=$nMerges learned=${m.size} ${secs}%.1f s")
    }
    spark.stop()
  }
}
