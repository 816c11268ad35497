package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: measure how the heaviest PIPELINE queries scale with data —
  * time each at two scale factors (default sf0.01 and sf0.1, a 10× data
  * step) and report the per-query scaling exponent
  * `log10(t_big / t_small)`. An exponent ≈ 1 is linear-in-data (the
  * 100 TB design claim); ≫ 1 flags a super-linear operator (quadratic
  * candidate generation, skew collapse) that small-scale correctness
  * gates cannot see. Noop-sink timing (the Bench discipline — `.count()`
  * would elide final sorts via EliminateSorts); first evaluation per
  * (query, sf) is an untimed warmup so one-time artifact builds (pair
  * index, span store, trained models) don't pollute the trend.
  *
  * Usage: runMain graft.tools.ScaleProbe [outPath] [smallDir] [bigDir] [reps]
  * Writes one JSON object (committed per round as SCALE_PROBE_r<N>.json).
  */
object ScaleProbe {
  private val targets = Seq(
    "q_pack_bpe", "q_span_dedup", "q_dedup_containment",
    "q_line_dedup", "q_decontaminate", "q_dedup_ngram")

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

    def timeAt(name: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup: artifact builds, file-index caches, codegen
      (1 to reps).map(_ => once()).min
    }

    val rows = targets.map { name =>
      val tS = timeAt(name, small)
      val tB = timeAt(name, big)
      val exp = math.log10(tB / tS)
      println(f"[scale] $name%-22s small=$tS%.3f s big=$tB%.3f s exponent=$exp%.2f")
      f""" "$name":{"t_small":$tS%.3f,"t_big":$tB%.3f,"exponent":$exp%.2f}"""
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
