package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time one SparkEntry query repeatedly.
  * Usage: runMain graft.tools.PerfProbe <queryName> [sfDir] [reps]
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.shuffle.sort.bypassMergeThreshold",
        graft.Graft.shuffleWriterThreshold)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.install(spark)
    graft.cube.TpchCube.ensure(spark, sfDir)
    graft.cube.RollupCube.ensure(spark, sfDir)
    graft.Tables.t(spark, sfDir, "lineitem").count()
    val fn = graft.SparkEntry.queries(name)
    if (sys.env.contains("PROBE_EXPLAIN")) {
      val qe = fn(spark, sfDir)
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution
      println("=== OPTIMIZED ===\n" + qe.optimizedPlan.treeString)
      println("=== PHYSICAL ===\n" + qe.executedPlan.treeString)
    }
    // PROBE_NOOP=1 times the noop-sink full evaluation (what Bench times —
    // includes any final sort, which .count() elides via EliminateSorts)
    val noop = sys.env.contains("PROBE_NOOP")
    // PROBE_RAW=1 re-times with every graft rewrite disabled (Bench's
    // "raw" mode) so a routing decision can be judged engine-vs-raw.
    def once(): Long =
      if (noop) { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); -1L }
      else fn(spark, sfDir).count()
    def timeIt(tag: String): Unit = for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = once()
      println(f"[probe$tag] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    timeIt("")
    if (sys.env.contains("PROBE_RAW"))
      graft.Graft.withoutRewrites(spark) { timeIt("-raw") }
    spark.stop()
  }
}
