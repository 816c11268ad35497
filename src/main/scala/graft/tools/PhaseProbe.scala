package graft.tools

import org.apache.spark.sql.SparkSession

/** Split a query's wall time into planning (analyze+optimize+physical)
  * and execution, averaged over warm repetitions — decides whether the
  * bench floor is rule overhead or scan/scheduling overhead.
  *
  * Usage: `sbt "runMain graft.tools.PhaseProbe [sfDir] [queryName ...]"`
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q01_pricing_summary", "q_subqry_filters_range")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.shuffle.sort.bypassMergeThreshold",
        graft.Graft.shuffleWriterThreshold)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.install(spark)
    graft.cube.TpchCube.ensure(spark, sfDir)
    graft.cube.RollupCube.ensure(spark, sfDir)
    for (name <- names) {
      // warm
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val reps = 5
      var planNs = 0L; var execNs = 0L
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val qe = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution
        qe.executedPlan // force full planning
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        planNs += (t1 - t0); execNs += (t2 - t1)
      }
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val qe = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution
      qe.executedPlan
      val phases = qe.tracker.phases.map { case (k, v) =>
        f"$k=${v.durationMs} ms"
      }.mkString(" ")
      println(f"[phase] $name plan=${planNs / reps / 1e6}%.1f ms exec=${execNs / reps / 1e6}%.1f ms | $phases")
    }
    spark.stop()
  }
}
