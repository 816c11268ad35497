package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: write `explain("formatted")` for SparkEntry queries to files
  * (the optimization rounds' `plans/rN/<query>_{before,after}.txt`
  * deliverable), plus one summary line per query with the plan-shape
  * counters that matter for §2/§3 of the optimization guide: number of
  * Exchange nodes, join strategies, and the number of Spark jobs + stages
  * a noop-sink execution actually runs (fixed scheduling overhead).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> [sfDir] [q1,q2,...|all]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sel: Option[Set[String]] =
      if (args.length > 3 && args(3) != "all")
        Some(args(3).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      else None
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
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.install(spark)
    graft.cube.TpchCube.ensure(spark, sfDir)
    graft.cube.RollupCube.ensure(spark, sfDir)
    graft.Tables.t(spark, sfDir, "lineitem").count()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
          tasks.addAndGet(j.stageInfos.map(_.numTasks).sum)
        }
      })

    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => sel.forall(_.contains(n)))
    for (name <- names) {
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val qe = df
          .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution
        val formatted = qe.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), formatted)
        // plan-shape counters from the physical plan text (pre-AQE), plus
        // the REAL job/stage/task counts of one warm noop execution
        val exch = "(?m)^.*Exchange".r.findAllIn(formatted).size
        val joins = Seq("BroadcastHashJoin", "SortMergeJoin",
          "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct")
          .map(j => j -> s"\\b$j".r.findAllIn(formatted).size)
          .filter(_._2 > 0).map { case (j, c) => s"$j=$c" }.mkString(",")
        df.write.mode("overwrite").format("noop").save() // warm (AQE final)
        org.apache.spark.sql.graft.ListenerBusUtil.waitUntilEmpty(spark)
        jobs.set(0); stages.set(0); tasks.set(0)
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        org.apache.spark.sql.graft.ListenerBusUtil.waitUntilEmpty(spark)
        println(s"[plandump] $name exchanges=$exch joins[$joins] " +
          s"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
      } catch { case e: Throwable =>
        println(s"[plandump] $name FAILED: $e")
      }
    }
    spark.stop()
  }
}
