package graft.tools

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev tool: per-stage wall/task breakdown of one warm query execution —
  * names the stage (callsite) so plan-level hot spots are attributable.
  *
  * Usage: runMain graft.tools.StageProbe <queryName> [sfDir]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
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
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.install(spark)
    graft.cube.TpchCube.ensure(spark, sfDir)
    graft.cube.RollupCube.ensure(spark, sfDir)
    graft.Tables.t(spark, sfDir, "lineitem").count()
    val fn = graft.SparkEntry.queries(name)
    // warm twice
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    org.apache.spark.sql.graft.ListenerBusUtil.waitUntilEmpty(spark)

    case class St(id: Int, name: String, tasks: Int,
                  submitted: Long, completed: Long, taskTimeMs: Long,
                  runMs: Long, deserMs: Long, gcMs: Long, cpuMs: Long)
    val stages = mutable.ArrayBuffer[St]()
    case class Acc(dur: java.util.concurrent.atomic.AtomicLong = new java.util.concurrent.atomic.AtomicLong,
                   run: java.util.concurrent.atomic.AtomicLong = new java.util.concurrent.atomic.AtomicLong,
                   deser: java.util.concurrent.atomic.AtomicLong = new java.util.concurrent.atomic.AtomicLong,
                   gc: java.util.concurrent.atomic.AtomicLong = new java.util.concurrent.atomic.AtomicLong,
                   cpu: java.util.concurrent.atomic.AtomicLong = new java.util.concurrent.atomic.AtomicLong)
    val taskMs = new java.util.concurrent.ConcurrentHashMap[Int, Acc]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val a = taskMs.computeIfAbsent(te.stageId, _ => Acc())
        if (te.taskInfo != null) a.dur.addAndGet(te.taskInfo.duration)
        if (te.taskMetrics != null) {
          a.run.addAndGet(te.taskMetrics.executorRunTime)
          a.deser.addAndGet(te.taskMetrics.executorDeserializeTime)
          a.gc.addAndGet(te.taskMetrics.jvmGCTime)
          a.cpu.addAndGet(te.taskMetrics.executorCpuTime / 1000000L)
        }
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages.synchronized {
          val a = Option(taskMs.get(si.stageId)).getOrElse(Acc())
          stages += St(si.stageId, si.name.linesIterator.next().take(100),
            si.numTasks,
            si.submissionTime.getOrElse(0L), si.completionTime.getOrElse(0L),
            a.dur.get(), a.run.get(), a.deser.get(), a.gc.get(), a.cpu.get())
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    val wall = (System.nanoTime() - t0) / 1e6
    org.apache.spark.sql.graft.ListenerBusUtil.waitUntilEmpty(spark)
    println(f"[stageprobe] $name wall=${wall}%.0f ms, ${stages.size} stages")
    val base = stages.map(_.submitted).min
    for (s <- stages.sortBy(_.submitted))
      println(f"[stageprobe]  t+${s.submitted - base}%5d .. t+${s.completed - base}%5d wall=${s.completed - s.submitted}%5d ms taskSum=${s.taskTimeMs}%6d (run=${s.runMs} deser=${s.deserMs} gc=${s.gcMs} cpu=${s.cpuMs}) tasks=${s.tasks}%3d  ${s.name}")
    spark.stop()
  }
}
