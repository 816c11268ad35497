package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time a list of SparkEntry queries against an arbitrary data
  * dir at the session's core count (`SPARK_GRAFT_CPUS`), noop-sink
  * min-of-reps after one untimed warmup — WITHOUT the cube/rollup ensure
  * of Bench/PerfProbe, so it runs against partial replicas (e.g. the
  * documents-only sf10-equivalent) whose star tables don't exist. Used
  * for the 8-vs-32-core scaling point at replica scale (r20 verdict
  * item 8: at sf0.1 the core ratio only measures the scheduling floor).
  *
  * Usage: runMain graft.tools.CoreProbe <q1,q2,...> <dataDir> [reps]
  */
object CoreProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
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
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val rows = names.map { name =>
      val fn = graft.SparkEntry.queries(name)
      def run(): Unit =
        fn(spark, dir).write.mode("overwrite").format("noop").save()
      run() // warmup
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(s"[core] $name cpus=$cpus " +
        s"reps=${ts.map(fmt).mkString(",")}")
      s""""$name":{"min":${fmt(ts.min)},"reps":[${ts.map(fmt).mkString(",")}]}"""
    }
    println(s"""CORE_PROBE {"cpus":$cpus,"dir":"$dir","queries":${rows.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
