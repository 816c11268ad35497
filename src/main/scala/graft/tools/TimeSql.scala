package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time SQL statements (noop sink, warm reps) through the
  * installed engine session — for comparing candidate formulations of a
  * query before committing a rewrite.
  *
  * Usage: runMain graft.tools.TimeSql <sfDir> <reps> <sql1> [sql2 ...]
  */
object TimeSql {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val sqls = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("PROBE_BYPASS", graft.Graft.shuffleWriterThreshold))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", sys.env.getOrElse("PROBE_LOCAL_DIR", graft.Graft.sparkLocalDir))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.install(spark)
    for (t <- graft.Tables.starTables ++ Seq("documents", "embeddings"))
      graft.Tables.t(spark, sfDir, t).createOrReplaceTempView(t)
    graft.cube.TpchCube.ensure(spark, sfDir)
    graft.cube.RollupCube.ensure(spark, sfDir)
    graft.Tables.t(spark, sfDir, "lineitem").count()
    for ((sql, i) <- sqls.zipWithIndex) {
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.sql(sql).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val ts = (1 to reps).map(_ => once())
      println(f"[timesql] #$i min=${ts.min}%.3f reps=${ts.map(t => f"$t%.3f").mkString(",")} :: ${sql.linesIterator.next().take(80)}")
    }
    spark.stop()
  }
}
