package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: break a SparkEntry query's FIRST-contact wall time into
  * build (DataFrame construction incl. descriptor parse), optimize
  * (analysis + rewrite rules + route pricing), plan (physical), and
  * execute — then repeat warm. Usage:
  *   runMain graft.tools.FirstContactProbe <queryName> [sfDir] [reps]
  */
object FirstContactProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.install(spark)
    graft.cube.TpchCube.ensure(spark, sfDir)
    graft.cube.RollupCube.ensure(spark, sfDir)
    graft.Tables.t(spark, sfDir, "lineitem").count()
    val fn = graft.SparkEntry.queries(name)
    def ms(t0: Long): String = f"${(System.nanoTime() - t0) / 1e6}%.0f ms"
    if (sys.env.contains("PROBE_WARM_JSON")) {
      val t0 = System.nanoTime()
      org.json4s.jackson.JsonMethods.parse("""{"a": 1}""")
      println(s"[fc] json4s first parse: ${ms(t0)}")
    }
    for (i <- 1 to reps) {
      var t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      println(s"[fc] rep $i build:    ${ms(t0)}")
      val qe = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution
      t0 = System.nanoTime()
      qe.optimizedPlan
      println(s"[fc] rep $i optimize: ${ms(t0)}")
      t0 = System.nanoTime()
      qe.executedPlan
      println(s"[fc] rep $i plan:     ${ms(t0)}")
      t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(s"[fc] rep $i execute:  ${ms(t0)}")
    }
    spark.stop()
  }
}
