package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: install the engine, run an SQL, print optimized + physical
  * plans and a timing. Usage: runMain graft.tools.ExplainProbe <sql|@file> [sfDir]
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val sql =
      if (args(0).startsWith("@"))
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(args(0).drop(1))), "UTF-8")
      else args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.install(spark)
    for (t <- graft.Tables.starTables ++ Seq("documents", "embeddings"))
      graft.Tables.t(spark, sfDir, t).createOrReplaceTempView(t)
    graft.cube.TpchCube.ensure(spark, sfDir)
    graft.cube.RollupCube.ensure(spark, sfDir)
    val df = spark.sql(sql)
    val qe = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution
    println("=== OPTIMIZED ===\n" + qe.optimizedPlan.treeString)
    println("=== PHYSICAL ===\n" + qe.executedPlan.treeString)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[probe] rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
