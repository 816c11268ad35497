package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print analyzed + optimized plans for a SQL text with the
  * engine installed. Usage: runMain graft.tools.PlanProbe <sfDir> <sql>
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val sql = args(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.install(spark)
    for (t <- graft.Tables.starTables)
      graft.Tables.t(spark, sfDir, t).createOrReplaceTempView(t)
    graft.cube.TpchCube.ensure(spark, sfDir)
    graft.cube.RollupCube.ensure(spark, sfDir)
    val qe = spark.sql(sql)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution
    println("=== ANALYZED ===\n" + qe.analyzed.treeString)
    println("=== OPTIMIZED ===\n" + qe.optimizedPlan.treeString)
  }
}
