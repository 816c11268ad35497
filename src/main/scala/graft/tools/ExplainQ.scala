package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed physical plan of one `SparkEntry.queries`
  * entry by name — the fastest way to audit a gate query's plan shape
  * (join strategy, exchange count, bucketed scans, pushed filters)
  * without writing SQL for PlanProbe/ExplainProbe.
  *
  * Usage: runMain graft.tools.ExplainQ <queryName> [sfDir]
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println(s"=== PHYSICAL $name ===")
    println(df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.treeString)
    spark.stop()
  }
}
