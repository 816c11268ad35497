package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec

/** Diagnostics main: for each named query (or a built-in set of
  * scale-critical ones), print every parquet scan's pushed data filters,
  * partition filters and read schema — the things that must survive for the
  * plan to hold at 100 TB (SURVEY.md §4.4).
  *
  * Usage: `sbt "runMain graft.PlanCheck [sfDir] [queryName ...]"`
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q_subqry_filters_range", "q07_nation_volume", "q_ship_date_range",
        "q06_forecast_revenue", "q_rollup_reagg")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // diagnostics only: AQE hides the scan nodes until execution
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      println(s"\n===== $name =====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      val qe = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution
      qe.executedPlan.foreach {
        case f: FileSourceScanExec =>
          val loc = f.relation.location.rootPaths.headOption.map(_.getName).getOrElse("?")
          val parts = f.relation.location.listFiles(f.partitionFilters, Nil).size
          println(s"scan $loc")
          println(s"  dataFilters:      ${f.dataFilters.mkString(", ")}")
          println(s"  pushedDownFilters:${f.metadata.getOrElse("PushedFilters", "")}")
          println(s"  partitionFilters: ${f.partitionFilters.mkString(", ")} -> $parts partition(s)")
          println(s"  readSchema:       ${f.requiredSchema.fieldNames.mkString(",")}")
        case _ =>
      }
    }
    spark.stop()
  }
}
