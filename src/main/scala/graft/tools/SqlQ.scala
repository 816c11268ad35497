package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run one SQL statement through a fully installed engine
  * session (extensions, parser commands, metadata views, star temp
  * views) and print the result — the fastest way to drive the SQL
  * command surface (`ADVISE GRAFT ...`, `SHOW GRAFT ...`,
  * `EXPLAIN GRAFT ...`) end to end without writing a spec.
  *
  * Usage: runMain graft.tools.SqlQ "<sql>" <sfDir>
  * (sfDir may instead come from SPARK_GRAFT_SF_DIR)
  */
object SqlQ {
  private def usage(): Nothing = {
    System.err.println(
      """usage: runMain graft.tools.SqlQ "<sql>" <sfDir>
        |  sfDir: directory of parquet star tables (region, nation, ...);
        |         may be omitted if SPARK_GRAFT_SF_DIR is set""".stripMargin)
    sys.exit(2)
  }
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) usage()
    val sql = args(0)
    val sfDir = args.lift(1).orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse(usage())
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // parser commands only exist on a session BUILT with the
      // extensions (injectParser has no post-hoc install path)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.install(spark)
    for (t <- graft.Tables.starTables)
      graft.Tables.t(spark, sfDir, t).createOrReplaceTempView(t)
    graft.Graft.registerMetadataViews(spark)
    println(s"=== $sql ===")
    spark.sql(sql).show(100, truncate = false)
    spark.stop()
  }
}
