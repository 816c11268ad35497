package graft.tools

import org.apache.spark.sql.SparkSession

/** Investigation aid: run a SINGLE SparkEntry query exactly as Verify does
  * (dump parquet + oracle_sql.json) so `tools/check.py` can diff just it —
  * a full Verify pass costs minutes, this costs seconds.
  *
  * Usage: runMain graft.tools.OneVerify <queryName[,more]> <sfDir> <outDir>
  */
object OneVerify {
  def main(args: Array[String]): Unit = {
    val Array(names, sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.shuffle.sort.bypassMergeThreshold",
        graft.Graft.shuffleWriterThreshold)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val wanted = names.split(",").map(_.trim).filter(_.nonEmpty)
    wanted.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
      println(s"[one-verify] dumped $name")
    }
    // oracleSql AFTER the queries ran — entries that inline trained
    // artifacts (annKmeansOracle) only exist post-run
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .filter { case (k, _) => wanted.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"[one-verify] oracle entries: ${wanted.mkString(",")}")
    spark.stop()
  }
}
