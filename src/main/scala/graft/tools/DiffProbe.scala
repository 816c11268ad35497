package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc differential: run named SparkEntry queries with the engine on,
  * then with every rewrite disabled, and compare sorted/rounded rows —
  * the reference's cTest protocol as a command-line probe.
  *
  * Usage: `sbt "runMain graft.tools.DiffProbe [sfDir] [queryName ...]"`
  */
object DiffProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else Seq("q_subqry_filters_range")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def rows(name: String): Seq[String] =
      graft.SparkEntry.queries(name)(spark, sfDir).collect().map { r =>
        (0 until r.length).map { i =>
          r.get(i) match {
            case d: Double => f"$d%.2f"
            case v         => String.valueOf(v)
          }
        }.mkString("|")
      }.sorted.toSeq
    var bad = 0
    for (name <- names) {
      val engine = rows(name)
      val raw = graft.Graft.withoutRewrites(spark)(rows(name))
      val ok = engine == raw
      if (!ok) {
        bad += 1
        println(s"$name MISMATCH engine=${engine.size} raw=${raw.size}")
        (engine.diff(raw) ++ raw.diff(engine)).take(10).foreach(r => println(s"  $r"))
      } else println(s"$name OK (${engine.size} rows)")
    }
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
