package graft.tools

import org.apache.spark.sql.SparkSession

/** r20 verdict item 6: the driver read mild (−10–23%) regressions on the
  * sub-0.5 s headline queries two rounds running, with bit-identical scan
  * metrics — i.e. no plan change. The suspected mechanism is SESSION
  * ORDERING: the timed tail (~145 queries × 5 reps) accumulates JVM state
  * (plans, broadcasts, codegen classes, GC debt) that the headline numbers
  * of the NEXT round's warm pass then sit on. This probe measures that
  * directly in ONE session: warm everything, settle, time the headlines
  * (pass A), execute the full tail timed-loop-style, settle, time the
  * headlines again (pass B). A reproducible A-vs-B gap = session-state
  * drift of exactly the driver's magnitude; A ≈ B = the driver deltas were
  * box noise.
  *
  * Usage: runMain graft.tools.HeadlineDriftProbe [sfDir]
  */
object HeadlineDriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
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
    graft.cube.TpchCube.ensure(spark, sfDir)
    graft.cube.RollupCube.ensure(spark, sfDir)
    graft.Tables.t(spark, sfDir, "lineitem").count()

    val headline = Seq(
      "q02_basic_agg", "q_ship_date_range", "q_subqry_filters_range",
      "q01_pricing_summary", "q03_shipping_priority", "q05_local_supplier",
      "q07_nation_volume", "q08_market_share")
    val all = graft.SparkEntry.queries.toSeq.sortBy(_._1)
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def settle(): Unit = {
      org.apache.spark.sql.graft.ListenerBusUtil.waitUntilEmpty(spark)
      System.gc(); Thread.sleep(500); System.gc(); Thread.sleep(500)
    }
    def timeHeadlines(label: String): Map[String, Seq[Double]] = {
      settle()
      headline.map { name =>
        val fn = graft.SparkEntry.queries(name)
        val ts = (1 to 5).map { _ =>
          val t0 = System.nanoTime()
          exec(fn(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }
        System.err.println(f"[drift] $label $name min=${ts.min}%.3f " +
          s"reps=${ts.map(t => f"$t%.3f").mkString(",")}")
        name -> ts
      }.toMap
    }

    // warm pass over everything (Bench-identical)
    all.foreach { case (_, fn) =>
      try exec(fn(spark, sfDir)) catch { case _: Throwable => () }
    }
    val passA = timeHeadlines("A(before-tail)")
    // the tail, executed timed-loop-style (3 reps each, like Bench's base
    // reps) to accumulate the same session state the real suite does
    all.filterNot(q => headline.contains(q._1)).foreach { case (_, fn) =>
      (1 to 3).foreach { _ =>
        try exec(fn(spark, sfDir)) catch { case _: Throwable => () }
      }
    }
    val passB = timeHeadlines("B(after-tail)")
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val js = headline.map { n =>
      val a = passA(n).min
      val b = passB(n).min
      s""""$n":{"before_tail":${fmt(a)},"after_tail":${fmt(b)},"ratio":${fmt(b / a)}}"""
    }.mkString("{", ",", "}")
    println(s"""HEADLINE_DRIFT {"sf":"$sfDir","queries":$js}""")
    spark.stop()
  }
}
