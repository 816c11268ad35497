package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ListenerBusUtil

/** Dev tool: measure the clustered-leaf row-group skip on a MULTI-row-group
  * layout and commit it as a per-round artifact (ROWGROUP_PROBE_r<N>.json).
  *
  * Why this exists: the cube build sorts each time bucket by the declared
  * `CubeInfo.clusterDims` (TpchCube.ensure) so that at 100 TB — where one
  * month holds thousands of parquet row groups — a dim-sliced query reads
  * only the row groups whose min/max straddle the slice value. The
  * committed bench runs at sf0.1 where every leaf is a single row group,
  * so that design claim is invisible in BENCH_*.json; RowGroupSkipSpec
  * measures it but only inside `sbt test`. This probe reproduces the
  * cube's EXACT per-bucket layout discipline (one file, rows sorted by the
  * cube's own declared clusterDims) with a small `parquet.block.size` so
  * the file holds 100+ row groups — the shape of one 100-TB bucket, shrunk
  * — and records the measured rows-read ratio clustered vs unclustered.
  *
  * `recordsRead` is the observable: the vectorized parquet reader only
  * materializes rows of row groups that survive footer min/max filtering,
  * so (unclustered recordsRead) / (clustered recordsRead) IS the skip
  * ratio. Scenarios mirror the serving shapes that matter:
  *  - Q3's residual dim slice (`c_mktsegment = <seg>`),
  *  - Q8's supplier-nation slice (`s_nation = <nation>`),
  *  - both together (the lattice's two leading clusterDims),
  *  - a time-range prefix read on an `o_orderdate`-sorted node layout
  *    (the okey rollup node's declared clustering, RollupCube).
  * Predicate values are taken from the data (lowest distinct value) so the
  * probe survives driver testdata regeneration.
  *
  * Reference analog: the raw-grain index behavior every headline claim is
  * measured against in `docs/benchmark/BenchMarkDetails.org:146-160`.
  *
  * Usage: runMain graft.tools.RowGroupProbe [outPath] [sfDir] [blockKiB]
  */
object RowGroupProbe {

  private val read = new AtomicLong

  def main(args: Array[String]): Unit = {
    val outPath = if (args.length > 0) args(0) else "ROWGROUP_PROBE_LATEST.json"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val blockKiB = if (args.length > 2) args(2).toInt else 128
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same discipline as the engine session (Graft.install): INT96 has no
    // usable row-group stats, so the time-prefix scenario needs INT64
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")

    val sf = new java.io.File(sfDir).getName
    val dir = s"/root/repo/target/cubes/rowgroup_probe_${sf}_" +
      graft.Tables.contentTag(sfDir)
    val clusterDims = graft.cube.TpchCube.info.clusterDims

    val flat = graft.Tables.flat(spark, sfDir)
      .select(("o_orderdate" +: "l_quantity" +: "l_extendedprice" +:
        clusterDims).distinct.map(col): _*)
    def write(df: DataFrame, path: String): Unit =
      df.write.mode("overwrite")
        .option("parquet.block.size", blockKiB * 1024)
        .option("parquet.page.size", 8 * 1024)
        .parquet(path)
    // one partition + sortWithinPartitions = exactly the cube build's
    // per-bucket layout (TpchCube.ensure / CubeRefresh), one file
    val one = flat.repartition(1)
    write(one.sortWithinPartitions(clusterDims.map(col): _*), s"$dir/clustered")
    write(one, s"$dir/unclustered")
    write(one.sortWithinPartitions("o_orderdate"), s"$dir/time_sorted")

    val groups = rowGroups(spark, s"$dir/clustered")
    val total = spark.read.parquet(s"$dir/unclustered").count()

    // predicate values from the data, not hard-coded names
    val seg = flat.select(min("c_mktsegment")).head().getString(0)
    val nation = flat.select(min("s_nation")).head().getString(0)
    // ~10% into the o_orderdate range (JVM-side date math — works whether
    // the column is DATE or an ISO string)
    val dateCut = {
      val r = flat.select(min(col("o_orderdate")).cast("string"),
        max(col("o_orderdate")).cast("string")).head()
      val lo = java.time.LocalDate.parse(r.getString(0).take(10))
      val hi = java.time.LocalDate.parse(r.getString(1).take(10))
      lo.plusDays(java.time.temporal.ChronoUnit.DAYS.between(lo, hi) / 10)
        .toString
    }

    def slice(name: String, pred: DataFrame => DataFrame,
              sortedPath: String): String = {
      val sorted = recordsRead(spark, pred(spark.read.parquet(sortedPath)))
      val unsorted =
        recordsRead(spark, pred(spark.read.parquet(s"$dir/unclustered")))
      val ratio = unsorted.toDouble / math.max(1L, sorted)
      // identical results either way — the skip must be lossless
      val a = pred(spark.read.parquet(sortedPath)).count()
      val b = pred(spark.read.parquet(s"$dir/unclustered")).count()
      require(a == b, s"$name: clustered/unclustered row counts differ $a/$b")
      println(f"[rowgroup] $name%-24s clustered reads $sorted%,d of " +
        f"$total%,d rows, unclustered $unsorted%,d — skip ${ratio}%.1fx")
      f""" "$name":{"rows_clustered":$sorted,"rows_unclustered":$unsorted,"result_rows":$a,"skip_ratio":$ratio%.1f}"""
    }

    val rows = Seq(
      slice("q3_segment_slice",
        _.where(col("c_mktsegment") === seg), s"$dir/clustered"),
      slice("q8_nation_slice",
        _.where(col("s_nation") === nation), s"$dir/clustered"),
      slice("dim_pair_slice",
        _.where(col("c_mktsegment") === seg && col("s_nation") === nation),
        s"$dir/clustered"),
      slice("time_prefix_read",
        df => df.where(col("o_orderdate") <
          lit(dateCut).cast(df.schema("o_orderdate").dataType)),
        s"$dir/time_sorted")) :+ engineRouteScenario(spark, sfDir, dir, blockKiB)

    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      s"""{"sfDir":"$sfDir","block_kib":$blockKiB,"row_groups_per_file":$groups,"total_rows":$total,
         |"layout":"single file per bucket, sortWithinPartitions(${clusterDims.mkString(",")}) — TpchCube.ensure's discipline",
         |"predicates":{"segment":"$seg","nation":"$nation","date_cutoff":"$dateCut"},
         |"scenarios":{
         |${rows.mkString(",\n")}
         |}}
         |""".stripMargin)
    println(s"[rowgroup] $groups row groups/file; wrote $outPath")
    spark.stop()
  }

  /** The verdict-grade scenario: the ENGINE'S OWN routed Q3 plan over a
    * multi-row-group cube. The real cube is rebuilt twice at the small
    * block size — once with TpchCube.ensure's declared clusterDims sort,
    * once unsorted — each copy is registered as the serving cube, and the
    * stock TPC-H Q3 SQL runs through the full rewrite stack (star collapse
    * → cube scan with the `c_mktsegment` residual + time-bucket pruning;
    * rollup routing disabled so the CUBE leaf layout is what's measured).
    * recordsRead(unclustered) / recordsRead(clustered) is the row-group
    * skip the declared clustering buys the production plan itself, not a
    * hand-written scan. Both routes must return identical rows.
    */
  private def engineRouteScenario(spark: SparkSession, sfDir: String,
                                  dir: String, blockKiB: Int): String = {
    graft.Graft.install(spark)
    for (t <- graft.Tables.starTables)
      graft.Tables.t(spark, sfDir, t).createOrReplaceTempView(t)
    val cube = graft.cube.TpchCube.ensure(spark, sfDir)
    spark.conf.set("spark.graft.rollupRouting.enabled", "false")

    def rebuild(dst: String, clustered: Boolean): Unit = {
      val base = spark.read.parquet(cube.cubePath).repartition(col("g_tbucket"))
      val laid = if (clustered)
        base.sortWithinPartitions(
          ("g_tbucket" +: graft.cube.TpchCube.info.clusterDims).map(col): _*)
      else
        // a bare repartition PRESERVES the source cube's sorted runs per
        // bucket (min/max stats would still discriminate) — scramble by a
        // hash so every row group really spans every segment
        base.sortWithinPartitions(col("g_tbucket"), xxhash64(col("l_orderkey")))
      laid.write.mode("overwrite")
        .option("parquet.block.size", blockKiB * 1024)
        .option("parquet.page.size", 8 * 1024)
        .partitionBy("g_tbucket").parquet(dst)
    }
    val cDir = s"$dir/cube_clustered"
    val uDir = s"$dir/cube_unclustered"
    rebuild(cDir, clustered = true)
    rebuild(uDir, clustered = false)

    def routed(path: String): (Long, Seq[String]) = {
      graft.cube.CubeCatalog.register(
        cube.copy(cubePath = path, rollups = Nil))
      graft.cube.CubeCatalog.invalidatePlan(cube.cubePath)
      graft.cube.CubeCatalog.invalidatePlan(path)
      org.apache.spark.sql.graft.FileListingCache.invalidateAll(spark)
      val df = spark.sql(graft.SparkEntry.StarQueries.q03_shipping_priority)
      // root-path check, not treeString matching: InMemoryFileIndex
      // truncates long paths when the plan prints
      val scanned = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.rootPaths.map(_.toString)
              case _ => Nil
            }
        }.flatten
      require(scanned.exists(_.endsWith(new java.io.File(path).getName)),
        s"Q3 did not route to $path, scans: $scanned")
      val result = df.collect().map(_.toString).toSeq
      (recordsRead(spark, df), result)
    }
    // restore-in-finally: a require failure inside routed() must not leave
    // the scrambled probe cube registered as the serving cube (or rollup
    // routing disabled) for the rest of the session
    val (cReads, cRows, uReads, uRows) =
      try {
        val (cr, crows) = routed(cDir)
        val (ur, urows) = routed(uDir)
        (cr, crows, ur, urows)
      } finally {
        graft.cube.CubeCatalog.register(cube)
        graft.cube.CubeCatalog.invalidatePlan(cDir)
        graft.cube.CubeCatalog.invalidatePlan(uDir)
        org.apache.spark.sql.graft.FileListingCache.invalidateAll(spark)
        spark.conf.unset("spark.graft.rollupRouting.enabled")
      }
    require(cRows == uRows, "routed Q3 rows differ between layouts")
    val ratio = uReads.toDouble / math.max(1L, cReads)
    println(f"[rowgroup] engine_q3_route          routed Q3 reads $cReads%,d " +
      f"rows clustered vs $uReads%,d unclustered — skip ${ratio}%.1fx")
    f""" "engine_q3_route":{"rows_clustered":$cReads,"rows_unclustered":$uReads,"result_rows":${cRows.size},"skip_ratio":$ratio%.1f}"""
  }

  private def rowGroups(spark: SparkSession, path: String): Int = {
    val f = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(f.getAbsolutePath),
      spark.sessionState.newHadoopConf())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFooter.getBlocks.size() finally r.close()
  }

  /** recordsRead for a full evaluation of `df` (noop sink, as in Bench). */
  private def recordsRead(spark: SparkSession, df: DataFrame): Long = {
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          read.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      ListenerBusUtil.waitUntilEmpty(spark)
      read.set(0L)
      df.write.mode("overwrite").format("noop").save()
      ListenerBusUtil.waitUntilEmpty(spark)
      read.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
