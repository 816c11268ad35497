package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cube.{CubeCatalog, CubeRefresh, RollupCube, TpchCube}

/** Incremental cube refresh: grow the fact table (new months AND a
  * late-arriving mid-month batch), refresh, and prove the cube + every
  * rollup node serve results identical to a from-scratch build — while only
  * the dirty buckets were rewritten.
  */
class CubeRefreshSpec extends AnyFunSuite {
  import TestSpark._

  private val srcSf = "/root/testdata/sf0.001"
  private val workDir = "/tmp/graft_refresh_sf"
  // cutoff mid-month: bucket 317 (1996-06) exists at build time but GROWS on
  // refresh — exercising the late-arrival path, not just new months
  private val cutoff = "1996-06-15"

  private def seedWorkDir(): Unit = {
    val dir = new java.io.File(workDir)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(dir)
    // wipe every GENERATION (pointer + .gen-N siblings + root data) of
    // the cube and all lattice nodes — a refresh now publishes new
    // generation dirs beside the build roots (CubeGenerations)
    Seq(TpchCube.cubePath(workDir), RollupCube.rollupPath(workDir),
      RollupCube.coarsePath(workDir), RollupCube.slicePath(workDir),
      RollupCube.q1Path(workDir), RollupCube.q3Path(workDir),
      RollupCube.nationsPath(workDir), RollupCube.marketPath(workDir),
      RollupCube.ordersNationsPath(workDir))
      .foreach(graft.cube.CubeGenerations.wipeAll)
    dir.mkdirs()
    for (t <- Tables.starTables) {
      val df = spark.read.parquet(Tables.path(srcSf, t))
      val out =
        if (t == "lineitem") df.filter(col("l_shipdate") < lit(cutoff).cast("timestamp"))
        else df
      out.coalesce(1).write.mode("overwrite").parquet(Tables.path(workDir, t))
    }
    Tables.invalidateCache()
  }

  test("refresh rewrites only dirty buckets and matches a full rebuild") {
    seedWorkDir()
    TpchCube.ensure(spark, workDir)
    RollupCube.ensure(spark, workDir)
    val name = s"tpch_flat_${new java.io.File(workDir).getName}"
    val before = CubeCatalog.get(name).get
    val bucketsBefore = spark.read.parquet(before.cubePath)
      .select("g_tbucket").distinct().collect().map(_.getInt(0)).toSet

    // the fact table grows: full lineitem replaces the truncated one
    spark.read.parquet(Tables.path(srcSf, "lineitem"))
      .coalesce(1).write.mode("overwrite").parquet(Tables.path(workDir, "lineitem"))
    Tables.invalidateCache()

    val result = CubeRefresh.refresh(spark, before, Tables.flat(spark, workDir))
    val after = result.refreshed

    // dirty set = the grown mid-month bucket + every later month; nothing
    // before the cutoff month was touched
    val cutoffBucket = (1996 - 1970) * 12 + 6 - 1
    assert(result.dirtyBuckets.min == cutoffBucket, result.dirtyBuckets.toString)
    assert(result.dirtyBuckets.size > 1)
    assert(bucketsBefore.filter(_ < cutoffBucket)
      .forall(b => !result.dirtyBuckets.contains(b)))

    // baselines must come from the raw facts, NOT via the engine's own
    // rewrite onto the (refreshed) cube/rollup — that would be circular
    def withoutRewrites[T](body: => T): T = {
      spark.conf.set("spark.graft.starJoin.enabled", "false")
      spark.conf.set("spark.graft.rollupRouting.enabled", "false")
      try body finally {
        spark.conf.set("spark.graft.starJoin.enabled", "true")
        spark.conf.set("spark.graft.rollupRouting.enabled", "true")
      }
    }

    // cube content now equals a direct flatten of the full sources
    val cubeCount = spark.read.parquet(after.cubePath).count()
    val directCount = withoutRewrites { Tables.flat(spark, workDir).count() }
    assert(cubeCount == directCount)

    // the time interval metadata extended past the cutoff
    val hi = after.info.timeIntervalMicros.get._2
    assert(hi > java.time.Instant.parse(s"${cutoff}T00:00:00Z").toEpochMilli * 1000L)

    // every rollup node re-aggregates to the same answer as the raw facts
    val direct = withoutRewrites {
      Tables.flat(spark, workDir)
        .groupBy("c_mktsegment", "l_returnflag")
        .agg(count(lit(1)).as("cnt"), Tables.dsum(col("l_quantity")).as("sum_qty"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    }
    for (ru <- after.rollups if ru.dims.toSet.intersect(
        Set("c_mktsegment", "l_returnflag")).size == 2) {
      val served = spark.read.parquet(ru.path)
        .groupBy("c_mktsegment", "l_returnflag")
        .agg(sum(col("cnt")).as("cnt"),
          sum(col("sum_qty")).cast("double").as("sum_qty"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
      assert(served == direct, s"rollup at ${ru.path} diverged")
    }

    // exact-NDV proof was refreshed (customers only grow)
    val ndvBefore = before.rollups.head.kmvExactNdv("o_custkey")
    val ndvAfter = after.rollups.head.kmvExactNdv("o_custkey")
    assert(ndvAfter >= ndvBefore)

    // idempotent: a second refresh finds nothing dirty
    val again = CubeRefresh.refresh(spark, after, Tables.flat(spark, workDir))
    assert(again.dirtyBuckets.isEmpty)

    // rebuilds preserve declared leaf clustering: inside every parquet file
    // of a clusterDims node, the cluster column must be non-decreasing —
    // that monotonicity is exactly what makes row-group min/max stats
    // skippable. (Checked per FILE: split packing may put several small
    // files in one partition, and sortedness across files is not claimed.)
    def firstColViolations(path: String, c: String): Long = {
      val df = spark.read.parquet(path)
      // numeric cluster dims must compare numerically — "10" < "9"
      // lexicographically would flag correctly sorted files
      val v = df.schema(c).dataType match {
        case _: org.apache.spark.sql.types.NumericType =>
          format_string("%020.6f", col(c).cast("double"))
        case _ => col(c).cast("string")
      }
      df.select(input_file_name().as("f"), v.as("v"))
        .rdd.mapPartitions { it =>
          var prevFile = ""; var prev = ""; var bad = 0L
          it.foreach { r =>
            val f = r.getString(0)
            val v = if (r.isNullAt(1)) "" else r.getString(1)
            if (f == prevFile && v < prev) bad += 1
            prevFile = f; prev = v
          }
          Iterator.single(bad)
        }.fold(0L)(_ + _)
    }
    for (ru <- after.rollups if ru.clusterDims.nonEmpty)
      assert(firstColViolations(ru.path, ru.clusterDims.head) == 0,
        s"node ${ru.path} lost its ${ru.clusterDims.head} clustering after refresh")
    // the fact cube's own declared clustering survives the dirty-bucket
    // rewrite too (CubeInfo.clusterDims)
    assert(after.info.clusterDims.nonEmpty)
    assert(firstColViolations(after.cubePath, after.info.clusterDims.head) == 0,
      "fact cube lost its intra-bucket clustering after refresh")
  }
}
