package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cube.{CubeCatalog, CubeGenerations, CubeRefresh, RollupCube, TpchCube}

/** The cube's consistency contract (r18 verdict item 1 —
  * [[graft.cube.CubeGenerations]]): a refresh publishes a NEW generation
  * and never mutates a serving directory, so
  *
  *   1. a query RACING the refresh — planned at any instant before,
  *      during, or after the publish — serves exactly one whole
  *      generation's answer (the reference's coordinator swap: readers
  *      never observe a torn datasource);
  *   2. a FOREIGN JVM's refresh of the same cube is excluded by the
  *      cube root's OS maintenance lock for the whole (cube + nodes)
  *      maintenance unit;
  *   3. old generations survive keep-2 + the age grace (an in-flight
  *      reader's planned files are never deleted under it), then
  *      collect;
  *   4. a crashed staging (a `.gen-N` sibling with no pointer flip) is
  *      invisible to serving.
  */
class CubeGenerationSpec extends AnyFunSuite {
  import TestSpark._

  private val srcSf = "/root/testdata/sf0.001"
  private val workDir = "/tmp/graft_gen_sf"
  private val cutoff = "1996-06-15"

  private def seedWorkDir(): Unit = {
    val dir = new java.io.File(workDir)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(dir)
    Seq(TpchCube.cubePath(workDir), RollupCube.rollupPath(workDir),
      RollupCube.coarsePath(workDir), RollupCube.slicePath(workDir),
      RollupCube.q1Path(workDir), RollupCube.q3Path(workDir),
      RollupCube.nationsPath(workDir), RollupCube.marketPath(workDir),
      RollupCube.ordersNationsPath(workDir))
      .foreach(CubeGenerations.wipeAll)
    dir.mkdirs()
    for (t <- Tables.starTables) {
      val df = spark.read.parquet(Tables.path(srcSf, t))
      val out =
        if (t == "lineitem")
          df.filter(col("l_shipdate") < lit(cutoff).cast("timestamp"))
        else df
      out.coalesce(1).write.mode("overwrite").parquet(Tables.path(workDir, t))
    }
    Tables.invalidateCache()
  }

  test("torn generation store refuses loudly; wiped cache falls back") {
    val root = "/tmp/graft_gen_torn/cube"
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File("/tmp/graft_gen_torn"))
    new java.io.File(root).mkdirs()
    val pointer = new java.io.File(root + ".generation.current")
    // pointer names a VANISHED generation, no siblings: wiped cache —
    // fall back to the bare root so a rebuild proceeds
    java.nio.file.Files.writeString(pointer.toPath,
      CubeGenerations.genDir(root, 2))
    assert(CubeGenerations.currentDir(root) == root)
    // same pointer, but a STALE sibling survives: a torn store — serving
    // the bare root would silently answer from generation-1 data
    new java.io.File(CubeGenerations.genDir(root, 3)).mkdirs()
    val e = intercept[IllegalStateException] {
      CubeGenerations.currentDir(root)
    }
    assert(e.getMessage.contains("torn generation store"), e.getMessage)
    assert(e.getMessage.contains(".gen-00000003"), e.getMessage)
    rm(new java.io.File("/tmp/graft_gen_torn"))
  }

  test("refresh is a generation swap: racing queries whole, foreign JVM excluded, keep-2 GC") {
    seedWorkDir()
    TpchCube.ensure(spark, workDir)
    RollupCube.ensure(spark, workDir)
    val name = s"tpch_flat_${new java.io.File(workDir).getName}"
    val before = CubeCatalog.get(name).get
    val cubeRoot = CubeGenerations.rootOf(before.cubePath)
    assert(before.cubePath == cubeRoot, "initial build serves the bare root")

    // the probe query: a full star aggregate the engine rewrites onto
    // the cube/lattice at PLAN time — the real serve path, no lock
    // anywhere on it
    def measure(): Map[String, (Long, Double)] =
      Tables.flat(spark, workDir)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"), Tables.dsum(col("l_quantity")).as("q"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val beforeMap = measure()

    // the fact table grows: full lineitem replaces the truncated one
    spark.read.parquet(Tables.path(srcSf, "lineitem"))
      .coalesce(1).write.mode("overwrite")
      .parquet(Tables.path(workDir, "lineitem"))
    Tables.invalidateCache()
    // ground truth AFTER growth, measured from the raw tables (the cube
    // is stale until the refresh publishes)
    val afterMap = Graft.withoutRewrites(spark) { measure() }
    assert(afterMap != beforeMap, "growth must change the answer")

    // 1. RACING READERS: hammer the serve path while the refresh stages
    // and publishes — every observation must be exactly beforeMap (old
    // generation) or afterMap (new generation); anything else is a torn
    // read (mixed generations / vanished files), the bug class the
    // in-place dynamic overwrite had
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val observations = new java.util.concurrent.atomic.AtomicInteger(0)
    val violations =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val v = measure()
          observations.incrementAndGet()
          if (v != beforeMap && v != afterMap)
            violations.add(v.toString)
          ()
        } catch {
          case t: Throwable => violations.add(s"reader threw: $t")
        }
      }
    })
    reader.start()
    val result = CubeRefresh.refresh(spark, before,
      Tables.flat(spark, workDir))
    // after the publish, readers settle on the new generation; give the
    // loop a few more observations before stopping
    Thread.sleep(1500)
    stop.set(true)
    reader.join(60000)
    assert(violations.isEmpty,
      s"torn reads during refresh: ${violations.toArray.mkString("; ")}")
    assert(observations.get() >= 3,
      s"racing reader only observed ${observations.get()} times")

    // the new registration serves afterMap from a NEW generation dir;
    // the pre-refresh generation is PREVIOUS — intact on disk, so any
    // reader that planned against it finishes whole
    val after = result.refreshed
    assert(after.cubePath == CubeGenerations.genDir(cubeRoot, 2),
      after.cubePath)
    assert(new java.io.File(before.cubePath, "_SUCCESS").exists(),
      "keep-2: the previous generation must survive the refresh")
    assert(measure() == afterMap)
    after.rollups.foreach(ru =>
      assert(ru.path.endsWith(".gen-00000002"), ru.path))

    // 4. a CRASHED staging: a stale .gen sibling with no pointer flip —
    // serving is untouched, and the next refresh replaces it wholesale
    val crashed = new java.io.File(CubeGenerations.genDir(cubeRoot, 3))
    crashed.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(crashed, "partial.bin").toPath, "torn")
    assert(CubeGenerations.currentDir(cubeRoot) == after.cubePath)
    assert(measure() == afterMap)

    // 2. FOREIGN-JVM exclusion: a second driver holding the cube root's
    // maintenance lock blocks even a no-op refresh for its whole hold
    // (the lock wraps dirty detection, staging AND publish — one
    // maintenance unit)
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getPath
    def src(c: Class[_]) = new java.io.File(
      c.getProtectionDomain.getCodeSource.getLocation.toURI).getPath
    val cp = Seq(src(graft.tools.LockProbe.getClass),
      src(scala.Predef.getClass)).mkString(java.io.File.pathSeparator)
    val holdMs = 3000L
    val proc = new ProcessBuilder(javaBin, "-cp", cp,
      "graft.tools.LockProbe", cubeRoot + ".maintenance.lock",
      "hold-exclusive", holdMs.toString).start()
    val rdr = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    assert(rdr.readLine() == "ACQUIRED", "foreign lock holder failed")
    val t0 = System.nanoTime()
    CubeRefresh.refresh(spark, after, Tables.flat(spark, workDir),
      explicitDirty = Some(Nil)) // no-op body; the WAIT is the measure
    val waitedMs = (System.nanoTime() - t0) / 1e6
    proc.waitFor(30, java.util.concurrent.TimeUnit.SECONDS)
    assert(waitedMs >= holdMs - 500,
      f"refresh entered after $waitedMs%.0f ms against a $holdMs ms " +
        "foreign maintenance hold — cross-JVM exclusion broken")

    // 3. GC: a forced third generation under gcGraceMs=0 (child session,
    // shared conf untouched) collects generation 1 (neither current nor
    // previous) — including the crashed gen-3 leftover, which the forced
    // refresh replaced wholesale and then superseded. The forced refresh
    // runs through the SQL verb: `REFRESH GRAFT CUBE ... BUCKETS (b)`
    // rebuilds the flattening from the registered descriptor alone
    // (CubeSource.flatten), so the serve-equality assertions below ALSO
    // prove that metadata-derived flattening matches the build's own
    val sG = spark.newSession()
    sG.conf.set("spark.graft.artifact.gcGraceMs", "0")
    val parser = new graft.plans.GraftSqlParser(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.sqlParser)
    val sqlRow = parser.parsePlan(
      s"REFRESH GRAFT CUBE $name BUCKETS (${result.dirtyBuckets.head})")
      .asInstanceOf[graft.plans.RefreshGraftCubeCommand].run(sG).head
    assert(sqlRow.getString(0) == name &&
      sqlRow.getString(1) == result.dirtyBuckets.head.toString &&
      sqlRow.getString(3) == "3", sqlRow.toString)
    val forcedCube = CubeCatalog.get(name).get
    assert(forcedCube.cubePath == CubeGenerations.genDir(cubeRoot, 3))
    assert(!new java.io.File(cubeRoot, "_SUCCESS").exists(),
      "generation 1 (the bare root's data) must be collected past keep-2")
    assert(new java.io.File(after.cubePath, "_SUCCESS").exists(),
      "generation 2 is PREVIOUS — retained for in-flight readers")
    assert(Graft.withoutRewrites(spark) { measure() } == afterMap)
    assert(measure() == afterMap, "serve unchanged across the forced swap")

    // 5. FOREIGN-refresh staleness guard: simulate another JVM's stale
    // registration (the pre-forced-refresh generation) — the catalog's
    // pointer re-check must re-attach the CURRENT generation's
    // descriptor instead of serving gen-2 forever (and, two foreign
    // refreshes later, a collected generation)
    CubeCatalog.register(after) // stale: points at gen-2
    CubeCatalog.forceStaleCheck()
    val reattached = CubeCatalog.get(name).get
    assert(reattached.cubePath == CubeGenerations.genDir(cubeRoot, 3),
      s"stale registration must re-attach the current generation, " +
        s"got ${reattached.cubePath}")
    assert(reattached.rollups.forall(_.path.endsWith(".gen-00000003")))
    assert(measure() == afterMap)
  }
}
