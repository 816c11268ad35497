package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cube.{RollupCube, TpchCube}

/** Queryable metadata relations (the reference's
  * `metadata/DruidMetadataViews.scala`, `StarSchemaMetadataTest.scala`):
  * catalog state exposed as `graft_cubes` / `graft_columns` /
  * `graft_rollups` temp views a BI tool can SELECT and JOIN, plus the
  * `REGISTER GRAFT VIEWS` SQL surface that refreshes the snapshot.
  */
class MetadataViewsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val init: Unit = {
    TpchCube.ensure(spark, sf)
    RollupCube.ensure(spark, sf)
    Graft.registerMetadataViews(spark)
  }

  test("graft_cubes lists the registered cube with its lattice size") {
    init
    val rows = spark.sql(
      """SELECT cube, fact_table, time_column, n_rollups
        |FROM graft_cubes WHERE fact_table = 'lineitem'""".stripMargin).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("time_column") == "l_shipdate")
    assert(rows.head.getAs[Int]("n_rollups") >= 3)
  }

  test("graft_columns joins to graft_cubes and matches DESCRIBE GRAFT CUBE") {
    init
    val name = spark.sql("SELECT cube FROM graft_cubes WHERE fact_table = 'lineitem'")
      .collect().head.getString(0)
    val joined = spark.sql(
      s"""SELECT c.column, c.role, c.ndv, c.rollup
         |FROM graft_columns c JOIN graft_cubes b ON c.cube = b.cube
         |WHERE b.cube = '$name' ORDER BY c.column""".stripMargin).collect()
    val described = Graft.describeCube(spark, name).orderBy("column").collect()
    assert(joined.length == described.length && joined.length > 10)
    assert(joined.map(_.toSeq).toSeq == described.map(_.toSeq).toSeq,
      "graft_columns must carry exactly the DESCRIBE rows")
  }

  test("graft_rollups exposes lattice layout columns for planning audits") {
    init
    val rows = spark.sql(
      """SELECT cube, ordinal, dims, grain, partition_dims, cluster_dims,
        |  total_rows, stored_files, stored_rows, stored_bytes
        |FROM graft_rollups ORDER BY ordinal""".stripMargin).collect()
    assert(rows.length >= 3)
    // at least one node is day-grain and at least one carries a layout
    assert(rows.exists(_.getAs[String]("grain") == "day"))
    assert(rows.exists(r => r.getAs[String]("partition_dims").nonEmpty ||
      r.getAs[String]("cluster_dims").nonEmpty))
    assert(rows.forall(_.getAs[Long]("total_rows") != 0L))
    // measured stored sizes (what the cost router prices nodes with) are
    // positive for every built node
    assert(rows.forall(r => r.getAs[Long]("stored_files") > 0L &&
      r.getAs[Long]("stored_rows") > 0L && r.getAs[Long]("stored_bytes") > 0L))
  }

  test("REGISTER GRAFT VIEWS refreshes the snapshot through the parser") {
    init
    // same wiring as GraftSqlParserSpec: the parser class GraftExtensions
    // injects, exercised directly against the session parser as delegate
    val parser = new graft.plans.GraftSqlParser(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.sqlParser)
    val cmd = parser.parsePlan("REGISTER GRAFT VIEWS")
      .asInstanceOf[graft.plans.RegisterGraftViewsCommand]
    val out = cmd.run(spark).map(_.getString(0)).toSet
    assert(out == Set("graft_cubes", "graft_columns", "graft_rollups",
      "graft_query_history"))
    // the refreshed views are immediately queryable
    assert(spark.sql("SELECT count(*) FROM graft_rollups").collect().head.getLong(0) >= 3)
  }

  test("query history records what served each action; view + SHOW surface it") {
    init
    for (t <- Tables.starTables)
      Tables.t(spark, sf, t).createOrReplaceTempView(t)
    // a cube-served star aggregate: the listener classifies it by scan path
    spark.sql(
      """SELECT c_mktsegment, count(*) AS cnt, sum(l_quantity) AS q
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin).collect()
    // QueryExecutionListener delivery is async on the listener bus — poll
    val deadline = System.currentTimeMillis() + 10000
    def entries = graft.plans.QueryHistory.snapshot
    // poll for the ASSERTED predicate, not any-non-raw: under a different
    // suite order the ring already holds artifact:* entries from earlier
    // specs, which would satisfy a weaker poll before this query's async
    // entry lands
    def served = entries.exists(e => e.served.startsWith("rollup:") ||
      e.served.startsWith("cube:"))
    while (!served && System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(served,
      s"no cube/rollup-served entry in ${entries.map(_.served).distinct}")
    assert(entries.forall(_.durationMs >= 0))
    // the snapshot view joins like any relation
    Graft.registerMetadataViews(spark)
    val viewRows = spark.sql(
      """SELECT served, count(*) AS n FROM graft_query_history
        |GROUP BY served""".stripMargin).collect()
    assert(viewRows.map(_.getString(0)).exists(s =>
      s.startsWith("rollup:") || s.startsWith("cube:")))
    // ... and the SQL command surface returns the same log
    val parser = new graft.plans.GraftSqlParser(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.sqlParser)
    val shown = parser.parsePlan("SHOW GRAFT HISTORY")
      .asInstanceOf[graft.plans.ShowGraftHistoryCommand].run(spark)
    assert(shown.nonEmpty && shown.head.length == 8)
    // per-query execution metrics: the rollup/cube-served entry carries
    // the footer-measured IO its executed plan actually read (the
    // reference's DruidQueryExecutionMetric surface) — a parquet-scanning
    // action must report positive files/rows/bytes
    val servedEntry = entries.find(_.served != "raw").get
    assert(servedEntry.scanFiles > 0 && servedEntry.scanRows > 0 &&
      servedEntry.scanBytes > 0,
      s"expected measured IO, got files=${servedEntry.scanFiles} " +
        s"rows=${servedEntry.scanRows} bytes=${servedEntry.scanBytes}")
    val viewIo = spark.sql(
      """SELECT max(scan_rows) FROM graft_query_history
        |WHERE served != 'raw'""".stripMargin).collect().head.getLong(0)
    assert(viewIo == servedEntry.scanRows ||
      viewIo > 0, s"view scan_rows $viewIo")
  }

  test("one-time session warm-up records in history as build:engine-warmup") {
    init
    val snap0 = graft.plans.QueryHistory.snapshot
    val before = snap0.map(_.id).maxOption.getOrElse(0L)
    // warm-up is keyed per (session, dir): if an EARLIER test in this
    // session already touched sf0.001 the build row predates us and this
    // touch must add none — assert whichever branch applies, so the test
    // is order-insensitive (ADVICE r11)
    // the build row's planHead ends with the exact warmed dir — match it
    // end-anchored so a hypothetical sibling dir sharing the prefix
    // (sf0.0011) can't satisfy the assertion (ADVICE r12)
    val warmDir = "/root/testdata/sf0.001"
    def isWarm(e: graft.plans.QueryHistory.Entry): Boolean =
      e.served == "build:engine-warmup" && e.planHead.endsWith(s"for $warmDir")
    val alreadyWarm = snap0.exists(isWarm)
    // first touch of a NEW sf dir pays the warm-up (temp views +
    // cube/rollup ensure) exactly once — and the history row explains it
    graft.SparkEntry.queries("q02_basic_agg")(spark, warmDir)
      .collect()
    val fresh = graft.plans.QueryHistory.snapshot.filter(_.id > before)
    val build = fresh.filter(isWarm)
    if (alreadyWarm)
      assert(build.isEmpty, s"warm dir re-recorded build: ${fresh.map(_.served)}")
    else {
      assert(build.size == 1, s"expected one build row, got ${fresh.map(_.served)}")
      assert(build.head.durationMs >= 0)
    }
    // second query on the same dir pays nothing and records no build row
    val before2 = graft.plans.QueryHistory.snapshot.map(_.id).max
    graft.SparkEntry.queries("q02_basic_agg")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(!graft.plans.QueryHistory.snapshot.filter(_.id > before2)
      .exists(_.served.startsWith("build:")))
    // the row is queryable through the metadata view like any other
    Graft.registerMetadataViews(spark)
    val n = spark.sql(
      """SELECT count(*) FROM graft_query_history
        |WHERE served = 'build:engine-warmup'""".stripMargin)
      .collect().head.getLong(0)
    assert(n >= 1)
  }

  test("materialized pipeline artifacts classify in history as artifact:<kind>") {
    init
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    val embs = Tables.t(spark, sf, "embeddings")
    val cents = Similarity.trainKmeansCentroids(embs, "embedding", k = 8, iters = 2)
    val q = embs.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0)
    // build-or-reuse registers the store with history as artifact:ivf
    val store = Similarity.materializedIvfIndex(embs, "vec_id", "embedding",
      cents, "/root/repo/target/indexes/ivf_history_spec_v1")
    val before = graft.plans.QueryHistory.snapshot.map(_.id).maxOption.getOrElse(0L)
    Similarity.ivfStoreTopK(store, "vec_id", "embedding", q,
      k = 5, cents, nprobe = 2).collect()
    // listener delivery is async — poll for the new entry
    val deadline = System.currentTimeMillis() + 10000
    def fresh = graft.plans.QueryHistory.snapshot.filter(_.id > before)
    while (!fresh.exists(_.served == "artifact:ivf") &&
      System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(fresh.exists(_.served == "artifact:ivf"),
      s"expected an artifact:ivf-served entry, got ${fresh.map(_.served).distinct}")
    // ... and the artifact registry is queryable with measured sizes —
    // scoped to THIS test's store: suites run in parallel, and another
    // suite's legitimately-emptied store (a full fold) correctly reports
    // zero sizes
    Graft.registerMetadataViews(spark)
    val arts = spark.sql(
      s"""SELECT kind, stored_files, stored_rows, stored_bytes
         |FROM graft_artifacts WHERE kind = 'ivf' AND path = '${
        graft.cube.CubeCatalog.normalizePath(
          "/root/repo/target/indexes/ivf_history_spec_v1")}'"""
        .stripMargin).collect()
    assert(arts.nonEmpty, "expected the ivf store in graft_artifacts")
    assert(arts.forall(r => r.getLong(1) > 0 && r.getLong(2) > 0 &&
      r.getLong(3) > 0), arts.mkString("; "))
  }

  test("ADVISE GRAFT MAINTENANCE surfaces IVF pressure before the cap throws; a fold clears it") {
    init
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    val embs = Tables.t(spark, sf, "embeddings")
    val path = "/root/repo/target/indexes/ivf_advise_spec_v1"
    for (suffix <- Seq("", ".tombstones")) {
      val f = new java.io.File(path + suffix)
      if (f.exists()) org.apache.commons.io.FileUtils.deleteDirectory(f)
    }
    val cents = Similarity.trainKmeansCentroids(embs, "embedding", k = 4, iters = 1)
    Similarity.materializedIvfIndex(embs, "vec_id", "embedding", cents, path)
    val capKey = "spark.graft.ivf.maxPendingTombstones"
    val prevCap = spark.conf.getOption(capKey)
    spark.conf.set(capKey, "10")
    try {
      // pressure: 6 pending tombstones (60% of cap 10 >= the 50% advice
      // threshold) and 3 ingest appends (1 build file + 3 appends = 4
      // files in every touched bucket >= the files-per-bucket threshold)
      Similarity.ivfTombstone(spark, path, "vec_id",
        embs.filter(col("vec_id") < 6).select("vec_id"))
      for (_ <- 1 to 3)
        Similarity.ivfIngest(embs.filter(col("vec_id") < 16), "embedding",
          cents, path)
      val parser = new graft.plans.GraftSqlParser(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
          .sessionState.sqlParser)
      def advise() = parser.parsePlan("ADVISE GRAFT MAINTENANCE")
        .asInstanceOf[graft.plans.AdviseGraftMaintenanceCommand].run(spark)
        .filter(_.getString(1) == graft.cube.CubeCatalog.normalizePath(path))
      val hot = advise()
      assert(hot.size == 1, s"expected one row for $path, got $hot")
      assert(hot.head.getLong(2) == 6L, s"pending: ${hot.head}")
      assert(hot.head.getLong(4) >= 4L, s"files/bucket: ${hot.head}")
      val advice = hot.head.getString(6)
      assert(advice.contains("ivfCompact") && advice.contains(path) &&
        advice.contains("pending tombstones") &&
        advice.contains("append files"), advice)
      // the same pressure columns are queryable in graft_artifacts
      Graft.registerMetadataViews(spark)
      val viewRow = spark.sql(
        s"""SELECT pending_tombstones, max_files_per_bucket, buckets,
           |  hot_bucket_share
           |FROM graft_artifacts WHERE kind = 'ivf'
           |AND path = '${graft.cube.CubeCatalog.normalizePath(path)}'"""
          .stripMargin).collect()
      assert(viewRow.length == 1 && viewRow.head.getLong(0) == 6L &&
        viewRow.head.getInt(1) >= 4 && viewRow.head.getInt(2) > 0 &&
        viewRow.head.getDouble(3) > 0.0 && viewRow.head.getDouble(3) <= 1.0,
        viewRow.mkString("; "))
      // running the recommendation clears the advice — the closed loop
      // (contains, not isEmpty: this store may legitimately carry drift
      // advice too — the compact leg under test is the one that clears)
      Similarity.ivfCompact(spark, path)
      val cold = advise()
      assert(cold.size == 1 && cold.head.getLong(2) == 0L &&
        cold.head.getLong(4) == 1L &&
        !cold.head.getString(6).contains("ivfCompact"),
        s"post-fold compact advice must clear: $cold")
    } finally prevCap match {
      case Some(v) => spark.conf.set(capKey, v)
      case None => spark.conf.unset(capKey)
    }
  }

  test("ADVISE GRAFT MAINTENANCE flags a drifted IVF store for recluster; the retrain clears it") {
    init
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    // the drifted-store fixture (scale probe's skewed-bucket shape): 60%
    // of the corpus collapses into a tight clump whose nearest centroid
    // is pinned — the end state of streamed ingest under distribution
    // drift. Everything is hash-deterministic, so the balance numbers
    // are fixed constants for this data, not flaky.
    val embs = Tables.t(spark, sf, "embeddings")
    val seed = embs.orderBy("vec_id").select("embedding")
      .head().getSeq[Float](0)
    val dim = seed.size
    val clump = pmod(col("vec_id"), lit(5L)) < 3
    val skewed = embs.withColumn("embedding",
      when(clump, zip_with(typedLit(seed), sequence(lit(0), lit(dim - 1)),
        (x, i) => x + (pmod(xxhash64(col("vec_id"), i), lit(201L)) -
          lit(100L)).cast("float") * lit(5e-5f)))
        .otherwise(col("embedding")))
    val cents = seed.map(_.toDouble).toSeq +:
      Similarity.trainKmeansCentroids(embs.filter(!clump), "embedding",
        k = 15, iters = 1)
    val path = "/root/repo/target/indexes/ivf_drift_advise_spec_v1"
    val f = new java.io.File(path)
    if (f.exists()) org.apache.commons.io.FileUtils.deleteDirectory(f)
    Similarity.materializedIvfIndex(skewed, "vec_id", "embedding", cents, path)
    val parser = new graft.plans.GraftSqlParser(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.sqlParser)
    def advise() = parser.parsePlan("ADVISE GRAFT MAINTENANCE")
      .asInstanceOf[graft.plans.AdviseGraftMaintenanceCommand].run(spark)
      .filter(_.getString(1) == graft.cube.CubeCatalog.normalizePath(path))
    val hot = advise()
    assert(hot.size == 1, s"expected one row for $path: $hot")
    assert(hot.head.getDouble(5) >= 0.5,
      s"clumped store must read >= 60%-ish hot share: ${hot.head}")
    assert(hot.head.getString(6).contains("ivfRecluster") &&
      hot.head.getString(6).contains("read volume"), hot.head.getString(6))
    // the recommended retrain re-partitions the clump across fresh
    // centroids — the read-volume fix compaction cannot provide
    Similarity.ivfRecluster(spark, path, "embedding", k = 16, iters = 2)
    val cold = advise()
    assert(cold.size == 1 && cold.head.getDouble(5) < hot.head.getDouble(5),
      s"recluster must shrink the hot share: ${hot.head} -> ${cold.head}")
    assert(!cold.head.getString(6).contains("ivfRecluster"),
      s"post-retrain drift advice must clear: ${cold.head}")
  }

  test("drift advice reaches small-k stores: k=2, 100% hot fires ivfRecluster") {
    init
    import graft.operators.Similarity
    // raw 3/k balanced-share floor at k=2 is 1.5 — unreachable, which
    // silently disabled the drift leg for small-k stores (r16 ADVICE);
    // the floor is clamped to 0.9, so a k=2 store with 255/256 of its
    // rows piled into one bucket (one sentinel row keeps the second
    // bucket directory alive — a PHYSICAL one-bucket store carries no
    // imbalance signal and is deliberately exempt, r17 review) must now
    // receive recluster advice
    import org.apache.spark.sql.functions.{array_repeat, col, lit, when}
    val embs = Tables.t(spark, sf, "embeddings").limit(256)
    val dim = embs.select("embedding").head().getSeq[Float](0).size
    val skewed = embs.withColumn("embedding",
      when(col("vec_id") === 0L,
        array_repeat(lit(999.0f), dim)).otherwise(col("embedding")))
    val cents = Seq(Seq.fill(dim)(0.0), Seq.fill(dim)(1000.0))
    val path = "/root/repo/target/indexes/ivf_smallk_drift_spec_v1"
    val f = new java.io.File(path)
    if (f.exists()) org.apache.commons.io.FileUtils.deleteDirectory(f)
    Similarity.materializedIvfIndex(skewed, "vec_id", "embedding", cents, path)
    val parser = new graft.plans.GraftSqlParser(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.sqlParser)
    val rows = parser.parsePlan("ADVISE GRAFT MAINTENANCE")
      .asInstanceOf[graft.plans.AdviseGraftMaintenanceCommand].run(spark)
      .filter(_.getString(1) == graft.cube.CubeCatalog.normalizePath(path))
    assert(rows.size == 1, s"expected one row for $path: $rows")
    assert(rows.head.getDouble(5) >= 0.99 && rows.head.getDouble(5) < 1.0,
      s"hot share: ${rows.head}")
    assert(rows.head.getString(6).contains("ivfRecluster"),
      s"k=2 collapsed store must get drift advice: ${rows.head}")
  }

  test("ADVISE GRAFT MAINTENANCE covers span stores: partial-file pressure, compact clears") {
    init
    import graft.operators.Dedup
    val docs = Tables.t(spark, sf, "documents").limit(64)
    val path = "/root/repo/target/indexes/span_advise_spec_v1"
    val f = new java.io.File(path)
    if (f.exists()) org.apache.commons.io.FileUtils.deleteDirectory(f)
    for (_ <- 1 to 3) Dedup.spanCountsIngest(docs, "doc_id", "text", k = 8, path)
    def dataFiles: Int = Option(f.listFiles()).toSeq.flatten
      .count(x => x.getName.endsWith(".parquet") &&
        !x.getName.startsWith("_") && !x.getName.startsWith("."))
    val key = "spark.graft.span.adviseFiles"
    val prev = spark.conf.getOption(key)
    val parser = new graft.plans.GraftSqlParser(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.sqlParser)
    def advise() = parser.parsePlan("ADVISE GRAFT MAINTENANCE")
      .asInstanceOf[graft.plans.AdviseGraftMaintenanceCommand].run(spark)
      .filter(r => r.getString(0) == "span_store" &&
        r.getString(1) == graft.cube.CubeCatalog.normalizePath(path))
    try {
      // thresholds pinned to MEASURED counts (file-per-write counts vary
      // with AQE coalescing): at T = hot count the advice fires; after
      // the compact — which must strictly reduce files — T = cold+1 is
      // quiet again
      val hot = dataFiles
      spark.conf.set(key, hot.toString)
      val hotRows = advise()
      assert(hotRows.size == 1 && hotRows.head.getLong(4) == hot.toLong,
        s"expected one span row at pressure $hot: $hotRows")
      val advice = hotRows.head.getString(6)
      assert(advice.contains("spanCountsCompact") && advice.contains(path),
        advice)
      Dedup.spanCountsCompact(spark, path)
      val cold = dataFiles
      assert(cold < hot, s"compaction must reduce files: $hot -> $cold")
      spark.conf.set(key, (cold + 1).toString)
      val coldRows = advise()
      assert(coldRows.size == 1 && coldRows.head.getString(6).isEmpty,
        s"post-compact advice must clear: $coldRows")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("ADVISE GRAFT MAINTENANCE costs ZERO Spark jobs (driver-side metadata only)") {
    init
    import graft.operators.Similarity
    // a real registered store so the snapshot has something to price
    // (the build itself may run jobs — it happens before counting)
    val embs = Tables.t(spark, sf, "embeddings").filter(
      org.apache.spark.sql.functions.col("vec_id") < 64)
    val cents = Similarity.trainKmeansCentroids(embs, "embedding",
      k = 2, iters = 1)
    Similarity.materializedIvfIndex(embs, "vec_id", "embedding", cents,
      "/root/repo/target/indexes/ivf_advise_zerojob_spec_v1")
    val parser = new graft.plans.GraftSqlParser(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.sqlParser)
    // count only THIS thread's jobs (job-group scoped): parallel suites
    // share the SparkContext, and a foreign job landing inside the
    // counting window must not fail the zero-job claim (r17 review)
    val group = "advise-zerojob-spec"
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (Option(j.properties)
            .exists(_.getProperty("spark.jobGroup.id") == group)) {
          jobs.incrementAndGet(); ()
        }
    }
    spark.sparkContext.addSparkListener(l)
    spark.sparkContext.setJobGroup(group, "zero-job advise window")
    try {
      // drain jobs queued by earlier work, then count across the command
      org.apache.spark.sql.graft.ListenerBusUtil.waitUntilEmpty(spark)
      jobs.set(0)
      val rows = parser.parsePlan("ADVISE GRAFT MAINTENANCE")
        .asInstanceOf[graft.plans.AdviseGraftMaintenanceCommand].run(spark)
      org.apache.spark.sql.graft.ListenerBusUtil.waitUntilEmpty(spark)
      assert(rows.nonEmpty, "expected at least the store built above")
      assert(jobs.get() == 0,
        s"ADVISE ran ${jobs.get()} Spark jobs over ${rows.size} artifacts — " +
          "the advice surface must stay driver-side listing + footer reads")
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(l)
    }
  }

  test("REGISTER GRAFT ARTIFACT re-attaches on-disk stores to a fresh session's registry with zero Spark jobs") {
    init
    import graft.operators.Similarity
    // two real stores, one per protocol, built by "an earlier session"
    val embs = Tables.t(spark, sf, "embeddings").filter(
      org.apache.spark.sql.functions.col("vec_id") < 64)
    val cents = Similarity.trainKmeansCentroids(embs, "embedding",
      k = 2, iters = 1)
    val pPosix = "/root/repo/target/indexes/ivf_register_posix_spec_v1"
    val pMani = "/root/repo/target/indexes/ivf_register_manifest_spec_v1"
    Similarity.materializedIvfIndex(embs, "vec_id", "embedding", cents, pPosix)
    // manifest protocol on a CHILD session (conf isolation — parallel
    // suites share the SparkContext; the ops read conf from the frame's
    // session)
    val sM = spark.newSession()
    sM.conf.set("spark.graft.artifactStore", "manifest")
    Similarity.materializedIvfIndex(
      Tables.t(sM, sf, "embeddings").filter(
        org.apache.spark.sql.functions.col("vec_id") < 64),
      "vec_id", "embedding", cents, pMani)
    val parser = new graft.plans.GraftSqlParser(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.sqlParser)
    // simulate the fresh monitoring session: the in-memory registry is
    // empty, the stores exist only on disk. Snapshot and restore the
    // registrations of parallel-running suites around the clear.
    val before = graft.plans.QueryHistory.artifactsSnapshot
    try {
      graft.plans.QueryHistory.clearArtifacts()
      def advisePaths() = parser.parsePlan("ADVISE GRAFT MAINTENANCE")
        .asInstanceOf[graft.plans.AdviseGraftMaintenanceCommand].run(spark)
        .map(_.getString(1)).toSet
      // target-path absence, not full emptiness: a parallel suite may
      // legitimately register its own store between the clear and here
      val cleared = advisePaths()
      for (p <- Seq(pPosix, pMani))
        assert(!cleared.contains(graft.cube.CubeCatalog.normalizePath(p)),
          s"fresh session must not see unregistered $p")
      // job-group scoped like the ADVISE zero-job lock: parallel suites'
      // jobs must not land in the counting window (r17 review)
      val group = "register-artifact-zerojob-spec"
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          if (Option(j.properties)
              .exists(_.getProperty("spark.jobGroup.id") == group)) {
            jobs.incrementAndGet(); ()
          }
      }
      spark.sparkContext.addSparkListener(l)
      spark.sparkContext.setJobGroup(group, "zero-job register window")
      try {
        org.apache.spark.sql.graft.ListenerBusUtil.waitUntilEmpty(spark)
        jobs.set(0)
        // registration reads ONLY the stores' own kind metadata — the
        // POSIX .artifact.json sidecar and the manifest's kind field
        val r1 = parser.parsePlan(s"REGISTER GRAFT ARTIFACT FROM '$pPosix'")
          .asInstanceOf[graft.plans.RegisterGraftArtifactCommand].run(spark)
        val r2 = parser.parsePlan(s"REGISTER GRAFT ARTIFACT FROM '$pMani'")
          .asInstanceOf[graft.plans.RegisterGraftArtifactCommand].run(spark)
        // ... and the re-attached stores price in ADVISE, still jobless
        val advised = advisePaths()
        org.apache.spark.sql.graft.ListenerBusUtil.waitUntilEmpty(spark)
        assert(r1.head.getString(0) == "ivf" && r2.head.getString(0) == "ivf",
          s"kinds: $r1 / $r2")
        for (p <- Seq(pPosix, pMani))
          assert(advised.contains(graft.cube.CubeCatalog.normalizePath(p)),
            s"ADVISE must price re-attached $p: $advised")
        assert(jobs.get() == 0,
          s"register + advise ran ${jobs.get()} Spark jobs — the " +
            "registration loop must stay driver-side file reads")
      } finally {
        spark.sparkContext.clearJobGroup()
        spark.sparkContext.removeSparkListener(l)
      }
      // an unregistered path with no kind metadata fails with guidance
      val err = intercept[IllegalArgumentException] {
        parser.parsePlan("REGISTER GRAFT ARTIFACT FROM '/root/repo/target'")
          .asInstanceOf[graft.plans.RegisterGraftArtifactCommand].run(spark)
      }
      assert(err.getMessage.contains("no artifact kind metadata"))
    } finally before.foreach { case (k, p) =>
      graft.plans.QueryHistory.registerArtifact(k, p)
    }
  }

  test("bucketed layout tables classify in history as artifact:bucketed") {
    init
    val bkt = graft.operators.Bucketing.ensureBucketed(spark,
      Tables.t(spark, sf, "supplier").select("s_suppkey", "s_nationkey"),
      "g_bkt_history_spec", "s_suppkey", buckets = 4)
    val before = graft.plans.QueryHistory.snapshot.map(_.id).maxOption.getOrElse(0L)
    bkt.groupBy("s_nationkey").count().collect()
    val deadline = System.currentTimeMillis() + 10000
    def fresh = graft.plans.QueryHistory.snapshot.filter(_.id > before)
    while (!fresh.exists(_.served == "artifact:bucketed") &&
      System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(fresh.exists(_.served == "artifact:bucketed"),
      s"expected an artifact:bucketed entry, got ${fresh.map(_.served).distinct}")
  }
}
