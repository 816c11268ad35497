package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{DescribeGraftCubeCommand, ExplainGraftRewriteCommand, GraftSqlParser, ShowGraftCubesCommand}

/** The SQL command surface (reference `SPLParser` commands re-expressed on
  * `injectParser`). The parser is exercised directly against the session's
  * own parser as delegate — `GraftExtensions` wires the same class into
  * sessions built with `withExtensions`.
  */
class GraftSqlParserSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val parser = new GraftSqlParser(
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.sqlParser)

  private def init(): Unit = {
    for (t <- Tables.starTables)
      Tables.t(spark, sf, t).createOrReplaceTempView(t)
    graft.cube.TpchCube.ensure(spark, sf)
  }

  test("EXPLAIN GRAFT REWRITE parses and reports the cube rewrite") {
    init()
    val plan = parser.parsePlan(
      """EXPLAIN GRAFT REWRITE SELECT c_mktsegment, sum(l_quantity) AS q
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin)
    val cmd = plan.asInstanceOf[ExplainGraftRewriteCommand]
    val report = cmd.run(spark).map(_.getString(0)).mkString("\n")
    assert(report.contains("cube scans: tpch_flat"), report.take(200))
    assert(report.contains("remaining joins: 0"))
  }

  test("EXPLAIN GRAFT COST prices the engine route against raw and estimates cardinality") {
    init()
    graft.cube.RollupCube.ensure(spark, sf)
    val plan = parser.parsePlan(
      """EXPLAIN GRAFT COST SELECT c_mktsegment, l_returnflag,
        |  count(*) AS cnt, sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment, l_returnflag""".stripMargin)
    val rows = plan.asInstanceOf[graft.plans.ExplainGraftCostCommand].run(spark)
    def section(s: String) = rows.filter(_.getString(0) == s)
    // the rewritten route serves from cube/rollup scans, never raw tables
    assert(section("engine").nonEmpty)
    assert(section("engine").forall(r =>
      r.getString(1).startsWith("cube:") || r.getString(1).startsWith("rollup:")),
      section("engine").mkString("; "))
    // the raw route reads the base star tables
    assert(section("raw").exists(_.getString(1) == "raw:lineitem"),
      section("raw").mkString("; "))
    val byRoute = section("summary").map(r => r.getString(1) -> r).toMap
    val engineRows = byRoute("engine_total").getLong(4)
    val rawRows = byRoute("raw_total").getLong(4)
    // rollup serving plans strictly fewer rows even at the spec's tiny
    // scale factor (the ratio grows with data: 614x at sf0.1 — BENCH)
    assert(engineRows > 0 && rawRows / engineRows >= 2,
      s"engine=$engineRows raw=$rawRows")
    // the FD-closure estimate bounds the true result size (15 groups)
    val est = byRoute("result_estimate").getLong(4)
    assert(est >= 15, s"estimate $est below true cardinality")
    // the lattice section shows the priced comparison: every node of the
    // serving cube with measured stored rows, the scanned one marked
    // chosen — and no candidate measures smaller than the chosen node
    val lat = section("lattice")
    assert(lat.nonEmpty, "expected a lattice pricing section")
    val chosen = lat.filter(_.getString(2) == "chosen")
    assert(chosen.size == 1, lat.mkString("; "))
    val chosenRows = chosen.head.getLong(4)
    assert(chosenRows > 0)
    val measured = lat.filter(r => r.getString(2) == "candidate" &&
      r.getLong(3) > 0).map(_.getLong(4))
    assert(measured.forall(_ >= chosenRows),
      s"chosen node ($chosenRows rows) is not the measured-smallest: " +
        lat.mkString("; "))
    // the fact route's verdict is unambiguous: when a rollup won on a
    // MEASURED price the fact reads "outpriced", never a vague "candidate"
    assert(lat.exists(r => r.getString(1).startsWith("cube:") &&
      r.getString(2) == "outpriced"), lat.mkString("; "))
  }

  test("SHOW GRAFT CUBES lists the registered cube and its lattice") {
    init()
    graft.cube.RollupCube.ensure(spark, sf)
    val rows = parser.parsePlan("SHOW GRAFT CUBES")
      .asInstanceOf[ShowGraftCubesCommand].run(spark)
    val row = rows.find(_.getString(0).startsWith("tpch_flat")).get
    assert(row.getString(1) == "lineitem")
    assert(row.getString(2) == "l_shipdate")
    assert(row.getString(4).contains("_rollup"),
      "lattice column should list rollup paths")
  }

  test("DESCRIBE GRAFT CUBE returns the column metadata") {
    init()
    val cubeName = graft.cube.CubeCatalog.all.head.info.name
    val rows = parser.parsePlan(s"DESCRIBE GRAFT CUBE $cubeName")
      .asInstanceOf[DescribeGraftCubeCommand].run(spark)
    val byCol = rows.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byCol("l_shipdate") == "Time")
    assert(byCol("l_quantity") == "Metric")
  }

  test("db-qualified cube names register, DESCRIBE and resolve bare (multi-DB)") {
    // reference `MultiDBTest.scala`: datasources addressable as db.table.
    // A cube registered under a qualified name must serve the qualified
    // DESCRIBE and the raw-descriptor path, and an unambiguous bare name
    // resolves to it; re-qualifying a bare registration does NOT.
    init()
    val base = graft.cube.CubeCatalog.all.head
    val qualified = base.copy(info = base.info.copy(name = "analytics.q_flat"))
    graft.cube.CubeCatalog.register(qualified)
    try {
      val rows = parser.parsePlan("DESCRIBE GRAFT CUBE analytics.q_flat")
        .asInstanceOf[DescribeGraftCubeCommand].run(spark)
      assert(rows.map(_.getString(0)).contains("l_quantity"))
      // bare suffix resolves the single qualified registration
      assert(graft.cube.CubeCatalog.get("q_flat").exists(_.info.name == "analytics.q_flat"))
      // a qualified request never falls back to a bare registration
      assert(graft.cube.CubeCatalog.get(s"otherdb.${base.info.name}").isEmpty)
      // raw descriptor execution addresses the qualified name too
      val df = graft.cube.DirectQuery.execute(spark, "analytics.q_flat",
        """{"queryType":"segmentMetadata"}""")
      assert(df.collect().nonEmpty)
    } finally graft.cube.CubeCatalog.unregister("analytics.q_flat")
  }

  test("CLEAR GRAFT CACHE empties the catalog; ensure re-registers") {
    init()
    assert(graft.cube.CubeCatalog.all.nonEmpty)
    val cleared = parser.parsePlan("CLEAR GRAFT CACHE")
      .asInstanceOf[graft.plans.ClearGraftCacheCommand].run(spark)
    assert(cleared.nonEmpty && graft.cube.CubeCatalog.isEmpty)
    // materialized parquet survives: re-registration is metadata-only and
    // restores the state other specs in this JVM rely on
    graft.cube.TpchCube.ensure(spark, sf)
    graft.cube.RollupCube.ensure(spark, sf)
    assert(graft.cube.CubeCatalog.all.nonEmpty)
  }

  test("REFRESH GRAFT CUBE parses, with and without a pinned bucket set") {
    val bare = parser.parsePlan("REFRESH GRAFT CUBE tpch_flat_sf0001")
      .asInstanceOf[graft.plans.RefreshGraftCubeCommand]
    assert(bare.name == "tpch_flat_sf0001" && bare.buckets.isEmpty)
    val pinned = parser.parsePlan(
      "REFRESH GRAFT CUBE db.some_cube BUCKETS (317, 318)")
      .asInstanceOf[graft.plans.RefreshGraftCubeCommand]
    assert(pinned.name == "db.some_cube" &&
      pinned.buckets.contains(Seq(317, 318)))
    // an unregistered cube refuses with the registration hint
    val ex = intercept[IllegalArgumentException] {
      parser.parsePlan("REFRESH GRAFT CUBE no_such_cube")
        .asInstanceOf[graft.plans.RefreshGraftCubeCommand].run(spark)
    }
    assert(ex.getMessage.contains("REGISTER GRAFT CUBE"))
    // the end-to-end refresh through this verb (descriptor-derived
    // flattening, generation publish, serve equality) is gated by
    // CubeGenerationSpec
  }

  test("MATERIALIZE GRAFT ROLLUP parses PARTITION BY and CLUSTER BY layout clauses") {
    val cmd = parser.parsePlan(
      """MATERIALIZE GRAFT ROLLUP ON some_cube
        |DIMENSIONS (c_region, p_type, g_year)
        |PARTITION BY (c_region)
        |CLUSTER BY (p_type)
        |AT '/tmp/x'""".stripMargin)
      .asInstanceOf[graft.plans.MaterializeGraftRollupCommand]
    assert(cmd.dims == Seq("c_region", "p_type", "g_year"))
    assert(cmd.sketchCols.isEmpty)
    assert(cmd.partitionDims == Seq("c_region"))
    assert(cmd.clusterDims == Seq("p_type"))
    // layout clauses are optional and independent
    val bare = parser.parsePlan(
      "MATERIALIZE GRAFT ROLLUP ON c DIMENSIONS (a) AT '/tmp/y'")
      .asInstanceOf[graft.plans.MaterializeGraftRollupCommand]
    assert(bare.partitionDims.isEmpty && bare.clusterDims.isEmpty)
    val clusterOnly = parser.parsePlan(
      "MATERIALIZE GRAFT ROLLUP ON c DIMENSIONS (a, b) CLUSTER BY (b) AT '/tmp/z'")
      .asInstanceOf[graft.plans.MaterializeGraftRollupCommand]
    assert(clusterOnly.partitionDims.isEmpty && clusterOnly.clusterDims == Seq("b"))
  }

  test("MATERIALIZE GRAFT ROLLUP with PARTITION BY / CLUSTER BY lays out the node") {
    init()
    val cubeName = graft.cube.CubeCatalog.all
      .find(_.info.name.startsWith("tpch_flat")).get.info.name
    val path = "/root/repo/target/cubes/parser_rollup_layout"
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(path))
    val cmd = parser.parsePlan(
      s"""MATERIALIZE GRAFT ROLLUP ON $cubeName
         |DIMENSIONS (l_returnflag, l_linestatus)
         |PARTITION BY (l_returnflag)
         |CLUSTER BY (l_linestatus)
         |AT '$path'""".stripMargin)
      .asInstanceOf[graft.plans.MaterializeGraftRollupCommand]
    try {
      cmd.run(spark)
      // dim partitions nest under the time bucket as Hive leaf dirs
      val bucketDirs = new java.io.File(path).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("g_tbucket="))
      assert(bucketDirs.nonEmpty, "expected g_tbucket=* dirs")
      assert(bucketDirs.head.listFiles()
        .exists(f => f.isDirectory && f.getName.startsWith("l_returnflag=")),
        "expected l_returnflag=* leaf dirs under each bucket")
      // CLUSTER BY reached the files: l_linestatus is monotone per file
      import org.apache.spark.sql.functions.{col, input_file_name}
      val violations = spark.read.parquet(path)
        .select(input_file_name().as("f"), col("l_linestatus").as("v"))
        .rdd.mapPartitions { it =>
          var pf = ""; var pv = ""; var bad = 0L
          it.foreach { r =>
            val f = r.getString(0); val v = r.getString(1)
            if (f == pf && v < pv) bad += 1
            pf = f; pv = v
          }
          Iterator.single(bad)
        }.fold(0L)(_ + _)
      assert(violations == 0, "CLUSTER BY ordering must survive the write")
      val ru = graft.cube.CubeCatalog.get(cubeName).get.rollups
        .find(_.path == path).get
      assert(ru.partitionDims == Seq("l_returnflag"))
      assert(ru.clusterDims == Seq("l_linestatus"))
    } finally {
      val cube = graft.cube.CubeCatalog.get(cubeName).get
      graft.cube.CubeCatalog.register(cube.copy(
        rollups = cube.rollups.filterNot(_.path == path)))
      graft.cube.CubeMeta.save(graft.cube.CubeCatalog.get(cubeName).get)
    }
  }

  test("MATERIALIZE GRAFT ROLLUP builds, proves and attaches the node") {
    init()
    val cubeName = graft.cube.CubeCatalog.all
      .find(_.info.name.startsWith("tpch_flat")).get.info.name
    val path = "/root/repo/target/cubes/parser_rollup"
    val cmd = parser.parsePlan(
      s"""MATERIALIZE GRAFT ROLLUP ON $cubeName
         |DIMENSIONS (l_returnflag, l_linestatus)
         |SKETCH (c_custkey)
         |AT '$path'""".stripMargin)
      .asInstanceOf[graft.plans.MaterializeGraftRollupCommand]
    assert(cmd.dims == Seq("l_returnflag", "l_linestatus"))
    assert(cmd.sketchCols == Seq("c_custkey"))
    try {
      val rows = cmd.run(spark)
      assert(rows.head.getString(0) == cubeName)
      val cube = graft.cube.CubeCatalog.get(cubeName).get
      val ru = cube.rollups.find(_.path == path).get
      assert(ru.dims == Seq("l_returnflag", "l_linestatus"))
      assert(ru.kmvExactNdv.contains("c_custkey"))
      assert(ru.totalRows.exists(_ > 0L))
    } finally {
      // detach the extra node so other specs' lattice-shape asserts hold
      val cube = graft.cube.CubeCatalog.get(cubeName).get
      graft.cube.CubeCatalog.register(cube.copy(
        rollups = cube.rollups.filterNot(_.path == path)))
      graft.cube.CubeMeta.save(graft.cube.CubeCatalog.get(cubeName).get)
    }
  }

  test("ON GRAFT CUBE EXECUTE QUERY runs a raw descriptor, equal to the SQL form") {
    init()
    val cubeName = graft.cube.CubeCatalog.all
      .find(_.info.name.startsWith("tpch_flat")).get.info.name
    val json =
      """{"queryType": "groupBy",
        | "dimensions": ["c_mktsegment"],
        | "aggregations": [
        |   {"type": "count", "name": "cnt"},
        |   {"type": "doubleSum", "fieldName": "l_quantity", "name": "sum_qty"}],
        | "filter": {"type": "selector", "dimension": "l_returnflag", "value": "R"},
        | "intervals": ["1995-01-01/1997-01-01"]}""".stripMargin
    // the parser turns the statement into the query's own logical plan
    val plan = parser.parsePlan(s"ON GRAFT CUBE $cubeName EXECUTE QUERY '$json'")
    assert(plan.exists(_.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.logical.Aggregate]),
      s"expected an aggregate plan, got:\n$plan")
    val got = graft.cube.DirectQuery.execute(spark, cubeName, json)
      .collect().map(_.toString).sorted.toSeq

    val want = spark.sql(
      """SELECT c_mktsegment, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |  AND l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1""".stripMargin)
      .collect().map(_.toString).sorted.toSeq
    assert(got == want && got.nonEmpty)
  }

  test("regex, like, search and interval filter specs equal their SQL forms") {
    init()
    val cubeName = graft.cube.CubeCatalog.all
      .find(_.info.name.startsWith("tpch_flat")).get.info.name
    def run(json: String): Seq[String] =
      graft.cube.DirectQuery.execute(spark, cubeName, json)
        .collect().map(_.toString).sorted.toSeq
    def sql(where: String): Seq[String] = spark.sql(
      s"""SELECT c_mktsegment, count(*) AS cnt
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN part ON l_partkey = p_partkey
         |WHERE $where GROUP BY 1""".stripMargin)
      .collect().map(_.toString).sorted.toSeq
    def gb(filter: String): String =
      s"""{"queryType": "groupBy", "dimensions": ["c_mktsegment"],
         | "aggregations": [{"type": "count", "name": "cnt"}],
         | "filter": $filter}""".stripMargin

    val regex = run(gb("""{"type": "regex", "dimension": "p_type", "pattern": "^ECO.*MY$"}"""))
    assert(regex == sql("p_type RLIKE '^ECO.*MY$'") && regex.nonEmpty)

    val like = run(gb("""{"type": "like", "dimension": "p_type", "pattern": "%DARD"}"""))
    assert(like == sql("p_type LIKE '%DARD'") && like.nonEmpty)

    val search = run(gb("""{"type": "search", "dimension": "p_type",
      | "query": {"type": "insensitive_contains", "value": "medi"}}""".stripMargin))
    assert(search == sql("lower(p_type) LIKE '%medi%'") && search.nonEmpty)

    val frag = run(gb("""{"type": "search", "dimension": "p_type",
      | "query": {"type": "fragment", "values": ["eco", "nomy"]}}""".stripMargin))
    assert(frag == sql("lower(p_type) LIKE '%eco%' AND lower(p_type) LIKE '%nomy%'")
      && frag.nonEmpty)

    val iv = run(gb(
      """{"type": "interval", "dimension": "l_shipdate",
        | "intervals": ["1995-01-01/1995-07-01", "1996-01-01/1996-07-01"]}""".stripMargin))
    assert(iv == sql(
      """(l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-07-01')
        | OR (l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01')""".stripMargin)
      && iv.nonEmpty)
  }

  test("extraction dimension specs (substring/regex/timeFormat/lower) equal SQL") {
    init()
    val cubeName = graft.cube.CubeCatalog.all
      .find(_.info.name.startsWith("tpch_flat")).get.info.name
    def run(json: String): Seq[String] =
      graft.cube.DirectQuery.execute(spark, cubeName, json)
        .collect().map(_.toString).sorted.toSeq
    def gb(dimSpec: String): String =
      s"""{"queryType": "groupBy", "dimensions": [$dimSpec],
         | "aggregations": [{"type": "count", "name": "cnt"}]}""".stripMargin
    def sql(select: String): Seq[String] = spark.sql(
      s"""SELECT $select, count(*) AS cnt
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN part ON l_partkey = p_partkey
         |GROUP BY 1""".stripMargin)
      .collect().map(_.toString).sorted.toSeq

    val sub = run(gb("""{"type": "extraction", "dimension": "p_type",
      | "outputName": "t3",
      | "extractionFn": {"type": "substring", "index": 0, "length": 3}}""".stripMargin))
    assert(sub == sql("substring(p_type, 1, 3) AS t3") && sub.nonEmpty)

    val rex = run(gb("""{"type": "extraction", "dimension": "c_mktsegment",
      | "outputName": "seg",
      | "extractionFn": {"type": "regex", "expr": "^(..)"}}""".stripMargin))
    assert(rex == sql("regexp_extract(c_mktsegment, '^(..)', 1) AS seg") && rex.nonEmpty)

    val tf = run(gb("""{"type": "extraction", "dimension": "l_shipdate",
      | "outputName": "ym",
      | "extractionFn": {"type": "timeFormat", "format": "yyyy-MM"}}""".stripMargin))
    assert(tf == sql("date_format(l_shipdate, 'yyyy-MM') AS ym") && tf.nonEmpty)

    val lo = run(gb("""{"type": "extraction", "dimension": "c_mktsegment",
      | "outputName": "lseg", "extractionFn": {"type": "lower"}}""".stripMargin))
    assert(lo == sql("lower(c_mktsegment) AS lseg") && lo.nonEmpty)

    // default spec renames without transforming
    val ren = run(gb("""{"type": "default", "dimension": "c_mktsegment",
      | "outputName": "seg2"}""".stripMargin))
    assert(ren == sql("c_mktsegment AS seg2") && ren.nonEmpty)
  }

  test("spatial filter and lookup extraction specs equal their SQL forms") {
    init()
    val cubeName = graft.cube.CubeCatalog.all
      .find(_.info.name.startsWith("tpch_flat")).get.info.name
    def run(json: String): Seq[String] =
      graft.cube.DirectQuery.execute(spark, cubeName, json)
        .collect().map(_.toString).sorted.toSeq

    val spatial = run(
      """{"queryType": "groupBy", "dimensions": ["c_mktsegment"],
        | "aggregations": [{"type": "count", "name": "cnt"}],
        | "filter": {"type": "spatial", "dimension": "c_acctbal,s_acctbal",
        |   "bound": {"type": "rectangular",
        |     "minCoords": [0.0, 1000.0], "maxCoords": [5000.0, 8000.0]}}}""".stripMargin)
    val spatialWant = spark.sql(
      """SELECT c_mktsegment, count(*) AS cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE c_acctbal >= 0.0 AND c_acctbal < 5000.0
        |  AND s_acctbal >= 1000.0 AND s_acctbal < 8000.0
        |GROUP BY 1""".stripMargin).collect().map(_.toString).sorted.toSeq
    assert(spatial == spatialWant && spatial.nonEmpty)

    val lookup = run(
      """{"queryType": "groupBy",
        | "dimensions": [{"type": "extraction", "dimension": "l_returnflag",
        |   "outputName": "flag",
        |   "extractionFn": {"type": "lookup",
        |     "lookup": {"type": "map", "map": {"R": "returned", "A": "accepted"}},
        |     "replaceMissingValueWith": "other"}}],
        | "aggregations": [{"type": "count", "name": "cnt"}]}""".stripMargin)
    val lookupWant = spark.sql(
      """SELECT CASE l_returnflag WHEN 'R' THEN 'returned'
        |            WHEN 'A' THEN 'accepted' ELSE 'other' END AS flag,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY 1""".stripMargin)
      .collect().map(_.toString).sorted.toSeq
    assert(lookup == lookupWant && lookup.nonEmpty)

    // retainMissingValue keeps the original value
    val retained = run(
      """{"queryType": "groupBy",
        | "dimensions": [{"type": "extraction", "dimension": "l_returnflag",
        |   "outputName": "flag",
        |   "extractionFn": {"type": "lookup",
        |     "lookup": {"type": "map", "map": {"R": "returned"}},
        |     "retainMissingValue": true}}],
        | "aggregations": [{"type": "count", "name": "cnt"}]}""".stripMargin)
    val retainedWant = spark.sql(
      """SELECT CASE l_returnflag WHEN 'R' THEN 'returned'
        |            ELSE l_returnflag END AS flag, count(*) AS cnt
        |FROM lineitem GROUP BY 1""".stripMargin)
      .collect().map(_.toString).sorted.toSeq
    assert(retained == retainedWant && retained.nonEmpty)
  }

  test("duration/period granularities and __time equal their SQL forms") {
    init()
    val cubeName = graft.cube.CubeCatalog.all
      .find(_.info.name.startsWith("tpch_flat")).get.info.name
    def run(json: String): Seq[String] =
      graft.cube.DirectQuery.execute(spark, cubeName, json)
        .collect().map(_.toString).sorted.toSeq

    // 14-day buckets anchored at an origin, addressed through a __time
    // interval filter — floor((t-origin)/dur)*dur + origin in millis
    val dur = run(
      """{"queryType": "timeseries",
        | "granularity": {"type": "duration", "duration": 1209600000,
        |                 "origin": "1995-01-02T00:00:00"},
        | "aggregations": [{"type": "count", "name": "cnt"}],
        | "filter": {"type": "interval", "dimension": "__time",
        |   "intervals": ["1995-03-01/1995-06-01"]}}""".stripMargin)
    val durWant = spark.sql(
      """SELECT timestamp_millis(o - pmod(o, 1209600000) + 789004800000) AS g_time,
        |       count(*) AS cnt
        |FROM (SELECT unix_millis(l_shipdate) - 789004800000 AS o FROM lineitem
        |      WHERE l_shipdate >= TIMESTAMP '1995-03-01'
        |        AND l_shipdate < TIMESTAMP '1995-06-01')
        |GROUP BY 1""".stripMargin).collect().map(_.toString).sorted.toSeq
    assert(dur == durWant && dur.nonEmpty)

    // PT6H period == 21600000 ms duration (UTC-fixed)
    val per = run(
      """{"queryType": "timeseries",
        | "granularity": {"type": "period", "period": "P2D"},
        | "aggregations": [{"type": "count", "name": "cnt"}],
        | "intervals": ["1995-03-01/1995-04-01"]}""".stripMargin)
    val perWant = spark.sql(
      """SELECT timestamp_millis(o - pmod(o, 172800000)) AS g_time, count(*) AS cnt
        |FROM (SELECT unix_millis(l_shipdate) AS o FROM lineitem
        |      WHERE l_shipdate >= TIMESTAMP '1995-03-01'
        |        AND l_shipdate < TIMESTAMP '1995-04-01')
        |GROUP BY 1""".stripMargin).collect().map(_.toString).sorted.toSeq
    assert(per == perWant && per.nonEmpty)

    // calendar-variable periods refuse instead of silently fixing a length
    val err = intercept[IllegalArgumentException] {
      run("""{"queryType": "timeseries",
            | "granularity": {"type": "period", "period": "P1M"},
            | "aggregations": [{"type": "count", "name": "cnt"}]}""".stripMargin)
    }
    assert(err.getMessage.contains("calendar-variable"))
  }

  test("timeBoundary returns the datasource time cover, equal to SQL") {
    init()
    val cubeName = graft.cube.CubeCatalog.all
      .find(_.info.name.startsWith("tpch_flat")).get.info.name
    val both = graft.cube.DirectQuery.execute(spark, cubeName,
      """{"queryType": "timeBoundary"}""").collect()
    val want = spark.sql(
      "SELECT min(l_shipdate) AS min_time, max(l_shipdate) AS max_time FROM lineitem")
      .collect()
    assert(both.map(_.toString).toSeq == want.map(_.toString).toSeq)
    val mx = graft.cube.DirectQuery.execute(spark, cubeName,
      """{"queryType": "timeBoundary", "bound": "maxTime"}""").collect()
    assert(mx.head.getTimestamp(0) == want.head.getTimestamp(1))
  }

  test("timeseries zero-fills empty buckets; skipEmptyBuckets opts out") {
    init()
    val cubeName = graft.cube.CubeCatalog.all
      .find(_.info.name.startsWith("tpch_flat")).get.info.name
    // ship dates are date-grained, so hour buckets past 00:00 are all
    // EMPTY — Druid's default zero-fills them, count 0, sums 0
    def q(ctx: String): String =
      s"""{"queryType": "timeseries", "granularity": "hour",
         | "aggregations": [
         |   {"type": "count", "name": "cnt"},
         |   {"type": "doubleSum", "fieldName": "l_quantity", "name": "qty"},
         |   {"type": "doubleMax", "fieldName": "l_quantity", "name": "mx"}],
         | "intervals": ["1995-03-05/1995-03-07"]$ctx}""".stripMargin
    val rows = graft.cube.DirectQuery.execute(spark, cubeName, q(""))
      .orderBy("g_time").collect()
    assert(rows.length == 48, s"expected 48 hourly buckets, got ${rows.length}")
    val empty = rows.filter(_.getLong(1) == 0L)
    assert(empty.length >= 46, "hour buckets past midnight must zero-fill")
    // zero-filled buckets: count 0, sum 0.0, max NULL
    assert(empty.forall(r => r.getDouble(2) == 0.0 && r.isNullAt(3)))
    val some = rows.filter(_.getLong(1) > 0L)
    assert(some.nonEmpty, "the midnight buckets must carry the day's rows")
    // opting out returns only non-empty buckets (the pre-fill behavior)
    val skipped = graft.cube.DirectQuery.execute(spark, cubeName,
      q(""", "context": {"skipEmptyBuckets": true}"""))
      .orderBy("g_time").collect()
    assert(skipped.map(_.toString).toSeq == some.map(_.toString).toSeq)
  }

  test("filtered and cardinality aggregators equal their SQL forms") {
    init()
    val cubeName = graft.cube.CubeCatalog.all
      .find(_.info.name.startsWith("tpch_flat")).get.info.name
    val json =
      """{"queryType": "groupBy", "dimensions": ["c_mktsegment"],
        | "aggregations": [
        |   {"type": "filtered",
        |    "filter": {"type": "selector", "dimension": "l_returnflag", "value": "R"},
        |    "aggregator": {"type": "doubleSum", "fieldName": "l_quantity", "name": "r_qty"}},
        |   {"type": "filtered", "name": "r_cnt",
        |    "filter": {"type": "bound", "dimension": "l_quantity", "lower": "25"},
        |    "aggregator": {"type": "count"}},
        |   {"type": "cardinality", "name": "seg_parts", "fields": ["p_brand"]},
        |   {"type": "hyperUnique", "fieldName": "s_name", "name": "u_supp"}]}""".stripMargin
    val got = graft.cube.DirectQuery.execute(spark, cubeName, json)
      .collect().map(_.toString).sorted.toSeq
    val want = spark.sql(
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity END AS DECIMAL(28,6))) AS DOUBLE) AS r_qty,
        |  count(CASE WHEN l_quantity >= 25 THEN 1 END) AS r_cnt,
        |  approx_count_distinct(p_brand) AS seg_parts,
        |  approx_count_distinct(s_name) AS u_supp
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN part ON l_partkey = p_partkey
        |GROUP BY 1""".stripMargin)
      .collect().map(_.toString).sorted.toSeq
    assert(got == want && got.nonEmpty)
  }

  test("timeseries and topN descriptors execute, equal to their SQL forms") {
    init()
    graft.cube.RollupCube.ensure(spark, sf)
    val cubeName = graft.cube.CubeCatalog.all
      .find(_.info.name.startsWith("tpch_flat")).get.info.name
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq

    val ts = graft.cube.DirectQuery.execute(spark, cubeName,
      """{"queryType": "timeseries", "granularity": "month",
        | "aggregations": [{"type": "count", "name": "cnt"}]}""".stripMargin)
    val tsWant = spark.sql(
      """SELECT date_trunc('month', l_shipdate) AS g_time, count(*) AS cnt
        |FROM lineitem GROUP BY 1""".stripMargin)
    assert(rows(ts) == rows(tsWant) && ts.count() > 0)

    // week granularity: not month-aligned, exercises the day-grain serve
    val wk = graft.cube.DirectQuery.execute(spark, cubeName,
      """{"queryType": "timeseries", "granularity": "week",
        | "aggregations": [{"type": "count", "name": "cnt"}]}""".stripMargin)
    val wkWant = spark.sql(
      """SELECT date_trunc('week', l_shipdate) AS g_time, count(*) AS cnt
        |FROM lineitem GROUP BY 1""".stripMargin)
    assert(rows(wk) == rows(wkWant) && wk.count() > 0)

    // hour granularity: finer than the data grain — identity on the
    // day-quantized testdata, equal to day granularity's row count
    val hr = graft.cube.DirectQuery.execute(spark, cubeName,
      """{"queryType": "timeseries", "granularity": "hour",
        | "aggregations": [{"type": "count", "name": "cnt"}]}""".stripMargin)
    val hrWant = spark.sql(
      """SELECT date_trunc('hour', l_shipdate) AS g_time, count(*) AS cnt
        |FROM lineitem GROUP BY 1""".stripMargin)
    assert(rows(hr) == rows(hrWant) && hr.count() > 0)

    val topn = graft.cube.DirectQuery.execute(spark, cubeName,
      """{"queryType": "topN", "dimension": "l_suppkey", "metric": "cnt",
        | "threshold": 5,
        | "aggregations": [{"type": "count", "name": "cnt"}]}""".stripMargin)
    val topnWant = spark.sql(
      """SELECT l_suppkey, count(*) AS cnt FROM lineitem
        |GROUP BY 1 ORDER BY cnt DESC, l_suppkey LIMIT 5""".stripMargin)
    assert(rows(topn) == rows(topnWant) && topn.count() == 5)
  }

  test("topN metric specs: numeric object, lexicographic with previousStop, inverted") {
    // reference TopNMetricSpec orderings (`DruidQuerySpec.scala:478-508`)
    init()
    val cubeName = graft.cube.CubeCatalog.all
      .find(_.info.name.startsWith("tpch_flat")).get.info.name
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq

    // {"type":"numeric"} object form ≡ the string shorthand
    val num = graft.cube.DirectQuery.execute(spark, cubeName,
      """{"queryType": "topN", "dimension": "l_returnflag",
        | "metric": {"type": "numeric", "metric": "cnt"}, "threshold": 2,
        | "aggregations": [{"type": "count", "name": "cnt"}]}""".stripMargin)
    val numWant = spark.sql(
      """SELECT l_returnflag, count(*) AS cnt FROM lineitem
        |GROUP BY 1 ORDER BY cnt DESC, l_returnflag LIMIT 2""".stripMargin)
    assert(rows(num) == rows(numWant) && num.count() == 2)

    // lexicographic: dimension ascending, resuming strictly after the stop
    val lex = graft.cube.DirectQuery.execute(spark, cubeName,
      """{"queryType": "topN", "dimension": "c_mktsegment",
        | "metric": {"type": "lexicographic", "previousStop": "BUILDING"},
        | "threshold": 3,
        | "aggregations": [{"type": "count", "name": "cnt"}]}""".stripMargin)
    val lexWant = spark.sql(
      """SELECT c_mktsegment, count(*) AS cnt FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment > 'BUILDING'
        |GROUP BY 1 ORDER BY c_mktsegment LIMIT 3""".stripMargin)
    assert(rows(lex) == rows(lexWant) && lex.count() == 3)

    // inverted(numeric) = bottomN; inverted(lexicographic) = dim desc
    val bottom = graft.cube.DirectQuery.execute(spark, cubeName,
      """{"queryType": "topN", "dimension": "l_returnflag",
        | "metric": {"type": "inverted", "metric": {"type": "numeric", "metric": "cnt"}},
        | "threshold": 2,
        | "aggregations": [{"type": "count", "name": "cnt"}]}""".stripMargin)
    val bottomWant = spark.sql(
      """SELECT l_returnflag, count(*) AS cnt FROM lineitem
        |GROUP BY 1 ORDER BY cnt ASC, l_returnflag LIMIT 2""".stripMargin)
    assert(rows(bottom) == rows(bottomWant) && bottom.count() == 2)

    val lexDesc = graft.cube.DirectQuery.execute(spark, cubeName,
      """{"queryType": "topN", "dimension": "c_mktsegment",
        | "metric": {"type": "inverted",
        |            "metric": {"type": "lexicographic", "previousStop": "HOUSEHOLD"}},
        | "threshold": 2,
        | "aggregations": [{"type": "count", "name": "cnt"}]}""".stripMargin)
    val lexDescWant = spark.sql(
      """SELECT c_mktsegment, count(*) AS cnt FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment < 'HOUSEHOLD'
        |GROUP BY 1 ORDER BY c_mktsegment DESC LIMIT 2""".stripMargin)
    assert(rows(lexDesc) == rows(lexDescWant) && lexDesc.count() == 2)
  }

  test("select, search and segmentMetadata descriptors execute, equal to their SQL forms") {
    init()
    val cubeName = graft.cube.CubeCatalog.all
      .find(_.info.name.startsWith("tpch_flat")).get.info.name
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq

    // select: a raw event page — deterministic multiset under the
    // full-column ordering even at the LIMIT boundary
    val sel = graft.cube.DirectQuery.execute(spark, cubeName,
      """{"queryType": "select",
        | "dimensions": ["l_returnflag"], "metrics": ["l_quantity"],
        | "intervals": ["1995-01-01/1995-03-01"],
        | "pagingSpec": {"threshold": 50}}""".stripMargin)
    val selWant = spark.sql(
      """SELECT l_shipdate, l_returnflag, l_quantity FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1995-03-01'
        |ORDER BY l_shipdate, l_returnflag, l_quantity LIMIT 50""".stripMargin)
    assert(rows(sel) == rows(selWant) && sel.count() == 50)

    // search: per-value match counts across dimensions, one scan
    val se = graft.cube.DirectQuery.execute(spark, cubeName,
      """{"queryType": "search",
        | "searchDimensions": ["c_mktsegment", "l_returnflag"],
        | "query": {"type": "fragment", "values": ["O", "o"]}}""".stripMargin)
    val seWant = spark.sql(
      """SELECT dimension, value, cnt FROM (
        |  SELECT 'c_mktsegment' AS dimension, c_mktsegment AS value,
        |    count(*) AS cnt
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE contains(lower(c_mktsegment), 'o') GROUP BY 2
        |  UNION ALL
        |  SELECT 'l_returnflag', l_returnflag, count(*) FROM lineitem
        |  WHERE contains(lower(l_returnflag), 'o') GROUP BY 2)
        |ORDER BY dimension, value""".stripMargin)
    assert(rows(se) == rows(seWant) && se.count() > 0)

    // segmentMetadata: per-month-bucket row counts and time cover
    val sm = graft.cube.DirectQuery.execute(spark, cubeName,
      """{"queryType": "segmentMetadata"}""")
    val smWant = spark.sql(
      """SELECT (year(l_shipdate) - 1970) * 12 + month(l_shipdate) - 1 AS segment,
        |  count(*) AS num_rows,
        |  unix_micros(CAST(min(l_shipdate) AS TIMESTAMP)) AS t_min_us,
        |  unix_micros(CAST(max(l_shipdate) AS TIMESTAMP)) AS t_max_us
        |FROM lineitem GROUP BY 1""".stripMargin)
    assert(rows(sm) == rows(smWant) && sm.count() > 0)
  }

  test("postAggregations, having and limitSpec shape the groupBy result") {
    init()
    val cubeName = graft.cube.CubeCatalog.all
      .find(_.info.name.startsWith("tpch_flat")).get.info.name
    val got = graft.cube.DirectQuery.execute(spark, cubeName,
      """{"queryType": "groupBy",
        | "dimensions": ["c_mktsegment"],
        | "aggregations": [
        |   {"type": "count", "name": "cnt"},
        |   {"type": "doubleSum", "fieldName": "l_quantity", "name": "sum_qty"}],
        | "postAggregations": [
        |   {"type": "arithmetic", "name": "avg_qty", "fn": "/",
        |    "fields": [{"type": "fieldAccess", "fieldName": "sum_qty"},
        |               {"type": "fieldAccess", "fieldName": "cnt"}]}],
        | "having": {"type": "greaterThan", "aggregation": "cnt", "value": 10},
        | "limitSpec": {"type": "default", "limit": 3, "columns": [
        |   {"dimension": "avg_qty", "direction": "descending"},
        |   "c_mktsegment"]}}""".stripMargin)
      .collect().map(_.toString).toSeq
    val want = spark.sql(
      """WITH g AS (SELECT c_mktsegment, count(*) AS cnt,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1)
        |SELECT c_mktsegment, cnt, sum_qty, sum_qty / cnt AS avg_qty FROM g
        |WHERE cnt > 10
        |ORDER BY avg_qty DESC, c_mktsegment LIMIT 3""".stripMargin)
      .collect().map(_.toString).toSeq
    assert(got == want && got.size == 3)
  }

  test("SHOW GRAFT STATS reports rewrite fires after a served query") {
    init()
    graft.cube.RollupCube.ensure(spark, sf)
    graft.plans.RewriteStats.reset()
    spark.sql(
      """SELECT c_mktsegment, count(*) AS cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin).collect()
    val stats = parser.parsePlan("SHOW GRAFT STATS")
      .asInstanceOf[graft.plans.ShowGraftStatsCommand].run(spark)
      .map(r => r.getString(0) -> r.getString(1).toLong).toMap
    assert(stats.getOrElse("starJoinElimination", 0L) >= 1L, stats.toString)
    assert(stats.getOrElse("rollupRouting", 0L) >= 1L, stats.toString)
  }

  test("anything else delegates to the Spark parser") {
    val plan = parser.parsePlan("SELECT 1 AS one")
    assert(!plan.isInstanceOf[ExplainGraftRewriteCommand])
    // expressions / identifiers delegate too
    assert(parser.parseExpression("1 + 1") != null)
    assert(parser.parseTableIdentifier("a.b").table == "b")
  }
}
