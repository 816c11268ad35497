package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cube.{CubeCatalog, RollupAdvisor, TpchCube}

/** Workload-driven rollup recommendation over the TPC-H cube. */
class RollupAdvisorSpec extends AnyFunSuite {
  import TestSpark._

  private def cube() = {
    for (t <- Tables.starTables)
      Tables.t(spark, sf, t).createOrReplaceTempView(t)
    TpchCube.ensure(spark, sf)
    CubeCatalog.get("tpch_flat_sf0.001").get
  }

  private val servable = Seq(
    // dims: c_mktsegment, l_returnflag
    """SELECT c_mktsegment, l_returnflag, count(*) AS cnt, sum(l_quantity) AS q
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1, 2""".stripMargin,
    // dims: c_mktsegment only, time served by the bucket
    """SELECT c_mktsegment, year(l_shipdate) AS y, avg(l_extendedprice) AS p
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1, 2""".stripMargin,
    // filter column joins the dim set: s_nation
    """SELECT l_returnflag, sum(l_quantity) AS q
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_3'
      |GROUP BY 1""".stripMargin)

  private val unservable = Seq(
    // percentile is not mergeable from a rollup
    "SELECT l_returnflag, percentile(l_quantity, 0.5) AS p FROM lineitem GROUP BY 1",
    // groups by a metric column
    "SELECT l_quantity, count(*) AS c FROM lineitem GROUP BY 1")

  test("analyzeQuery extracts dims, treats time as the bucket, rejects unservable") {
    val c = cube()
    val n0 = RollupAdvisor.analyzeQuery(spark, c, servable(0)).get
    assert(n0.dims == Set("c_mktsegment", "l_returnflag"))
    val n1 = RollupAdvisor.analyzeQuery(spark, c, servable(1)).get
    assert(n1.dims == Set("c_mktsegment"))
    // n_name is role-played (customer AND supplier nation); static analysis
    // keeps the conservative superset of candidate cube columns
    val n2 = RollupAdvisor.analyzeQuery(spark, c, servable(2)).get
    assert(n2.dims == Set("l_returnflag", "c_nation", "s_nation"))
    for (q <- unservable)
      assert(RollupAdvisor.analyzeQuery(spark, c, q).isEmpty, q)
  }

  test("count(DISTINCT dim) is servable via a sketch column and reported") {
    val c = cube()
    val n = RollupAdvisor.analyzeQuery(spark, c,
      """SELECT c_mktsegment, count(DISTINCT n_name) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin)
    // the advisor sees the base column name n_name (role mapping happens at
    // materialization) and recommends sketching every candidate role column
    assert(n.isDefined)
    assert(n.get.sketchCols == Set("c_nation", "s_nation"))
  }

  test("ADVISE GRAFT ROLLUP feeds on recorded history and emits runnable DDL") {
    val c = cube()
    Graft.install(spark) // query-history listener + parser
    graft.plans.QueryHistory.clear()
    // run the workload for real — the listener classifies each plan at
    // record time; no SQL text is retained
    for (q <- servable ++ unservable) spark.sql(q).collect()
    org.apache.spark.sql.graft.ListenerBusUtil.waitUntilEmpty(spark)
    // the listener fires asynchronously; wait for the needs to land
    var tries = 0
    def needsCount() = graft.plans.QueryHistory.snapshot.count(_.needs.nonEmpty)
    while (needsCount() < servable.size && tries < 100) {
      Thread.sleep(50); tries += 1
    }
    assert(needsCount() >= servable.size)
    // TestSpark's session predates extension injection — drive the same
    // parser class directly, as GraftSqlParserSpec does
    val parser = new graft.plans.GraftSqlParser(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.sqlParser)
    val cmd = parser.parsePlan(s"ADVISE GRAFT ROLLUP ON ${c.info.name}")
      .asInstanceOf[graft.plans.AdviseGraftRollupCommand]
    val rows = cmd.run(spark)
    assert(rows.nonEmpty)
    val top = rows.head
    assert(top.getString(3).toInt >= servable.size)
    // the emitted MATERIALIZE statement must parse (path placeholder
    // swapped) AND actually build+register a node the workload routes to —
    // advice → DDL → build → serve, end to end
    val path = "/root/repo/target/advised_rollup_spec"
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(path))
    val ddl = top.getString(4).replace("<rollup-path>", path)
    val before = CubeCatalog.get(c.info.name).get
    val cmd2 = parser.parsePlan(ddl)
      .asInstanceOf[org.apache.spark.sql.execution.command.RunnableCommand]
    val built = cmd2.run(spark)
    assert(built.nonEmpty && built.head.getString(2).toLong > 0, built)
    try {
      val report = Graft.explainRewrite(spark, servable.head)
      assert(report.contains("rollup"), report.take(400))
    } finally {
      // restore the pre-advice registration so other suites' routing locks
      // see the standard lattice
      CubeCatalog.register(before)
    }
  }

  test("recommend returns a Pareto front covering the workload") {
    val c = cube()
    val recs = RollupAdvisor.recommend(spark, c, servable ++ unservable)
    assert(recs.nonEmpty)
    // the top node serves every servable query
    assert(recs.head.queriesServed == servable.size)
    assert(Set("c_mktsegment", "l_returnflag", "c_nation", "s_nation")
      .subsetOf(recs.head.dims.toSet))
    // estimated rows respect functional deps and stay plausible
    assert(recs.head.estRowsPerBucket > 0)
    // no recommendation is dominated by another
    for (r <- recs; o <- recs if o != r)
      assert(!(o.queriesServed >= r.queriesServed &&
        o.estRowsPerBucket <= r.estRowsPerBucket &&
        (o.queriesServed > r.queriesServed || o.estRowsPerBucket < r.estRowsPerBucket)))
  }
}
