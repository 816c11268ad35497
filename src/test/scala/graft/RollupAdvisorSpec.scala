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
