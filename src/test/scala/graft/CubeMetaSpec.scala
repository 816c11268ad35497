package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cube.{CubeCatalog, CubeMeta, RollupCube, TpchCube}
import graft.plans.RegisterGraftCubeCommand

/** Cube-descriptor persistence: the JSON sidecar round-trips the full
  * registration (star schema, mapping, lattice), and a cleared session
  * re-attaches from the sidecar alone and still serves from the rollup.
  */
class CubeMetaSpec extends AnyFunSuite {
  import TestSpark._

  test("descriptor JSON round-trips the full registered cube") {
    TpchCube.ensure(spark, sf)
    RollupCube.ensure(spark, sf)
    val cube = CubeCatalog.get(s"tpch_flat_sf0.001").get
    val back = CubeMeta.fromJson(CubeMeta.toJson(cube))
    assert(back.info == cube.info)
    assert(back.cubePath == cube.cubePath)
    assert(back.tablePaths == cube.tablePaths)
    assert(back.rollups == cube.rollups)
  }

  test("REGISTER GRAFT CUBE FROM re-attaches after a cache clear") {
    TpchCube.ensure(spark, sf)
    RollupCube.ensure(spark, sf)
    val name = s"tpch_flat_sf0.001"
    val path = CubeCatalog.get(name).get.cubePath
    val before = CubeCatalog.get(name).get
    try {
      CubeCatalog.clear()
      assert(CubeCatalog.get(name).isEmpty)
      val rows = RegisterGraftCubeCommand(path).run(spark)
      assert(rows.head.getString(0) == name)
      val attached = CubeCatalog.get(name).get
      assert(attached.info == before.info)
      assert(attached.rollups == before.rollups)
      // and the rewrite still fires end-to-end off the attached metadata
      for (t <- Tables.starTables)
        Tables.t(spark, sf, t).createOrReplaceTempView(t)
      val report = Graft.explainRewrite(spark,
        """SELECT c_mktsegment, sum(l_quantity) AS q
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |GROUP BY c_mktsegment""".stripMargin)
      assert(report.contains("cube scans: " + name), report.take(300))
    } finally {
      // restore the full registration for other suites sharing the session
      CubeCatalog.register(before)
    }
  }
}
