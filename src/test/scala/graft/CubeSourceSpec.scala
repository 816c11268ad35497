package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cube.{CubeCatalog, TpchCube}
import graft.sources.CubeSource

/** Generic cube registration (§2.1 DefaultSource parity): the
  * denormalization derived from declared star metadata must equal the
  * hand-written flattener, and a cube materialized through the generic
  * path must drive the same plan rewrites.
  */
class CubeSourceSpec extends AnyFunSuite {
  import TestSpark._

  private def paths: Map[String, String] =
    TpchCube.roleOfTable.keys.map(t => t -> Tables.path(sf, t)).toMap

  test("metadata-derived flatten equals the hand-written flat table") {
    val generic = CubeSource.flatten(spark, TpchCube.info, paths)
    val manual = Tables.flat(spark, sf)
    assert(generic.columns.sorted.toSeq == manual.columns.sorted.toSeq,
      s"column sets differ: ${generic.columns.sorted.mkString(",")}")
    val cols = manual.columns.sorted.map(org.apache.spark.sql.functions.col).toSeq
    val g = generic.select(cols: _*).collect().map(_.toString).sorted
    val m = manual.select(cols: _*).collect().map(_.toString).sorted
    assert(g.length == m.length)
    assert(g.toSeq == m.toSeq)
  }

  test("a generically materialized cube serves the star rewrite") {
    val dest = "/root/repo/target/cubes/generic_spec_v1"
    val info = TpchCube.info.copy(name = "generic_spec")
    // isolate from the TPC-H cube other suites may have registered — both
    // can serve this join, and the router picks whichever matches first
    val previouslyRegistered = CubeCatalog.all.map(_.info.name)
    previouslyRegistered.foreach(CubeCatalog.unregister)
    val cube = CubeSource.materialize(spark, info, paths, dest)
    try {
      for (t <- Tables.starTables)
        Tables.t(spark, sf, t).createOrReplaceTempView(t)
      val df = spark.sql(
        """SELECT c_mktsegment, count(*) AS cnt
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |GROUP BY c_mktsegment""".stripMargin)
      val routed = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.optimizedPlan.exists {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.rootPaths.exists(_.toString.contains("generic_spec"))
              case _ => false
            }
          case _ => false
        }
      assert(routed, "generically registered cube should capture the star join")
      assert(df.count() == 5)
    } finally {
      CubeCatalog.unregister(cube.info.name)
      TpchCube.ensure(spark, sf)
    }
  }
}
