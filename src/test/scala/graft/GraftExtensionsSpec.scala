package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.ExtensionsProbe
import org.scalatest.funsuite.AnyFunSuite

import graft.cube.TpchCube

/** The `spark.sql.extensions` wiring: GraftExtensions must inject the four
  * optimizer rules and the command parser, the injected rules must actually
  * rewrite plans, and function registration must run as a side effect of
  * rule construction (how a `withExtensions` session gets the compat UDFs
  * and sketch aggregates).
  */
class GraftExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val ext = {
    val e = new SparkSessionExtensions
    new GraftExtensions().apply(e)
    e
  }

  test("injects the four rewrite rules; the star rule rewrites a real plan") {
    val rules = ExtensionsProbe.optimizerRules(ext, spark)
    val names = rules.map(_.getClass.getSimpleName).toSet
    for (r <- Seq("StarJoinElimination", "TimeBucketPruning",
                  "SumOfLiteralRewrite$", "RollupRouting"))
      assert(names.contains(r), s"missing rule $r in $names")

    for (t <- Tables.starTables)
      Tables.t(spark, sf, t).createOrReplaceTempView(t)
    TpchCube.ensure(spark, sf)
    val analyzed = spark.sql(
      """SELECT c_mktsegment, count(*) AS cnt
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed
    val star = rules.find(_.getClass.getSimpleName == "StarJoinElimination").get
    // the rule runs post-optimization; emulate the relevant normalization
    val cleaned = org.apache.spark.sql.catalyst.analysis.EliminateView(
      org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases(analyzed))
    val rewritten = star(cleaned)
    assert(!rewritten.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Join]),
      "extension-built StarJoinElimination should collapse the star join")
  }

  test("injects the command parser with delegation intact") {
    val delegate = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.sqlParser
    val p = ExtensionsProbe.parser(ext, spark, delegate)
    assert(p.isInstanceOf[graft.plans.GraftSqlParser])
    assert(p.parsePlan("SHOW GRAFT CUBES")
      .isInstanceOf[graft.plans.ShowGraftCubesCommand])
    assert(p.parseTableIdentifier("x.y").table == "y")
  }

  test("rule construction registers the compat/sketch function surface") {
    // building the rules ran DateTimeCompat.register + KmvSketch.register
    ExtensionsProbe.optimizerRules(ext, spark)
    assert(spark.sql("SELECT dayOfWeek(dateTime('1996-01-01'))").head().getInt(0) == 1)
    assert(spark.sql("SELECT kmv_distinct(x, 64) FROM VALUES (1),(2),(1) t(x)")
      .head().getLong(0) == 2L)
  }
}
