package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.QuantileSketch
import org.scalatest.funsuite.AnyFunSuite

/** The gated quantile sketch: exact below capacity, explicit NULL refusal
  * at saturation, mergeable across rollup cells, and served automatically
  * by RollupRouting under the measured totalRows proof.
  */
class QuantileSketchSpec extends AnyFunSuite {
  import TestSpark._

  private def li = Tables.t(spark, sf, "lineitem")

  test("sketch percentile is bit-equal to direct percentile below capacity") {
    val got = li.groupBy("l_returnflag")
      .agg(QuantileSketch.qskSketch(col("l_extendedprice")).as("sk"))
      .groupBy("l_returnflag")
      .agg(QuantileSketch.qskPercentile(col("sk"), 0.5).as("p50"),
        QuantileSketch.qskPercentile(col("sk"), 0.95).as("p95"))
      .orderBy("l_returnflag").collect()
    val want = li.groupBy("l_returnflag")
      .agg(percentile(col("l_extendedprice"), lit(0.5)).as("p50"),
        percentile(col("l_extendedprice"), lit(0.95)).as("p95"))
      .orderBy("l_returnflag").collect()
    assert(got.length == want.length && got.nonEmpty)
    for ((g, w) <- got.zip(want)) {
      assert(g.getDouble(1) == w.getDouble(1), s"p50 at ${g.getString(0)}")
      assert(g.getDouble(2) == w.getDouble(2), s"p95 at ${g.getString(0)}")
    }
  }

  test("two-level union cascade still equals direct percentile") {
    // per (returnflag, linestatus) cells unioned up to per-returnflag — the
    // rollup lattice path
    val cells = li.groupBy("l_returnflag", "l_linestatus")
      .agg(QuantileSketch.qskSketch(col("l_quantity")).as("sk"))
    val got = cells.groupBy("l_returnflag")
      .agg(QuantileSketch.qskUnion(col("sk")).as("sk"))
      .groupBy("l_returnflag")
      .agg(QuantileSketch.qskPercentile(col("sk"), 0.25).as("p25"))
      .orderBy("l_returnflag").collect()
    val want = li.groupBy("l_returnflag")
      .agg(percentile(col("l_quantity"), lit(0.25)).as("p25"))
      .orderBy("l_returnflag").collect()
    for ((g, w) <- got.zip(want))
      assert(g.getDouble(1) == w.getDouble(1), s"p25 at ${g.getString(0)}")
    assert(got.nonEmpty)
  }

  test("saturation refuses with NULL, and saturation is contagious through merges") {
    val tiny = li.limit(200)
    // k=16 << 200 rows: the merged sketch must saturate and answer NULL
    val sat = tiny
      .groupBy("l_linenumber")
      .agg(QuantileSketch.qskSketch(col("l_extendedprice"), 16).as("sk"))
      .agg(QuantileSketch.qskUnion(col("sk"), 16).as("sk"))
      .select(QuantileSketch.qskPercentile(col("sk"), 0.5, 16).as("p50"))
      .collect().head
    assert(sat.isNullAt(0), "saturated sketch must refuse with NULL")
  }

  test("SQL surface: qsk_sketch/qsk_union/qsk_percentile registered") {
    li.limit(500).createOrReplaceTempView("qsk_li")
    val got = spark.sql(
      """SELECT qsk_percentile(sk2, 0.5D) AS p50 FROM (
        |  SELECT qsk_union(sk) AS sk2 FROM (
        |    SELECT qsk_sketch(l_quantity) AS sk FROM qsk_li GROUP BY l_returnflag
        |  )
        |)""".stripMargin).collect().head.getDouble(0)
    val want = spark.sql(
      "SELECT percentile(l_quantity, 0.5D) FROM qsk_li")
      .collect().head.getDouble(0)
    assert(got == want)
  }

  test("RollupRouting serves percentile from the rollup under the totalRows proof") {
    import graft.cube.{CubeCatalog, TpchCube}
    for (t <- Tables.starTables)
      Tables.t(spark, sf, t).createOrReplaceTempView(t)
    graft.cube.RollupCube.ensure(spark, sf)
    val sql =
      """SELECT c_mktsegment, l_returnflag,
        |  percentile(l_extendedprice, 0.5D) AS p50_price,
        |  count(*) AS cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2""".stripMargin
    val routed = spark.sql(sql)
    val scansRollup = routed.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.optimizedPlan.exists {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.exists(_.toString.contains("_rollup"))
            case _ => false
          }
        case _ => false
      }
    assert(scansRollup, "expected percentile to be served from the rollup")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (0 until r.length).map(i => String.valueOf(r.get(i))).mkString("|")
    }.sorted.toSeq
    val routedRows = rows(routed)
    val cube = TpchCube.ensure(spark, sf)
    CubeCatalog.unregister(cube.info.name)
    try {
      assert(rows(spark.sql(sql)) == routedRows,
        "sketch-served percentiles diverge from vanilla execution")
      assert(routedRows.nonEmpty)
      assert(!routedRows.exists(_.contains("null")),
        "sketch refusal leaked into a gated route")
    } finally graft.cube.RollupCube.ensure(spark, sf)
  }

  test("route declines when totalRows exceeds the sketch capacity") {
    import graft.cube.{CubeCatalog, TpchCube}
    for (t <- Tables.starTables)
      Tables.t(spark, sf, t).createOrReplaceTempView(t)
    val rollupPath = graft.cube.RollupCube.ensure(spark, sf)
    val registered = CubeCatalog.all
      .find(_.rollups.exists(_.path == rollupPath)).get
    // shrink the recorded proof below the data size: the route must refuse
    CubeCatalog.register(registered.copy(rollups =
      registered.rollups.map(r => r.copy(totalRows = Some(r.quantileK.toLong + 1)))))
    try {
      val routed = spark.sql(
        """SELECT c_mktsegment, percentile(l_extendedprice, 0.5D) AS p50
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |GROUP BY 1""".stripMargin)
      val scansRollup = routed.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.optimizedPlan.exists {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.rootPaths.exists(_.toString.contains("_rollup"))
              case _ => false
            }
          case _ => false
        }
      assert(!scansRollup, "unproven percentile must not route to the sketch")
      assert(routed.collect().forall(!_.isNullAt(1)))
    } finally CubeCatalog.register(registered)
  }
}
