package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cube._
import graft.sources.CubeSource

/** The engine is not TPC-H-bound: a degenerate star schema (fact table
  * only, no relations) over the `events` stream registers through the
  * generic API, and time-sliced event aggregates route to the bucketed
  * cube with partition pruning — the serving path for the streaming
  * ingest layout.
  */
class EventsCubeSpec extends AnyFunSuite {
  import TestSpark._

  private val base = "/root/repo/target/cubes/events_spec"

  private def cubeInfo = CubeInfo(
    name = "events_cube_spec",
    timeColumn = "ts",
    columns = Seq(
      CubeColumn("event_id", ColumnRole.Dimension),
      CubeColumn("ts", ColumnRole.Time),
      CubeColumn("user_id", ColumnRole.Dimension),
      CubeColumn("event_type", ColumnRole.Dimension),
      CubeColumn("value", ColumnRole.Metric)),
    starSchema = StarSchema("events", Nil),
    roleOfTable = Map("events" -> Seq("events")),
    columnMapping = Seq("event_id", "ts", "user_id", "event_type", "value")
      .map(c => ("events", c) -> c).toMap)

  test("single-table events cube registers generically and prunes by time") {
    // the raw events parquet is TIMESTAMP(NANOS); persist the micros form
    // the engine (and any plain reader) consumes
    val src = s"$base/src"
    if (!new java.io.File(src, "_SUCCESS").exists())
      Tables.events(spark, sf).drop("props")
        .write.mode("overwrite").parquet(src)
    val cube = CubeSource.materialize(spark, cubeInfo, Map("events" -> src),
      s"$base/cube")
    try {
      val q = spark.read.parquet(src)
        .filter(col("ts") >= lit("2024-01-10").cast("timestamp") &&
          col("ts") < lit("2024-02-10").cast("timestamp"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))

      val classic = q.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      val scansEventsCube = classic.queryExecution.optimizedPlan.exists {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.exists(_.toString.contains("events_spec/cube"))
            case _ => false
          }
        case _ => false
      }
      assert(scansEventsCube, "time-sliced event aggregate should route to the cube")
      // pruned: only the buckets overlapping Jan/Feb 2024 survive
      // (projection-only shape keeps AQE wrappers out of the physical plan)
      val proj = spark.read.parquet(src)
        .filter(col("ts") >= lit("2024-01-10").cast("timestamp") &&
          col("ts") < lit("2024-02-10").cast("timestamp"))
        .select("value")
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      val scan = proj.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head
      assert(scan.relation.location
        .listFiles(scan.partitionFilters, Nil).map(_.values).size <= 2)
      // and results equal the unrouted aggregation
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toString).sorted.toSeq
      val routed = rows(q)
      CubeCatalog.unregister(cube.info.name)
      val vanilla = rows(spark.read.parquet(src)
        .filter(col("ts") >= lit("2024-01-10").cast("timestamp") &&
          col("ts") < lit("2024-02-10").cast("timestamp"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value")))
      assert(routed == vanilla)
      assert(routed.nonEmpty)
    } finally CubeCatalog.unregister(cube.info.name)
  }
}
