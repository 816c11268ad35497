package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cube._
import graft.sources.CubeSource

/** The ingest edge is format-agnostic (§2.1: the reference loads its test
  * data from CSV): the same events cube materializes from parquet, ORC,
  * CSV, and JSON-lines sources, raw scans over the non-parquet sources
  * still route to the cube, and results are identical across formats.
  */
class FormatSourceSpec extends AnyFunSuite {
  import TestSpark._

  private val base = "/root/repo/target/cubes/format_spec"

  private def cubeInfo(name: String) = CubeInfo(
    name = name,
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

  private lazy val srcEvents = Tables.events(spark, sf).drop("props")

  private def agg(df: org.apache.spark.sql.DataFrame) =
    df.filter(col("ts") >= lit("2024-01-10").cast("timestamp") &&
        col("ts") < lit("2024-02-10").cast("timestamp"))
      .groupBy("event_type")
      // dsum (decimal) — a raw double sum depends on partition merge order,
      // and the three sources legitimately partition differently
      .agg(count(lit(1)).as("cnt"), Tables.dsum(col("value")).as("sum_value"))
      .collect().map(_.toString).sorted.toSeq

  test("CSV, JSON and ORC sources materialize the same cube and still route") {
    val csvSrc = s"$base/events.csv"
    val jsonSrc = s"$base/events.json"
    val orcSrc = s"$base/events.orc"
    if (!new java.io.File(csvSrc, "_SUCCESS").exists())
      srcEvents.write.mode("overwrite").option("header", "true").csv(csvSrc)
    if (!new java.io.File(jsonSrc, "_SUCCESS").exists())
      srcEvents.write.mode("overwrite").json(jsonSrc)
    if (!new java.io.File(orcSrc, "_SUCCESS").exists())
      srcEvents.write.mode("overwrite").orc(orcSrc)
    val schema = srcEvents.schema
    val want = agg(srcEvents)

    for ((src, fmt) <- Seq(csvSrc -> "csv", jsonSrc -> "json", orcSrc -> "orc")) {
      val cube = CubeSource.materialize(spark, cubeInfo(s"events_$fmt"),
        Map("events" -> src), s"$base/cube_$fmt",
        schemas = Map("events" -> schema))
      try {
        val raw = CubeSource.readTable(spark, src, Some(schema))
        assert(raw.schema == schema, s"$fmt schema round-trip")
        val q = agg(raw)
        assert(q == want, s"$fmt results differ from parquet source")
        // the raw-format scan routed to the (parquet) cube
        val plan = raw
          .filter(col("ts") >= lit("2024-01-10").cast("timestamp") &&
            col("ts") < lit("2024-02-10").cast("timestamp"))
          .groupBy("event_type").agg(count(lit(1)).as("cnt"))
          .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        val scansCube = plan.queryExecution.optimizedPlan.exists {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.rootPaths.exists(_.toString.contains(s"cube_$fmt"))
              case _ => false
            }
          case _ => false
        }
        assert(scansCube, s"$fmt raw scan should route to the materialized cube")
      } finally CubeCatalog.unregister(s"events_$fmt")
    }
  }

  test("inferSchema fallback reads CSV without an explicit schema") {
    val csvSrc = s"$base/events.csv"
    assume(new java.io.File(csvSrc, "_SUCCESS").exists())
    val inferred = CubeSource.readTable(spark, csvSrc)
    // inference lands on workable types: numeric ids, a real timestamp
    val types = inferred.schema.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("event_id") == "long" || types("event_id") == "integer")
    assert(types("ts") == "timestamp")
    assert(inferred.count() == srcEvents.count())
  }
}
