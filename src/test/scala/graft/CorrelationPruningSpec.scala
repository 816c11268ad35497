package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cube._
import graft.sources.CubeSource

/** Correlation-driven partition pruning: a cube declares that a second
  * date column has physically bounded lag against the time dimension; the
  * bound is MEASURED at build (never trusted), and predicates on the
  * correlated column then prune time buckets through the measured bound —
  * zone-map-style pruning neither Druid (segment selection is
  * time-dimension-only) nor stock Spark has.
  *
  * The fixture derives a commit-date analog from real lineitem rows
  * (`l_shipdate + (l_orderkey % 60) days` — the TPC-H l_commitdate column
  * the driver testdata omits), so the lag is provably in [-59d, 0].
  * The TPC-H cube itself declares `o_orderdate` but the driver testdata
  * draws order and ship dates independently — there the measured bound is
  * vacuous (±6.5 years) and the rule correctly emits nothing.
  */
class CorrelationPruningSpec extends AnyFunSuite {
  import TestSpark._

  private val base = "/root/repo/target/cubes/corr_spec"

  private def cubeInfo = CubeInfo(
    name = "corr_cube_spec",
    timeColumn = "l_shipdate",
    columns = Seq(
      CubeColumn("l_orderkey", ColumnRole.Dimension),
      CubeColumn("l_shipdate", ColumnRole.Time),
      CubeColumn("l_commitdate", ColumnRole.Dimension),
      CubeColumn("l_returnflag", ColumnRole.Dimension),
      CubeColumn("l_quantity", ColumnRole.Metric)),
    starSchema = StarSchema("lineitem", Nil),
    roleOfTable = Map("lineitem" -> Seq("lineitem")),
    columnMapping = Seq("l_orderkey", "l_shipdate", "l_commitdate",
      "l_returnflag", "l_quantity")
      .map(c => ("lineitem", c) -> c).toMap,
    timeCorrelatedColumns = Seq("l_commitdate"))

  test("measured lag bounds turn correlated-column predicates into bucket pruning") {
    Graft.install(spark)
    val src = s"$base/src"
    if (!new java.io.File(src, "_SUCCESS").exists())
      Tables.t(spark, sf, "lineitem")
        .select("l_orderkey", "l_shipdate", "l_returnflag", "l_quantity")
        .withColumn("l_commitdate",
          col("l_shipdate") - expr("make_interval(0,0,0,int(l_orderkey % 60),0,0,0)"))
        .write.mode("overwrite").parquet(src)
    val cube = CubeSource.materialize(spark, cubeInfo, Map("lineitem" -> src),
      s"$base/cube")
    try {
      // the build measured the derived column's true lag: time - commit
      // is (l_orderkey % 60) days, so bounds within [0, 59d]
      val DayUs = 86400000000L
      val (lo, hi) = cube.info.timeLagBounds("l_commitdate")
      assert(cube.info.timeNullFree)
      assert(lo >= 0L && hi <= 59L * DayUs, s"measured lag [$lo, $hi]")

      // a predicate ONLY on the correlated column must prune time buckets:
      // commit >= 1997-06-01 implies ship >= 1997-06-01, commit < 1997-08-01
      // implies ship < 1997-08-01 + 59d
      val pred = col("l_commitdate") >= lit("1997-06-01").cast("timestamp") &&
        col("l_commitdate") < lit("1997-08-01").cast("timestamp")
      def agg(df: org.apache.spark.sql.DataFrame) = df.filter(pred)
        .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"),
          sum("l_quantity").as("sum_qty"))
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val (survivors, total) =
        try {
          val scan = agg(spark.read.parquet(cube.cubePath))
            .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
            .queryExecution.executedPlan.collect {
              case f: org.apache.spark.sql.execution.FileSourceScanExec => f
            }.head
          (scan.relation.location.listFiles(scan.partitionFilters, Nil).size,
            scan.relation.location.listFiles(Nil, Nil).size)
        } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      assert(survivors < total,
        s"correlated predicate pruned nothing ($survivors of $total)")
      assert(survivors <= 5, // Jun..Sep 1997 + slack: 59d lag spans ~3 months
        s"expected <= 5 surviving buckets, got $survivors")

      // and the pruned plan's results are identical to the raw table's
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toString).sorted.toSeq
      val pruned = rows(agg(spark.read.parquet(cube.cubePath)))
      val vanilla = rows(agg(spark.read.parquet(src)))
      assert(pruned == vanilla)
      assert(pruned.nonEmpty)
    } finally CubeCatalog.unregister(cube.info.name)
  }

  test("random correlated-column predicates: pruned results equal vanilla (soundness property)") {
    Graft.install(spark)
    val src = s"$base/src"
    val cube = CubeSource.materialize(spark, cubeInfo, Map("lineitem" -> src),
      s"$base/cube")
    try {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toString).sorted.toSeq
      val rnd = new scala.util.Random(17)
      val ops = Seq("<", "<=", ">", ">=", "=")
      for (i <- 1 to 20) {
        // random literal across (and beyond) the data's time span, random
        // op, sometimes a conjunction of two bounds
        def lit0 = {
          val day = rnd.nextInt(1200) - 60 // before/inside/after coverage
          java.time.LocalDate.of(1995, 1, 1).plusDays(day.toLong).toString
        }
        def pred() = {
          val p = s"l_commitdate ${ops(rnd.nextInt(ops.size))} TIMESTAMP '$lit0 00:00:00'"
          if (rnd.nextBoolean()) p
          else s"$p AND l_commitdate ${ops(rnd.nextInt(ops.size))} TIMESTAMP '$lit0 00:00:00'"
        }
        val where = pred()
        def agg(df: org.apache.spark.sql.DataFrame) =
          df.where(where).groupBy("l_returnflag")
            .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"))
        val pruned = rows(agg(spark.read.parquet(cube.cubePath)))
        val vanilla = rows(agg(spark.read.parquet(src)))
        assert(pruned == vanilla, s"case $i diverged under [$where]")
      }
    } finally CubeCatalog.unregister(cube.info.name)
  }

  test("independent columns measure a vacuous bound and the rule emits nothing") {
    Graft.install(spark)
    for (t <- Tables.starTables)
      Tables.t(spark, sf, t).createOrReplaceTempView(t)
    val cube = TpchCube.ensure(spark, sf)
    // the driver testdata draws o_orderdate and l_shipdate independently —
    // the measured bound must reflect that (multi-year span both ways)
    val (lo, hi) = cube.info.timeLagBounds("o_orderdate")
    val DayUs = 86400000000L
    assert(lo < -300L * DayUs && hi > 300L * DayUs,
      s"expected a vacuous measured bound on independent columns, got [$lo, $hi]")
    // ... and an o_orderdate slice adds no bucket predicate (nothing to
    // prune through a vacuous bound; the plan stays noise-free)
    val df = spark.read.parquet(cube.cubePath)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
    val optimized = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.optimizedPlan
    val bucketPreds = optimized.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        splitConjunctivePredicates(f.condition).filter(
          _.references.exists(_.name.equalsIgnoreCase("g_tbucket")))
    }.flatten
    assert(bucketPreds.isEmpty,
      s"vacuous correlation must not emit bucket predicates: $bucketPreds")
  }

  private def splitConjunctivePredicates(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
    case other => Seq(other)
  }
}
