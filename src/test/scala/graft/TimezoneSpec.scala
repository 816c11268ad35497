package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.scalatest.funsuite.AnyFunSuite

import graft.cube.{CubeCatalog, RollupCube, TpchCube}

/** Non-UTC-session correctness differential (the reference threads a zone
  * conf through every extraction — `DruidPlanner.scala:73-76`,
  * `SparkDateTimeCTest`): with the session in `Asia/Kolkata` (+05:30, no
  * DST), every time-shaped query must return EXACTLY what vanilla Spark
  * returns under the same zone.
  *
  * The engine's materialized buckets are UTC-fixed, so under a non-UTC
  * session: instant-based interval pruning stays active (bucket
  * boundaries are instants), while calendar-valued serving
  * (year/month/trunc groupings, cast-to-date translation, sub-day
  * identities) is gated off and falls back to raw evaluation — results
  * must match in either case, and the plan assertions lock WHICH of the
  * two behaviors carried the query.
  */
class TimezoneSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val init: Unit = {
    for (t <- Tables.starTables)
      Tables.t(spark, sf, t).createOrReplaceTempView(t)
    TpchCube.ensure(spark, sf)
    RollupCube.ensure(spark, sf)
  }

  private def withTz[T](tz: String)(body: => T): T = {
    val old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try body finally spark.conf.set("spark.sql.session.timeZone", old)
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map { r =>
      (0 until r.length).map { i =>
        r.get(i) match {
          case d: Double => f"$d%.2f"
          case v         => String.valueOf(v)
        }
      }.mkString("|")
    }.sorted.toSeq

  private def scanPaths(df: DataFrame): Seq[String] = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    classic.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _                    => Nil
      }
    }.flatten
  }

  /** rewritten (cubes registered) vs rewrites-disabled, same session TZ. */
  private def differential(sql: String): DataFrame = {
    init
    val rewritten = spark.sql(sql)
    val expected = Graft.withoutRewrites(spark)(rows(spark.sql(sql)))
    assert(rows(rewritten) == expected, s"TZ result mismatch:\n$sql")
    rewritten
  }

  test("calendar groupings fall back (not rollup-served) and match under Asia/Kolkata") {
    withTz("Asia/Kolkata") {
      val df = differential(
        """SELECT year(l_shipdate) AS y, month(l_shipdate) AS m,
          |       sum(l_quantity) AS s_qty, count(*) AS cnt
          |FROM lineitem GROUP BY 1, 2""".stripMargin)
      // Kolkata years are NOT UTC-bucket years: serving this from the
      // month rollup would shift rows near month boundaries by one group
      assert(!scanPaths(df).exists(_.contains("rollup")),
        "calendar grouping must not serve from UTC rollup buckets in a non-UTC session")
    }
  }

  test("week and sub-day truncations match under Asia/Kolkata") {
    withTz("Asia/Kolkata") {
      differential(
        """SELECT date_trunc('week', l_shipdate) AS wk, sum(l_quantity) AS s
          |FROM lineitem GROUP BY 1""".stripMargin)
      // UTC-midnight-quantized data is NOT hour-quantized in +05:30 —
      // the day-grain identity serve must stay off
      differential(
        """SELECT date_trunc('hour', l_shipdate) AS h, count(*) AS cnt
          |FROM lineitem GROUP BY 1""".stripMargin)
    }
  }

  test("cast-to-date grouping and filter match under Asia/Kolkata") {
    withTz("Asia/Kolkata") {
      differential(
        """SELECT CAST(l_shipdate AS DATE) AS d, count(*) AS cnt
          |FROM lineitem
          |WHERE CAST(l_shipdate AS DATE) >= DATE'1996-01-01'
          |GROUP BY 1""".stripMargin)
    }
  }

  test("instant interval filters still bucket-prune under Asia/Kolkata") {
    withTz("Asia/Kolkata") {
      val df = differential(
        """SELECT sum(l_extendedprice * l_discount) AS revenue
          |FROM lineitem
          |WHERE l_shipdate >= timestamp'1996-01-01 00:00:00'
          |  AND l_shipdate <  timestamp'1996-07-01 00:00:00'""".stripMargin)
      // the route to the cube is instant-based and TZ-safe; the Kolkata
      // literals shift -05:30, widening the covered range by at most one
      // bucket on each side of the 6-month window
      val cubeScan = scanPaths(df).filter(_.contains("target/cubes"))
      assert(cubeScan.nonEmpty, "interval query should still route to the cube")
      val scans = org.apache.spark.sql.graft.ScanBytes.scans(df)
      assert(scans.nonEmpty)
      val parts = scans.head.relation.location
        .listFiles(scans.head.partitionFilters, Nil).map(_.values).size
      assert(parts <= 8, s"expected <=8 pruned buckets, scanned $parts")
    }
  }

  test("star join with year() extraction matches under Asia/Kolkata") {
    withTz("Asia/Kolkata") {
      differential(
        """SELECT year(l_shipdate) AS y, n_name AS nation,
          |       sum(l_extendedprice * (1 - l_discount)) AS volume
          |FROM lineitem
          |JOIN supplier ON s_suppkey = l_suppkey
          |JOIN nation ON n_nationkey = s_nationkey
          |GROUP BY 1, 2""".stripMargin)
    }
  }

  test("UTC control: the same calendar grouping IS rollup-served") {
    init
    withTz("UTC") {
      val df = spark.sql(
        """SELECT year(l_shipdate) AS y, month(l_shipdate) AS m,
          |       sum(l_quantity) AS s_qty, count(*) AS cnt
          |FROM lineitem GROUP BY 1, 2""".stripMargin)
      assert(scanPaths(df).exists(_.contains("rollup")),
        "UTC session should serve the calendar grouping from a rollup node")
    }
  }
}
