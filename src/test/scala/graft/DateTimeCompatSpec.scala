package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DateTimeCompat

/** The reference-compat date-time function algebra: joda semantics on known
  * dates, ISO-period parsing, and — the point of building it from native
  * expressions — constant folding down to plain time-column literals so the
  * cube/pruning rules fire on compat-UDF predicates exactly as on native
  * ones.
  */
class DateTimeCompatSpec extends AnyFunSuite {
  import TestSpark._

  private def one(sql: String): Any = {
    DateTimeCompat.register(spark)
    spark.sql(s"SELECT $sql").head().get(0)
  }

  test("period parses ISO-8601 designators") {
    val p = DateTimeCompat.parsePeriod("P1Y2M3W4DT5H6M7.5S")
    assert(p.months == 14)
    assert(p.days == 25)
    assert(p.microseconds == 5L * 3600000000L + 6L * 60000000L + 7500000L)
    assert(DateTimeCompat.parsePeriod("-P90D").days == -90)
    intercept[IllegalArgumentException](DateTimeCompat.parsePeriod("90 days"))
  }

  test("extractors follow joda semantics on known dates") {
    // 1996-01-01 was a Monday, ISO week 1 of 1996
    assert(one("dayOfWeek(dateTime('1996-01-01'))") == 1)
    assert(one("dayOfWeekName(dateTime('1996-01-01'))") == "Monday")
    assert(one("weekyear(dateTime('1996-01-01'))") == 1996)
    // 1996-12-31 was a Tuesday in ISO week 1 of 1997
    assert(one("dayOfWeek(dateTime('1996-12-31'))") == 2)
    assert(one("weekyear(dateTime('1996-12-31'))") == 1997)
    assert(one("era(dateTime('1996-06-15'))") == "AD")
    assert(one("centuryOfEra(dateTime('1996-06-15'))") == 19)
    assert(one("yearOfCentury(dateTime('1996-06-15'))") == 96)
    assert(one("monthOfYearName(dateTime('1996-06-15'))") == "June")
    assert(one("dayOfYear(dateTime('1996-02-01'))") == 32)
  }

  test("date algebra: plus/minus periods and comparisons") {
    assert(one("CAST(datePlus(dateTime('1995-06-01'), period('P6M')) AS STRING)")
      == "1995-12-01 00:00:00")
    assert(one("CAST(dateMinus(dateTime('1997-01-01'), period('P31D')) AS STRING)")
      == "1996-12-01 00:00:00")
    assert(one("dateIsBefore(dateTime('1996-01-01'), dateTime('1996-01-02'))") == true)
    assert(one("dateIsAfterOrEqual(dateTime('1996-01-01'), dateTime('1996-01-01'))") == true)
    assert(one("hourOfDay(datePlus(dateTime('1996-01-01'), period('PT7H30M')))") == 7)
    assert(one("minuteOfHour(datePlus(dateTime('1996-01-01'), period('PT7H30M')))") == 30)
  }

  test("compat predicates constant-fold and route through the cube") {
    for (t <- Tables.starTables)
      Tables.t(spark, sf, t).createOrReplaceTempView(t)
    graft.cube.TpchCube.ensure(spark, sf)
    val report = Graft.explainRewrite(spark,
      """SELECT count(*) AS cnt FROM lineitem
        |WHERE dateIsAfterOrEqual(dateTime(l_shipdate),
        |        datePlus(dateTime('1995-06-01'), period('P6M')))
        |  AND dateIsBefore(dateTime(l_shipdate), dateTime('1996-03-01'))""".stripMargin)
    assert(!report.contains("NONE (vanilla Spark plan)"),
      s"compat-UDF interval predicate did not route to the cube:\n$report")
    // the folded literals must also bucket-prune: only 1995-12 .. 1996-02
    // partitions survive in the optimized plan's pushed-down filters
    assert(report.contains("g_tbucket"),
      s"no bucket predicate in rewritten plan:\n$report")
  }
}
