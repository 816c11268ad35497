package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Tables.events]] must decode whatever `ts` encoding a testdata
  * generation carries (round 6 shipped one that broke every
  * events-touching query in Verify AND Bench): raw INT64 epoch values in
  * seconds / millis / micros / nanos are disambiguated by magnitude, and
  * string / date columns are parsed. Each case round-trips a known instant.
  */
class EventsEncodingSpec extends AnyFunSuite {
  import TestSpark._

  // 2025-06-01T12:34:56Z
  private val epochSec = 1748781296L

  private def writeEvents(dir: String, tsExpr: String): String = {
    val base = s"/root/repo/target/events_enc/$dir"
    spark.range(1).select(
        lit(1L).as("event_id"), lit(7L).as("user_id"),
        lit("view").as("event_type"), lit(1.0).as("value"),
        expr(tsExpr).as("ts"))
      .write.mode("overwrite").parquet(s"$base/events.parquet")
    base
  }

  private def decoded(base: String): Long = {
    Tables.invalidateCache()
    val r = Tables.events(spark, base).select(unix_millis(col("ts"))).head()
    Tables.invalidateCache() // don't leak synthetic tables into other suites
    r.getLong(0)
  }

  test("INT64 epoch seconds / millis / micros / nanos all decode") {
    assert(decoded(writeEvents("sec", s"${epochSec}L")) == epochSec * 1000)
    assert(decoded(writeEvents("ms", s"${epochSec}000L")) == epochSec * 1000)
    assert(decoded(writeEvents("us", s"${epochSec}000000L")) == epochSec * 1000)
    assert(decoded(writeEvents("ns", s"${epochSec}000000000L")) == epochSec * 1000)
  }

  test("string and native timestamp columns decode") {
    assert(decoded(writeEvents("str", "'2025-06-01 12:34:56'")) == epochSec * 1000)
    assert(decoded(writeEvents("tsn", s"timestamp_seconds(${epochSec}L)")) ==
      epochSec * 1000)
  }
}
