package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // an 8+ minute suite is exposed to the same box-level /tmp sweeper
      // that killed a long scale-probe run mid-shuffle (r16)
      .config("spark.local.dir", Graft.sparkLocalDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Graft.install(s)
    s
  }
  val sf = "/root/testdata/sf0.001"

  /** Wait for [[org.apache.spark.sql.graft.ScanBytes.footerReads]] to go
    * quiet: the query-history listener measures scans ASYNC after any
    * action, so a spec counting footer opens must not let listener reads
    * land inside its measurement window.
    */
  def quiesceFooterReads(): Unit = {
    val counter = org.apache.spark.sql.graft.ScanBytes.footerReads
    var last = counter.get(); var stable = 0
    while (stable < 3) {
      Thread.sleep(100)
      val now = counter.get()
      if (now == last) stable += 1 else { stable = 0; last = now }
    }
  }
}

class QueriesSpec extends AnyFunSuite {
  import TestSpark._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and every query has matching oracle coverage") {
    val qs = SparkEntry.queries
    for ((name, fn) <- qs) {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
    val missing = SparkEntry.oracleSql.keySet -- qs.keySet
    assert(missing.isEmpty, s"oracleSql entries without queries: $missing")
  }

  test("q01 pricing summary matches hand-computed aggregate") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf)
    val rows = df.collect()
    assert(rows.length > 0)
    // count_order column must sum to the filtered row count
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.t(spark, sf, "lineitem")
      .filter(org.apache.spark.sql.functions.col("l_shipdate") <=
        org.apache.spark.sql.functions.to_timestamp(
          org.apache.spark.sql.functions.lit("1998-09-02")))
      .count()
    assert(total == expected)
  }
}
