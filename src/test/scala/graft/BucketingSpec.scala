package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketing

/** Bucketed layout kills the per-query join shuffle: lineitem and orders
  * written with the same bucket count on the order key sort-merge join with
  * ZERO ShuffleExchange operators — the layout paid the shuffle once. This
  * is the plan shape a 1000-executor fact-to-fact join needs; the row-level
  * result stays identical to the plain join.
  */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("co-bucketed fact tables join with zero shuffle exchanges") {
    val li = Bucketing.ensureBucketed(spark,
      Tables.t(spark, sf, "lineitem").select("l_orderkey", "l_quantity"),
      "li_bucketed", "l_orderkey", buckets = 8)
    val ord = Bucketing.ensureBucketed(spark,
      Tables.t(spark, sf, "orders").select("o_orderkey", "o_totalprice"),
      "ord_bucketed", "o_orderkey", buckets = 8)

    val joined = Bucketing.cobucketedJoin(li, "l_orderkey", ord, "o_orderkey")
    val classic = joined.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val shuffles = classic.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty,
      s"bucketed join must not shuffle, found ${shuffles.size}:\n" +
        classic.queryExecution.executedPlan.toString.take(2000))

    // identical rows to the plain (shuffling) join
    val got = joined.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .collect().map(_.toString).sorted
    val want = Tables.t(spark, sf, "lineitem")
      .join(Tables.t(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .collect().map(_.toString).sorted
    assert(got.sameElements(want))
    assert(got.nonEmpty)
  }
}
