package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SpatialFunctions._

class SpatialSpec extends AnyFunSuite {
  import TestSpark._

  test("rect intersection matches the reference CombineSpatialFilters semantics") {
    val a = Rect(0, 10, 0, 10)
    val b = Rect(5, 15, -5, 7)
    assert(a.intersect(b).contains(Rect(5, 10, 0, 7)))
    assert(a.intersect(Rect(11, 12, 0, 1)).isEmpty)
    assert(a.intersect(a).contains(a))
  }

  test("empty intersection folds the plan to an empty scan") {
    import org.apache.spark.sql.functions.col
    val df = Tables.t(spark, sf, "customer")
      .filter(rectsContain(col("c_acctbal"), col("c_custkey"),
        Seq(Rect(0, 10, 0, 10), Rect(20, 30, 0, 10))))
    // Catalyst folds `false` to LocalRelation — no scan at all
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    assert(classic.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    assert(df.count() == 0)
  }

  test("rect containment filters the expected rows") {
    import org.apache.spark.sql.functions.col
    val c = Tables.t(spark, sf, "customer")
    val got = c.filter(rectContains(col("c_acctbal"), col("c_custkey").cast("double"),
      Rect(0.0, 5000.0, 0.0, 100.0))).count()
    val want = c.filter("c_acctbal >= 0.0 AND c_acctbal < 5000.0 AND c_custkey >= 0 AND c_custkey < 100").count()
    assert(got == want && got > 0)
  }
}
