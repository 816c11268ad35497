package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential spec for [[org.apache.spark.sql.graft.PercentileExactExpr]]
  * and the [[graft.plans.PercentileRewrite]] grouping rule: the custom
  * aggregate must be BIT-IDENTICAL to Spark's `percentile` — the driver's
  * oracle hash-compares doubles, so a 1-ulp interpolation drift is a
  * correctness failure, not noise.
  */
class PercentileExactSpec extends AnyFunSuite {
  import TestSpark._

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  /** Spark percentile vs PercentileExactExpr on the same frame, bitwise. */
  private def differential(values: Seq[Double], pcts: Seq[Double],
                           tag: String): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    val df = values.toDF("v")
    val expected = df.agg(
      pcts.head match { case _ => // one percentile column per pct
        org.apache.spark.sql.functions.percentile(col("v"), lit(pcts.head)) },
      pcts.tail.map(p =>
        org.apache.spark.sql.functions.percentile(col("v"), lit(p))): _*
    ).head().toSeq.map(_.asInstanceOf[Double])
    val gotRow = df.agg(
      org.apache.spark.sql.graft.PercentileExact.of(col("v"), pcts).as("g"))
      .head()
    val got = gotRow.getSeq[Double](0)
    assert(got.size == pcts.size, tag)
    for (i <- pcts.indices)
      assert(bits(got(i)) == bits(expected(i)),
        s"$tag pct=${pcts(i)}: got ${got(i)} (${bits(got(i))}) " +
          s"expected ${expected(i)} (${bits(expected(i))})")
  }

  test("bitwise equality vs Spark percentile on randomized multisets") {
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 40) {
      val n = 1 + rnd.nextInt(200)
      // mix of continuous values and heavy duplicates; some rounds integral
      val vals = (1 to n).map { _ =>
        if (rnd.nextBoolean()) rnd.nextInt(8).toDouble
        else math.rint(rnd.nextDouble() * 10000) / 100.0
      }
      val pcts = Seq(rnd.nextDouble(), 0.0, 1.0, 0.5,
        rnd.nextInt(100) / 100.0).distinct
      differential(vals, pcts, s"round $round n=$n")
    }
  }

  test("edge cases: single value, all-equal, negative zero, two values") {
    differential(Seq(5.0), Seq(0.0, 0.3, 1.0), "single")
    differential(Seq(2.0, 2.0, 2.0), Seq(0.25, 0.75), "all-equal")
    differential(Seq(-0.0, 0.0, 1.0), Seq(0.2, 0.5, 0.8), "neg-zero")
    differential(Seq(1.0, 2.0), Seq(0.3), "two")   // formula-distinguishing
  }

  test("empty and all-null inputs yield null like Spark") {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    val df = Seq.empty[Double].toDF("v")
    val got = df.agg(
      org.apache.spark.sql.graft.PercentileExact.of(col("v"), Seq(0.5)).as("g"))
      .head()
    assert(got.isNullAt(0))
  }

  test("PercentileRewrite groups percentiles of one column into one buffer") {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    val df = (1 to 500).map(i => (i % 3, i * 1.0, i * 2.0))
      .toDF("k", "a", "b")
    df.createOrReplaceTempView("g_pct_rewrite_probe")
    val q = spark.sql(
      """SELECT k, percentile(a, 0.5D) p50a, percentile(a, 0.9D) p90a,
        |       percentile(b, 0.25D) p25b
        |FROM g_pct_rewrite_probe GROUP BY k ORDER BY k""".stripMargin)
    val optimized = q.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.optimizedPlan
    val exacts = optimized.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        a.aggregateExpressions.flatMap(_.collect {
          case e: org.apache.spark.sql.graft.PercentileExactExpr => e
        })
    }.flatten
    assert(exacts.nonEmpty, "rewrite must fire")
    // two distinct buffers (column a with both pcts, column b with one)
    assert(exacts.map(e => (e.child.toString, e.percentages)).distinct.size == 2,
      exacts.map(e => (e.child.toString, e.percentages)).toString)
    // and values match vanilla Spark with the rewrite bypassed
    val expected = Graft.withoutRewrites(spark) {
      spark.sql(
        """SELECT k, percentile(a, 0.5D) p50a, percentile(a, 0.9D) p90a,
          |       percentile(b, 0.25D) p25b
          |FROM g_pct_rewrite_probe GROUP BY k ORDER BY k""".stripMargin)
        .collect().toSeq
    }
    val got = q.collect().toSeq
    assert(got.size == expected.size)
    for ((g, e) <- got.zip(expected); i <- 1 to 3)
      assert(bits(g.getDouble(i)) == bits(e.getDouble(i)), s"row $g vs $e")
  }
}
