package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cube.TpchCube
import graft.operators.Skew

/** Salted skew joins (result-identical to the plain join) and the
  * spark.graft.* session-conf surface that toggles each rewrite rule.
  */
class SkewAndConfSpec extends AnyFunSuite {
  import TestSpark._

  test("saltedJoin equals the plain inner join on a skewed key") {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    // 90% of fact rows hit key 7
    val large = (1 to 5000).map(i => (if (i % 10 == 0) i % 5 else 7, i))
      .toDF("k", "v")
    val small = (0 to 9).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = large.join(small, "k").select("k", "v", "name")
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(large, small, "k", salt = 8)
      .select("k", "v", "name").collect().map(_.toString).sorted.toSeq
    assert(salted == plain)

    val profileDf = Skew.keySkewProfile(large, col("k"))
    val profile = profileDf.collect()
    assert(profile.head.getInt(0) == 7)
    assert(profile.head.getDouble(2) > 0.8)
    // single input pass: the grand total comes from the SAME rollup
    // aggregation as the per-key counts (reused exchange), not a second
    // df.count() scan
    val executed = profileDf
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(executed.contains("ReusedExchange") ||
      executed.contains("ReusedQueryStage") ||
      executed.contains("TableCacheQueryStage"),
      s"expected the rollup exchange to be reused, got:\n$executed")
    // shares are over ALL rows (the rollup total), not just the top-n
    assert(profile.map(_.getDouble(2)).sum <= 1.0 + 1e-9)
  }

  test("merge-hinted salted join shuffles BOTH sides on (key, salt)") {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    val large = (1 to 5000).map(i => (if (i % 10 == 0) i % 5 else 7, i))
      .toDF("k", "v")
    val small = (0 to 9).map(k => (k, s"dim_$k")).toDF("k", "name")
    // the q_salted_join gate's discipline: hint the small side so the
    // join takes the shuffling sort-merge path salting exists for — a
    // broadcast join has no skewed shuffle to spread and the hot key 7
    // would land on ONE reducer anyway
    val df = Skew.saltedJoin(large, small.hint("merge"), "k", salt = 8)
    // treeString, not collect: AQE wraps the plan and collect() does not
    // descend into AdaptiveSparkPlanExec's inner plan
    val executed = df
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(executed.contains("SortMergeJoin") &&
      "SortMergeJoin \\[k#\\d+L?, g_salt#\\d+".r.findFirstIn(executed).isDefined,
      s"expected a SortMergeJoin keyed on (k, g_salt):\n$executed")
    assert(!executed.toLowerCase.contains("broadcasthashjoin"),
      "the hinted salted join must not broadcast")
  }

  test("salted path works with AQE skew-join disabled (the lever is independent)") {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    // saltedJoin exists precisely for the cases OptimizeSkewedJoin skips
    // (sub-threshold hot partitions, stream-static, determinism) — verify
    // the explicit lever end-to-end with the runtime one switched OFF, so
    // nothing in the salted plan silently depends on AQE's split
    val key = "spark.sql.adaptive.skewJoin.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      val large = (1 to 5000).map(i => (if (i % 10 == 0) i % 5 else 7, i))
        .toDF("k", "v")
      val small = (0 to 9).map(k => (k, s"dim_$k")).toDF("k", "name")
      val plain = large.join(small, "k").select("k", "v", "name")
        .collect().map(_.toString).sorted.toSeq
      val df = Skew.saltedJoin(large, small.hint("merge"), "k", salt = 8)
      assert(df.select("k", "v", "name").collect()
        .map(_.toString).sorted.toSeq == plain)
      val executed = df
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
      // the spread comes from the salt in the shuffle key, not from AQE
      assert("SortMergeJoin \\[k#\\d+L?, g_salt#\\d+".r
        .findFirstIn(executed).isDefined,
        s"expected a SortMergeJoin keyed on (k, g_salt):\n$executed")
      assert(!executed.contains("OptimizeSkewedJoin") &&
        !executed.contains("isSkew=true"),
        "AQE skew handling must be inert in this plan")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def scansCube(df: org.apache.spark.sql.DataFrame): Boolean =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.optimizedPlan.exists {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.exists(_.toString.contains("target/cubes"))
            case _ => false
          }
        case _ => false
      }

  test("spark.graft.* confs toggle the rewrite rules per session") {
    for (t <- Tables.starTables)
      Tables.t(spark, sf, t).createOrReplaceTempView(t)
    TpchCube.ensure(spark, sf)
    val sql =
      """SELECT c_mktsegment, count(*) AS cnt
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin
    assert(scansCube(spark.sql(sql)), "baseline: rewrite on")
    try {
      spark.conf.set("spark.graft.starJoin.enabled", "false")
      assert(!scansCube(spark.sql(sql)), "starJoin.enabled=false must disable")
    } finally spark.conf.unset("spark.graft.starJoin.enabled")

    // cardinality override: an absurdly low session limit refuses the same
    // rewrite the cube metadata would allow
    try {
      spark.conf.set("spark.graft.maxResultCardinality", "1")
      assert(!scansCube(spark.sql(sql)), "session cardinality cap must refuse")
    } finally spark.conf.unset("spark.graft.maxResultCardinality")
    assert(scansCube(spark.sql(sql)), "restored after unset")
  }
}
