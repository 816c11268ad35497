package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

import graft.plans.{RollupRouting, StarJoinElimination, SumOfLiteralRewrite, TimeBucketPruning}

/** Engine installation: inject the cube-rewrite rules into a session.
  *
  * Two paths, mirroring the reference's module loader
  * (`SparklineDataModule.scala:32-150`) with the modern API:
  *   - [[GraftExtensions]] for `SparkSession.builder.withExtensions` /
  *     `spark.sql.extensions` (the supported Spark 3/4 plugin mechanism);
  *   - [[Graft.install]] for post-hoc injection into an existing session via
  *     `experimental.extraOptimizations` (what the driver-run `Verify`/
  *     `Bench` sessions use).
  */
object Graft {

  /** Debug report for a SQL text: whether the engine rewrote it onto a
    * registered cube, plus the optimized and physical plans — the
    * equivalent of the reference's `EXPLAIN DRUID REWRITE <sql>` command
    * (`SparklineDataParser.scala:121-124`,
    * `commands/DruidMetadataCommands.scala:49-77`), exposed as an API
    * instead of a parser extension.
    */
  def explainRewrite(spark: SparkSession, sql: String): String = {
    val qe = spark.sql(sql)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution
    val cubeScans = qe.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
          if graft.cube.CubeCatalog.cubeOfRelation(lr).isDefined =>
        graft.cube.CubeCatalog.cubeOfRelation(lr).get.info.name
    }
    val joins = qe.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.size
    s"""== Cube Rewrite ==
       |cube scans: ${if (cubeScans.isEmpty) "NONE (vanilla Spark plan)"
                      else cubeScans.mkString(", ")}
       |remaining joins: $joins
       |== Optimized Logical Plan ==
       |${qe.optimizedPlan.treeString}
       |== Physical Plan ==
       |${qe.executedPlan.treeString}""".stripMargin
  }

  def install(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val existing = classic.experimental.extraOptimizations
    val mine = Seq(StarJoinElimination(spark), TimeBucketPruning(spark),
        SumOfLiteralRewrite, RollupRouting(spark))
      .filterNot(r => existing.exists(_.getClass == r.getClass))
    classic.experimental.extraOptimizations = existing ++ mine
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(s => StarJoinElimination(s))
    e.injectOptimizerRule(s => TimeBucketPruning(s))
    e.injectOptimizerRule(_ => SumOfLiteralRewrite)
    e.injectOptimizerRule(s => RollupRouting(s))
  }
}
