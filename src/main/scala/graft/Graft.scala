package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

import graft.plans.{StarJoinElimination, SumOfLiteralRewrite, TimeBucketPruning}

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

  def install(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val existing = classic.experimental.extraOptimizations
    val mine = Seq(StarJoinElimination(spark), TimeBucketPruning(spark),
        SumOfLiteralRewrite)
      .filterNot(r => existing.exists(_.getClass == r.getClass))
    classic.experimental.extraOptimizations = existing ++ mine
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(s => StarJoinElimination(s))
    e.injectOptimizerRule(s => TimeBucketPruning(s))
    e.injectOptimizerRule(_ => SumOfLiteralRewrite)
  }
}
