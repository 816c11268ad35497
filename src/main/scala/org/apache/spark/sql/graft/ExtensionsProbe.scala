package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Test-support shim: `SparkSessionExtensions.build*` are `private[sql]`,
  * so specs reach the injected components through this package. Lets the
  * `spark.sql.extensions` wiring (`graft.GraftExtensions`) be exercised
  * without tearing down the shared test session (extensions only apply at
  * session construction).
  */
object ExtensionsProbe {
  def optimizerRules(e: SparkSessionExtensions, spark: SparkSession): Seq[Rule[LogicalPlan]] =
    e.buildOptimizerRules(spark)

  def parser(e: SparkSessionExtensions, spark: SparkSession,
             delegate: ParserInterface): ParserInterface =
    e.buildParser(spark, delegate)
}
