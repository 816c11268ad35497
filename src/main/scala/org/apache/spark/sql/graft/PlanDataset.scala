package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge into `private[sql]` plan construction: wrap an analyzed/raw
  * logical plan back into a DataFrame. Used by operators that want to
  * restructure their INPUT plan (e.g. drop a redundant upstream exchange)
  * before adding their own shuffle.
  */
object PlanDataset {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
