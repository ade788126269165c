package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Classic-mode bridge for constructing a DataFrame from a LogicalPlan
  * (`Dataset.ofRows` is `private[sql]` in Spark 4). Companion to
  * [[GraftColumnBridge]].
  */
object GraftDatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed
}
