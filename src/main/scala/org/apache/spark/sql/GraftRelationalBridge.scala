package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset constructor so graft's custom
  * logical operators (e.g. [[graft.plans.AsOfJoin]]) can surface as
  * ordinary DataFrames. Living in Spark's package namespace purely for
  * access — the standard technique third-party Catalyst extensions use
  * to materialize a hand-built LogicalPlan; no Spark behavior is
  * modified or overridden here.
  */
object GraftRelationalBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
