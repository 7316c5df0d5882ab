package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal access shim for `private[sql]` constructors that custom
  * logical-plan APIs need (the standard technique for out-of-tree
  * Catalyst extensions): turn a LogicalPlan into a DataFrame.
  */
object GraftShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
