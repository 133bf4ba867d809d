package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `private[sql]` access bridge: wrap an already-resolved LogicalPlan into
  * a DataFrame. The one internal surface the native as-of join needs (the
  * node is built from analyzed child plans, so no analyzer rule is
  * required).
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
