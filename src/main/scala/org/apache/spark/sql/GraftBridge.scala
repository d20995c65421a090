package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge for the graft library: lift a custom
  * LogicalPlan into a DataFrame. `Dataset.ofRows` is package-private, so
  * every Spark-extension library that introduces whole-operator plans
  * (graft's BandJoin) needs this one-method hop into the sql package.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
