package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** private[sql]-access bridge: construct a DataFrame from a custom
  * LogicalPlan — the same doorway Spark's own datasources and
  * extension libraries use to hand planner-visible nodes to a
  * session. Kept to this single call so the package intrusion stays
  * minimal and auditable.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
