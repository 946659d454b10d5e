package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Library-side access to `Dataset.ofRows` (which Spark scopes
  * `private[sql]`): the standard way third-party libraries wrap a
  * custom `LogicalPlan` node into a user-facing DataFrame — the same
  * package-placement pattern used by public Spark extension libraries
  * since the API has no supported constructor for foreign plans. */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
