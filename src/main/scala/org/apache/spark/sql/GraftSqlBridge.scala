package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the package-private `Dataset.ofRows` factory, so graft's
  * custom logical operators (graft.plans.AsOfJoin) can be wrapped back
  * into a user-facing DataFrame. This is the established pattern for
  * Spark extension libraries that add plan nodes without forking Spark
  * (cf. SNIPPETS.md [1]/[3] — public extension projects expose exactly
  * this shim), kept to the single factory call.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
