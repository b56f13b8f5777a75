package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-internal bridge: `Dataset.ofRows` is `private[sql]`, and a custom
  * whole-operator extension (graft.plans.TopKPerKeyPlan) needs exactly one
  * thing from it — wrapping a hand-built resolved LogicalPlan back into a
  * DataFrame. This is the standard extension-library shim (same pattern as
  * every OSS Spark connector that injects logical plans); nothing else from
  * the private surface is touched.
  */
object GraftSqlShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
