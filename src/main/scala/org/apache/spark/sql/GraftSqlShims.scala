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

  /** The `RowLevelOperation` behind a row-level-rewrite scan relation's
    * table, when there is one. `RowLevelOperationTable` is `private[sql]`,
    * so the match lives in this shim; graft.sources.catalog.BoundedMorMerge
    * uses it to recognize its own delta-merge target scans.
    */
  def rowLevelOperationOf(t: org.apache.spark.sql.connector.catalog.Table)
      : Option[org.apache.spark.sql.connector.write.RowLevelOperation] = t match {
    case rt: org.apache.spark.sql.connector.write.RowLevelOperationTable => Some(rt.operation)
    case _ => None
  }
}
