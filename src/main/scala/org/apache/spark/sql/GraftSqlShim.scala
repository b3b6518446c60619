package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one sanctioned crossing into `private[sql]` space: building a
  * DataFrame from a raw Catalyst [[LogicalPlan]]. Spark's public surface
  * deliberately hides `Dataset.ofRows`, but a library that contributes its
  * OWN logical operators (graft's [[graft.plans.MatMul]]) needs exactly
  * this seam — the same move every planner-extending Spark library makes
  * (a one-object shim in the `org.apache.spark.sql` package). Nothing else
  * in the repo compiles against non-public API.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
