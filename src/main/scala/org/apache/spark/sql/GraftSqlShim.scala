package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one sanctioned crossing into `private[sql]` space: building a
  * DataFrame from a raw Catalyst [[LogicalPlan]], and converting between
  * the public `Column` wrapper and the Catalyst `Expression` it denotes.
  * Spark's public surface deliberately hides `Dataset.ofRows` and
  * `ExpressionUtils`, but a library that contributes its OWN logical
  * operators (graft's [[graft.plans.MatMul]]) or carries driver-computed
  * payloads inside a custom expression (graft's
  * [[graft.functions.RangeBucket]] — boundary constants can't ride the
  * string-named function registry) needs exactly this seam — the same move
  * every planner-extending Spark library makes (a one-object shim in the
  * `org.apache.spark.sql` package). Nothing else in the repo compiles
  * against non-public API.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def column(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Normalize a possibly-sorted Column (`col("x").desc` carries an
    * `internal.SortOrder` COLUMN NODE, which the lazy converter only turns
    * into a catalyst `SortOrder` at analysis time) into an eager catalyst
    * `SortOrder`. Bare columns get Spark's `ORDER BY` default (ascending,
    * nulls first).
    */
  def sortOrder(c: Column): catalyst.expressions.SortOrder = c.node match {
    case internal.SortOrder(child, dir, nullOrd, _) =>
      val d = dir match {
        case internal.SortOrder.Ascending => catalyst.expressions.Ascending
        case internal.SortOrder.Descending => catalyst.expressions.Descending
      }
      val no = nullOrd match {
        case internal.SortOrder.NullsFirst => catalyst.expressions.NullsFirst
        case internal.SortOrder.NullsLast => catalyst.expressions.NullsLast
      }
      catalyst.expressions.SortOrder(
        classic.ExpressionUtils.expression(Column(child)), d, no, Seq.empty)
    case _ =>
      catalyst.expressions.SortOrder(expression(c),
        catalyst.expressions.Ascending)
  }
}
