package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression and LogicalPlan <-> DataFrame bridge. Spark 4 made
  * the converters `private[sql]` (`org.apache.spark.sql.classic
  * .ExpressionUtils`, `classic.Dataset.ofRows`), so custom native
  * expressions and custom logical plans need this one-hop re-export from
  * inside the sql namespace — the established pattern for third-party
  * Catalyst extensions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column to a catalyst Expression TREE.
    * [[expression]] returns a lazy `ColumnNodeExpression` wrapper, which is
    * fine inside the Dataset API but opaque to the analyzer when returned
    * from a `FunctionRegistry` builder — macro-registered SQL functions
    * need the converted tree (its `Unresolved*` nodes then resolve in the
    * analyzer's normal fixed-point batch).
    */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Evaluate a foldable string Column at macro-expansion time —
    * config parameters of macro-registered SQL functions (a blocklist,
    * a cutoff table) must be plan constants because they expand into
    * the returned expression tree.
    */
  def foldableString(fn: String, arg: String, c: Column): String = {
    val e = resolvedExpression(c)
    require(e.foldable &&
      e.dataType == org.apache.spark.sql.types.StringType,
      s"$fn: $arg must be a string literal")
    val v = e.eval()
    require(v != null, s"$fn: $arg must not be NULL")
    v.toString
  }

  /** Wrap a (resolved-children) logical plan as a DataFrame — the entry
    * point for custom logical nodes like [[graft.plans.AsOfJoinPlan]].
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
