package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column<->Expression converters. Living in a
  * subpackage of org.apache.spark.sql grants the access — the established
  * technique for Spark extension libraries that construct Columns from
  * custom catalyst Expressions without going through the function registry
  * (which would tie every call site to an installed SparkSessionExtensions).
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge to `private[sql]` DataSourceStrategy.translateFilter — the SQL
  * DML rewrites (manifest DELETE/UPDATE) translate each conjunct of a
  * resolved condition into the public `sources.Filter` ADT for manifest
  * file pruning (best-effort: untranslatable conjuncts just prune less;
  * the full condition is always applied exactly as a Column).
  */
object FilterShim {
  def translate(e: Expression): Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = true)
}

/** Bridge to `private[sql] Dataset.ofRows` — a command that re-plans a
  * resolved query (the manifest INSERT rewrite) needs a DataFrame over an
  * existing LogicalPlan without re-parsing anything.
  */
object DatasetShim {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
