package org.apache.spark.sql.graftinternal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** The one `private[sql]` door the engine needs: wrap a hand-built
  * [[LogicalPlan]] back into a public [[DataFrame]]. Spark keeps
  * `Dataset.ofRows` package-private, so every extension library that
  * contributes whole logical operators (rather than just expressions)
  * hosts this one-liner inside `org.apache.spark.sql` — the same
  * pattern the retrieved public extension projects use. Nothing else
  * in the repo lives outside the `graft` namespace.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** Column → Catalyst expression, converted EAGERLY (Spark 4 keeps
    * the ColumnNode converter `private[sql]`; the lazy
    * `ExpressionUtils.expression` wrapper is not serializable and
    * never resolved inside custom logical nodes).
    */
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
}
