package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The two `private[sql]` bridges the SQL DML surface needs, behind
  * one tiny object in a `org.apache.spark.sql` subpackage — the same
  * placement the public Delta Lake codebase uses for exactly these
  * calls (its classes live under `org.apache.spark.sql.delta`).
  * Nothing else in this repository reaches into Spark internals;
  * keep it that way — every addition here widens the surface that
  * can break on a Spark upgrade.
  *
  *  - [[ofRows]]: a parsed/unresolved [[LogicalPlan]] (the SOURCE
  *    query a command carried from the parser) to an analyzed,
  *    runnable [[DataFrame]] at command execution time.
  *  - [[column]]: an unresolved parser [[Expression]] (a DML
  *    predicate / SET value) to a [[Column]] that resolves against
  *    whatever DataFrame it is applied to — the exact mechanism of
  *    the public `functions.expr`, minus the re-parse.
  */
object StoreSqlShims {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan)

  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Re-wrap a [[Column]]'s expression in an ANSI-eval-mode cast —
    * the runtime half of ANSI store assignment (an out-of-range or
    * malformed value fails loudly instead of landing as NULL). The
    * plan-time half (`Cast.canANSIStoreAssign`) stays with the
    * callers; this shim only supplies the `Column` ↔ `Expression`
    * bridge.
    */
  def ansiCast(c: Column,
      dt: org.apache.spark.sql.types.DataType): Column =
    column(org.apache.spark.sql.catalyst.expressions.Cast(
      org.apache.spark.sql.classic.ExpressionUtils.expression(c),
      dt, None, org.apache.spark.sql.catalyst.expressions
        .EvalMode.ANSI))
}
