package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's private[sql] Column↔Expression converters — Spark 4
  * removed `Column.expr` from the public API, and plan-time introspection of
  * literal arguments (e.g. a regex pattern whose capture-group count decides
  * the output array arity) needs the underlying Expression. Declared under
  * org.apache.spark.sql so the private[sql] member resolves: the standard
  * extension-library shim technique.
  */
object ColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** EAGER Column→catalyst conversion through the session's converter.
    * `expression(c)` above wraps the ColumnNode lazily (resolution happens
    * during analysis), which is fine inside a Dataset plan but NOT for
    * expressions embedded in custom plan nodes that ship to executors —
    * the lazy wrapper holds non-serializable internal nodes. */
  def eagerExpression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .expression(c)

  /** DataFrame over a custom LogicalPlan (Dataset.ofRows is private[sql] in
    * Spark 4) — the entry point for library-defined logical operators. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Spark's own floating-point key normalization (-0.0 → 0.0, NaN → one
    * canonical bit pattern) — what Catalyst applies to hash-aggregate,
    * join, and window partition keys before binary comparison. Custom
    * operators that group by UnsafeRow equality need the same treatment;
    * the rule object is private[sql]. */
  def normalizeFloats(e: Expression): Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers
      .normalize(e)

  /** String value of a literal Column (`lit("…")`), if it is one. Reads the
    * ColumnNode directly — the catalyst conversion wraps literals in a lazy
    * ColumnNodeExpression whose foldability is opaque before analysis. */
  def litString(c: Column): Option[String] = c.node match {
    case org.apache.spark.sql.internal.Literal(v: String, _, _) => Some(v)
    case org.apache.spark.sql.internal.Literal(
        v: org.apache.spark.unsafe.types.UTF8String, _, _) => Some(v.toString)
    case _ => None
  }
}
