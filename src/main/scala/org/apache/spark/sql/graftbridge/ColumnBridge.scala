package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
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
