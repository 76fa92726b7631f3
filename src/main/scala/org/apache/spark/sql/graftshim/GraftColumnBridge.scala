/*
 * Accessor shim: `org.apache.spark.sql.classic.ExpressionUtils` is
 * bytecode-public but `private[sql]` at the Scala level in Spark 4.1.2,
 * so code in package `graft.*` cannot call it directly. This object is
 * compiled into a subpackage of `org.apache.spark.sql`, which satisfies
 * the `private[sql]` qualifier, and forwards the two conversions graft
 * needs to build self-contained Columns around custom Catalyst
 * expressions (no session-registry dependency).
 */
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object GraftColumnBridge {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its underlying Catalyst expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
