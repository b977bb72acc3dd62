/* Bridge into Spark's package-private classic Column/Expression
 * conversions. `org.apache.spark.sql.classic.ExpressionUtils` is
 * `private[sql]`, so extension libraries conventionally expose it from a
 * sub-package of org.apache.spark.sql. This is the only file outside the
 * graft namespace. */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

package object graftbridge {
  /** Wrap a Catalyst Expression as a user-facing Column. */
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Extract the Catalyst Expression backing a Column. */
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
