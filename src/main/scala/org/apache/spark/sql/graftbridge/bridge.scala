package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4 hides the Column↔Expression conversion behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`)
  * because of the Connect split. Libraries that ship native Catalyst
  * expressions (as this one does for vector math and hashing — see
  * `graft.functions`) conventionally expose it from a package stub
  * inside `org.apache.spark.sql`; this object is that stub and the
  * only file in the repo living outside the `graft` namespace.
  */
package object graftbridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
