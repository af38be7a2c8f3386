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

  /** Release the storage blocks behind a `localCheckpoint`ed frame NOW.
    *
    * `Dataset.unpersist` only uncaches CacheManager entries; a local
    * checkpoint's persistence lives at the RDD layer (the `LogicalRDD`
    * the checkpointed plan wraps), which the public API cannot reach —
    * without this, blocks are freed only when the ContextCleaner
    * eventually GCs the dropped RDD, which is too lazy for iterative
    * algorithms holding one snapshot per round. No-op for frames that
    * are not checkpoint-backed. */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ =>
    }
}
