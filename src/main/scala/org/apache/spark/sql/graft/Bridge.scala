package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ⇄ Column bridge. `ExpressionUtils` is `private[sql]`, so the
  * shim lives under the org.apache.spark.sql namespace (the standard
  * technique for libraries that construct Catalyst expressions carrying
  * non-literal state — here: centroid tables, PQ LUTs, probe sets).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
