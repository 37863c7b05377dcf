package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** The one `private[sql]` doorway the library needs: wrap a custom
  * Catalyst Expression as a Column without requiring session
  * extensions to be installed (queries must run on a caller-provided
  * vanilla SparkSession — the driver gate constructs its own session).
  * Kept to this single file so the package-intrusion surface is
  * auditable at a glance.
  */
object GraftSqlShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)
}
