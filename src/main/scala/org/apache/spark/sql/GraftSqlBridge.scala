package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge to the package-private Column <-> Expression converters,
 * so the library can define native Catalyst expressions without forking
 * Spark. Standard pattern for Spark extension libraries (cf. the public
 * DatasetFactory/SqlStrategy bridges in open-source Spark add-ons).
 */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
