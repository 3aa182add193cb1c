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

  /** Clone a session for per-query conf scoping: isolated SQLConf, shared
   *  SparkContext/cache. Uses Spark's own `cloneSession()` (the mechanism
   *  behind per-query isolation inside the engine), which also carries the
   *  caller's runtime conf sets, temp views, and runtime-registered
   *  functions — a hand-rolled newSession+conf copy would lose the latter
   *  two. `overrides` are applied on the clone afterwards. */
  def clonedSession(spark: SparkSession, overrides: (String, String)*): SparkSession = {
    val scoped = spark.asInstanceOf[classic.SparkSession].cloneSession()
    overrides.foreach { case (k, v) => scoped.conf.set(k, v) }
    scoped
  }

  /** Rebind an ANALYZED logical plan to another session of the same
   *  SparkContext — the session-isolation primitive behind per-query conf
   *  scoping (run a plan on a cloned session with its own SQLConf instead
   *  of mutating the shared session's conf). Pass an analyzed plan: temp
   *  view references are already resolved, so the target session needs
   *  none of the source session's catalog. */
  def onSession(spark: SparkSession, df: DataFrame): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession],
      df.queryExecution.analyzed)

  /** Register a temp SQL function backed by a raw Expression builder. */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
