package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/**
 * Base contract for every pipeline actor (reader / transformer / validator /
 * writer / utility).
 *
 * Mirrors the reference semantics (reference: common/Actor.scala:76 —
 * `def run(ctx: JobContext)(implicit session: SparkSession): Option[DataFrame]`)
 * but replaces runtime-reflection property injection
 * (reference: common/PropertyInitializer.scala:44-105) with an explicit
 * `init(properties)` call: actors pattern-match the typed property map
 * themselves. This keeps actors plain Scala objects that are easy to unit
 * test and removes a whole class of reflective-classpath failure modes.
 */
trait Actor extends Serializable {

  /** Extra named views an actor wants published besides its main output
   *  (e.g. flat-file header/trailer views; reference: common/Actor.scala:125-129). */
  private val _extraViews = mutable.ArrayBuffer.empty[(String, DataFrame, Boolean)]

  /** Configure the actor from a string property map (pipeline-definition
   *  properties, already `${var}`-resolved by the builder). */
  def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = ()

  /** Hook invoked by the runner just before `run`, with current job
   *  variables — used by SQL actors to late-bind `set`-variables declared by
   *  earlier actions (reference: common/Actor.scala:60-68). */
  def beforeRun(ctx: JobContext)(implicit spark: SparkSession): Unit = ()

  /** Execute. Returning Some(df) makes the runner publish it as this
   *  action's output view. */
  def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame]

  /** Actor-specific metrics contributed to the per-action metrics record. */
  def collectMetrics(df: DataFrame): Seq[(String, String)] = Seq.empty

  /** Input view names this actor depends on; the runner checks existence and
   *  reference-counts them for auto-caching. */
  def inputViews: Seq[String] = Seq.empty

  protected def registerView(name: String, df: DataFrame, global: Boolean = false): Unit =
    _extraViews += ((name, df, global))

  /** Drained by the runner after `run`. */
  def extraViews: Seq[(String, DataFrame, Boolean)] = {
    val vs = _extraViews.toSeq
    _extraViews.clear()
    vs
  }

  /** Convenience for required properties. */
  protected def require_(properties: Map[String, String], key: String): String =
    properties.getOrElse(key,
      throw new IllegalArgumentException(s"${getClass.getSimpleName}: missing required property '$key'"))
}
