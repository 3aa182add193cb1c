package graft.utils

import graft.core.{Actor, JobContext}
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions.expr

/**
 * Zero-extra-pass data-quality metrics: wraps a view with
 * `Dataset.observe`, so the declared aggregate expressions are computed
 * BY THE JOB'S OWN ACTION as the rows stream through — no second scan,
 * no `count()` materialization, no driver collect. The production
 * alternative to re-reading a 100 TB output just to count nulls.
 *
 * Metrics are declared as `metric.<alias>` properties whose values are
 * aggregate SQL expressions over the view's columns, e.g.
 * `metric.null_ids: "count_if(id IS NULL)"`. The output view is the
 * input with observation attached — chain the sink off it; the metrics
 * materialize when the first downstream action executes.
 *
 * Batch views register an [[org.apache.spark.sql.Observation]] on the
 * [[JobContext]] (`ctx.observedMetrics` / `ctx.observation(name)`), and
 * the PipelineRunner appends one `observe:<name>` row per observation to
 * its metrics report after the job. Streaming views use the named
 * `observe` variant instead — their metrics arrive per micro-batch in
 * `StreamingQueryProgress.observedMetrics` (an Observation cannot attach
 * to a streaming Dataset), so nothing registers on the context.
 */
class ObserveActor extends Actor {
  protected var view: String = ""
  protected var name: String = ""
  protected var metrics: Seq[(String, String)] = Seq.empty

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    view = require_(properties, "view")
    name = properties.getOrElse("name", s"${view}_metrics")
    metrics = properties.toSeq.collect {
      case (k, v) if k.startsWith("metric.") => k.stripPrefix("metric.") -> v
    }.sortBy(_._1)
    require(metrics.nonEmpty,
      "ObserveActor: declare at least one metric.<alias> aggregate expression")
  }

  def sourceView(v: String): this.type = { view = v; this }
  def named(n: String): this.type = { name = n; this }
  def metric(alias: String, aggExpr: String): this.type = {
    metrics = (metrics :+ (alias -> aggExpr)).sortBy(_._1); this
  }

  override def inputViews: Seq[String] = if (view.nonEmpty) Seq(view) else Seq.empty

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    val df = ctx.getView(view)
    val cols = metrics.map { case (alias, e) => expr(e).as(alias) }
    Some(if (df.isStreaming) df.observe(name, cols.head, cols.tail: _*)
    else {
      val obs = Observation(name)
      val out = df.observe(obs, cols.head, cols.tail: _*)
      ctx.registerObservation(name, obs)
      out
    })
  }
}
