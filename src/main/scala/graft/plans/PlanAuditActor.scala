package graft.plans

import graft.core.{Actor, JobContext}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Pipeline actor for [[PlanAudit]]: audit a view's query plan BEFORE
 * the pipeline spends cluster time executing it, and optionally fail
 * the run on scale-fatal shapes.
 *
 * Properties:
 *  - `view` (required): the view whose plan to audit
 *  - `failOn`: `error` (default) | `warn` | `never` — throw if any
 *    finding at/above this severity survives the allow list
 *  - `allowRules`: comma-separated rule names to suppress entirely
 *    (e.g. `cartesian-join` for a labeled brute-force baseline stage)
 *  - `lowCardKeys`: comma-separated column names ADDED to the default
 *    bounded-cardinality key set for the window check
 *  - `boundedRows`: override for the "Catalyst-provably-bounded side"
 *    threshold (default 4096)
 *
 * Output view: one row per finding (`rule, severity, node, detail`) —
 * sink it next to the job's metrics for an audit trail. The audited
 * view itself is untouched (audit is pure plan inspection; no job
 * runs). Per-action metrics report the finding counts by severity.
 *
 * ```yaml
 * - actor: plan-audit
 *   properties:
 *     view: joined_corpus
 *     failOn: error
 *     lowCardKeys: "datacenter,tier"
 * ```
 */
class PlanAuditActor extends Actor {
  protected var view: String = ""
  protected var failOn: String = "error"
  protected var allowRules: Set[String] = Set.empty
  protected var lowCardKeys: Set[String] = PlanAudit.DefaultLowCardKeys
  protected var boundedRows: Long = PlanAudit.DefaultBoundedRows
  private var lastCounts: Map[String, Long] = Map.empty

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    view = require_(properties, "view")
    properties.get("failOn").foreach { f =>
      require(Seq("error", "warn", "never").contains(f),
        s"PlanAuditActor: failOn must be error|warn|never, got '$f'")
      failOn = f
    }
    properties.get("allowRules").foreach(v =>
      allowRules = v.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    properties.get("lowCardKeys").foreach(v =>
      lowCardKeys = lowCardKeys ++ v.split(",").map(_.trim.toLowerCase).filter(_.nonEmpty))
    properties.get("boundedRows").foreach(v => boundedRows = v.toLong)
  }

  def sourceView(v: String): this.type = { view = v; this }
  def failingOn(f: String): this.type = { failOn = f; this }
  def allowing(rules: String*): this.type = { allowRules = allowRules ++ rules; this }

  override def inputViews: Seq[String] = if (view.nonEmpty) Seq(view) else Seq.empty

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    val findings = PlanAudit.audit(ctx.getView(view), lowCardKeys, boundedRows)
      .filterNot(f => allowRules(f.rule))
    lastCounts = findings.groupBy(_.severity).map { case (s, fs) => s -> fs.size.toLong }
    val fatal = if (failOn == "never") Seq.empty
                else findings.filter(f => PlanAudit.atLeast(f.severity, failOn))
    if (fatal.nonEmpty)
      throw new IllegalStateException(
        s"PlanAuditActor: view '$view' has ${fatal.size} plan finding(s) at/above " +
          s"severity '$failOn':\n" +
          fatal.map(f => s"  [${f.severity}] ${f.rule} @ ${f.node}: ${f.detail}").mkString("\n"))
    Some(PlanAudit.toDf(findings))
  }

  override def collectMetrics(df: DataFrame): Seq[(String, String)] =
    Seq("error", "warn", "info").map(s =>
      s"findings_$s" -> lastCounts.getOrElse(s, 0L).toString)
}
