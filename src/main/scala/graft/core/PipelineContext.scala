package graft.core

/**
 * Engine-wide execution settings shared by all jobs of one pipeline run.
 *
 * Reference: common/PipelineContext.scala (ioConnections=16 at :111,
 * ioBatchSize=1600 at :117, global_temp database name at :19). We keep the
 * same defaults but make them plain constructor parameters instead of
 * session-conf entries.
 */
final case class PipelineContext(
    /** Max parallel sink connections for chunked row-level writes. */
    ioConnections: Int = 16,
    /** Rows per JDBC/HBase batch in row-level writers. */
    ioBatchSize: Int = 1600,
    /** When true all jobs share one SparkSession (local temp views cross
     *  job boundaries); default mirrors the reference: a sub-session per
     *  job (reference: PipelineRunner.scala:49). */
    singleSparkSession: Boolean = false,
    /** Re-publish global_temp views under their bare name in each job's
     *  sub-session so SQL can skip the `global_temp.` prefix
     *  (reference: PipelineRunner.scala:113-116). */
    globalViewAsLocal: Boolean = true,
    /** Non-negative => validation run: every action's output truncated to
     *  this many rows (reference: PipelineRunner.scala:21-29,78). */
    validationRunLimit: Option[Int] = None,
    /** Collect per-action metrics (row count, schema, size, time). */
    metricsEnabled: Boolean = false,
    /** Directory for metrics JSON output; None => stdout log only. */
    metricsUri: Option[String] = None,
    /** Debug staging: dump every action's output to this uri as csv. */
    stagingUri: Option[String] = None,
    stagingActions: Seq[String] = Seq.empty,
    /** Pipeline-wide plan gate: when Some("error"|"warn"), every action's
     *  output plan is audited by [[graft.plans.PlanAudit]] and the run
     *  fails on findings at/above the severity — the per-action
     *  `plan-audit` actor without writing one action per view. Pure plan
     *  inspection; None (default) = off. */
    planAudit: Option[String] = None,
    /** Rule names the pipeline-wide gate ignores (e.g. a labeled
     *  brute-force baseline stage's `cartesian-join`). */
    planAuditAllowRules: Set[String] = Set.empty
) {
  // fail fast on BOTH construction paths (YAML validates earlier, but a
  // programmatic planAudit = Some("eror") would otherwise make the gate
  // silently inert — atLeast() compares against rank 3, never firing
  require(planAudit.forall(Set("error", "warn")),
    s"planAudit must be 'error' or 'warn', got '${planAudit.get}'")
  val globalTempDatabase: String = "global_temp"
}
