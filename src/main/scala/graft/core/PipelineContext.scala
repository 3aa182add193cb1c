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
    stagingActions: Seq[String] = Seq.empty
) {
  val globalTempDatabase: String = "global_temp"
}
