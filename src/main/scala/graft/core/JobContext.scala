package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel
import scala.collection.mutable

/**
 * Per-job execution context: view registry + reference counts (driving the
 * auto-cache policy), pipeline variables, and runtime settings.
 *
 * Reference: common/JobContext.scala. Key semantic preserved: a view
 * referenced more than once is persisted MEMORY_AND_DISK on its second
 * reference (reference: JobContext.scala:74-85; README.md:374). The
 * reference smuggles ref-counts through the Spark session conf
 * (JobContext.scala:112); we keep a plain driver-side map.
 */
final class JobContext(val pipelineCtx: PipelineContext)(implicit spark: SparkSession) {

  /** Pipeline/job variables (config + `--var` + VariableSetter results). */
  private val _variables = mutable.LinkedHashMap.empty[String, String]
  /** SQL-dialect variables declared with `set` / `setrun` in SqlActors;
   *  visible across actors of the same job (reference: Actor.scala:83-109). */
  private val _sqlVariables = mutable.LinkedHashMap.empty[String, String]
  /** How many times each view has been referenced as an input so far. */
  private val _viewRefs = mutable.Map.empty[String, Int].withDefaultValue(0)
  /** Views referenced within the CURRENT action — a view both declared in
   *  input-views and found in the SQL plan parse is one logical use, not
   *  two (the reference counts via either the runner or the plan parse,
   *  never both — SqlActor.scala:94-109). */
  private var _seenThisAction = mutable.Set.empty[String]
  /** Whether beginAction() has ever been called. Code that drives actors on
   *  a bare JobContext (tests, the query catalog) never delimits actions —
   *  for them every referenceView call must count, or the 2nd-reference
   *  auto-persist could never trigger. */
  private var _actionScoped = false
  /** The exact DataFrames we persisted (not just names): a later
   *  createOrReplaceTempView re-binds the name to a new plan, and
   *  unpersisting THAT plan would leak the original cache entry. */
  private val _cached = mutable.Map.empty[String, DataFrame]
  /** All views promoted during this job, in order, with their global flag. */
  private val _promoted = mutable.LinkedHashMap.empty[String, Boolean]

  var metricsRequired: Boolean = pipelineCtx.metricsEnabled

  // ---- variables ----------------------------------------------------------
  def setVariable(name: String, value: String): Unit = _variables(name) = value
  def setVariables(vs: Iterable[(String, String)]): Unit = vs.foreach { case (k, v) => setVariable(k, v) }
  def getVariable(name: String): Option[String] = _variables.get(name)
  def variables: Map[String, String] = _variables.toMap

  def setSqlVariable(name: String, value: String): Unit = _sqlVariables(name) = value
  def sqlVariables: Map[String, String] = _sqlVariables.toMap

  // ---- views --------------------------------------------------------------
  /** Resolve a view by name; global_temp-qualified names are honored. */
  def getView(name: String): DataFrame =
    if (viewExists(name)) spark.table(resolvedName(name))
    else throw new IllegalStateException(s"view '$name' does not exist")

  def viewExists(name: String): Boolean =
    spark.catalog.tableExists(resolvedName(name))

  private def resolvedName(name: String): String =
    if (name.contains(".")) name
    else if (spark.catalog.tableExists(name)) name
    else {
      val g = s"${pipelineCtx.globalTempDatabase}.$name"
      if (spark.catalog.tableExists(g)) g else name
    }

  /** Reset the per-action reference dedup scope (runner calls this at the
   *  start of every action). */
  def beginAction(): Unit = { _actionScoped = true; _seenThisAction = mutable.Set.empty }

  /** Count a reference to `name`; auto-persist on the 2nd reference
   *  (skipped for streaming views — persist is illegal on them). At most
   *  one count per view per action — see [[_seenThisAction]] — but only
   *  once the runner has delimited actions via beginAction(); bare-context
   *  callers count every reference. */
  def referenceView(name: String): Unit = if (!_actionScoped || _seenThisAction.add(name)) {
    _viewRefs(name) += 1
    if (_viewRefs(name) == 2 && viewExists(name) && !_cached.contains(name)) {
      val df = getView(name)
      if (!df.isStreaming) {
        df.persist(StorageLevel.MEMORY_AND_DISK)
        _cached(name) = df
      }
    }
  }

  def promoteView(name: String, df: DataFrame, global: Boolean): Unit = {
    if (global) df.createOrReplaceGlobalTempView(name)
    else df.createOrReplaceTempView(name)
    _promoted(name) = global
  }

  def promotedViews: Seq[(String, Boolean)] = _promoted.toSeq

  // ---- observations -------------------------------------------------------

  /** Batch `Dataset.observe` handles registered by ObserveActor; metrics
   *  materialize when a downstream action executes the observed plan. */
  private val _observations =
    mutable.LinkedHashMap.empty[String, org.apache.spark.sql.Observation]

  def registerObservation(name: String, obs: org.apache.spark.sql.Observation): Unit = {
    require(!_observations.contains(name),
      s"observation '$name' is already registered in this job — observation names are unique per job")
    _observations(name) = obs
  }

  def observation(name: String): Option[org.apache.spark.sql.Observation] =
    _observations.get(name)

  /** Snapshot of observation results; executed observations map to their
   *  metric rows, unexecuted ones to an empty map. The observation future
   *  completes on Spark's listener-bus thread shortly AFTER the observed
   *  action returns, so `awaitMs` bounds a wait for that async hop.
   *  `awaitMs` is ONE SHARED deadline across all observations (the waits
   *  overlap; each pending future gets only the budget remaining), so a
   *  job with several dangling observations — views that never reached
   *  an action — stalls teardown by at most `awaitMs` total, not per
   *  observation. (Reads the future directly: Observation.getOrEmpty is
   *  private[sql].) */
  def observedMetrics(awaitMs: Long = 0L): Map[String, Map[String, Any]] = {
    val deadline = System.nanoTime() + awaitMs * 1000000L
    _observations.map { case (n, o) =>
      val leftMs = (deadline - System.nanoTime()) / 1000000L
      if (leftMs > 0 && o.future.value.isEmpty)
        scala.util.Try(scala.concurrent.Await.ready(o.future,
          scala.concurrent.duration.Duration(leftMs, "ms")))
      n -> (o.future.value match {
        case Some(scala.util.Success(row)) =>
          row.schema.fieldNames.zip(row.toSeq).toMap[String, Any]
        case _ => Map.empty[String, Any]
      })
    }.toMap
  }

  /** Interior caches an actor's library pass created (graft.ml's
   *  CacheLease frames): the pass can't free them (its returned frames
   *  depend on the cached plans) and the actor can't either (downstream
   *  actions haven't consumed the view yet) — so they're deferred here
   *  and freed at job teardown, after the writers ran. */
  private val _deferred = mutable.ArrayBuffer.empty[DataFrame]
  def deferUnpersist(dfs: Seq[DataFrame]): Unit = _deferred ++= dfs

  /** Unpersist everything we cached (job teardown;
   *  reference: PipelineRunner.scala:243-258). */
  def cleanup(): Unit = {
    // unpersist the DataFrames we actually cached — resolving by name here
    // would unpersist whatever plan the name points at NOW (a no-op if the
    // view was re-promoted), leaking the original cache entry
    _cached.values.foreach(df => scala.util.Try(df.unpersist()))
    _cached.clear()
    _deferred.foreach(df => scala.util.Try(df.unpersist()))
    _deferred.clear()
  }
}
