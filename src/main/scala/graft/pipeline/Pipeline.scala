package graft.pipeline

import graft.core.Actor

/**
 * Pipeline definition AST.
 *
 * Reference: pipeline/definition/{Pipeline,Job,Action,View}.scala — a
 * pipeline is a list of jobs, each a sequence of actions; each action wraps
 * one instantiated Actor plus its output-view declaration and declared
 * input views.
 */
final case class View(name: String, global: Boolean = false)

final case class Action(
    name: String,
    actor: Actor,
    outputView: Option[View],
    inputViews: Seq[String] = Seq.empty
)

final case class Job(name: String, actions: Seq[Action])

final case class Pipeline(
    name: String,
    jobs: Seq[Job],
    /** name -> value, already merged across config/submit-args/pipeline
     *  scopes with pipeline-most-specific precedence
     *  (reference: README.md:105, common/VariableResolver.scala:41-51). */
    variables: Map[String, String] = Map.empty,
    /** prefix -> UdfRegister class/function hook. */
    udfRegistrations: Seq[String] = Seq.empty,
    singleSparkSession: Boolean = false,
    globalViewAsLocal: Boolean = true,
    /** settings.planAudit: "error" | "warn" — pipeline-wide plan gate. */
    planAudit: Option[String] = None,
    /** settings.planAuditAllowRules: comma-separated suppressed rules. */
    planAuditAllowRules: Set[String] = Set.empty
)
