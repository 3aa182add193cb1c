package graft.transform

import graft.core.{Actor, JobContext}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Contract for user-supplied arbitrary-stateful stream processors: take the
 * (streaming) input frame, return the transformed frame — canonically via
 * `ds.groupByKey(...).mapGroupsWithState(...)` or `flatMapGroupsWithState`.
 *
 * Reference: common/stream/ArbitraryStatefulProcessor.scala:10-17; canonical
 * implementation pattern in the reference's UserStatefulProcessor test
 * (groupByKey + mapGroupsWithState + GroupState.update, :36-41,76).
 */
trait ArbitraryStatefulProcessor extends Serializable {
  /** Optional typed properties injected from the pipeline definition
   *  (`processor.*` keys, reference: transform/StreamStatefulTransformer.scala:41-49). */
  def init(properties: Map[String, String]): Unit = ()
  def transformState(df: DataFrame)(implicit spark: SparkSession): DataFrame
}

/**
 * Plugs an [[ArbitraryStatefulProcessor]] (by instance or reflective class
 * name) into the stream.
 *
 * Reference: transform/StreamStatefulTransformer.scala:29-36.
 */
class StreamStatefulTransformer extends Actor {
  protected var view: String = ""
  protected var processor: ArbitraryStatefulProcessor = _

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    view = require_(properties, "view")
    properties.get("processor.type").foreach { cls =>
      processor = Class.forName(cls).getDeclaredConstructor().newInstance()
        .asInstanceOf[ArbitraryStatefulProcessor]
    }
    require(processor != null, "StreamStatefulTransformer: processor required")
    processor.init(properties.collect {
      case (k, v) if k.startsWith("processor.") && k != "processor.type" =>
        k.stripPrefix("processor.") -> v
    })
  }

  def sourceView(v: String): this.type = { view = v; this }
  def withProcessor(p: ArbitraryStatefulProcessor): this.type = { processor = p; this }

  override def inputViews: Seq[String] = if (view.nonEmpty) Seq(view) else Seq.empty

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] =
    Some(processor.transformState(ctx.getView(view))(spark))
}
