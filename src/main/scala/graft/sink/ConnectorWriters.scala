package graft.sink

import graft.core.{Actor, JobContext}
import graft.streaming.StreamWriteSupport
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Generic connector writer covering the Delta / Iceberg / Mongo / Redis /
 * Flight batch sinks — per the reference these differ only in format
 * string, table-vs-path addressing, mode handling, and a couple of
 * ordering requirements (reference: sink/DeltaWriter.scala:23-48,
 * IcebergWriter.scala:41-50, MongoWriter.scala:28-49, RedisWriter.scala:
 * 26-46, FlightWriter.scala:25-41).
 */
abstract class ConnectorWriter(format: String) extends Actor {
  protected var table: Option[String] = None
  protected var path: Option[String] = None
  protected var view: String = ""
  // advanced: substitute a wire-compatible provider name (test double /
  // vendor fork); mode-validation and addressing rules stay the actor's
  protected var providerFormat: String = format
  protected var mode: String = "append"
  protected var partitionBy: Seq[String] = Seq.empty
  protected var bucketSpec: Option[(Int, Seq[String])] = None
  protected var options: Map[String, String] = Map.empty

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    table = properties.get("table")
    path = properties.get("path")
    view = require_(properties, "view")
    properties.get("providerFormat").foreach(providerFormat = _)
    properties.get("mode").foreach { m =>
      require(Seq("overwrite", "append").contains(m), s"$format writer: bad mode $m")
      mode = m
    }
    properties.get("partitionBy").foreach(p => partitionBy = p.split(",").map(_.trim).toSeq)
    for (n <- properties.get("bucket.numBuckets"); cols <- properties.get("bucket.by"))
      bucketSpec = Some((n.toInt, cols.split(",").map(_.trim).toSeq))
    options = properties.collect { case (k, v) if k.startsWith("options.") => k.stripPrefix("options.") -> v }
  }

  def toTable(t: String): this.type = { table = Some(t); this }
  def toPath(p: String): this.type = { path = Some(p); this }
  def sourceView(v: String): this.type = { view = v; this }
  def writeMode(m: String): this.type = { mode = m; this }
  def partitionedBy(cols: String*): this.type = { partitionBy = cols; this }
  def bucketedBy(n: Int, cols: String*): this.type = { bucketSpec = Some((n, cols)); this }

  override def inputViews: Seq[String] = if (view.nonEmpty) Seq(view) else Seq.empty

  /** Pre-write frame adjustment hook (e.g. Iceberg ordered writes). */
  protected def prepare(df: DataFrame): DataFrame = df

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    val isInsertInto = table.isDefined && mode != "overwrite"
    var w = prepare(ctx.getView(view)).write.format(providerFormat).options(options)
    // insertInto appends into the table's EXISTING layout and Spark rejects
    // combining it with partitionBy/bucketBy — the table already carries
    // both; layout declarations apply to table creation and path writes
    if (partitionBy.nonEmpty && !isInsertInto) w = w.partitionBy(partitionBy: _*)
    if (!isInsertInto)
      bucketSpec.foreach { case (n, cols) => w = w.bucketBy(n, cols.head, cols.tail: _*) }
    (table, path) match {
      // table addressing: overwrite => saveAsTable, else insertInto
      // (reference: DeltaWriter.scala:41-44)
      case (Some(t), _) if mode == "overwrite" => w.mode(mode).saveAsTable(t)
      case (Some(t), _) => w.insertInto(t)
      case (None, Some(p)) => w.mode(mode).save(p)
      case _ => throw new IllegalArgumentException(s"$format writer: table or path required")
    }
    None
  }
}

class DeltaWriter extends ConnectorWriter("delta")

/** Iceberg requires rows sorted by the table partition columns within each
 *  task (reference: sink/IcebergWriter.scala:47 — sortWithinPartitions). */
class IcebergWriter extends ConnectorWriter("iceberg") {
  protected var tablePartitionedBy: Seq[String] = Seq.empty

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    super.init(properties)
    properties.get("tablePartitionedBy").foreach(p => tablePartitionedBy = p.split(",").map(_.trim).toSeq)
  }
  def tablePartitions(cols: String*): this.type = { tablePartitionedBy = cols; this }

  override protected def prepare(df: DataFrame): DataFrame =
    if (tablePartitionedBy.nonEmpty)
      df.sortWithinPartitions(tablePartitionedBy.map(df.col): _*)
    else df
}

class MongoWriter extends ConnectorWriter("mongodb")
class RedisWriter extends ConnectorWriter("org.apache.spark.sql.redis")
class FlightWriter extends ConnectorWriter("flight")

/** Streaming connector writer: Delta/Iceberg path sinks with output-mode +
 *  trigger validation (reference: sink/DeltaStreamWriter.scala:41-65,
 *  IcebergStreamWriter.scala:38-76 — Iceberg rejects continuous). */
abstract class ConnectorStreamWriter(format: String, continuousAllowed: Boolean)
  extends Actor with StreamWriteSupport {
  protected var table: Option[String] = None
  protected var path: Option[String] = None
  protected var view: String = ""
  // advanced: substitute a wire-compatible provider name (test double /
  // vendor fork); addressing + output-mode/trigger rules stay the actor's
  protected var providerFormat: String = format
  protected var options: Map[String, String] = Map.empty

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    table = properties.get("table")
    path = properties.get("path")
    view = require_(properties, "view")
    properties.get("providerFormat").foreach(providerFormat = _)
    options = properties.collect { case (k, v) if k.startsWith("options.") => k.stripPrefix("options.") -> v }
    allowedOutputModes = Seq("append", "complete")
    initStreamWrite(properties)
    if (!continuousAllowed && triggerMode.contains("continuous"))
      throw new IllegalArgumentException(s"$format stream writer: continuous trigger not supported")
  }

  override def inputViews: Seq[String] = if (view.nonEmpty) Seq(view) else Seq.empty

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    val df = ctx.getView(view)
    require(df.isStreaming, s"$format stream writer: view '$view' is not a stream")
    var w = df.writeStream.format(providerFormat).options(options).outputMode(outputMode)
    checkpointLocation.foreach(c => w = w.option("checkpointLocation", c))
    val query = (table, path) match {
      // a TABLE name must start via toTable — Delta treats option("path")
      // strictly as a filesystem path and would silently write a directory
      // literally named after the table. Iceberg is the exception: its
      // DSv2 sink addresses tables through the path option.
      case (Some(t), _) if format == "iceberg" => applyTrigger(w.option("path", t)).start()
      case (Some(t), _) => applyTrigger(w).toTable(t)
      case (None, Some(p)) => applyTrigger(w.option("path", p)).start()
      case _ => throw new IllegalArgumentException(s"$format stream writer: table or path required")
    }
    awaitIfRequested(query)
    None
  }
}

class DeltaStreamWriter extends ConnectorStreamWriter("delta", continuousAllowed = true)
class IcebergStreamWriter extends ConnectorStreamWriter("iceberg", continuousAllowed = false)
