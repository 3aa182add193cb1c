package graft.streaming

import graft.core.{Actor, JobContext}
import org.apache.spark.sql.{DataFrame, ForeachWriter, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Trigger / output-mode / await plumbing shared by all stream writers
 *  (reference: e.g. sink/FileStreamWriter.scala:36-66, trigger match
 *  :52-57, test wait :60-63). `once` maps to AvailableNow (Trigger.Once is
 *  deprecated in Spark 4 and AvailableNow drains then stops — the behavior
 *  the reference's tests rely on). */
trait StreamWriteSupport { this: Actor =>
  protected var outputMode: String = "append"
  protected var triggerMode: Option[String] = None   // continuous | processingTime | once
  protected var triggerInterval: Option[String] = None
  protected var checkpointLocation: Option[String] = None
  protected var waitTimeMs: Option[Long] = None
  protected var allowedOutputModes: Seq[String] = Seq("append", "complete", "update")

  protected def initStreamWrite(properties: Map[String, String]): Unit = {
    properties.get("outputMode").foreach { m =>
      require(allowedOutputModes.contains(m), s"invalid outputMode: $m")
      outputMode = m
    }
    triggerMode = properties.get("trigger.mode")
    triggerInterval = properties.get("trigger.interval")
    checkpointLocation = properties.get("options.checkpointLocation")
    waitTimeMs = properties.get("test.waittimeMS").map(_.toLong)
  }

  def withOutputMode(m: String): this.type = { outputMode = m; this }
  def withTrigger(mode: String, interval: String = ""): this.type = {
    triggerMode = Some(mode)
    if (interval.nonEmpty) triggerInterval = Some(interval)
    this
  }
  def withCheckpoint(uri: String): this.type = { checkpointLocation = Some(uri); this }
  def testWaitTimeMs(ms: Long): this.type = { waitTimeMs = Some(ms); this }

  protected def applyTrigger[T](w: DataStreamWriter[T]): DataStreamWriter[T] = triggerMode match {
    case Some("continuous") => w.trigger(Trigger.Continuous(triggerInterval.getOrElse("1 second")))
    case Some("processingTime") => w.trigger(Trigger.ProcessingTime(triggerInterval.getOrElse("0 seconds")))
    case Some("once") | Some("availableNow") => w.trigger(Trigger.AvailableNow())
    case Some(other) => throw new IllegalArgumentException(s"invalid trigger mode: $other")
    case None => w
  }

  /** Start + optional bounded await (used by tests / validation runs).
   *  A drain trigger (once/availableNow) terminates by itself and is
   *  always awaited — otherwise a later pipeline action reading the sink
   *  would race the still-running drain. */
  protected def startAndWait[T](w: DataStreamWriter[T]): Unit =
    awaitIfRequested(w.start())

  /** The await half of [[startAndWait]], for sinks whose start call is not
   *  `.start()` (e.g. `.toTable(t)`). */
  protected def awaitIfRequested(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    waitTimeMs match {
      case Some(ms) => q.awaitTermination(ms); if (q.isActive) q.stop()
      case None if triggerMode.exists(m => m == "once" || m == "availableNow") =>
        q.awaitTermination()
      case None => ()
    }
}

/**
 * Streaming file sink (csv/json/parquet/avro/orc).
 * Reference: sink/FileStreamWriter.scala:36-66.
 */
class FileStreamWriter extends Actor with StreamWriteSupport {
  protected var format: String = "parquet"
  protected var writeOptions: Map[String, String] = Map.empty
  protected var uri: String = ""
  protected var view: String = ""

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    properties.get("format").foreach(format = _)
    writeOptions ++= properties.collect { case (k, v) if k.startsWith("options.") => k.stripPrefix("options.") -> v }
    uri = require_(properties, "fileUri")
    view = require_(properties, "view")
    initStreamWrite(properties)
  }

  def sinkFormat(f: String): this.type = { format = f; this }
  def writeOption(k: String, v: String): this.type = { writeOptions += (k -> v); this }
  def fileUri(u: String): this.type = { uri = u; this }
  def sourceView(v: String): this.type = { view = v; this }

  override def inputViews: Seq[String] = if (view.nonEmpty) Seq(view) else Seq.empty

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    val df = ctx.getView(view)
    require(df.isStreaming, s"FileStreamWriter: view '$view' is not a stream")
    val w = applyTrigger(df.writeStream.format(format).options(writeOptions)
      .outputMode(outputMode).option("path", uri))
    startAndWait(w)
    None
  }
}

/**
 * Generic foreachBatch micro-batch sink: hand each micro-batch DataFrame to
 * a user function — the integration point for JDBC/HBase/Mongo/Redis-style
 * row sinks (reference: common/stream/MicroBatchWriter.scala:8-15).
 */
class ForeachBatchStreamWriter(batchFn: (DataFrame, Long) => Unit) extends Actor with StreamWriteSupport {
  protected var view: String = ""
  def sourceView(v: String): this.type = { view = v; this }
  override def inputViews: Seq[String] = if (view.nonEmpty) Seq(view) else Seq.empty

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    view = require_(properties, "view")
    initStreamWrite(properties)
  }

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    val df = ctx.getView(view)
    require(df.isStreaming, s"ForeachBatchStreamWriter: view '$view' is not a stream")
    var w = df.writeStream.outputMode(outputMode).foreachBatch(batchFn)
    checkpointLocation.foreach(c => w = w.option("checkpointLocation", c))
    startAndWait(applyTrigger(w))
    None
  }
}

/**
 * Generic continuous sink over a ForeachWriter (per-partition open/process/
 * close; reference: common/stream/ContinuousWriter.scala:9-11 +
 * sink/JdbcStreamWriter.scala:73).
 */
class ForeachStreamWriter(writer: ForeachWriter[Row]) extends Actor with StreamWriteSupport {
  protected var view: String = ""
  def sourceView(v: String): this.type = { view = v; this }
  override def inputViews: Seq[String] = if (view.nonEmpty) Seq(view) else Seq.empty

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    view = require_(properties, "view")
    initStreamWrite(properties)
  }

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    val df = ctx.getView(view)
    require(df.isStreaming, s"ForeachStreamWriter: view '$view' is not a stream")
    var w = df.writeStream.outputMode(outputMode).foreach(writer)
    checkpointLocation.foreach(c => w = w.option("checkpointLocation", c))
    startAndWait(applyTrigger(w))
    None
  }
}
