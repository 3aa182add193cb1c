package graft.sink

import graft.core.{Actor, JobContext}
import graft.streaming.StreamWriteSupport
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Kafka record assembly shared by batch/stream writers: key from a field or
 * a generated id; value from a field or `to_json(struct(*))`; optional
 * headers column.
 *
 * Reference: common/KafkaWriteActor.scala:36-66 (defaults :49-50 — key
 * `monotonically_increasing_id`, value `to_json(struct(*))`; headers :64).
 * The Avro value path needs spark-avro (absent here) and raises a clear
 * error.
 */
object KafkaRecord {
  def assemble(df: DataFrame, keyField: Option[String], valueField: Option[String],
               headersField: Option[String], avroValue: Boolean): DataFrame = {
    if (avroValue) throw new UnsupportedOperationException(
      "Avro value encode requires the spark-avro module, which is not on this classpath")
    val key: Column = keyField.map(col(_).cast("string"))
      .getOrElse(monotonically_increasing_id().cast("string"))
    val value: Column = valueField.map(col(_).cast("string"))
      .getOrElse(to_json(struct(df.columns.map(col).toSeq: _*)))
    val cols = Seq(key.as("key"), value.as("value")) ++
      headersField.map(col(_).as("headers")).toSeq
    df.select(cols: _*)
  }
}

/** Batch Kafka writer (reference: sink/KafkaWriter.scala:11-18). */
class KafkaWriter extends Actor {
  protected var bootstrapServers: String = ""
  protected var topic: String = ""
  protected var view: String = ""
  protected var providerFormat: String = "kafka"
  protected var keyField: Option[String] = None
  protected var valueField: Option[String] = None
  protected var headersField: Option[String] = None
  protected var options: Map[String, String] = Map.empty

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    bootstrapServers = require_(properties, "bootstrapServers")
    topic = require_(properties, "topic")
    view = require_(properties, "view")
    properties.get("providerFormat").foreach(providerFormat = _)
    keyField = properties.get("keyField")
    valueField = properties.get("valueField")
    headersField = properties.get("headersField")
    options = properties.collect { case (k, v) if k.startsWith("options.") => k.stripPrefix("options.") -> v }
  }

  def servers(s: String): this.type = { bootstrapServers = s; this }
  def toTopic(t: String): this.type = { topic = t; this }
  def sourceView(v: String): this.type = { view = v; this }

  override def inputViews: Seq[String] = if (view.nonEmpty) Seq(view) else Seq.empty

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    val df = KafkaRecord.assemble(ctx.getView(view), keyField, valueField, headersField, avroValue = false)
    // append mode explicitly: kafka's V1 sink ignores it, and it keeps a
    // providerFormat substitute (DSv2 or V1) on the supported-mode path
    df.write.format(providerFormat).mode("append")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .options(options)
      .save()
    None
  }
}

/** Streaming Kafka writer with trigger/output-mode control
 *  (reference: sink/KafkaStreamWriter.scala:32-54). */
class KafkaStreamWriter extends Actor with StreamWriteSupport {
  protected var bootstrapServers: String = ""
  protected var topic: String = ""
  protected var view: String = ""
  protected var providerFormat: String = "kafka"
  protected var keyField: Option[String] = None
  protected var valueField: Option[String] = None
  protected var headersField: Option[String] = None
  protected var options: Map[String, String] = Map.empty

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    bootstrapServers = require_(properties, "bootstrapServers")
    topic = require_(properties, "topic")
    view = require_(properties, "view")
    providerFormat = properties.getOrElse("providerFormat", providerFormat)
    keyField = properties.get("keyField")
    valueField = properties.get("valueField")
    headersField = properties.get("headersField")
    options = properties.collect { case (k, v) if k.startsWith("options.") => k.stripPrefix("options.") -> v }
    initStreamWrite(properties)
  }

  override def inputViews: Seq[String] = if (view.nonEmpty) Seq(view) else Seq.empty

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    val df = KafkaRecord.assemble(ctx.getView(view), keyField, valueField, headersField, avroValue = false)
    var w = df.writeStream.format(providerFormat)
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .options(options)
      .outputMode(outputMode)
    checkpointLocation.foreach(c => w = w.option("checkpointLocation", c))
    startAndWait(applyTrigger(w))
    None
  }
}
