package graft.streaming

import graft.core.{Actor, JobContext}
import graft.source.FlatFields
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Watermark + synthetic-event-time plumbing shared by all stream readers
 *  (reference: the postLoad step of every stream reader in `source/` —
 *  e.g. FileStreamReader.scala:37-46). */
trait StreamReadSupport { this: Actor =>
  protected var watermarkField: Option[String] = None
  protected var watermarkDelay: Option[String] = None
  protected var addTimestamp: Boolean = false

  protected def initStream(properties: Map[String, String]): Unit = {
    watermarkField = properties.get("watermark.timeField")
    watermarkDelay = properties.get("watermark.delayThreshold")
    properties.get("addTimestamp").foreach(v => addTimestamp = v.toBoolean)
  }

  def watermark(timeField: String, delayThreshold: String): this.type = {
    watermarkField = Some(timeField); watermarkDelay = Some(delayThreshold); this
  }
  def withTimestamp(): this.type = { addTimestamp = true; this }

  /** Apply `__timestamp` column then watermark, in reference order. */
  protected def postLoad(df: DataFrame): DataFrame = {
    val withTs = if (addTimestamp) df.withColumn("__timestamp", current_timestamp()) else df
    (watermarkField, watermarkDelay) match {
      case (Some(f), Some(d)) => withTs.withWatermark(f, d)
      case _ => withTs
    }
  }
}

/**
 * Streaming file source for csv/json/parquet/avro/orc.
 * Reference: source/FileStreamReader.scala:31-46.
 */
class FileStreamReader extends Actor with StreamReadSupport {
  protected var format: String = "parquet"
  protected var readOptions: Map[String, String] = Map.empty
  protected var ddlSchema: Option[StructType] = None
  protected var uri: String = ""

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    properties.get("format").foreach { f =>
      require(Set("csv", "json", "parquet", "avro", "orc", "text").contains(f), s"bad format $f")
      format = f
    }
    readOptions ++= properties.collect { case (k, v) if k.startsWith("options.") => k.stripPrefix("options.") -> v }
    properties.get("ddlSchemaString").foreach(s => ddlSchema = Some(StructType.fromDDL(s)))
    uri = require_(properties, "fileUri")
    initStream(properties)
  }

  def sourceFormat(f: String): this.type = { format = f; this }
  def readOption(k: String, v: String): this.type = { readOptions += (k -> v); this }
  def ddlSchemaString(s: String): this.type = { ddlSchema = Some(StructType.fromDDL(s)); this }
  def fileUri(u: String): this.type = { uri = u; this }

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    val r0 = spark.readStream.format(format).options(readOptions)
    val r = ddlSchema.fold(r0)(r0.schema)
    Some(postLoad(r.load(uri)))
  }
}

/**
 * Streaming fixed-width text reader (positional fields only).
 * Reference: source/FlatStreamReader.scala:43-78 (substr select :64-67).
 */
class FlatStreamReader extends Actor with StreamReadSupport {
  protected var uri: String = ""
  protected var positionalSpec: String = ""

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    uri = require_(properties, "fileUri")
    positionalSpec = require_(properties, "positionalFields")
    initStream(properties)
  }

  def fileUri(u: String): this.type = { uri = u; this }
  def positionalFields(s: String): this.type = { positionalSpec = s; this }

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    val fields = FlatFields.parsePositional(positionalSpec)
    val raw = spark.readStream.format("text").load(uri)
    val cols = FlatFields.positionalCols(col("value"), fields)
    Some(postLoad(raw.select(cols: _*)))
  }
}
