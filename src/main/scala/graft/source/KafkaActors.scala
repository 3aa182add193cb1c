package graft.source

import graft.core.{Actor, JobContext}
import graft.streaming.{StreamReadSupport, StreamWriteSupport}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/**
 * Kafka key/value schema handling shared by batch + streaming readers.
 *
 * Reference: common/KafkaActor.scala:71-84 (schema precedence avroString →
 * avroUri → avroFile → jsonString → jsonFile) and common/KafkaReadActor
 * .scala:38-88 (decode via from_avro / from_json, struct flattening of
 * `key.*` / `value.*`, non-key columns renamed `__kafka_*`).
 *
 * Avro decode is live on every distribution: [[graft.functions
 * .AvroDecoder]] uses the native `from_avro` reflectively when the
 * optional spark-avro module is present and otherwise decodes with the
 * always-shipped avro-core runtime. The JSON path (Spark JSON schema or
 * DDL) is handled by `from_json`.
 */
object KafkaSchema {
  sealed trait Spec
  final case class JsonSpec(schema: DataType) extends Spec
  final case class AvroSpec(schemaJson: String) extends Spec
  case object NoSpec extends Spec

  def fromProperties(prefix: String, properties: Map[String, String]): Spec = {
    def read(f: String) = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)), "UTF-8")
    properties.get(s"$prefix.avroSchemaString").map(AvroSpec.apply)
      .orElse(properties.get(s"$prefix.avroSchemaFile").map(f => AvroSpec(read(f))))
      .orElse(properties.get(s"$prefix.jsonSchemaString").map(s => JsonSpec(parseJsonSchema(s))))
      .orElse(properties.get(s"$prefix.jsonSchemaFile").map(f => JsonSpec(parseJsonSchema(read(f)))))
      .getOrElse(NoSpec)
  }

  /** First prefix that declares a schema wins. The actor docs spell the
   *  properties `key.*`/`value.*`; `keySchema.*`/`valueSchema.*` are the
   *  historical names — both resolve, so a pipeline following either
   *  form decodes (a docs-only name would otherwise silently skip the
   *  decode and hand raw bytes downstream). */
  def fromPropertyPrefixes(prefixes: Seq[String], properties: Map[String, String]): Spec =
    prefixes.iterator.map(fromProperties(_, properties))
      .collectFirst { case s if s != NoSpec => s }.getOrElse(NoSpec)

  /** Accepts a Spark JSON schema document or a DDL string. */
  def parseJsonSchema(s: String): DataType =
    try DataType.fromJson(s)
    catch { case _: Exception => StructType.fromDDL(s) }

  /** Decode a raw kafka binary column per the spec; None = leave as-is. */
  def decode(raw: Column, spec: Spec): Option[Column] = spec match {
    case JsonSpec(schema) => Some(from_json(raw.cast("string"), schema))
    case AvroSpec(schemaJson) => Some(graft.functions.AvroDecoder.decode(raw, schemaJson))
    case NoSpec => None
  }

  /** Catalyst type a spec decodes to; drives struct-vs-scalar projection.
   *  None = unknown — either no spec, or an Avro shape only the native
   *  spark-avro module can map (e.g. multi-branch unions, which it
   *  renders as member structs): treat unknown as struct so the native
   *  path keeps working; the fallback decoder raises its own clear error
   *  when it is the one that cannot handle the shape. */
  def decodedType(spec: Spec): Option[DataType] = spec match {
    case JsonSpec(schema) => Some(schema)
    case AvroSpec(schemaJson) =>
      try Some(graft.functions.AvroDecoder.sparkTypeFor(
        new org.apache.avro.Schema.Parser().parse(schemaJson)))
      catch { case _: IllegalArgumentException => None }
    case NoSpec => None
  }

  /** Project a decoded kafka frame: flatten key/value STRUCTS to top-level
   *  columns; KNOWN scalar-typed schemas (e.g. a bare Avro "long")
   *  surface as `__kafka_key`/`__kafka_value` — star-expanding them would
   *  fail analysis, and the prefix avoids colliding with a same-named
   *  field flattened from the other side's struct. Metadata columns get
   *  the `__kafka_` prefix (reference: KafkaReadActor.scala:81-88). */
  def project(df: DataFrame, keySpec: Spec, valueSpec: Spec): DataFrame = {
    val metaCols = Seq("topic", "partition", "offset", "timestamp", "timestampType")
      .filter(df.columns.contains)
      .map(c => col(c).as(s"__kafka_$c"))
    def side(raw: String, spec: Spec, structAlias: String): Seq[Column] =
      (decode(col(raw), spec), decodedType(spec)) match {
        case (Some(decoded), Some(t)) if !t.isInstanceOf[StructType] =>
          Seq(decoded.as(s"__kafka_$raw"))
        case (Some(decoded), _) => Seq(decoded.as(structAlias))
        case _ => Seq(col(raw).as(s"__kafka_$raw"))
      }
    val keyCols = side("key", keySpec, "__key_struct_")
    val valueCols = side("value", valueSpec, "__value_struct_")
    var out = df.select(keyCols ++ valueCols ++ metaCols: _*)
    if (out.columns.contains("__key_struct_")) out = out.select(col("__key_struct_.*"),
      col("*")).drop("__key_struct_")
    if (out.columns.contains("__value_struct_")) out = out.select(col("__value_struct_.*"),
      col("*")).drop("__value_struct_")
    out
  }
}

/** Batch Kafka topic reader (reference: source/KafkaReader.scala:11-18).
 *  `providerFormat` (advanced) substitutes a wire-compatible data-source
 *  name for the stock "kafka" provider — vendor forks, or the in-process
 *  `graft-test-kafka` double ConnectorSpec drives the full
 *  actor->options->connector path with. */
class KafkaReader extends Actor {
  protected var bootstrapServers: String = ""
  protected var topic: String = ""
  protected var providerFormat: String = "kafka"
  protected var options: Map[String, String] = Map.empty
  protected var keySpec: KafkaSchema.Spec = KafkaSchema.NoSpec
  protected var valueSpec: KafkaSchema.Spec = KafkaSchema.NoSpec

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    bootstrapServers = require_(properties, "bootstrapServers")
    topic = require_(properties, "topic")
    properties.get("providerFormat").foreach(providerFormat = _)
    options = properties.collect { case (k, v) if k.startsWith("options.") => k.stripPrefix("options.") -> v }
    keySpec = KafkaSchema.fromPropertyPrefixes(Seq("keySchema", "key"), properties)
    valueSpec = KafkaSchema.fromPropertyPrefixes(Seq("valueSchema", "value"), properties)
  }

  def servers(s: String): this.type = { bootstrapServers = s; this }
  def subscribe(t: String): this.type = { topic = t; this }

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    val df = spark.read.format(providerFormat)
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .options(options)
      .load()
    Some(KafkaSchema.project(df, keySpec, valueSpec))
  }
}

/** Streaming Kafka reader + watermark (reference: source/KafkaStreamReader.scala:24-42). */
class KafkaStreamReader extends Actor with StreamReadSupport {
  protected var bootstrapServers: String = ""
  protected var topic: String = ""
  protected var providerFormat: String = "kafka"
  protected var options: Map[String, String] = Map.empty
  protected var keySpec: KafkaSchema.Spec = KafkaSchema.NoSpec
  protected var valueSpec: KafkaSchema.Spec = KafkaSchema.NoSpec

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    bootstrapServers = require_(properties, "bootstrapServers")
    topic = require_(properties, "topic")
    properties.get("providerFormat").foreach(providerFormat = _)
    options = properties.collect { case (k, v) if k.startsWith("options.") => k.stripPrefix("options.") -> v }
    keySpec = KafkaSchema.fromPropertyPrefixes(Seq("keySchema", "key"), properties)
    valueSpec = KafkaSchema.fromPropertyPrefixes(Seq("valueSchema", "value"), properties)
    initStream(properties)
  }

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    val df = spark.readStream.format(providerFormat)
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .options(options)
      .load()
    Some(postLoad(KafkaSchema.project(df, keySpec, valueSpec)))
  }
}
