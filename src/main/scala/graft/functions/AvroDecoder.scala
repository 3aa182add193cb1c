package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger}
import java.nio.ByteBuffer
import java.time.{Instant, LocalDate}

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.generic.{GenericDatumReader, GenericFixed, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.api.java.UDF1
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/**
 * Avro binary -> Spark column decode with two engines, picked at runtime:
 *
 *  1. `org.apache.spark.sql.avro.functions.from_avro` via reflection when
 *     the spark-avro module is on the classpath — native Catalyst
 *     expression, the preferred path.
 *  2. Otherwise an avro-core (`org.apache.avro`, shipped with every Spark
 *     distribution) fallback: a `GenericDatumReader` UDF returning a Row
 *     of the Catalyst type derived from the writer schema. Slower than a
 *     native expression (per-row object conversion) but fully functional
 *     — Kafka+Avro pipelines work even without the optional module.
 *
 * Reference behavior: common/KafkaReadActor.scala:38-78 (from_avro on the
 * kafka key/value binary columns).
 *
 * Supported Avro shapes: records (nested), primitives, enum/fixed/bytes,
 * arrays, string-keyed maps, [null, T] unions (-> nullable T), and the
 * decimal / date / timestamp-millis / timestamp-micros logical types.
 * Multi-branch non-null unions are rejected with a clear error — encode
 * those as records upstream.
 */
object AvroDecoder {

  /** Decode `raw` (binary Avro, no Confluent wire framing) per the given
   *  writer schema JSON. */
  def decode(raw: Column, schemaJson: String): Column =
    viaSparkAvro(raw, schemaJson).getOrElse(viaAvroCore(raw, schemaJson))

  /** Reflective gate for the optional spark-avro module: Some(column) when
   *  present, None when absent (offline distributions). NOTE the gate
   *  probes for the module's implementation class, not the `functions`
   *  facade — Spark 4 ships a `from_avro` STUB in catalyst that resolves
   *  but throws AVRO_NOT_LOADED at analysis time when the real module
   *  (AvroDataToCatalyst) is not on the classpath. */
  private[graft] def viaSparkAvro(raw: Column, schemaJson: String): Option[Column] =
    try {
      Class.forName("org.apache.spark.sql.avro.AvroDataToCatalyst")
      val cls = Class.forName("org.apache.spark.sql.avro.functions$")
      val module = cls.getField("MODULE$").get(null)
      val m = cls.getMethod("from_avro", classOf[Column], classOf[String])
      Some(m.invoke(module, raw, schemaJson).asInstanceOf[Column])
    } catch {
      case _: ClassNotFoundException | _: NoSuchMethodException | _: LinkageError => None
    }

  /** The avro-core fallback: schema-derived Catalyst type + decoding UDF. */
  private[graft] def viaAvroCore(raw: Column, schemaJson: String): Column = {
    val sparkType = sparkTypeFor(new Schema.Parser().parse(schemaJson))
    udf(new AvroBinaryDecodeFn(schemaJson), sparkType).apply(raw)
  }

  /** Catalyst type for an Avro schema (see supported shapes above). */
  def sparkTypeFor(s: Schema): DataType = s.getType match {
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map { f =>
        StructField(f.name(), sparkTypeFor(f.schema()), nullable = isNullable(f.schema()))
      })
    case Schema.Type.UNION => sparkTypeFor(nonNullBranch(s))
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType else IntegerType
    case Schema.Type.LONG => s.getLogicalType match {
      case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros => TimestampType
      case _ => LongType
    }
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES | Schema.Type.FIXED => s.getLogicalType match {
      case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
      case _ => BinaryType
    }
    case Schema.Type.ARRAY =>
      ArrayType(sparkTypeFor(s.getElementType), containsNull = isNullable(s.getElementType))
    case Schema.Type.MAP =>
      MapType(StringType, sparkTypeFor(s.getValueType), valueContainsNull = isNullable(s.getValueType))
    case Schema.Type.NULL => NullType
    case other => throw new IllegalArgumentException(s"unsupported avro type: $other")
  }

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.NULL ||
      (s.getType == Schema.Type.UNION && s.getTypes.asScala.exists(_.getType == Schema.Type.NULL))

  private def nonNullBranch(s: Schema): Schema = {
    val branches = s.getTypes.asScala.filterNot(_.getType == Schema.Type.NULL)
    require(branches.size == 1,
      s"unsupported avro union with ${branches.size} non-null branches: $s — encode as a record instead")
    branches.head
  }

  /** Avro runtime value -> Catalyst-convertible external value. */
  private[graft] def convert(value: Any, s: Schema): Any =
    if (value == null) null
    else s.getType match {
      case Schema.Type.UNION => convert(value, nonNullBranch(s))
      case Schema.Type.RECORD =>
        val r = value.asInstanceOf[GenericRecord]
        Row(s.getFields.asScala.toSeq.map(f => convert(r.get(f.pos()), f.schema())): _*)
      case Schema.Type.STRING | Schema.Type.ENUM => value.toString
      case Schema.Type.INT =>
        if (s.getLogicalType.isInstanceOf[LogicalTypes.Date])
          LocalDate.ofEpochDay(value.asInstanceOf[Int].toLong)
        else value
      case Schema.Type.LONG => s.getLogicalType match {
        case _: LogicalTypes.TimestampMillis => Instant.ofEpochMilli(value.asInstanceOf[Long])
        case _: LogicalTypes.TimestampMicros =>
          val us = value.asInstanceOf[Long]
          Instant.ofEpochSecond(Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
        case _ => value
      }
      case Schema.Type.BYTES | Schema.Type.FIXED =>
        val bytes = value match {
          case bb: ByteBuffer =>
            val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
          case gf: GenericFixed => gf.bytes().clone()
          case b: Array[Byte] => b
        }
        s.getLogicalType match {
          case d: LogicalTypes.Decimal => new JBigDecimal(new BigInteger(bytes), d.getScale)
          case _ => bytes
        }
      case Schema.Type.ARRAY =>
        value.asInstanceOf[java.util.Collection[_]].asScala
          .map(convert(_, s.getElementType)).toSeq
      case Schema.Type.MAP =>
        value.asInstanceOf[java.util.Map[_, _]].asScala
          .map { case (k, v) => k.toString -> convert(v, s.getValueType) }.toMap
      case Schema.Type.FLOAT | Schema.Type.DOUBLE | Schema.Type.BOOLEAN => value
      case other => throw new IllegalArgumentException(s"unsupported avro type: $other")
    }
}

/** Serializable decode closure: the schema travels as JSON and is parsed
 *  lazily once per executor (avro Schema objects are not serializable
 *  across all versions). */
private[graft] class AvroBinaryDecodeFn(schemaJson: String)
  extends UDF1[Array[Byte], Any] with Serializable {
  @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val reader = new GenericDatumReader[Any](schema)

  override def call(bytes: Array[Byte]): Any =
    if (bytes == null) null
    else {
      val dec = DecoderFactory.get().binaryDecoder(bytes, null)
      AvroDecoder.convert(reader.read(null, dec), schema)
    }
}
