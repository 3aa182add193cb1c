package graft

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import graft.functions.AvroDecoder
import graft.source.KafkaSchema
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end Avro decode on the avro-core fallback path: records are
 *  encoded with the vanilla Avro runtime (exactly what a Kafka producer
 *  does) and decoded through the engine's column decoder. */
class AvroDecoderSpec extends SparkSpec {

  private val schemaJson =
    """{
      |  "type": "record", "name": "event", "fields": [
      |    {"name": "id", "type": "long"},
      |    {"name": "name", "type": "string"},
      |    {"name": "score", "type": "double"},
      |    {"name": "active", "type": "boolean"},
      |    {"name": "maybe", "type": ["null", "string"], "default": null},
      |    {"name": "kind", "type": {"type": "enum", "name": "kinds", "symbols": ["A", "B"]}},
      |    {"name": "payload", "type": "bytes"},
      |    {"name": "amount", "type": {"type": "bytes", "logicalType": "decimal", "precision": 10, "scale": 2}},
      |    {"name": "day", "type": {"type": "int", "logicalType": "date"}},
      |    {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
      |    {"name": "tags", "type": {"type": "array", "items": "int"}},
      |    {"name": "attrs", "type": {"type": "map", "values": "long"}},
      |    {"name": "inner", "type": {"type": "record", "name": "inner_r", "fields": [
      |      {"name": "x", "type": "int"}, {"name": "y", "type": ["null", "double"], "default": null}]}}
      |  ]
      |}""".stripMargin

  private val schema = new Schema.Parser().parse(schemaJson)

  private def encode(fill: GenericRecord => Unit): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    fill(rec)
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  test("avro-core decode: every supported shape round-trips") {
    import spark.implicits._
    val inner = new GenericData.Record(schema.getField("inner").schema())
    inner.put("x", 7)
    inner.put("y", 2.5d)
    val bytes = encode { r =>
      r.put("id", 42L)
      r.put("name", "doc-42")
      r.put("score", 0.25d)
      r.put("active", true)
      r.put("maybe", "present")
      r.put("kind", new GenericData.EnumSymbol(schema.getField("kind").schema(), "B"))
      r.put("payload", ByteBuffer.wrap(Array[Byte](1, 2, 3)))
      r.put("amount", ByteBuffer.wrap(new java.math.BigDecimal("1234.56").unscaledValue().toByteArray))
      r.put("day", 19000) // 2022-01-08
      r.put("ts", 1700000000000000L)
      r.put("tags", java.util.List.of(3, 1, 4))
      r.put("attrs", java.util.Map.of("a", 1L, "b", 2L))
      r.put("inner", inner)
    }
    val df = Seq(Tuple1(bytes)).toDF("value")
      .select(AvroDecoder.decode(col("value"), schemaJson).as("v"))
      .select("v.*")

    val t = df.schema
    t("id").dataType shouldBe LongType
    t("maybe").dataType shouldBe StringType
    t("maybe").nullable shouldBe true
    t("amount").dataType shouldBe DecimalType(10, 2)
    t("day").dataType shouldBe DateType
    t("ts").dataType shouldBe TimestampType
    t("tags").dataType shouldBe ArrayType(IntegerType, containsNull = false)
    t("attrs").dataType shouldBe MapType(StringType, LongType, valueContainsNull = false)
    t("inner").dataType shouldBe StructType(Seq(
      StructField("x", IntegerType, nullable = false),
      StructField("y", DoubleType, nullable = true)))

    val row = df.collect().head
    row.getAs[Long]("id") shouldBe 42L
    row.getAs[String]("name") shouldBe "doc-42"
    row.getAs[Double]("score") shouldBe 0.25d
    row.getAs[Boolean]("active") shouldBe true
    row.getAs[String]("maybe") shouldBe "present"
    row.getAs[String]("kind") shouldBe "B"
    row.getAs[Array[Byte]]("payload").toSeq shouldBe Seq[Byte](1, 2, 3)
    row.getAs[java.math.BigDecimal]("amount") shouldBe new java.math.BigDecimal("1234.56")
    row.getAs[java.sql.Date]("day").toLocalDate shouldBe java.time.LocalDate.ofEpochDay(19000)
    row.getAs[java.sql.Timestamp]("ts").toInstant.toEpochMilli shouldBe 1700000000000L
    row.getAs[Seq[Int]]("tags") shouldBe Seq(3, 1, 4)
    row.getAs[Map[String, Long]]("attrs") shouldBe Map("a" -> 1L, "b" -> 2L)
    val in = row.getAs[org.apache.spark.sql.Row]("inner")
    in.getInt(0) shouldBe 7
    in.getDouble(1) shouldBe 2.5d
  }

  test("null union branch and null input bytes decode to nulls") {
    import spark.implicits._
    val bytes = encode { r =>
      r.put("id", 1L); r.put("name", "n"); r.put("score", 0d); r.put("active", false)
      r.put("maybe", null)
      r.put("kind", new GenericData.EnumSymbol(schema.getField("kind").schema(), "A"))
      r.put("payload", ByteBuffer.wrap(Array.emptyByteArray))
      r.put("amount", ByteBuffer.wrap(java.math.BigInteger.ZERO.toByteArray))
      r.put("day", 0); r.put("ts", 0L)
      r.put("tags", java.util.List.of())
      r.put("attrs", java.util.Map.of())
      val in2 = new GenericData.Record(schema.getField("inner").schema())
      in2.put("x", 0); in2.put("y", null)
      r.put("inner", in2)
    }
    val df = Seq(Tuple1(bytes), Tuple1(null.asInstanceOf[Array[Byte]])).toDF("value")
      .select(AvroDecoder.decode(col("value"), schemaJson).as("v"))
    val rows = df.collect()
    val decoded = rows.map(_.getAs[org.apache.spark.sql.Row]("v"))
    val present = decoded.filter(_ != null)
    present.length shouldBe 1
    present.head.getAs[String]("maybe") shouldBe null
    decoded.count(_ == null) shouldBe 1
  }

  test("reflective spark-avro gate: absent on this classpath, fallback engages") {
    AvroDecoder.viaSparkAvro(col("value"), schemaJson) shouldBe None
    // decode still resolves through avro-core
    AvroDecoder.decode(col("value"), schemaJson).toString should include("UDF")
  }

  test("multi-branch non-null unions are rejected with guidance") {
    val bad = """{"type":"record","name":"r","fields":[{"name":"u","type":["int","string"]}]}"""
    val ex = intercept[IllegalArgumentException](
      AvroDecoder.sparkTypeFor(new Schema.Parser().parse(bad)))
    ex.getMessage should include("union")
  }

  test("kafka end-to-end: avro value spec decodes and flattens through project") {
    import spark.implicits._
    val simpleJson =
      """{"type":"record","name":"v","fields":[
        |{"name":"user_id","type":"long"},{"name":"city","type":"string"}]}""".stripMargin
    val simple = new Schema.Parser().parse(simpleJson)
    def enc(id: Long, city: String): Array[Byte] = {
      val rec = new GenericData.Record(simple)
      rec.put("user_id", id); rec.put("city", city)
      val out = new ByteArrayOutputStream()
      val e = EncoderFactory.get().binaryEncoder(out, null)
      new GenericDatumWriter[GenericRecord](simple).write(rec, e)
      e.flush(); out.toByteArray
    }
    val raw = Seq(
      (Array[Byte](107), enc(7L, "x"), "t", 0, 42L),
      (Array[Byte](108), enc(8L, "y"), "t", 0, 43L)
    ).toDF("key", "value", "topic", "partition", "offset")
    val spec = KafkaSchema.fromProperties("valueSchema",
      Map("valueSchema.avroSchemaString" -> simpleJson))
    val out = KafkaSchema.project(raw, KafkaSchema.NoSpec, spec)
    out.columns should contain allOf ("user_id", "city", "__kafka_key", "__kafka_topic")
    out.filter("user_id = 8").select("city").collect().head.getString(0) shouldBe "y"
  }
}
