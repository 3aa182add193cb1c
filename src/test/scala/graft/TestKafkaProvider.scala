package graft.testdouble

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/**
 * In-process stand-in for the Kafka batch connector — same record
 * schema, same option plumbing, no broker. The offline environment has
 * no kafka-clients/server jars (docs/INTEGRATION.md:80-94 records the
 * embedded-broker probe), so the actor->options->connector path was
 * only contract-tested; this double closes the gap: `KafkaReader` /
 * `KafkaWriter` run their REAL `run()` against it via the
 * `providerFormat` property, and the assertions inspect exactly what a
 * broker would have been asked to do.
 *
 * Records for the read side come from the `test.records` option as
 * `key|value;key|value;...` (`|`-separated so JSON values keep their
 * commas); rows surface with Kafka's batch read schema (binary
 * key/value + topic/partition/offset/timestamp/timestampType), so the
 * actor's decode/flatten projection is exercised unmodified. The write
 * side captures assembled (key, value) records plus the options and
 * SaveMode the actor handed the connector.
 *
 * V1 Relation API by design: Spark's own Kafka BATCH source is a V1
 * relation (the DSv2 surface is its streaming side), so this double
 * sits behind the exact API seam the real connector uses.
 */
object GraftTestKafka {
  @volatile var lastReadOptions: Map[String, String] = Map.empty
  @volatile var lastWriteOptions: Map[String, String] = Map.empty
  @volatile var lastWriteMode: Option[SaveMode] = None
  private val writtenBuf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
  def written: Seq[(String, String)] = writtenBuf.synchronized(writtenBuf.toList)
  def record(kv: (String, String)): Unit = writtenBuf.synchronized { writtenBuf += kv; () }
  def reset(): Unit = {
    lastReadOptions = Map.empty; lastWriteOptions = Map.empty; lastWriteMode = None
    writtenBuf.synchronized(writtenBuf.clear())
  }

  /** Kafka's batch read schema, verbatim. */
  val readSchema: StructType = StructType(Seq(
    StructField("key", BinaryType), StructField("value", BinaryType),
    StructField("topic", StringType), StructField("partition", IntegerType),
    StructField("offset", LongType), StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  def parseRecords(spec: String): Seq[(String, String)] =
    spec.split(";").toSeq.filter(_.nonEmpty).map { e =>
      e.split("\\|", 2) match {
        case Array(k, v) => (k, v)
        case Array(k) => (k, "")
      }
    }
}

class GraftTestKafkaProvider extends RelationProvider
  with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-test-kafka"

  override def createRelation(ctx: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    GraftTestKafka.lastReadOptions = parameters
    val topic = parameters.getOrElse("subscribe", "test-topic")
    val recs = parameters.get("test.records")
      .map(GraftTestKafka.parseRecords).getOrElse(Seq("k0" -> "v0"))
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = GraftTestKafka.readSchema
      override def buildScan(): RDD[Row] = {
        val rows = recs.zipWithIndex.map { case ((k, v), i) =>
          Row(k.getBytes("UTF-8"), v.getBytes("UTF-8"), topic, 0, i.toLong,
            new java.sql.Timestamp(1700000000000L + i * 1000L), 0)
        }
        ctx.sparkContext.parallelize(rows, math.max(1, math.min(rows.size, 2)))
      }
    }
  }

  override def createRelation(ctx: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    GraftTestKafka.lastWriteOptions = parameters
    GraftTestKafka.lastWriteMode = Some(mode)
    val cols = data.columns
    def str(r: Row, name: String): String =
      if (!cols.contains(name)) null
      else r.getAs[Any](name) match {
        case null => null
        case b: Array[Byte] => new String(b, "UTF-8")
        case other => other.toString
      }
    // collect on the driver: the double runs under local[n] in tests, and
    // capturing through the companion keeps assertions trivial
    data.collect().foreach(r => GraftTestKafka.record((str(r, "key"), str(r, "value"))))
    new BaseRelation {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = data.schema
    }
  }
}
