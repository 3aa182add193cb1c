package graft.testdouble

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * STREAMING companion of [[GraftTestKafkaProvider]]: a DSv2 table under
 * the short name `graft-test-kafka-stream` with a MicroBatchStream
 * source (Kafka's batch read schema, records from `test.records`) and a
 * StreamingWrite sink that captures per-epoch records — so
 * `KafkaStreamReader` / `KafkaStreamWriter` run their REAL `run()`
 * (watermark plumbing, decode projection, trigger/outputMode/checkpoint
 * wiring) end-to-end offline via the `providerFormat` seam. A separate
 * provider from the V1 batch double on purpose: the real Kafka
 * connector's batch side is V1 and its streaming side DSv2, and keeping
 * the doubles split mirrors that seam exactly.
 */
object GraftTestKafkaStream {
  @volatile var lastReadOptions: Map[String, String] = Map.empty
  @volatile var lastWriteOptions: Map[String, String] = Map.empty
  @volatile var committedEpochs: List[Long] = Nil
  private val writtenBuf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
  def written: Seq[(String, String)] = writtenBuf.synchronized(writtenBuf.toList)
  def record(kv: (String, String)): Unit = writtenBuf.synchronized { writtenBuf += kv; () }
  def reset(): Unit = {
    lastReadOptions = Map.empty; lastWriteOptions = Map.empty; committedEpochs = Nil
    writtenBuf.synchronized(writtenBuf.clear())
  }
}

class GraftTestKafkaStreamProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-test-kafka-stream"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftTestKafka.readSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GraftTestKafkaStreamTable
}

private[testdouble] case class TestStreamOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[testdouble] case class TestRecordsPartition(
    records: Seq[(String, String)], topic: String) extends InputPartition

/** Rows in Kafka's batch/stream read schema as InternalRows. */
private[testdouble] class TestRecordsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TestRecordsPartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < p.records.size }
      override def get(): InternalRow = {
        val (k, v) = p.records(i)
        InternalRow(
          k.getBytes("UTF-8"), v.getBytes("UTF-8"),
          UTF8String.fromString(p.topic), 0, i.toLong,
          1700000000000000L + i * 1000000L, // micros
          0)
      }
      override def close(): Unit = ()
    }
  }
}

class GraftTestKafkaStreamTable extends Table with SupportsRead with SupportsWrite {
  override def name(): String = "graft-test-kafka-stream"
  override def schema(): StructType = GraftTestKafka.readSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ,
      TableCapability.STREAMING_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val opts = {
      val it = options.entrySet().iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    GraftTestKafkaStream.lastReadOptions = opts
    val topic = opts.getOrElse("subscribe", "test-topic")
    val recs = opts.get("test.records")
      .map(GraftTestKafka.parseRecords).getOrElse(Seq("k0" -> "v0"))
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = GraftTestKafka.readSchema
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            Array(TestRecordsPartition(recs, topic))
          override def createReaderFactory(): PartitionReaderFactory =
            new TestRecordsReaderFactory
        }
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new MicroBatchStream {
            override def initialOffset(): Offset = TestStreamOffset(0L)
            override def latestOffset(): Offset = TestStreamOffset(recs.size.toLong)
            override def deserializeOffset(json: String): Offset =
              TestStreamOffset(json.toLong)
            override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
              val s = start.asInstanceOf[TestStreamOffset].n.toInt
              val e = end.asInstanceOf[TestStreamOffset].n.toInt
              Array(TestRecordsPartition(recs.slice(s, e), topic))
            }
            override def createReaderFactory(): PartitionReaderFactory =
              new TestRecordsReaderFactory
            override def commit(end: Offset): Unit = ()
            override def stop(): Unit = ()
          }
      }
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val opts = {
      val it = info.options().entrySet().iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    GraftTestKafkaStream.lastWriteOptions = opts
    val schema = info.schema()
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite = new StreamingWrite {
          override def createStreamingWriterFactory(pInfo: PhysicalWriteInfo): StreamingDataWriterFactory =
            new TestStreamWriterFactory(schema)
          override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
            GraftTestKafkaStream.synchronized {
              GraftTestKafkaStream.committedEpochs =
                GraftTestKafkaStream.committedEpochs :+ epochId
            }
          override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
  }
}

private[testdouble] case class TestCommit() extends WriterCommitMessage

private[testdouble] class TestStreamWriterFactory(schema: StructType)
  extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] = {
    val keyIdx = schema.fieldNames.indexOf("key")
    val valIdx = schema.fieldNames.indexOf("value")
    def asString(row: InternalRow, idx: Int): String =
      if (idx < 0 || row.isNullAt(idx)) null
      else schema.fields(idx).dataType match {
        case StringType => row.getUTF8String(idx).toString
        case _ => new String(row.getBinary(idx), "UTF-8")
      }
    new DataWriter[InternalRow] {
      override def write(record: InternalRow): Unit =
        // local[n] test double: capture directly (same JVM)
        GraftTestKafkaStream.record((asString(record, keyIdx), asString(record, valIdx)))
      override def commit(): WriterCommitMessage = TestCommit()
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
  }
}
