package graft.testdouble

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * DSv2 STREAMING companion of [[GraftTestRowSink]]: a schema-agnostic
 * streaming sink under `graft-test-rowsink-stream` that records every
 * written row (stringified, with its epoch), the write options, the
 * schema, and the committed epochs — so `DeltaStreamWriter` /
 * `IcebergStreamWriter` (whose real sinks are DSv2 `writeStream
 * .format(...)` paths, absent offline) run their REAL `run()` e2e via
 * the `providerFormat` seam: output-mode/trigger validation, the
 * table-vs-path addressing rules, and checkpoint wiring all execute
 * against a sink that behaves like the wire one.
 */
object GraftTestRowSinkStream {
  @volatile var lastWriteOptions: Map[String, String] = Map.empty
  @volatile var lastSchema: Option[StructType] = None
  @volatile var committedEpochs: List[Long] = Nil
  private val writtenBuf = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[String])]
  /** (epochId, row values stringified in schema order; nulls as null). */
  def written: Seq[(Long, Seq[String])] = writtenBuf.synchronized(writtenBuf.toList)
  private[testdouble] def record(e: Long, row: Seq[String]): Unit =
    writtenBuf.synchronized { writtenBuf += ((e, row)); () }
  def reset(): Unit = {
    lastWriteOptions = Map.empty; lastSchema = None; committedEpochs = Nil
    writtenBuf.synchronized(writtenBuf.clear())
  }
}

class GraftTestRowSinkStreamProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-test-rowsink-stream"
  // write-only sink: schema comes from the stream being written
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GraftTestRowSinkStreamTable
}

class GraftTestRowSinkStreamTable extends Table with SupportsWrite {
  override def name(): String = "graft-test-rowsink-stream"
  override def schema(): StructType = new StructType()
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val opts = {
      val it = info.options().entrySet().iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    GraftTestRowSinkStream.lastWriteOptions = opts
    GraftTestRowSinkStream.lastSchema = Some(info.schema())
    val schema = info.schema()
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite = new StreamingWrite {
          override def createStreamingWriterFactory(p: PhysicalWriteInfo): StreamingDataWriterFactory =
            new TestRowSinkStreamWriterFactory(schema)
          override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
            GraftTestRowSinkStream.synchronized {
              GraftTestRowSinkStream.committedEpochs =
                GraftTestRowSinkStream.committedEpochs :+ epochId
            }
          override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
  }
}

private[testdouble] class TestRowSinkStreamWriterFactory(schema: StructType)
  extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      override def write(record: InternalRow): Unit = {
        // local[n] test double: capture directly (same JVM); stringify in
        // schema order so assertions are schema-agnostic
        val vals = schema.fields.zipWithIndex.map { case (f, i) =>
          if (record.isNullAt(i)) null else String.valueOf(record.get(i, f.dataType))
        }.toSeq
        GraftTestRowSinkStream.record(epochId, vals)
      }
      override def commit(): WriterCommitMessage = TestCommit()
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
