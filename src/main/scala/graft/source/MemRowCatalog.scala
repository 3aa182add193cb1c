package graft.source

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/**
 * Minimal DataSource-v2 catalog whose tables support ROW-LEVEL OPERATIONS
 * (MERGE INTO / UPDATE / DELETE) via copy-on-write: the whole table is one
 * replacement group, so Spark's GroupBasedRowLevelOperation rewrite scans
 * the table and writes back the surviving rows.
 *
 * Purpose: prove the engine's DML surface (SqlWriter's merge/update/delete
 * gate — reference: sink/SqlWriter.scala:14-21, docs/sql-actor.md) against
 * Spark's OWN rewrite plans without Delta/Iceberg jars. Storage is a
 * JVM-global map — a correctness harness for local[*] sessions, NOT a
 * distributed store: on a real cluster the same SQL runs unchanged against
 * any SupportsRowLevelOperations format (Iceberg, Delta, Paimon...).
 *
 * Register with: spark.conf.set("spark.sql.catalog.<name>",
 * classOf[MemRowCatalog].getName).
 */
object MemRowStore {
  final case class TableState(schema: StructType, rows: Vector[InternalRow])
  private val tables = TrieMap.empty[String, TableState]

  def key(catalog: String, ident: Identifier): String =
    (catalog +: ident.namespace().toSeq :+ ident.name()).mkString(".")

  def get(key: String): Option[TableState] = tables.get(key)
  def create(key: String, schema: StructType): Boolean =
    tables.putIfAbsent(key, TableState(schema, Vector.empty)).isEmpty
  def drop(key: String): Boolean = tables.remove(key).isDefined
  def rename(from: String, to: String): Unit =
    tables.remove(from).foreach(s => tables.put(to, s))
  def list(prefix: String): Seq[String] = tables.keys.filter(_.startsWith(prefix)).toSeq

  def append(key: String, rows: Seq[InternalRow]): Unit = tables.updateWith(key) {
    case Some(s) => Some(s.copy(rows = s.rows ++ rows))
    case None => throw new IllegalStateException(s"mem table $key dropped mid-write")
  }
  def replace(key: String, rows: Seq[InternalRow]): Unit = tables.updateWith(key) {
    case Some(s) => Some(s.copy(rows = rows.toVector))
    case None => throw new IllegalStateException(s"mem table $key dropped mid-write")
  }
  def rows(key: String): Array[InternalRow] =
    tables.get(key).map(_.rows.toArray).getOrElse(Array.empty)
}

class MemRowCatalog extends TableCatalog {
  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private def k(ident: Identifier): String = MemRowStore.key(catalogName, ident)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val prefix = (catalogName +: namespace.toSeq).mkString(".") + "."
    MemRowStore.list(prefix)
      .map(s => Identifier.of(namespace, s.stripPrefix(prefix)))
      .toArray
  }

  override def loadTable(ident: Identifier): Table =
    MemRowStore.get(k(ident)) match {
      case Some(state) => new MemRowTable(k(ident), state.schema)
      case None => throw new NoSuchTableException(ident.namespace().toSeq :+ ident.name())
    }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty, "MemRowCatalog tables are unpartitioned")
    if (!MemRowStore.create(k(ident), schema))
      throw new TableAlreadyExistsException(ident.namespace().toSeq :+ ident.name())
    new MemRowTable(k(ident), schema)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("ALTER TABLE is not supported by MemRowCatalog")

  override def dropTable(ident: Identifier): Boolean = MemRowStore.drop(k(ident))

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    MemRowStore.rename(k(oldIdent), k(newIdent))
}

class MemRowTable(key: String, tableSchema: StructType) extends Table
  with SupportsRead with SupportsWrite with SupportsRowLevelOperations {

  override def name(): String = key
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] = Set(
    TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
    TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScan(key, tableSchema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemWriteBuilder(key, tableSchema)

  override def newRowLevelOperationBuilder(info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new MemRowLevelOperation(key, tableSchema, info.command())
}

/** Whole-table copy-on-write: the operation's scan reads the single group
 *  (= the table) and its write REPLACES it with the surviving rows. */
class MemRowLevelOperation(key: String, schema: StructType,
                           cmd: RowLevelOperation.Command) extends RowLevelOperation {
  override def command(): RowLevelOperation.Command = cmd
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScan(key, schema)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemWriteBuilder(key, schema, replaceAll = true)
}

class MemScan(key: String, schema: StructType) extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(MemPartition(MemRowStore.rows(key)))
  override def createReaderFactory(): PartitionReaderFactory = new MemReaderFactory
}

final case class MemPartition(rows: Array[InternalRow]) extends InputPartition

class MemReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val it = partition.asInstanceOf[MemPartition].rows.iterator
      private var cur: InternalRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
}

class MemWriteBuilder(key: String, tableSchema: StructType,
                      replaceAll: Boolean = false)
  extends WriteBuilder with SupportsTruncate {
  private var doReplace = replaceAll
  override def truncate(): WriteBuilder = { doReplace = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new MemBatchWrite(key, doReplace, tableSchema)
  }
}

class MemBatchWrite(key: String, replace: Boolean,
                    tableSchema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new MemWriterFactory(tableSchema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.toSeq.flatMap(_.asInstanceOf[MemCommit].rows)
    if (replace) MemRowStore.replace(key, rows) else MemRowStore.append(key, rows)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final case class MemCommit(rows: Array[InternalRow]) extends WriterCommitMessage

class MemWriterFactory(tableSchema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // Row-level-operation writes carry Spark's synthetic marker columns
      // (__row_operation) AHEAD of the data columns, and LogicalWriteInfo
      // still reports the bare data schema — so size the projection off
      // the first physical row: the data columns are its trailing
      // tableSchema.length fields.
      import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
      private var proj: UnsafeProjection = _
      private val buf = Vector.newBuilder[InternalRow]
      override def write(record: InternalRow): Unit = {
        if (proj == null) {
          val skip = record.numFields - tableSchema.length
          require(skip >= 0, s"row narrower than table schema: ${record.numFields}")
          val refs = tableSchema.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
            BoundReference(skip + i, f.dataType, f.nullable)
          }
          proj = UnsafeProjection.create(refs)
        }
        buf += proj(record).copy()
      }
      override def commit(): WriterCommitMessage = MemCommit(buf.result().toArray)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
