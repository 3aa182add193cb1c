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

  sealed trait RenameResult
  case object Renamed extends RenameResult
  case object NoSource extends RenameResult
  case object TargetExists extends RenameResult

  // Every mutation holds the same monitor: rename is a cross-key
  // check-then-act, so a create/drop racing it through unsynchronized
  // TrieMap ops could still clobber the target (or crash the source
  // lookup) even with rename itself locked. Reads stay lock-free.
  def get(key: String): Option[TableState] = tables.get(key)
  def create(key: String, schema: StructType): Boolean = tables.synchronized {
    tables.putIfAbsent(key, TableState(schema, Vector.empty)).isEmpty
  }
  def drop(key: String): Boolean = tables.synchronized { tables.remove(key).isDefined }
  def rename(from: String, to: String): RenameResult = tables.synchronized {
    if (!tables.contains(from)) NoSource
    else if (tables.contains(to)) TargetExists
    else { tables.put(to, tables.remove(from).get); Renamed }
  }
  def list(prefix: String): Seq[String] = tables.keys.filter(_.startsWith(prefix)).toSeq

  def append(key: String, rows: Seq[InternalRow]): Unit = tables.synchronized {
    tables.updateWith(key) {
      case Some(s) => Some(s.copy(rows = s.rows ++ rows))
      case None => throw new IllegalStateException(s"mem table $key dropped mid-write")
    }
  }
  def replace(key: String, rows: Seq[InternalRow]): Unit = tables.synchronized {
    tables.updateWith(key) {
      case Some(s) => Some(s.copy(rows = rows.toVector))
      case None => throw new IllegalStateException(s"mem table $key dropped mid-write")
    }
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
    // TableCatalog contract: renaming a missing table must raise, and the
    // target must not already exist — a silent no-op would let
    // ALTER TABLE ... RENAME report success on a table that isn't there.
    MemRowStore.rename(k(oldIdent), k(newIdent)) match {
      case MemRowStore.Renamed => ()
      case MemRowStore.NoSource => throw new NoSuchTableException(oldIdent)
      case MemRowStore.TargetExists => throw new TableAlreadyExistsException(newIdent)
    }
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
    new MemWriteBuilder(key, tableSchema, info.schema())

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
    new MemWriteBuilder(key, schema, info.schema(), replaceAll = true)
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
                      writeSchema: StructType,
                      replaceAll: Boolean = false)
  extends WriteBuilder with SupportsTruncate {
  private var doReplace = replaceAll
  override def truncate(): WriteBuilder = { doReplace = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new MemBatchWrite(key, doReplace, tableSchema, writeSchema)
  }
}

class MemBatchWrite(key: String, replace: Boolean,
                    tableSchema: StructType,
                    writeSchema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new MemWriterFactory(tableSchema, writeSchema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.toSeq.flatMap(_.asInstanceOf[MemCommit].rows)
    if (replace) MemRowStore.replace(key, rows) else MemRowStore.append(key, rows)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final case class MemCommit(rows: Array[InternalRow]) extends WriterCommitMessage

class MemWriterFactory(tableSchema: StructType,
                       writeSchema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // Row-level-operation writes carry Spark's synthetic marker columns
      // (__row_operation) AHEAD of the data columns, while
      // LogicalWriteInfo.schema() still reports the bare data schema.
      // Binding order: (1) row width == table width → identity;
      // (2) row width == logical write schema width and every table
      // column appears there by name (type-checked) → bind by name, which
      // stays correct even if a Spark version moves metadata columns
      // after the data; (3) otherwise fall back to the verified
      // markers-leading layout. Rows must keep one width for the whole
      // task — a mid-stream change would misproject silently.
      import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
      private var proj: UnsafeProjection = _
      private var boundWidth = -1
      private val buf = Vector.newBuilder[InternalRow]

      // Case-INSENSITIVE name lookup (Spark resolves columns that way by
      // default): each table column must match exactly one write-schema
      // field, with the same data type — otherwise name binding is
      // ambiguous and the caller falls back to the positional layout.
      private lazy val nameBinding: Option[IndexedSeq[Int]] = {
        val byLower = writeSchema.fields.zipWithIndex.groupBy(_._1.name.toLowerCase)
        val hits = tableSchema.fields.toIndexedSeq.map { f =>
          byLower.get(f.name.toLowerCase) match {
            case Some(Array((wf, i))) if wf.dataType == f.dataType => Some(i)
            case _ => None
          }
        }
        if (hits.forall(_.isDefined)) Some(hits.map(_.get)) else None
      }

      private def bind(width: Int): UnsafeProjection = {
        val ordinals: IndexedSeq[Int] =
          if (width == tableSchema.length) {
            tableSchema.indices
          } else if (width == writeSchema.length) {
            // the logical write schema explains this row width, so name
            // binding MUST succeed — falling back to positional guessing
            // here could silently misproject a name-permuted layout
            nameBinding.getOrElse(throw new IllegalArgumentException(
              s"write schema $writeSchema does not bind to table schema " +
                s"$tableSchema by name (missing, ambiguous, or type-mismatched columns)"))
          } else {
            val skip = width - tableSchema.length
            require(skip >= 0,
              s"physical row ($width fields) narrower than table schema (${tableSchema.length}) " +
                s"and not explained by the logical write schema (${writeSchema.length})")
            (0 until tableSchema.length).map(_ + skip)
          }
        UnsafeProjection.create(tableSchema.fields.toIndexedSeq.zip(ordinals).map {
          case (f, i) => BoundReference(i, f.dataType, f.nullable)
        })
      }

      override def write(record: InternalRow): Unit = {
        if (proj == null) { boundWidth = record.numFields; proj = bind(boundWidth) }
        else require(record.numFields == boundWidth,
          s"row width changed mid-write: ${record.numFields} != $boundWidth")
        buf += proj(record).copy()
      }
      override def commit(): WriterCommitMessage = MemCommit(buf.result().toArray)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
