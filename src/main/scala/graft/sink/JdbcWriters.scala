package graft.sink

import graft.core.{Actor, JobContext}
import graft.utils.DataframeHelper
import org.apache.spark.sql.{DataFrame, ForeachWriter, Row, SparkSession}
import java.sql.{Connection, DriverManager, PreparedStatement}

/**
 * JDBC statement templating: `@field` placeholders bound by DataFrame
 * column name, with an auto-generated INSERT when no statement is given.
 *
 * Reference: sink/process/JdbcContinuousWriter.scala:209-219 (placeholder
 * regex + auto-INSERT :216-218) and typed binds :110-185. Re-designed: the
 * template is compiled ONCE on the driver into (sql-with-?, field order),
 * serialized to executors — no per-row regex work.
 */
object JdbcTemplating {
  private val PlaceholderRe = """@([A-Za-z_][A-Za-z0-9_]*)""".r

  /** A compiled DML statement: JDBC sql text + bind order (field names;
   *  the special name `batchId` binds the streaming epoch). */
  final case class Template(sql: String, bindFields: Seq[String]) extends Serializable

  def compile(statement: String): Template = {
    val fields = PlaceholderRe.findAllMatchIn(statement).map(_.group(1)).toSeq
    Template(PlaceholderRe.replaceAllIn(statement, "?"), fields)
  }

  /** Default statement: INSERT into `table` with every frame column. */
  def autoInsert(table: String, columns: Seq[String]): Template =
    Template(
      s"INSERT INTO $table (${columns.mkString(", ")}) VALUES (${columns.map(_ => "?").mkString(", ")})",
      columns)

  /** Bind one row's values by field name (typed setX; reference
   *  JdbcContinuousWriter.scala:110-185 incl. Array support). */
  def bind(stmt: PreparedStatement, tpl: Template, row: Row, batchId: Long = -1L): Unit =
    tpl.bindFields.zipWithIndex.foreach { case (field, i) =>
      val idx = i + 1
      if (field == "batchId") stmt.setLong(idx, batchId)
      else {
        val pos = row.fieldIndex(field)
        if (row.isNullAt(pos)) stmt.setObject(idx, null)
        else row.get(pos) match {
          case v: String => stmt.setString(idx, v)
          case v: Int => stmt.setInt(idx, v)
          case v: Long => stmt.setLong(idx, v)
          case v: Short => stmt.setShort(idx, v)
          case v: Byte => stmt.setByte(idx, v)
          case v: Float => stmt.setFloat(idx, v)
          case v: Double => stmt.setDouble(idx, v)
          case v: Boolean => stmt.setBoolean(idx, v)
          case v: java.math.BigDecimal => stmt.setBigDecimal(idx, v)
          case v: BigDecimal => stmt.setBigDecimal(idx, v.bigDecimal)
          case v: java.sql.Date => stmt.setDate(idx, v)
          case v: java.sql.Timestamp => stmt.setTimestamp(idx, v)
          case v: java.time.Instant => stmt.setTimestamp(idx, java.sql.Timestamp.from(v))
          case v: java.time.LocalDate => stmt.setDate(idx, java.sql.Date.valueOf(v))
          case v: Array[Byte] => stmt.setBytes(idx, v)
          case v: scala.collection.Seq[_] =>
            // element SQL type from the column's declared schema — value
            // sniffing would degrade to VARCHAR whenever the first element
            // happens to be null (reference binds typed arrays,
            // JdbcContinuousWriter.scala:145-175)
            import org.apache.spark.sql.types._
            val declared = Option(row.schema).map(_(pos).dataType) match {
              case Some(ArrayType(et, _)) => et match {
                case IntegerType | ShortType | ByteType => Some("INTEGER")
                case LongType => Some("BIGINT")
                case FloatType | DoubleType => Some("DOUBLE")
                case BooleanType => Some("BOOLEAN")
                case StringType => Some("VARCHAR")
                case _ => None
              }
              case _ => None
            }
            val elemType = declared.getOrElse(v.find(_ != null) match {
              case Some(_: Int) | Some(_: Short) | Some(_: Byte) => "INTEGER"
              case Some(_: Long) => "BIGINT"
              case Some(_: Float) | Some(_: Double) => "DOUBLE"
              case Some(_: Boolean) => "BOOLEAN"
              case _ => "VARCHAR"
            })
            stmt.setArray(idx, stmt.getConnection.createArrayOf(elemType,
              v.map(_.asInstanceOf[AnyRef]).toArray))
          case v => stmt.setObject(idx, v)
        }
      }
    }

  def openConnection(options: Map[String, String]): Connection = {
    options.get("driver").foreach(Class.forName)
    val props = new java.util.Properties()
    options.get("user").foreach(props.setProperty("user", _))
    options.get("password").foreach(props.setProperty("password", _))
    val conn = DriverManager.getConnection(options("url"), props)
    // isolation-level negotiation with txn-support probe
    // (reference: JdbcContinuousWriter.scala:52-63)
    options.get("isolationLevel").foreach { lvl =>
      val level = lvl.toUpperCase match {
        case "NONE" => Connection.TRANSACTION_NONE
        case "READ_UNCOMMITTED" => Connection.TRANSACTION_READ_UNCOMMITTED
        case "READ_COMMITTED" => Connection.TRANSACTION_READ_COMMITTED
        case "REPEATABLE_READ" => Connection.TRANSACTION_REPEATABLE_READ
        case "SERIALIZABLE" => Connection.TRANSACTION_SERIALIZABLE
        case other => throw new IllegalArgumentException(s"bad isolationLevel: $other")
      }
      try if (conn.getMetaData.supportsTransactionIsolationLevel(level))
        conn.setTransactionIsolation(level)
      catch { case _: Exception => () }
    }
    conn
  }

  /** Write one partition's rows in `batchSize` batches with commit-per-batch
   *  when transactions are supported (reference: JdbcContinuousWriter
   *  .scala:199-202, JdbcMicroBatchWriter.scala:26-34). */
  def writePartition(rows: Iterator[Row], options: Map[String, String],
                     tpl: Template, batchSize: Int, batchId: Long = -1L): Unit = {
    if (!rows.hasNext) return // chunked filters leave empty partitions — no connection for them
    val conn = openConnection(options)
    val txn = try conn.getMetaData.supportsTransactions catch { case _: Exception => false }
    if (txn) conn.setAutoCommit(false)
    try {
      val stmt = conn.prepareStatement(tpl.sql)
      try {
        rows.grouped(batchSize).foreach { batch =>
          batch.foreach { row => bind(stmt, tpl, row, batchId); stmt.addBatch() }
          stmt.executeBatch()
          if (txn) conn.commit()
        }
      } finally stmt.close()
    } finally conn.close()
  }
}

/**
 * Batch JDBC writer; modes overwrite/append (stock Spark JDBC sink) and
 * `merge` (parameterized sink DML through the row-level path with bounded
 * connection parallelism).
 *
 * Reference: sink/JdbcWriter.scala:36-59 — merge :49, chunked save :50-54,
 * defaults ioConnections=16 / ioBatchSize=1600 from PipelineContext:111-117.
 */
class JdbcWriter extends Actor {
  protected var connOptions: Map[String, String] = Map.empty
  protected var table: String = ""
  protected var view: String = ""
  protected var mode: String = "append" // overwrite | append | merge
  protected var sinkStatement: Option[String] = None
  protected var numPartitions: Option[Int] = None
  protected var batchSize: Option[Int] = None

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    connOptions = properties.collect { case (k, v) if k.startsWith("connection.") => k.stripPrefix("connection.") -> v }
    table = properties.getOrElse("dbtable", connOptions.getOrElse("dbtable", ""))
    view = require_(properties, "view")
    properties.get("mode").foreach { m =>
      require(Seq("overwrite", "append", "merge").contains(m), s"bad mode: $m")
      mode = m
    }
    sinkStatement = properties.get("sink.sqlString")
    numPartitions = properties.get("numPartitions").map(_.toInt)
    batchSize = properties.get("batchSize").map(_.toInt)
  }

  def connection(opts: Map[String, String]): this.type = { connOptions ++= opts; this }
  def dbTable(t: String): this.type = { table = t; this }
  def sourceView(v: String): this.type = { view = v; this }
  def writeMode(m: String): this.type = { mode = m; this }
  def sinkSql(s: String): this.type = { sinkStatement = Some(s); this }

  override def inputViews: Seq[String] = if (view.nonEmpty) Seq(view) else Seq.empty

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    val df = ctx.getView(view)
    mode match {
      case "overwrite" | "append" =>
        df.write.format("jdbc")
          .options(connOptions ++ Map("dbtable" -> table))
          .mode(mode).save()
      case "merge" =>
        val tpl = sinkStatement.map(JdbcTemplating.compile)
          .getOrElse(JdbcTemplating.autoInsert(table, df.columns.toSeq))
        val conns = numPartitions.getOrElse(ctx.pipelineCtx.ioConnections)
        val batch = batchSize.getOrElse(ctx.pipelineCtx.ioBatchSize)
        val opts = connOptions
        // cap concurrent connections: split into chunks of <= conns
        // partitions, written sequentially (reference :50-54). The frame is
        // persisted first: each chunk is a separate job over the same plan,
        // and an unpersisted re-evaluation could re-bucket rows (AQE /
        // indeterminate-stage rerun), writing a row into two chunks or none
        // — besides costing one full recompute per chunk.
        val chunks = DataframeHelper.split(df, conns)
        val needPersist = chunks.lengthCompare(1) > 0 &&
          df.storageLevel == org.apache.spark.storage.StorageLevel.NONE
        if (needPersist) df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try chunks.foreach { chunk =>
          chunk.rdd.foreachPartition { rows =>
            JdbcTemplating.writePartition(rows, opts, tpl, batch)
          }
        } finally if (needPersist) df.unpersist()
    }
    None
  }
}

/** ForeachWriter running one compiled DML per row batch, for continuous
 *  streaming writes (reference: sink/process/JdbcContinuousWriter.scala). */
class JdbcContinuousWriter(options: Map[String, String], tpl: JdbcTemplating.Template,
                           batchSize: Int) extends ForeachWriter[Row] {
  @transient private var conn: Connection = _
  @transient private var stmt: PreparedStatement = _
  @transient private var pending: Int = 0
  @transient private var txn: Boolean = false
  private var batchId: Long = -1L

  override def open(partitionId: Long, epochId: Long): Boolean = {
    conn = JdbcTemplating.openConnection(options)
    txn = try conn.getMetaData.supportsTransactions catch { case _: Exception => false }
    if (txn) conn.setAutoCommit(false)
    stmt = conn.prepareStatement(tpl.sql)
    batchId = epochId
    pending = 0
    true
  }

  override def process(row: Row): Unit = {
    JdbcTemplating.bind(stmt, tpl, row, batchId)
    stmt.addBatch()
    pending += 1
    if (pending >= batchSize) flush()
  }

  private def flush(): Unit = if (pending > 0) {
    stmt.executeBatch()
    if (txn) conn.commit()
    pending = 0
  }

  override def close(errorOrNull: Throwable): Unit =
    // flush may throw — the connection must still be released
    try if (stmt != null) { flush(); stmt.close() }
    finally if (conn != null) conn.close()
}

/**
 * Streaming JDBC writer: continuous trigger => per-row ForeachWriter;
 * otherwise foreachBatch micro-batches through the same templating engine.
 * Reference: sink/JdbcStreamWriter.scala:60-87.
 */
class JdbcStreamWriter extends Actor with graft.streaming.StreamWriteSupport {
  protected var connOptions: Map[String, String] = Map.empty
  protected var view: String = ""
  protected var sinkStatement: String = ""
  protected var numPartitions: Option[Int] = None
  protected var batchSize: Option[Int] = None

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    connOptions = properties.collect { case (k, v) if k.startsWith("connection.") => k.stripPrefix("connection.") -> v }
    view = require_(properties, "view")
    sinkStatement = require_(properties, "sink.sqlString")
    numPartitions = properties.get("numPartitions").map(_.toInt)
    batchSize = properties.get("batchSize").map(_.toInt)
    initStreamWrite(properties)
  }

  def connection(opts: Map[String, String]): this.type = { connOptions ++= opts; this }
  def sourceView(v: String): this.type = { view = v; this }
  def sinkSql(s: String): this.type = { sinkStatement = s; this }

  override def inputViews: Seq[String] = if (view.nonEmpty) Seq(view) else Seq.empty

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    val df = ctx.getView(view)
    require(df.isStreaming, s"JdbcStreamWriter: view '$view' is not a stream")
    val tpl = JdbcTemplating.compile(sinkStatement)
    val batch = batchSize.getOrElse(ctx.pipelineCtx.ioBatchSize)
    val conns = numPartitions.getOrElse(ctx.pipelineCtx.ioConnections)
    val opts = connOptions
    var w = triggerMode match {
      case Some("continuous") =>
        df.writeStream.outputMode(outputMode)
          .foreach(new JdbcContinuousWriter(opts, tpl, batch))
      case _ =>
        df.writeStream.outputMode(outputMode).foreachBatch { (batchDf: DataFrame, batchId: Long) =>
          // persist before multi-chunk writes — see the batch merge path
          val chunks = DataframeHelper.split(batchDf, conns)
          val needPersist = chunks.lengthCompare(1) > 0 &&
            batchDf.storageLevel == org.apache.spark.storage.StorageLevel.NONE
          if (needPersist) batchDf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try chunks.foreach { chunk =>
            chunk.rdd.foreachPartition { rows =>
              JdbcTemplating.writePartition(rows, opts, tpl, batch, batchId)
            }
          } finally if (needPersist) batchDf.unpersist()
        }
    }
    checkpointLocation.foreach(c => w = w.option("checkpointLocation", c))
    startAndWait(applyTrigger(w))
    None
  }
}
