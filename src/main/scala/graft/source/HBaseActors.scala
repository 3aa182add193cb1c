package graft.source

import graft.core.{Actor, JobContext}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/**
 * HBase actor family. The hbase-client jars are not on this offline
 * classpath, so the wire layer is an SPI ([[HBaseChannel]]) with the pure
 * logic — column mapping `col <- family:qualifier`, rowkey assembly from
 * concatenated columns, scan-range spec — implemented and unit-testable.
 *
 * Reference: source/HBaseReader.scala:30-37 (scan + mapping),
 * common/io/HBaseChannel.scala:53-84 (key/time ranges), sink/HBaseWriter
 * .scala:20-34 + common/HBaseWriteActor.scala:71-76 (rowkey from columns
 * with configurable concatenator, or generated UUID).
 */
object HBaseMapping {
  /** `dfCol -> family:qualifier` mapping entries. */
  final case class ColumnMap(column: String, family: String, qualifier: String)

  def parse(properties: Map[String, String], prefix: String = "columns."): Seq[ColumnMap] =
    properties.collect {
      case (k, v) if k.startsWith(prefix) =>
        val column = k.stripPrefix(prefix)
        v.split(":", 2) match {
          case Array(f, q) => ColumnMap(column, f, q)
          case _ => throw new IllegalArgumentException(s"bad hbase column mapping: $k=$v")
        }
    }.toSeq

  /** Scan bounds (reference: HBaseChannel.scala:58-70). */
  final case class ScanSpec(keyStart: Option[String], keyStop: Option[String],
                            keyPrefix: Option[String],
                            tsStart: Option[Long], tsStop: Option[Long])

  def scanSpec(properties: Map[String, String]): ScanSpec = ScanSpec(
    properties.get("scan.keyStart"), properties.get("scan.keyStop"),
    properties.get("scan.keyPrefix"),
    properties.get("scan.timeStart").map(_.toLong), properties.get("scan.timeStop").map(_.toLong))

  /** Rowkey column: concatenation of `from` columns with a configurable
   *  separator, or a deterministic-per-row generated key when absent
   *  (reference uses UUID; we derive from a uuid() expression). */
  def rowKeyColumn(df: DataFrame, fromCols: Seq[String], concatenator: String): org.apache.spark.sql.Column =
    if (fromCols.nonEmpty) concat_ws(concatenator, fromCols.map(c => df(c).cast("string")): _*)
    else expr("uuid()")
}

/** Wire-layer SPI: implement against hbase-client when the jars exist. */
trait HBaseChannel extends Serializable {
  def scan(table: String, spec: HBaseMapping.ScanSpec,
           mapping: Seq[HBaseMapping.ColumnMap])(implicit spark: SparkSession): DataFrame
  def put(table: String, rows: Iterator[Row], rowKeyIdx: Int,
          mapping: Seq[HBaseMapping.ColumnMap], batchSize: Int): Unit
  def truncate(table: String): Unit

  /**
   * DRIVER-side: obtain a serialized (URL-safe) authentication/delegation
   * token for this cluster, to be shipped to executors with the write.
   * None on unsecured clusters (the default). A Kerberos-secured
   * hbase-client implementation obtains the delegation token from an
   * open connection and encodes it — executors cannot kinit themselves,
   * so without this capture the first secured-cluster write fails.
   * Reference behavior: common/HBaseWriteActor.scala:48-57.
   */
  def obtainToken(): Option[String] = None

  /**
   * EXECUTOR-side: install a previously captured token into the current
   * user's security context before opening any connection in this task.
   * Idempotent per process. Reference behavior:
   * sink/process/HBaseContinuousWriter.scala:29-34.
   */
  def installToken(token: String): Unit = ()
}

object HBaseChannel {
  /** Default channel: raises until real hbase jars + impl are provided. */
  object Unavailable extends HBaseChannel {
    private def nope = throw new UnsupportedOperationException(
      "hbase-client is not on this classpath; provide an HBaseChannel implementation")
    def scan(table: String, spec: HBaseMapping.ScanSpec,
             mapping: Seq[HBaseMapping.ColumnMap])(implicit spark: SparkSession): DataFrame = nope
    def put(table: String, rows: Iterator[Row], rowKeyIdx: Int,
            mapping: Seq[HBaseMapping.ColumnMap], batchSize: Int): Unit = nope
    def truncate(table: String): Unit = nope
  }
}

/** HBase scan -> DataFrame (reference: source/HBaseReader.scala:30-37). */
class HBaseReader(channel: HBaseChannel) extends Actor {
  def this() = this(HBaseChannel.Unavailable) // reflective construction
  protected var table: String = ""
  protected var mapping: Seq[HBaseMapping.ColumnMap] = Seq.empty
  protected var spec: HBaseMapping.ScanSpec = HBaseMapping.ScanSpec(None, None, None, None, None)

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    table = require_(properties, "table")
    mapping = HBaseMapping.parse(properties)
    spec = HBaseMapping.scanSpec(properties)
  }

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] =
    Some(channel.scan(table, spec, mapping))
}

/** HBase batch writer: modes overwrite (truncate first) / merge; rowkey
 *  from columns or generated (reference: sink/HBaseWriter.scala:20-34). */
class HBaseWriter(channel: HBaseChannel) extends Actor {
  def this() = this(HBaseChannel.Unavailable) // reflective construction
  protected var table: String = ""
  protected var view: String = ""
  protected var mode: String = "merge" // overwrite | merge
  protected var mapping: Seq[HBaseMapping.ColumnMap] = Seq.empty
  protected var rowKeyFrom: Seq[String] = Seq.empty
  protected var concatenator: String = "&"
  protected var batchSize: Option[Int] = None

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    table = require_(properties, "table")
    view = require_(properties, "view")
    properties.get("mode").foreach { m =>
      require(Seq("overwrite", "merge").contains(m), s"HBaseWriter: bad mode $m")
      mode = m
    }
    mapping = HBaseMapping.parse(properties)
    properties.get("rowKey.from").foreach(v => rowKeyFrom = v.split(",").map(_.trim).toSeq)
    properties.get("rowKey.concatenator").foreach(concatenator = _)
    batchSize = properties.get("batchSize").map(_.toInt)
  }

  override def inputViews: Seq[String] = if (view.nonEmpty) Seq(view) else Seq.empty

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    val df = ctx.getView(view)
    // capture the security token ON THE DRIVER (the only place with a
    // Kerberos TGT), then ship it inside the task closure — executors
    // install it before their first put
    val token = channel.obtainToken()
    if (mode == "overwrite") channel.truncate(table)
    val withKey = df.withColumn("__rowkey_", HBaseMapping.rowKeyColumn(df, rowKeyFrom, concatenator))
    val keyIdx = withKey.columns.indexOf("__rowkey_")
    val m = mapping
    val ch = channel
    val bs = batchSize.getOrElse(ctx.pipelineCtx.ioBatchSize)
    val tbl = table
    withKey.rdd.foreachPartition { rows =>
      token.foreach(ch.installToken)
      ch.put(tbl, rows, keyIdx, m, bs)
    }
    None
  }
}
