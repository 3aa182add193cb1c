package graft.sink

import graft.core.{Actor, JobContext}
import graft.source.{HBaseChannel, HBaseMapping}
import graft.streaming.StreamWriteSupport
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Streaming HBase writer: continuous => per-partition ForeachWriter with
 * broadcast connection properties; otherwise foreachBatch micro-batches
 * through the same put path (reference: sink/HBaseStreamWriter.scala:28-52).
 */
class HBaseStreamWriter(channel: HBaseChannel) extends Actor with StreamWriteSupport {
  def this() = this(HBaseChannel.Unavailable)
  protected var table: String = ""
  protected var view: String = ""
  protected var mapping: Seq[HBaseMapping.ColumnMap] = Seq.empty
  protected var rowKeyFrom: Seq[String] = Seq.empty
  protected var concatenator: String = "&"
  protected var batchSize: Option[Int] = None

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    table = require_(properties, "table")
    view = require_(properties, "view")
    mapping = HBaseMapping.parse(properties)
    properties.get("rowKey.from").foreach(v => rowKeyFrom = v.split(",").map(_.trim).toSeq)
    properties.get("rowKey.concatenator").foreach(concatenator = _)
    batchSize = properties.get("batchSize").map(_.toInt)
    initStreamWrite(properties)
  }

  override def inputViews: Seq[String] = if (view.nonEmpty) Seq(view) else Seq.empty

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    val df = ctx.getView(view)
    require(df.isStreaming, s"HBaseStreamWriter: view '$view' is not a stream")
    val ch = channel
    // token captured on the driver at stream start and shipped with every
    // micro-batch task; long-running secured streams should use a channel
    // whose obtainToken() renews (delegation tokens expire)
    val token = channel.obtainToken()
    val m = mapping
    val bs = batchSize.getOrElse(ctx.pipelineCtx.ioBatchSize)
    val tbl = table
    val keyCols = rowKeyFrom
    val sep = concatenator
    if (triggerMode.contains("continuous")) {
      // continuous trigger cannot use foreachBatch — per-partition
      // ForeachWriter with the same channel put path (reference:
      // sink/process/HBaseContinuousWriter.scala)
      val withKey = df.withColumn("__rowkey_", HBaseMapping.rowKeyColumn(df, keyCols, sep))
      val keyIdx = withKey.columns.indexOf("__rowkey_")
      val writer = new org.apache.spark.sql.ForeachWriter[org.apache.spark.sql.Row] {
        @transient private var buf: scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row] = _
        override def open(partitionId: Long, epochId: Long): Boolean = {
          token.foreach(ch.installToken)
          buf = scala.collection.mutable.ArrayBuffer.empty
          true
        }
        override def process(row: org.apache.spark.sql.Row): Unit = {
          buf += row
          if (buf.size >= bs) flush()
        }
        override def close(errorOrNull: Throwable): Unit =
          if (errorOrNull == null) flush()
        private def flush(): Unit = if (buf.nonEmpty) {
          ch.put(tbl, buf.iterator, keyIdx, m, bs)
          buf.clear()
        }
      }
      var w = withKey.writeStream.outputMode(outputMode).foreach(writer)
      checkpointLocation.foreach(c => w = w.option("checkpointLocation", c))
      startAndWait(applyTrigger(w))
    } else {
      var w = df.writeStream.outputMode(outputMode).foreachBatch { (batch: DataFrame, _: Long) =>
        val withKey = batch.withColumn("__rowkey_", HBaseMapping.rowKeyColumn(batch, keyCols, sep))
        val keyIdx = withKey.columns.indexOf("__rowkey_")
        withKey.rdd.foreachPartition { rows =>
          token.foreach(ch.installToken)
          ch.put(tbl, rows, keyIdx, m, bs)
        }
      }
      checkpointLocation.foreach(c => w = w.option("checkpointLocation", c))
      startAndWait(applyTrigger(w))
    }
    None
  }
}

/**
 * Streaming Mongo/Redis writers: foreachBatch append with mandatory
 * checkpoint (reference: sink/MongoStreamWriter.scala:43-78,
 * RedisStreamWriter.scala:45-79).
 */
abstract class ForeachBatchConnectorStreamWriter(format: String) extends Actor with StreamWriteSupport {
  protected var view: String = ""
  // advanced: substitute a wire-compatible provider name (test double /
  // vendor fork); the foreachBatch/checkpoint semantics stay the actor's
  protected var providerFormat: String = format
  protected var options: Map[String, String] = Map.empty

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    view = require_(properties, "view")
    properties.get("providerFormat").foreach(providerFormat = _)
    options = properties.collect { case (k, v) if k.startsWith("options.") => k.stripPrefix("options.") -> v }
    initStreamWrite(properties)
    require(checkpointLocation.isDefined,
      s"$format stream writer: options.checkpointLocation is mandatory")
  }

  def sourceView(v: String): this.type = { view = v; this }
  def writeOption(k: String, v: String): this.type = { options += (k -> v); this }

  override def inputViews: Seq[String] = if (view.nonEmpty) Seq(view) else Seq.empty

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    val df = ctx.getView(view)
    require(df.isStreaming, s"$format stream writer: view '$view' is not a stream")
    val fmt = providerFormat
    val opts = options
    var w = df.writeStream.outputMode(outputMode).foreachBatch { (batch: DataFrame, _: Long) =>
      batch.write.format(fmt).options(opts).mode("append").save()
    }
    checkpointLocation.foreach(c => w = w.option("checkpointLocation", c))
    startAndWait(applyTrigger(w))
    None
  }
}

class MongoStreamWriter extends ForeachBatchConnectorStreamWriter("mongodb")
class RedisStreamWriter extends ForeachBatchConnectorStreamWriter("org.apache.spark.sql.redis")
