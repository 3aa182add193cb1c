package graft.sink

import graft.core.{Actor, JobContext}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/**
 * Batch file writer for csv/json/avro/parquet/orc.
 *
 * Reference: sink/FileWriter.scala:28-57. Preserved: modes
 * overwrite/append, partitionBy, and the emptyWrite policy — `no|disabled`
 * skips the write entirely when the frame is empty; `smart|default` forces
 * an append so the directory always exists (:40-43). Persist-before-count
 * avoids recomputing the plan for the emptiness probe (:34-39).
 */
class FileWriter extends Actor {
  protected var format: String = "parquet"
  protected var writeOptions: Map[String, String] = Map.empty
  protected var mode: String = "overwrite"
  protected var partitionBy: Seq[String] = Seq.empty
  protected var uri: String = ""
  protected var view: String = ""
  protected var emptyWrite: String = "default"

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    properties.get("format").foreach(format = _)
    writeOptions ++= properties.collect { case (k, v) if k.startsWith("options.") => k.stripPrefix("options.") -> v }
    properties.get("mode").foreach { m =>
      require(Seq("overwrite", "append").contains(m), s"FileWriter: invalid mode $m")
      mode = m
    }
    properties.get("partitionBy").foreach(p => partitionBy = p.split(",").map(_.trim).toSeq)
    uri = require_(properties, "fileUri")
    view = require_(properties, "view")
    properties.get("emptyWrite").foreach(emptyWrite = _)
  }

  def sinkFormat(f: String): this.type = { format = f; this }
  def writeOption(k: String, v: String): this.type = { writeOptions += (k -> v); this }
  def writeMode(m: String): this.type = { mode = m; this }
  def partitionedBy(cols: String*): this.type = { partitionBy = cols; this }
  def fileUri(u: String): this.type = { uri = u; this }
  def sourceView(v: String): this.type = { view = v; this }

  override def inputViews: Seq[String] = if (view.nonEmpty) Seq(view) else Seq.empty

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    val df = ctx.getView(view)
    // persist only for the isEmpty-probe + write pair; release our own
    // cache afterwards (leave caller-managed caches alone)
    val (writeIt, weCached) = emptyWrite.toLowerCase match {
      case "no" | "disabled" =>
        val wasCached = df.storageLevel != StorageLevel.NONE
        if (!wasCached) df.persist(StorageLevel.MEMORY_AND_DISK)
        (!df.isEmpty, !wasCached)
      case _ => (true, false)
    }
    try {
      if (writeIt) {
        val w0 = df.write.format(format).options(writeOptions).mode(mode)
        val w = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
        w.save(uri)
      }
    } finally if (weCached) df.unpersist()
    None
  }
}

/** Write a view into a catalog table; overwrite => saveAsTable, else
 *  insertInto; optional repartition-by-columns or coalesce first
 *  (reference: sink/SqlTableWriter.scala:32-48). Also supports bucketed
 *  writes (`bucketBy.columns` + `bucketBy.numBuckets`, mirroring
 *  DeltaWriter's bucketBy, reference sink/DeltaWriter.scala:33-37): two
 *  tables bucketed+sorted on their join key co-locate, so the join plans
 *  with NO shuffle on either side — at 100 TB that turns the nightly
 *  fact-to-fact join from the dominant exchange into a local merge. */
class SqlTableWriter extends Actor {
  private var table: String = ""
  private var view: String = ""
  private var mode: String = "append"
  private var partitionBy: Seq[String] = Seq.empty
  private var numPartitions: Option[Int] = None
  private var coalesceN: Option[Int] = None
  private var bucketCols: Seq[String] = Seq.empty
  private var numBuckets: Int = 0

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    table = require_(properties, "table")
    view = require_(properties, "view")
    properties.get("mode").foreach(mode = _)
    properties.get("partitionBy").foreach(p => partitionBy = p.split(",").map(_.trim).toSeq)
    properties.get("numPartitions").foreach(n => numPartitions = Some(n.toInt))
    properties.get("coalesce").foreach(n => coalesceN = Some(n.toInt))
    properties.get("bucketBy.columns").foreach(p => bucketCols = p.split(",").map(_.trim).toSeq)
    properties.get("bucketBy.numBuckets").foreach(n => numBuckets = n.toInt)
  }

  def bucketedBy(n: Int, cols: String*): this.type = {
    numBuckets = n; bucketCols = cols; this
  }

  override def inputViews: Seq[String] = if (view.nonEmpty) Seq(view) else Seq.empty

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    var df = ctx.getView(view)
    df = (numPartitions, partitionBy) match {
      case (Some(n), cols) if cols.nonEmpty => df.repartition(n, cols.map(df.col): _*)
      case (Some(n), _) => df.repartition(n)
      case (None, cols) if cols.nonEmpty => df.repartition(cols.map(df.col): _*)
      case _ => coalesceN.fold(df)(df.coalesce)
    }
    if (bucketCols.nonEmpty && numBuckets > 0) {
      // bucketed (+sorted) writes must go through saveAsTable
      df.write.mode(mode)
        .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
        .sortBy(bucketCols.head, bucketCols.tail: _*)
        .saveAsTable(table)
    } else if (mode == "overwrite") df.write.mode("overwrite").saveAsTable(table)
    else df.write.insertInto(table)
    None
  }
}
