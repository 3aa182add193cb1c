package graft.testdouble

import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/**
 * Generic in-process WRITE sink double — the batch half of what
 * `GraftTestKafka` does, but schema-agnostic: it records every
 * `createRelation` write call (rows, SaveMode, options, call count) so
 * any V1-`save()`-shaped connector path can be driven end-to-end with
 * no service. Closes the remaining wire-only slice from round 9:
 *  - `MongoStreamWriter` / `RedisStreamWriter`'s foreachBatch path
 *    (`batch.write.format(fmt).mode("append").save()` per micro-batch —
 *    each micro-batch lands here as one write call), and
 *  - `IcebergWriter`'s batch contract, including its
 *    sortWithinPartitions ordered-write requirement: pass
 *    `test.assertSortedBy` (comma-separated column names) and the
 *    double verifies, PER PARTITION, that rows arrive non-decreasing in
 *    those columns — exactly what an Iceberg fanout-free writer needs.
 *
 * Like the Kafka double, rows are collected on the driver (tests run
 * local[n]) so assertions stay trivial.
 */
object GraftTestRowSink {
  @volatile var lastWriteOptions: Map[String, String] = Map.empty
  @volatile var lastWriteMode: Option[SaveMode] = None
  @volatile var writeCalls: Int = 0
  @volatile var lastSchema: Option[StructType] = None
  private val rowBuf = scala.collection.mutable.ArrayBuffer.empty[Row]
  private val sortedBuf = scala.collection.mutable.ArrayBuffer.empty[Boolean]
  def written: Seq[Row] = rowBuf.synchronized(rowBuf.toList)
  /** One entry per non-empty partition of the last sorted-asserted write:
   *  was that partition non-decreasing in the `test.assertSortedBy` cols? */
  def partitionSorted: Seq[Boolean] = sortedBuf.synchronized(sortedBuf.toList)
  def reset(): Unit = {
    lastWriteOptions = Map.empty; lastWriteMode = None; writeCalls = 0
    lastSchema = None
    rowBuf.synchronized(rowBuf.clear())
    sortedBuf.synchronized(sortedBuf.clear())
  }
  private[testdouble] def record(rows: Seq[Row]): Unit =
    rowBuf.synchronized { rowBuf ++= rows; () }
  private[testdouble] def recordSorted(flags: Seq[Boolean]): Unit =
    sortedBuf.synchronized { sortedBuf ++= flags; () }
}

class GraftTestRowSinkProvider extends CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-test-rowsink"

  override def createRelation(ctx: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    GraftTestRowSink.lastWriteOptions = parameters
    GraftTestRowSink.lastWriteMode = Some(mode)
    GraftTestRowSink.writeCalls += 1
    GraftTestRowSink.lastSchema = Some(data.schema)
    parameters.get("test.assertSortedBy").foreach { colsSpec =>
      val cols = colsSpec.split(",").map(_.trim).toSeq
      val idxs = cols.map(data.schema.fieldIndex)
      // per-partition monotonicity in the declared columns — evaluated on
      // the EXECUTED partitions, so a sortWithinPartitions upstream either
      // held through the write or this records false
      val flags = data.rdd.mapPartitions { rows =>
        var ok = true
        var prev: Seq[String] = null
        var any = false
        rows.foreach { r =>
          any = true
          val cur = idxs.map(i => String.valueOf(r.get(i)))
          if (prev != null && implicitly[Ordering[Iterable[String]]].compare(cur, prev) < 0) ok = false
          prev = cur
        }
        if (any) Iterator(ok) else Iterator.empty
      }.collect().toSeq
      GraftTestRowSink.recordSorted(flags)
    }
    GraftTestRowSink.record(data.collect().toSeq)
    new BaseRelation {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = data.schema
    }
  }
}
