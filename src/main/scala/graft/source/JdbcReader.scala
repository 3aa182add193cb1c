package graft.source

import graft.core.{Actor, JobContext}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Batch JDBC table/query load.
 *
 * Reference: source/JdbcReader.scala:18-23 + common/JdbcActor.scala:22-27
 * (driver/url/dbtable required). Scale notes baked in: `partitionColumn`/
 * `lowerBound`/`upperBound`/`numPartitions` read-options give a
 * partition-parallel scan instead of a single-connection read — pass them
 * for any table that doesn't fit one executor.
 */
class JdbcReader extends Actor {
  protected var connOptions: Map[String, String] = Map.empty
  protected var readOptions: Map[String, String] = Map.empty

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    connOptions = properties.collect { case (k, v) if k.startsWith("connection.") => k.stripPrefix("connection.") -> v }
    readOptions = properties.collect { case (k, v) if k.startsWith("options.") => k.stripPrefix("options.") -> v }
    Seq("url").foreach(k => require(connOptions.contains(k) || readOptions.contains(k),
      s"JdbcReader: connection.$k required"))
    require(connOptions.contains("dbtable") || connOptions.contains("query")
      || readOptions.contains("dbtable") || readOptions.contains("query"),
      "JdbcReader: dbtable or query required")
  }

  def connection(opts: Map[String, String]): this.type = { connOptions ++= opts; this }
  def readOption(k: String, v: String): this.type = { readOptions += (k -> v); this }

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] =
    Some(spark.read.format("jdbc").options(connOptions ++ readOptions).load())
}
