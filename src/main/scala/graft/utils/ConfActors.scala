package graft.utils

import graft.core.{Actor, JobContext}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Set Spark/Hadoop configuration mid-pipeline; publishes no view.
 * Reference: common/SparkConfActor.scala:22-26.
 */
class SparkConfActor extends Actor {
  private var sparkConfs: Map[String, String] = Map.empty
  private var hadoopConfs: Map[String, String] = Map.empty

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    sparkConfs = properties.collect { case (k, v) if k.startsWith("configs.") => k.stripPrefix("configs.") -> v }
    hadoopConfs = properties.collect { case (k, v) if k.startsWith("hadoopConfigs.") => k.stripPrefix("hadoopConfigs.") -> v }
  }

  def sparkConf(k: String, v: String): this.type = { sparkConfs += (k -> v); this }
  def hadoopConf(k: String, v: String): this.type = { hadoopConfs += (k -> v); this }

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    sparkConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    hadoopConfs.foreach { case (k, v) => spark.sparkContext.hadoopConfiguration.set(k, v) }
    None
  }
}

/**
 * Declare pipeline variables mid-job; later actors see them via
 * `${var}` resolution. Reference: common/VariableSetter.scala:9-28.
 */
class VariableSetter extends Actor {
  private var vars: Map[String, String] = Map.empty

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    vars = properties.collect { case (k, v) if k.startsWith("variables.") => k.stripPrefix("variables.") -> v }
  }

  def variable(k: String, v: String): this.type = { vars += (k -> v); this }

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    ctx.setVariables(vars)
    None
  }
}
