package graft

import java.util.concurrent.atomic.AtomicInteger
import graft.core.{JobContext, PipelineContext}
import graft.source.{HBaseChannel, HBaseMapping, HBaseWriter}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/**
 * Proves the Kerberos-token write path without hbase-client: a mock
 * channel captures a token on the driver, and every executor task must
 * install that token BEFORE its first put. local[*] shares one JVM, so
 * static state observes both sides.
 */
object RecordingChannel {
  val obtained = new AtomicInteger(0)
  val installs = new AtomicInteger(0)
  val putsWithToken = new AtomicInteger(0)
  val putsWithoutToken = new AtomicInteger(0)
  val rowsPut = new AtomicInteger(0)
  // ThreadLocal: a put sees the token only if ITS task installed it first
  val installedInThread = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }
  def reset(): Unit = {
    obtained.set(0); installs.set(0)
    putsWithToken.set(0); putsWithoutToken.set(0); rowsPut.set(0)
  }
}

class RecordingChannel(secured: Boolean) extends HBaseChannel {
  def scan(table: String, spec: HBaseMapping.ScanSpec,
           mapping: Seq[HBaseMapping.ColumnMap])(implicit spark: SparkSession): DataFrame =
    throw new UnsupportedOperationException("not used")
  def truncate(table: String): Unit = ()
  override def obtainToken(): Option[String] = {
    RecordingChannel.obtained.incrementAndGet()
    if (secured) Some("mock-delegation-token") else None
  }
  override def installToken(token: String): Unit = {
    require(token == "mock-delegation-token", s"unexpected token $token")
    RecordingChannel.installs.incrementAndGet()
    RecordingChannel.installedInThread.set(true)
  }
  def put(table: String, rows: Iterator[Row], rowKeyIdx: Int,
          mapping: Seq[HBaseMapping.ColumnMap], batchSize: Int): Unit = {
    if (RecordingChannel.installedInThread.get()) RecordingChannel.putsWithToken.incrementAndGet()
    else RecordingChannel.putsWithoutToken.incrementAndGet()
    RecordingChannel.installedInThread.set(false)
    RecordingChannel.rowsPut.addAndGet(rows.size)
  }
}

class HBaseSecuritySpec extends SparkSpec {

  private def write(secured: Boolean): Unit = {
    implicit val s: SparkSession = spark
    val ctx = new JobContext(PipelineContext())
    spark.read.parquet(s"$sfDir/nation.parquet").repartition(4)
      .createOrReplaceTempView("hbase_sec_in")
    val w = new HBaseWriter(new RecordingChannel(secured))
    w.init(Map("table" -> "t", "view" -> "hbase_sec_in",
      "columns.n_name" -> "cf:name", "rowKey.from" -> "n_nationkey"))
    w.run(ctx)
  }

  test("secured cluster: driver captures the token once, every task installs it before put") {
    RecordingChannel.reset()
    write(secured = true)
    // exactly one driver-side token acquisition, not one per task
    RecordingChannel.obtained.get() shouldBe 1
    // all 4 partitions installed before putting; none put bare
    RecordingChannel.putsWithToken.get() shouldBe 4
    RecordingChannel.putsWithoutToken.get() shouldBe 0
    RecordingChannel.installs.get() shouldBe 4
    RecordingChannel.rowsPut.get() shouldBe 25
  }

  test("unsecured cluster: no token, puts proceed without installs") {
    RecordingChannel.reset()
    write(secured = false)
    RecordingChannel.obtained.get() shouldBe 1
    RecordingChannel.installs.get() shouldBe 0
    RecordingChannel.putsWithoutToken.get() shouldBe 4
    RecordingChannel.rowsPut.get() shouldBe 25
  }
}
