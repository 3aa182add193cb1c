package graft

import graft.core.{JobContext, PipelineContext}
import graft.sink.{JdbcTemplating, JdbcWriter}
import graft.source.JdbcReader
import java.sql.DriverManager

/** End-to-end JDBC against embedded Derby (in-memory). */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private def conn() = DriverManager.getConnection(url)

  override def beforeAll(): Unit = {
    super.beforeAll()
    val c = conn()
    try {
      val st = c.createStatement()
      st.execute("CREATE TABLE features (user_id VARCHAR(32) NOT NULL, score INT, PRIMARY KEY (user_id))")
      st.close()
    } finally c.close()
  }

  test("templating compiles @field placeholders in order") {
    val tpl = JdbcTemplating.compile(
      "INSERT INTO t (a, b, c) VALUES (@a, @b, @a)")
    tpl.sql shouldBe "INSERT INTO t (a, b, c) VALUES (?, ?, ?)"
    tpl.bindFields shouldBe Seq("a", "b", "a")
  }

  test("autoInsert builds a full-column INSERT") {
    val tpl = JdbcTemplating.autoInsert("t", Seq("x", "y"))
    tpl.sql shouldBe "INSERT INTO t (x, y) VALUES (?, ?)"
    tpl.bindFields shouldBe Seq("x", "y")
  }

  test("merge mode writes rows through the templated row-level path") {
    implicit val s = spark
    import spark.implicits._
    val ctx = new JobContext(PipelineContext())
    Seq(("u1", 10), ("u2", 20), ("u3", 30)).toDF("user_id", "score")
      .createOrReplaceTempView("jdbc_src")
    new JdbcWriter()
      .connection(Map("url" -> url))
      .sourceView("jdbc_src").writeMode("merge")
      .sinkSql("INSERT INTO features (user_id, score) VALUES (@user_id, @score)")
      .run(ctx)
    val c = conn()
    try {
      val rs = c.createStatement().executeQuery("SELECT COUNT(*), SUM(score) FROM features")
      rs.next()
      rs.getInt(1) shouldBe 3
      rs.getInt(2) shouldBe 60
    } finally c.close()
  }

  test("flagship streaming pipeline: flat stream -> arbitrary state -> jdbc stream write") {
    // the reference's pipeline_fileStreamRead-arbitraryState-jdbcStreamWrite
    // scenario, wired end-to-end against embedded Derby
    implicit val s = spark
    val c0 = conn()
    try c0.createStatement().execute(
      "CREATE TABLE stream_scores (user_id VARCHAR(32), total INT)")
    finally c0.close()
    val in = tmpDir("fsj_in")
    val ckpt = tmpDir("fsj_ck")
    writeFile(in, "a.txt", "alice010\nbobby020\nalice005")
    val ctx = new JobContext(PipelineContext())
    val stream = new graft.streaming.FlatStreamReader()
      .fileUri(in).positionalFields("user:1-5 string, score:6-3 int")
      .run(ctx).get
    ctx.promoteView("fsj_in", stream, global = false)
    val summed = new graft.transform.StreamStatefulTransformer()
      .sourceView("fsj_in").withProcessor(new SumProcessor)
      .run(ctx).get
    ctx.promoteView("fsj_sum", summed, global = false)
    val w = new graft.sink.JdbcStreamWriter()
    w.init(Map(
      "view" -> "fsj_sum",
      "connection.url" -> url,
      "sink.sqlString" -> "INSERT INTO stream_scores (user_id, total) VALUES (@k, @total)",
      "options.checkpointLocation" -> ckpt,
      "outputMode" -> "update",
      // drain trigger WITHOUT a test wait: exercises the await-on-drain path
      "trigger.mode" -> "once"))
    w.run(ctx)
    val c = conn()
    try {
      val rs = c.createStatement().executeQuery(
        "SELECT user_id, SUM(total) FROM stream_scores GROUP BY user_id ORDER BY user_id")
      rs.next(); rs.getString(1) shouldBe "alice"; rs.getInt(2) shouldBe 15
      rs.next(); rs.getString(1) shouldBe "bobby"; rs.getInt(2) shouldBe 20
      rs.isClosed shouldBe false
    } finally c.close()
  }

  test("JdbcReader reads the table back through Spark") {
    implicit val s = spark
    val ctx = new JobContext(PipelineContext())
    val df = new JdbcReader()
      .connection(Map("url" -> url, "dbtable" -> "features"))
      .run(ctx).get
    df.count() shouldBe 3
    df.filter("user_id = 'u2'").select("score").collect().head.getInt(0) shouldBe 20
  }

  test("append mode via stock Spark JDBC sink") {
    implicit val s = spark
    import spark.implicits._
    val ctx = new JobContext(PipelineContext())
    Seq(("u4", 40)).toDF("user_id", "score").createOrReplaceTempView("jdbc_src2")
    new JdbcWriter()
      .connection(Map("url" -> url))
      .dbTable("features")
      .sourceView("jdbc_src2").writeMode("append")
      .run(ctx)
    val c = conn()
    try {
      val rs = c.createStatement().executeQuery("SELECT COUNT(*) FROM features")
      rs.next(); rs.getInt(1) shouldBe 4
    } finally c.close()
  }

  test("batchId-guarded merge makes micro-batch replay idempotent") {
    // foreachBatch replays a batch after failure with the SAME batchId —
    // Spark's documented exactly-once recipe is an idempotent sink keyed on
    // batchId. Prove the templated merge path delivers it on Derby: the
    // guard `t.batch_id < @batchId` turns a replayed (already-applied)
    // batch into a no-op, while genuinely new batches accumulate.
    implicit val s = spark
    import spark.implicits._
    val c0 = conn()
    try {
      c0.createStatement().execute(
        "CREATE TABLE batch_agg (k VARCHAR(32) NOT NULL, v INT, batch_id BIGINT, PRIMARY KEY (k))")
    } finally c0.close()
    val tpl = JdbcTemplating.compile(
      """MERGE INTO batch_agg t USING SYSIBM.SYSDUMMY1 s ON t.k = @k
        |WHEN MATCHED AND t.batch_id < @batchId
        |  THEN UPDATE SET v = t.v + @v, batch_id = @batchId
        |WHEN NOT MATCHED THEN INSERT (k, v, batch_id) VALUES (@k, @v, @batchId)""".stripMargin)
    val opts = Map("url" -> url)
    def writeBatch(batchId: Long, rows: (String, Int)*): Unit =
      JdbcTemplating.writePartition(
        rows.toDF("k", "v").collect().iterator, opts, tpl, batchSize = 100, batchId = batchId)
    def snapshot(): Map[String, (Int, Long)] = {
      val c = conn()
      try {
        val rs = c.createStatement().executeQuery("SELECT k, v, batch_id FROM batch_agg")
        Iterator.continually(rs).takeWhile(_.next())
          .map(r => r.getString(1) -> ((r.getInt(2), r.getLong(3)))).toMap
      } finally c.close()
    }
    writeBatch(0L, "a" -> 1, "b" -> 2)
    writeBatch(1L, "a" -> 10)
    snapshot() shouldBe Map("a" -> ((11, 1L)), "b" -> ((2, 0L)))
    // failure happens AFTER commit, checkpoint not advanced -> the engine
    // re-delivers batch 1 verbatim: must not double-apply
    writeBatch(1L, "a" -> 10)
    snapshot() shouldBe Map("a" -> ((11, 1L)), "b" -> ((2, 0L)))
    // progress resumes normally after the replay
    writeBatch(2L, "a" -> 5, "b" -> 1)
    snapshot() shouldBe Map("a" -> ((16, 2L)), "b" -> ((3, 2L)))
  }

  test("JdbcStreamWriter continuous trigger writes per-epoch into Derby") {
    // the real continuous path end-to-end: rate source -> Trigger.Continuous
    // -> per-row JdbcContinuousWriter (open/bind/commit per epoch) -> Derby.
    // Continuous mode is at-least-once, so the sink table has no PK and the
    // assertion is "rows arrived across multiple epochs", not exact count.
    implicit val s = spark
    val c0 = conn()
    try c0.createStatement().execute(
      "CREATE TABLE rate_sink (v BIGINT, batch_id BIGINT)")
    finally c0.close()
    val ctx = new JobContext(PipelineContext())
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "500").option("numPartitions", "2").load()
      .selectExpr("value")
    ctx.promoteView("rate_cont_v", rate, global = false)
    val before = spark.streams.active.map(_.id).toSet
    new graft.sink.JdbcStreamWriter()
      .connection(Map("url" -> url))
      .sourceView("rate_cont_v")
      .sinkSql("INSERT INTO rate_sink (v, batch_id) VALUES (@value, @batchId)")
      .withTrigger("continuous", "500 milliseconds")
      .withCheckpoint(tmpDir("rate_ckpt"))
      .run(ctx)
    val q = spark.streams.active.find(a => !before.contains(a.id)).get
    def state(): (Long, Long) = {
      val c = conn()
      try {
        val rs = c.createStatement().executeQuery(
          "SELECT COUNT(*), COUNT(DISTINCT batch_id) FROM rate_sink")
        rs.next(); (rs.getLong(1), rs.getLong(2))
      } finally c.close()
    }
    try {
      val deadline = System.currentTimeMillis() + 60000
      while ({ val (n, e) = state(); (n < 100 || e < 2) } &&
             System.currentTimeMillis() < deadline) Thread.sleep(200)
    } finally q.stop()
    val (n, epochs) = state()
    n should be >= 100L
    epochs should be >= 2L // distinct epoch ids bound through @batchId
    q.isActive shouldBe false
  }

  test("upsert-style merge statement binds batchId and repeated fields") {
    // Derby has no ON DUPLICATE KEY; emulate via plain parameterized UPDATE
    implicit val s = spark
    import spark.implicits._
    val ctx = new JobContext(PipelineContext())
    Seq(("u1", 99)).toDF("user_id", "score").createOrReplaceTempView("jdbc_upd")
    new JdbcWriter()
      .connection(Map("url" -> url))
      .sourceView("jdbc_upd").writeMode("merge")
      .sinkSql("UPDATE features SET score = @score WHERE user_id = @user_id")
      .run(ctx)
    val c = conn()
    try {
      val rs = c.createStatement().executeQuery("SELECT score FROM features WHERE user_id = 'u1'")
      rs.next(); rs.getInt(1) shouldBe 99
    } finally c.close()
  }
}
