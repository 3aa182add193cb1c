package graft

import graft.core.{Actor, JobContext, PipelineContext, PipelineRunner}
import graft.pipeline.{Action, Job, Pipeline, View}
import graft.source.FileReader
import graft.sql.SqlTransformer
import org.apache.spark.sql.{DataFrame, SparkSession}

class PipelineRunnerSpec extends SparkSpec {

  private def readerAction(view: String, table: String = "lineitem.parquet") =
    Action(s"read_$view",
      new FileReader().sourceFormat("parquet").fileUri(s"$sfDir/$table"),
      Some(View(view)))

  test("end-to-end: reader -> sql -> view") {
    val p = Pipeline("t", Seq(Job("j", Seq(
      readerAction("li"),
      Action("agg", new SqlTransformer().sqlString(
        "select l_returnflag, count(*) as c from li group by l_returnflag"),
        Some(View("out")))))), singleSparkSession = true)
    new PipelineRunner(PipelineContext(singleSparkSession = true)).run(p)(spark)
    spark.table("out").count() shouldBe 3
  }

  test("missing input view fails with a clear error") {
    val p = Pipeline("t", Seq(Job("j", Seq(
      Action("agg", new SqlTransformer().sqlString("select * from nope_v"),
        Some(View("out2")), inputViews = Seq("nope_v"))))), singleSparkSession = true)
    val e = intercept[IllegalStateException] {
      new PipelineRunner(PipelineContext(singleSparkSession = true)).run(p)(spark)
    }
    e.getMessage should include("nope_v")
  }

  test("validation-run limit truncates outputs") {
    val p = Pipeline("t", Seq(Job("j", Seq(
      readerAction("li_limit")))), singleSparkSession = true)
    new PipelineRunner(PipelineContext(singleSparkSession = true,
      validationRunLimit = Some(7))).run(p)(spark)
    spark.table("li_limit").count() shouldBe 7
  }

  test("pipeline-wide plan gate: settings.planAudit fails a cartesian action, allowRules passes it") {
    val cross = Pipeline("t", Seq(Job("j", Seq(
      readerAction("pa_li"),
      readerAction("pa_od", "orders.parquet"),
      Action("boom", new SqlTransformer().sqlString(
        "select * from pa_li cross join pa_od"),
        Some(View("pa_out")))))), singleSparkSession = true,
      planAudit = Some("error"))
    val e = intercept[IllegalStateException] {
      new PipelineRunner(PipelineContext(singleSparkSession = true)).run(cross)(spark)
    }
    e.getMessage should include("plan audit")
    e.getMessage should include("cartesian-join")
    // the failure is recorded in the runner metrics
    // (one row per attempted action; the failing one carries the status)

    // an explicitly-allowed rule (a labeled brute-force stage) passes
    val allowed = cross.copy(planAuditAllowRules = Set("cartesian-join"))
    new PipelineRunner(PipelineContext(singleSparkSession = true)).run(allowed)(spark)
    spark.table("pa_out").columns.length should be > 0
    // a clean pipeline under the strictest severity (warn) also passes:
    // plain filtered aggregate has only info findings
    val clean = Pipeline("t2", Seq(Job("j", Seq(
      readerAction("pa_li2"),
      Action("agg", new SqlTransformer().sqlString(
        "select l_returnflag, count(*) as c from pa_li2 group by l_returnflag"),
        Some(View("pa_out2")))))), singleSparkSession = true,
      planAudit = Some("warn"))
    new PipelineRunner(PipelineContext(singleSparkSession = true)).run(clean)(spark)
    spark.table("pa_out2").count() shouldBe 3
  }

  test("global views cross job sub-sessions, local views do not") {
    val probe = new Actor {
      var sawGlobal = false
      var sawLocal = false
      override def run(ctx: JobContext)(implicit s: SparkSession): Option[DataFrame] = {
        sawGlobal = ctx.viewExists("gview")
        sawLocal = ctx.viewExists("lview")
        None
      }
    }
    val p = Pipeline("t", Seq(
      Job("j1", Seq(
        Action("g", new FileReader().sourceFormat("parquet").fileUri(s"$sfDir/nation.parquet"),
          Some(View("gview", global = true))),
        Action("l", new FileReader().sourceFormat("parquet").fileUri(s"$sfDir/region.parquet"),
          Some(View("lview"))))),
      Job("j2", Seq(Action("probe", probe, None)))))
    new PipelineRunner(PipelineContext()).run(p)(spark)
    probe.sawGlobal shouldBe true
    probe.sawLocal shouldBe false
    spark.catalog.dropGlobalTempView("gview")
  }

  test("auto-cache on second reference") {
    implicit val s = spark
    val ctx = new JobContext(PipelineContext())
    spark.read.parquet(s"$sfDir/region.parquet").createOrReplaceTempView("cache_v")
    // references are deduped per action scope: two references from ONE
    // action (declared input + plan parse) count once...
    ctx.beginAction()
    ctx.referenceView("cache_v")
    ctx.referenceView("cache_v")
    spark.table("cache_v").storageLevel.useMemory shouldBe false
    // ...a second ACTION's reference triggers the auto-persist
    ctx.beginAction()
    ctx.referenceView("cache_v")
    spark.table("cache_v").storageLevel.useMemory shouldBe true
    ctx.cleanup()
    spark.table("cache_v").storageLevel.useMemory shouldBe false
  }

  test("metrics collection records row counts and status") {
    val runner = new PipelineRunner(PipelineContext(singleSparkSession = true, metricsEnabled = true))
    val p = Pipeline("t", Seq(Job("j", Seq(readerAction("li_m")))), singleSparkSession = true)
    runner.run(p)(spark)
    val m = runner.metrics.find(_.action == "read_li_m").get
    m.rowCount shouldBe Some(6000L)
    m.status shouldBe "completed"
    m.schema should include("l_orderkey")
  }

  test("observe actor: metrics ride the sink's pass and land in the runner report") {
    val out = tmpDir("obs_out")
    val observe = new graft.utils.ObserveActor().sourceView("li_obs").named("quality")
      .metric("cnt", "count(1)")
      .metric("null_keys", "count_if(l_orderkey IS NULL)")
      .metric("max_qty", "max(cast(l_quantity AS DOUBLE))")
    val sink = new graft.sink.FileWriter().sinkFormat("parquet")
      .fileUri(s"$out/li").sourceView("li_observed")
    val runner = new PipelineRunner(PipelineContext(singleSparkSession = true))
    runner.run(Pipeline("obs", Seq(Job("j", Seq(
      readerAction("li_obs"),
      Action("observe_li", observe, Some(View("li_observed"))),
      Action("write_li", sink, None)))), singleSparkSession = true))(spark)
    // the sink's single pass computed the metrics — no extra scan ran
    val row = runner.metrics.find(_.action == "observe:quality").get
    row.status shouldBe "observed"
    row.schema should include("cnt=6000")
    row.schema should include("null_keys=0")
    spark.read.parquet(s"$out/li").count() shouldBe 6000L
  }

  test("observe actor rejects a metric-less init; duplicate names rejected per job") {
    intercept[IllegalArgumentException] {
      new graft.utils.ObserveActor().init(Map("view" -> "x"))(spark)
    }
    val ctx = new JobContext(PipelineContext())(spark)
    val o1 = org.apache.spark.sql.Observation("dup")
    ctx.registerObservation("dup", o1)
    intercept[IllegalArgumentException] {
      ctx.registerObservation("dup", org.apache.spark.sql.Observation("dup"))
    }
  }

  test("metrics JSON written per run when a metrics uri is configured") {
    val dir = tmpDir("metrics")
    val runner = new PipelineRunner(PipelineContext(singleSparkSession = true,
      metricsEnabled = true, metricsUri = Some(dir)))
    runner.run(Pipeline("mtest", Seq(Job("j", Seq(readerAction("li_mx")))),
      singleSparkSession = true))(spark)
    val files = new java.io.File(dir).listFiles()
    files.length shouldBe 1
    val json = new String(java.nio.file.Files.readAllBytes(files.head.toPath), "UTF-8")
    json should include("\"rowCount\": 6000")
    json should include("\"status\": \"completed\"")
  }

  test("SQL actors self-report referenced views for auto-caching") {
    val probe = new Actor {
      var cachedDuringJob = false
      override def run(ctx: JobContext)(implicit s: SparkSession): Option[DataFrame] = {
        cachedDuringJob = s.table("li_sqlref").storageLevel.useDisk
        None
      }
    }
    val p = Pipeline("t", Seq(Job("j", Seq(
      readerAction("li_sqlref"),
      Action("a1", new SqlTransformer().sqlString(
        "select count(*) as c from li_sqlref"), Some(View("o1"))),
      Action("a2", new SqlTransformer().sqlString(
        "select l_returnflag from li_sqlref limit 5"), Some(View("o2"))),
      Action("probe", probe, None)))),
      singleSparkSession = true)
    new PipelineRunner(PipelineContext(singleSparkSession = true)).run(p)(spark)
    // second reference through SQL plan-parse triggered the auto-persist;
    // job cleanup unpersists afterwards
    probe.cachedDuringJob shouldBe true
    spark.table("li_sqlref").storageLevel.useDisk shouldBe false
  }

  test("debug staging dumps per-action csv") {
    val stage = tmpDir("stagedump")
    val p = Pipeline("t", Seq(Job("jst", Seq(readerAction("li_st")))), singleSparkSession = true)
    new PipelineRunner(PipelineContext(singleSparkSession = true,
      stagingUri = Some(stage))).run(p)(spark)
    val staged = spark.read.option("header", "true").csv(s"$stage/jst/read_li_st")
    staged.count() shouldBe 6000
  }

  test("job filter selects jobs") {
    val p = Pipeline("t", Seq(
      Job("a", Seq(readerAction("va"))),
      Job("b", Seq(readerAction("vb")))), singleSparkSession = true)
    new PipelineRunner(PipelineContext(singleSparkSession = true))
      .run(p, Some(Set("b")))(spark)
    spark.catalog.tableExists("vb") shouldBe true
    spark.catalog.tableExists("va") shouldBe false
  }
}
