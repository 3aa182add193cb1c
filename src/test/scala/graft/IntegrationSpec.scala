package graft

import graft.core.{PipelineContext, PipelineRunner}
import graft.functions.UdfRegistry
import graft.pipeline.PipelineBuilder
import org.apache.spark.sql.SparkSession

/** End-to-end scenarios mirroring the reference's canonical test pipelines
  * (template_pipeline.yaml, window-user-train.sql, stream pipelines). */
class IntegrationSpec extends SparkSpec {

  test("template-style pipeline: flat file + csv join + set/setrun + validator + writer") {
    implicit val s = spark
    val dir = tmpDir("e2e")
    // fixed-width train file with header row (FIXTURES.md §3 shape)
    writeFile(dir, "train.txt",
      """HDR20240211
        |3044012  1         2024-02-11T00:00:001
        |3044013  2         2024-02-11T00:05:000
        |3044012  3         2024-02-11T00:07:111
        |""".stripMargin)
    // users csv with dirty birthyear (FIXTURES.md §1 shape)
    writeFile(dir, "users.csv",
      """user_id,birthyear,gender,joined_at
        |3044012,1990,male,2012-10-02T15:50:21.023Z
        |3044013,1985,,2013-01-01T00:00:00.000Z
        |""".stripMargin)
    val yaml =
      s"""name: user-train
         |variables:
         |  data_dir: "$dir"
         |  out_dir: "$dir/out"
         |settings:
         |  singleSparkSession: "true"
         |jobs:
         |  - name: main
         |    actions:
         |      - name: load train
         |        actor: flat-reader
         |        properties:
         |          fileUri: "$${data_dir}/train.txt"
         |          format: fixed-length
         |          positionalFields: "user:1-9 string, event:10-10 long, timestamp:20-19 string, interested:39-1 int"
         |          header.regex: "^HDR.*"
         |          header.view: train_hdr
         |        output-view:
         |          name: train
         |      - name: load users
         |        actor: file-reader
         |        properties:
         |          format: csv
         |          options:
         |            header: "true"
         |          fileUri: "$${data_dir}/users.csv"
         |        output-view:
         |          name: users
         |      - name: transform
         |        actor: sql
         |        properties:
         |          sqlString: >
         |            setrun user_count = (select count(*) from users);
         |            select t.user, cast(u.birthyear as int) as birthyear,
         |                   nvl(u.gender, 'unknown') as gender, t.event, t.interested,
         |                   ${"$"}{user_count} as total_users
         |            from train t left join users u on trim(t.user) = cast(u.user_id as string)
         |        output-view:
         |          name: features
         |      - name: validate
         |        actor: sql-data-validator
         |        properties:
         |          view: features
         |          validWhere: "birthyear is not null and event > 0"
         |          action: error
         |        output-view:
         |          name: features_valid
         |      - name: dedup
         |        actor: sql
         |        properties:
         |          sqlString: "select distinct user, birthyear, gender, interested from features_valid"
         |        output-view:
         |          name: features_dedup
         |      - name: save
         |        actor: file-writer
         |        properties:
         |          format: parquet
         |          fileUri: "$${out_dir}/features"
         |          view: features_dedup
         |""".stripMargin
    val f = writeFile(dir, "pipeline.yaml", yaml)
    val pipeline = PipelineBuilder.fromFile(f)
    new PipelineRunner(PipelineContext(singleSparkSession = true)).run(pipeline)(spark)

    spark.table("train_hdr").count() shouldBe 1
    spark.table("features").select("total_users").collect().head.getInt(0) shouldBe 2
    val out = spark.read.parquet(s"$dir/out/features")
    out.count() shouldBe 2 // 3 train rows, user 3044012 deduped
    out.filter("trim(user) = '3044013'").select("gender").collect().head.getString(0) shouldBe "unknown"
  }

  test("streaming windowed aggregation: tumbling window + watermark over file stream") {
    implicit val s = spark
    val dir = tmpDir("swin")
    val ckpt = tmpDir("swinck")
    val out = tmpDir("swinout")
    writeFile(dir, "events.csv",
      """u1,2024-02-11T00:00:05,3
        |u2,2024-02-11T00:00:07,5
        |u1,2024-02-11T00:00:12,2
        |u1,2024-02-11T00:00:25,7
        |""".stripMargin)
    val ctx = new graft.core.JobContext(PipelineContext())
    val stream = new graft.streaming.FileStreamReader()
      .sourceFormat("csv")
      .ddlSchemaString("user string, ts timestamp, v int")
      .fileUri(dir)
      .watermark("ts", "30 seconds")
      .run(ctx).get
    ctx.promoteView("ev", stream, global = false)
    // the reference's window-user-train.sql shape: tumbling 10s window + agg
    val windowed = spark.sql(
      """select user, window(ts, '10 seconds').start as wstart,
        |       sum(v) as total from ev
        |group by user, window(ts, '10 seconds')""".stripMargin)
    ctx.promoteView("win", windowed, global = false)
    new graft.streaming.ForeachBatchStreamWriter(
      (batch, _) => batch.write.mode("append").parquet(out))
      .sourceView("win").withCheckpoint(ckpt)
      .withOutputMode("update").withTrigger("once").testWaitTimeMs(30000)
      .run(ctx)
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toInstant.getEpochSecond % 100, r.getLong(2)))
      .toSet
    rows shouldBe Set(("u1", 0L, 3L), ("u1", 10L, 2L), ("u1", 20L, 7L), ("u2", 0L, 5L))
  }

  test("batch session_window groups gapped activity") {
    implicit val s = spark
    import spark.implicits._
    Seq(
      ("u1", "2024-02-11T00:00:00", 1), ("u1", "2024-02-11T00:00:20", 1),
      ("u1", "2024-02-11T00:10:00", 1), ("u2", "2024-02-11T00:00:00", 1)
    ).toDF("user", "ts_s", "v")
      .selectExpr("user", "cast(ts_s as timestamp) as ts", "v")
      .createOrReplaceTempView("sess_ev")
    val out = spark.sql(
      """select user, count(*) as events from sess_ev
        |group by user, session_window(ts, '5 minutes')""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    out shouldBe Seq(("u1", 1L), ("u1", 2L), ("u2", 1L))
  }

  test("bucketed as-of join matches the naive range-join formulation") {
    val naive = Queries.all.find(_.name == "q11b_asof_join").get.run(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bucketed = Queries.all.find(_.name == "q25_asof_bucketed").get.run(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    bucketed shouldBe naive
    naive should not be empty
  }

  test("training-data operators as declarative pipeline actions") {
    implicit val s = spark
    val dir = tmpDir("mlpipe")
    val yaml =
      s"""name: train-data-pipe
         |settings:
         |  singleSparkSession: "true"
         |jobs:
         |  - name: j
         |    actions:
         |      - name: docs
         |        actor: file-reader
         |        properties:
         |          format: parquet
         |          fileUri: "$sfDir/documents.parquet"
         |        output-view:
         |          name: ml_docs
         |      - name: analyze
         |        actor: text-analysis
         |        properties:
         |          view: ml_docs
         |        output-view:
         |          name: ml_analyzed
         |      - name: dedup
         |        actor: dedup
         |        properties:
         |          view: ml_docs
         |          method: exact
         |        output-view:
         |          name: ml_deduped
         |      - name: vecs
         |        actor: file-reader
         |        properties:
         |          format: parquet
         |          fileUri: "$sfDir/embeddings.parquet"
         |        output-view:
         |          name: ml_vecs
         |      - name: ann
         |        actor: similarity-search
         |        properties:
         |          view: ml_vecs
         |          k: "3"
         |          queryWhere: "vec_id < 5"
         |        output-view:
         |          name: ml_ann
         |""".stripMargin
    val f = writeFile(dir, "p.yaml", yaml)
    new PipelineRunner(PipelineContext(singleSparkSession = true))
      .run(PipelineBuilder.fromFile(f))(spark)
    spark.table("ml_analyzed").columns should contain allOf ("ws_tokens", "quality", "lang_pred", "fingerprint")
    spark.table("ml_deduped").count() shouldBe 500
    spark.table("ml_ann").groupBy("query_id").count().count() shouldBe 5
  }

  test("custom UDF provider registered through the pipeline") {
    implicit val s = spark
    val dir = tmpDir("udf")
    val yaml =
      s"""name: udf-pipe
         |settings:
         |  singleSparkSession: "true"
         |udf-registration:
         |  - graft.TestUdfProvider
         |jobs:
         |  - name: j
         |    actions:
         |      - name: q
         |        actor: sql
         |        properties:
         |          sqlString: "select test_double(21) as x"
         |        output-view:
         |          name: udf_out
         |""".stripMargin
    val f = writeFile(dir, "p.yaml", yaml)
    val pipeline = PipelineBuilder.fromFile(f)
    new PipelineRunner(PipelineContext(singleSparkSession = true)).run(pipeline)(spark)
    spark.table("udf_out").collect().head.getInt(0) shouldBe 42
  }
}

/** Example custom-UDF bundle (reference: test/udf/UserUdf.scala:7-20). */
class TestUdfProvider extends UdfRegistry.UdfProvider {
  def register(prefix: String, spark: SparkSession): Unit =
    spark.udf.register(prefix + "test_double", (x: Int) => x * 2)
}
