package graft

import graft.core.{JobContext, PipelineContext}
import graft.source.{DeltaReader, KafkaSchema}
import graft.sink.KafkaRecord
import org.apache.spark.sql.functions._

class ConnectorSpec extends SparkSpec {

  test("kafka JSON value decode flattens value.* and prefixes metadata") {
    implicit val s = spark
    import spark.implicits._
    val raw = Seq(
      (Array[Byte](107), """{"user_id": 7, "city": "x"}""".getBytes("UTF-8"), "t", 0, 42L),
      (Array[Byte](108), """{"user_id": 8, "city": "y"}""".getBytes("UTF-8"), "t", 0, 43L)
    ).toDF("key", "value", "topic", "partition", "offset")
    val spec = KafkaSchema.fromProperties("valueSchema",
      Map("valueSchema.jsonSchemaString" -> "user_id long, city string"))
    val out = KafkaSchema.project(raw, KafkaSchema.NoSpec, spec)
    out.columns should contain allOf ("user_id", "city", "__kafka_key", "__kafka_topic", "__kafka_offset")
    out.filter("user_id = 8").select("city").collect().head.getString(0) shouldBe "y"
  }

  test("kafka schema precedence: avro before json, file fallbacks") {
    val avro = KafkaSchema.fromProperties("k",
      Map("k.avroSchemaString" -> "{}", "k.jsonSchemaString" -> "a int"))
    avro shouldBe a[KafkaSchema.AvroSpec]
    val none = KafkaSchema.fromProperties("k", Map.empty)
    none shouldBe KafkaSchema.NoSpec
    // avro decode resolves on every classpath (native spark-avro when
    // present, avro-core fallback otherwise — full coverage in
    // AvroDecoderSpec)
    val avroSchema = """{"type":"record","name":"r","fields":[{"name":"a","type":"int"}]}"""
    KafkaSchema.decode(col("value"), KafkaSchema.AvroSpec(avroSchema)) shouldBe defined
  }

  test("kafka record assembly defaults: generated key + to_json(struct(*)) value") {
    implicit val s = spark
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b")).toDF("id", "name")
    val rec = KafkaRecord.assemble(df, None, None, None, avroValue = false)
    rec.columns.toSeq shouldBe Seq("key", "value")
    val values = rec.select("value").collect().map(_.getString(0)).sorted
    values.head shouldBe """{"id":1,"name":"a"}"""
  }

  test("connector reader wiring: delta reader reaches the DataSource layer") {
    implicit val s = spark
    val ctx = new JobContext(PipelineContext())
    val r = new DeltaReader
    r.init(Map("path" -> "/tmp/nope", "options.versionAsOf" -> "1"))
    // no delta jars offline: the failure must come from Spark's DataSource
    // lookup (proving option/path plumbing executed), not from our code
    val e = intercept[Exception](r.run(ctx))
    e.getMessage.toLowerCase should include("delta")
  }

  test("kafka batch reader e2e against the in-process double: options, decode, metadata") {
    // Full actor->options->connector path with no broker: KafkaReader's
    // REAL run() loads through the graft-test-kafka provider (resolved by
    // DataSourceRegister short name), which captures the exact options the
    // real connector would have received and serves Kafka-schema records.
    implicit val s = spark
    import graft.testdouble.GraftTestKafka
    GraftTestKafka.reset()
    val ctx = new JobContext(PipelineContext())
    val r = new graft.source.KafkaReader
    r.init(Map(
      "providerFormat" -> "graft-test-kafka",
      "bootstrapServers" -> "broker-a:9092,broker-b:9092",
      "topic" -> "events",
      "options.startingOffsets" -> "earliest",
      "options.test.records" ->
        """u7|{"user_id": 7, "city": "x"};u8|{"user_id": 8, "city": "y"}""",
      // the DOCUMENTED property form (value.*) must decode — the alias
      // bridge to the historical valueSchema.* names
      "value.jsonSchemaString" -> "user_id long, city string"))
    val out = r.run(ctx).get
    // the connector saw exactly what the actor promised to send
    GraftTestKafka.lastReadOptions("kafka.bootstrap.servers") shouldBe "broker-a:9092,broker-b:9092"
    GraftTestKafka.lastReadOptions("subscribe") shouldBe "events"
    GraftTestKafka.lastReadOptions("startingoffsets") shouldBe "earliest"
    // decode + flatten + metadata projection ran on the wire-shaped rows
    out.columns should contain allOf ("user_id", "city", "__kafka_key", "__kafka_topic", "__kafka_offset")
    out.count() shouldBe 2L
    out.filter("user_id = 8").select("city").collect().head.getString(0) shouldBe "y"
    out.select("__kafka_topic").distinct().collect().head.getString(0) shouldBe "events"
  }

  test("kafka batch writer e2e against the double: record assembly reaches the connector") {
    implicit val s = spark
    import spark.implicits._
    import graft.testdouble.GraftTestKafka
    GraftTestKafka.reset()
    val ctx = new JobContext(PipelineContext())
    Seq((7L, "x"), (8L, "y")).toDF("user_id", "city").createOrReplaceTempView("kw_src")
    val w = new graft.sink.KafkaWriter
    w.init(Map(
      "providerFormat" -> "graft-test-kafka",
      "bootstrapServers" -> "broker-a:9092",
      "topic" -> "out-topic",
      "view" -> "kw_src",
      "keyField" -> "user_id",
      "options.kafka.acks" -> "all"))
    w.run(ctx)
    GraftTestKafka.lastWriteOptions("kafka.bootstrap.servers") shouldBe "broker-a:9092"
    GraftTestKafka.lastWriteOptions("topic") shouldBe "out-topic"
    GraftTestKafka.lastWriteOptions("kafka.acks") shouldBe "all"
    GraftTestKafka.lastWriteMode shouldBe Some(org.apache.spark.sql.SaveMode.Append)
    val recs = GraftTestKafka.written.sortBy(_._1)
    recs.map(_._1) shouldBe Seq("7", "8")
    recs.head._2 shouldBe """{"user_id":7,"city":"x"}"""
    spark.catalog.dropTempView("kw_src")
  }

  test("delta reader e2e via providerFormat: table-vs-path precedence and option passthrough") {
    // The generic ConnectorReader path run end-to-end through the double:
    // proves the precedence rule and that options (time travel) reach the
    // provider — previously only assertable as "fails inside DataSource".
    implicit val s = spark
    import graft.testdouble.GraftTestKafka
    GraftTestKafka.reset()
    val ctx = new JobContext(PipelineContext())
    val r = new DeltaReader
    r.init(Map(
      "providerFormat" -> "graft-test-kafka",
      "path" -> "/lake/events",
      "options.versionAsOf" -> "12",
      "options.test.records" -> "a|1;b|2;c|3",
      "filter" -> "offset >= 1"))
    val out = r.run(ctx).get
    GraftTestKafka.lastReadOptions("versionasof") shouldBe "12"
    // V1 path-addressed load surfaces the path as an option
    GraftTestKafka.lastReadOptions("path") shouldBe "/lake/events"
    out.count() shouldBe 2L // post-load filter applied on the loaded frame
  }

  test("kafka STREAM reader e2e against the streaming double: decode + watermark plumbing") {
    // KafkaStreamReader's real run() against the DSv2 MicroBatchStream
    // double: subscribe/startingOffsets reach the source, the JSON value
    // decode + flatten runs on streaming wire-shaped rows, and the
    // watermark property attaches (visible as the eventTime column
    // surviving an event-time window aggregate without
    // withWatermark-missing analysis errors).
    implicit val s = spark
    import graft.testdouble.GraftTestKafkaStream
    GraftTestKafkaStream.reset()
    val ctx = new JobContext(PipelineContext())
    val r = new graft.source.KafkaStreamReader
    r.init(Map(
      "providerFormat" -> "graft-test-kafka-stream",
      "bootstrapServers" -> "broker-a:9092",
      "topic" -> "events",
      "options.test.records" ->
        """u7|{"user_id": 7, "city": "x"};u8|{"user_id": 8, "city": "y"}""",
      "value.jsonSchemaString" -> "user_id long, city string",
      "watermark.timeField" -> "__kafka_timestamp",
      "watermark.delayThreshold" -> "10 minutes"))
    val out = r.run(ctx).get
    out.isStreaming shouldBe true
    // event-time agg on the watermarked column — fails analysis if the
    // watermark did not attach
    val agg = out.groupBy(org.apache.spark.sql.functions.window(
      col("__kafka_timestamp"), "1 hour")).count()
    val qname = s"ksr_e2e_${System.nanoTime}"
    val sq = agg.writeStream.format("memory").queryName(qname)
      .outputMode("complete").start()
    sq.processAllAvailable(); sq.stop()
    spark.table(qname).collect().map(_.getLong(1)).sum shouldBe 2L
    spark.catalog.dropTempView(qname)
    GraftTestKafkaStream.lastReadOptions("subscribe") shouldBe "events"
    GraftTestKafkaStream.lastReadOptions("kafka.bootstrap.servers") shouldBe "broker-a:9092"
    // and the decode itself, drained without the agg
    val qname2 = s"ksr_rows_${System.nanoTime}"
    val sq2 = out.select("user_id", "city").writeStream.format("memory")
      .queryName(qname2).outputMode("append").start()
    sq2.processAllAvailable(); sq2.stop()
    val rows = spark.table(qname2).collect().map(r2 => (r2.getLong(0), r2.getString(1))).sorted
    rows.toSeq shouldBe Seq((7L, "x"), (8L, "y"))
    spark.catalog.dropTempView(qname2)
  }

  test("kafka STREAM writer e2e against the streaming double: records, epochs, options") {
    implicit val s = spark
    import graft.testdouble.GraftTestKafkaStream
    GraftTestKafkaStream.reset()
    val ctx = new JobContext(PipelineContext())
    // source stream: the read double; records become (key=binary k, ...)
    val src = spark.readStream.format("graft-test-kafka-stream")
      .option("test.records", "a|1;b|2;c|3").load()
      .selectExpr("CAST(key AS STRING) AS k", "CAST(value AS STRING) AS v")
    src.createOrReplaceTempView("ksw_src")
    val w = new graft.sink.KafkaStreamWriter
    w.init(Map(
      "providerFormat" -> "graft-test-kafka-stream",
      "bootstrapServers" -> "broker-a:9092",
      "topic" -> "out-topic",
      "view" -> "ksw_src",
      "keyField" -> "k",
      "valueField" -> "v",
      "outputMode" -> "append",
      "trigger.mode" -> "once",
      "options.checkpointLocation" -> tmpDir("ksw_ckpt")))
    w.run(ctx)
    GraftTestKafkaStream.lastWriteOptions("topic") shouldBe "out-topic"
    GraftTestKafkaStream.lastWriteOptions("kafka.bootstrap.servers") shouldBe "broker-a:9092"
    GraftTestKafkaStream.committedEpochs should not be empty
    GraftTestKafkaStream.written.sortBy(_._1) shouldBe Seq(
      ("a", "1"), ("b", "2"), ("c", "3"))
    spark.catalog.dropTempView("ksw_src")
  }

  test("iceberg batch writer e2e via the row-sink double: ordered-write contract + mode/options") {
    // IcebergWriter's real run() through the generic sink double: the
    // sortWithinPartitions(tablePartitionedBy) contract (reference:
    // sink/IcebergWriter.scala:47) is verified on the EXECUTED partitions,
    // not just present in the plan.
    implicit val s = spark
    import spark.implicits._
    import graft.testdouble.GraftTestRowSink
    GraftTestRowSink.reset()
    val ctx = new JobContext(PipelineContext())
    // 40 rows, deliberately shuffled order, 4 executed partitions
    val df = (1 to 40).map(i => (i.toLong, s"d${(i * 7) % 10}", s"v$i"))
      .toDF("id", "day", "v")
      .orderBy(rand(42)).repartition(4)
    df.createOrReplaceTempView("icw_src")
    val w = new graft.sink.IcebergWriter
    w.init(Map(
      "providerFormat" -> "graft-test-rowsink",
      "path" -> "/lake/iceberg/events",
      "view" -> "icw_src",
      "mode" -> "append",
      "tablePartitionedBy" -> "day",
      "options.write-format" -> "parquet",
      "options.test.assertSortedBy" -> "day"))
    w.run(ctx)
    GraftTestRowSink.lastWriteMode shouldBe Some(org.apache.spark.sql.SaveMode.Append)
    GraftTestRowSink.lastWriteOptions("write-format") shouldBe "parquet"
    GraftTestRowSink.lastWriteOptions("path") shouldBe "/lake/iceberg/events"
    GraftTestRowSink.written.size shouldBe 40
    // the contract: every executed partition arrived sorted by `day`
    GraftTestRowSink.partitionSorted should not be empty
    all(GraftTestRowSink.partitionSorted) shouldBe true
    // control: without the prepare() sort the same frame is NOT partition-
    // sorted (guards against the assertion passing vacuously)
    GraftTestRowSink.reset()
    df.write.format("graft-test-rowsink")
      .option("test.assertSortedBy", "day").mode("append").save("/lake/x")
    GraftTestRowSink.partitionSorted should contain(false)
    spark.catalog.dropTempView("icw_src")
  }

  test("mongo/redis STREAM writers e2e via the row-sink double: per-micro-batch append") {
    // The foreachBatch slice that was wire-only in round 9: each
    // micro-batch must land as ONE append-mode write call carrying the
    // actor's options, driven by the REAL run() with a mandatory
    // checkpoint. Source is the DSv2 streaming double.
    implicit val s = spark
    import graft.testdouble.GraftTestRowSink
    val ctx = new JobContext(PipelineContext())
    GraftTestRowSink.reset()
    val src = spark.readStream.format("graft-test-kafka-stream")
      .option("test.records", "a|1;b|2;c|3").load()
      .selectExpr("CAST(key AS STRING) AS k", "CAST(value AS STRING) AS v")
    src.createOrReplaceTempView("msw_src")
    val w = new graft.sink.MongoStreamWriter
    w.init(Map(
      "providerFormat" -> "graft-test-rowsink",
      "view" -> "msw_src",
      "outputMode" -> "append",
      "trigger.mode" -> "once",
      "options.uri" -> "mongodb://db0:27017",
      "options.database" -> "graft",
      "options.collection" -> "events",
      "options.checkpointLocation" -> tmpDir("msw_ckpt")))
    w.run(ctx)
    GraftTestRowSink.lastWriteMode shouldBe Some(org.apache.spark.sql.SaveMode.Append)
    GraftTestRowSink.lastWriteOptions("uri") shouldBe "mongodb://db0:27017"
    GraftTestRowSink.lastWriteOptions("collection") shouldBe "events"
    // checkpointLocation steers the STREAM, not the per-batch connector
    GraftTestRowSink.lastWriteOptions should not contain key("checkpointLocation")
    GraftTestRowSink.writeCalls should be >= 1
    GraftTestRowSink.written.map(r => (r.getString(0), r.getString(1)))
      .sorted shouldBe Seq(("a", "1"), ("b", "2"), ("c", "3"))
    // redis rides the same foreachBatch path — prove the class wiring
    GraftTestRowSink.reset()
    val w2 = new graft.sink.RedisStreamWriter
    w2.init(Map(
      "providerFormat" -> "graft-test-rowsink",
      "view" -> "msw_src",
      "outputMode" -> "append",
      "trigger.mode" -> "once",
      "options.table" -> "events",
      "options.key.column" -> "k",
      "options.checkpointLocation" -> tmpDir("rsw_ckpt")))
    w2.run(ctx)
    GraftTestRowSink.lastWriteOptions("table") shouldBe "events"
    GraftTestRowSink.written.size shouldBe 3
    // and the mandatory-checkpoint guard still fires without one
    val w3 = new graft.sink.RedisStreamWriter
    intercept[IllegalArgumentException] {
      w3.init(Map("providerFormat" -> "graft-test-rowsink",
        "view" -> "msw_src", "trigger.mode" -> "once"))
    }.getMessage should include("checkpointLocation")
    spark.catalog.dropTempView("msw_src")
  }

  test("delta/iceberg STREAM writers e2e via the DSv2 row-sink double: addressing, epochs, rows") {
    // The last wire-only writer slice: ConnectorStreamWriter's real run()
    // (output-mode/trigger validation, table-vs-path addressing,
    // checkpoint wiring) against a DSv2 streaming sink that records what
    // the wire one would have been handed.
    implicit val s = spark
    import graft.testdouble.GraftTestRowSinkStream
    val ctx = new JobContext(PipelineContext())
    GraftTestRowSinkStream.reset()
    val src = spark.readStream.format("graft-test-kafka-stream")
      .option("test.records", "a|1;b|2;c|3").load()
      .selectExpr("CAST(key AS STRING) AS k", "CAST(value AS STRING) AS v")
    src.createOrReplaceTempView("dsw_src")
    val w = new graft.sink.DeltaStreamWriter
    w.init(Map(
      "providerFormat" -> "graft-test-rowsink-stream",
      "path" -> "/lake/delta/events",
      "view" -> "dsw_src",
      "outputMode" -> "append",
      "trigger.mode" -> "once",
      "options.mergeSchema" -> "true",
      "options.checkpointLocation" -> tmpDir("dsw_ckpt")))
    w.run(ctx)
    // path addressing surfaces as the path option; actor options pass through
    GraftTestRowSinkStream.lastWriteOptions("path") shouldBe "/lake/delta/events"
    GraftTestRowSinkStream.lastWriteOptions("mergeschema") shouldBe "true"
    GraftTestRowSinkStream.committedEpochs should not be empty
    GraftTestRowSinkStream.lastSchema.get.fieldNames.toSeq shouldBe Seq("k", "v")
    GraftTestRowSinkStream.written.map(_._2).sortBy(_.head) shouldBe
      Seq(Seq("a", "1"), Seq("b", "2"), Seq("c", "3"))
    // iceberg: TABLE addressing rides the path option (its DSv2 sink's
    // documented exception), and continuous triggers are rejected at init
    GraftTestRowSinkStream.reset()
    val w2 = new graft.sink.IcebergStreamWriter
    w2.init(Map(
      "providerFormat" -> "graft-test-rowsink-stream",
      "table" -> "lake.events",
      "view" -> "dsw_src",
      "outputMode" -> "append",
      "trigger.mode" -> "once",
      "options.checkpointLocation" -> tmpDir("isw_ckpt")))
    w2.run(ctx)
    GraftTestRowSinkStream.lastWriteOptions("path") shouldBe "lake.events"
    GraftTestRowSinkStream.written.size shouldBe 3
    intercept[IllegalArgumentException] {
      new graft.sink.IcebergStreamWriter().init(Map(
        "providerFormat" -> "graft-test-rowsink-stream",
        "table" -> "lake.events", "view" -> "dsw_src",
        "trigger.mode" -> "continuous", "trigger.interval" -> "1 second",
        "options.checkpointLocation" -> tmpDir("isw_ckpt2")))
    }.getMessage should include("continuous")
    spark.catalog.dropTempView("dsw_src")
  }

  test("mongo batch reader e2e via the V1 double: option passthrough through the generic reader") {
    implicit val s = spark
    import graft.testdouble.GraftTestKafka
    GraftTestKafka.reset()
    val ctx = new JobContext(PipelineContext())
    val r = new graft.source.MongoReader
    r.init(Map(
      "providerFormat" -> "graft-test-kafka",
      "path" -> "graft.events",
      "options.uri" -> "mongodb://db0:27017",
      "options.database" -> "graft",
      "options.collection" -> "events",
      "options.test.records" -> "a|1;b|2"))
    val out = r.run(ctx).get
    GraftTestKafka.lastReadOptions("uri") shouldBe "mongodb://db0:27017"
    GraftTestKafka.lastReadOptions("collection") shouldBe "events"
    out.count() shouldBe 2L
  }

  test("delta STREAM reader e2e via the DSv2 double: path addressing + watermark plumbing") {
    implicit val s = spark
    import graft.testdouble.GraftTestKafkaStream
    GraftTestKafkaStream.reset()
    val ctx = new JobContext(PipelineContext())
    val r = new graft.source.DeltaStreamReader
    r.init(Map(
      "providerFormat" -> "graft-test-kafka-stream",
      "path" -> "/lake/delta/events",
      "options.maxFilesPerTrigger" -> "4",
      "options.test.records" -> "a|1;b|2;c|3",
      "watermark.timeField" -> "timestamp",
      "watermark.delayThreshold" -> "10 minutes"))
    val out = r.run(ctx).get
    out.isStreaming shouldBe true
    val qname = s"dsr_e2e_${System.nanoTime}"
    val sq = out.selectExpr("CAST(key AS STRING) AS k").writeStream
      .format("memory").queryName(qname).outputMode("append").start()
    sq.processAllAvailable(); sq.stop()
    spark.table(qname).collect().map(_.getString(0)).sorted shouldBe Array("a", "b", "c")
    // DSv2 resolves the scan at stream START, so options surface post-drain
    GraftTestKafkaStream.lastReadOptions("path") shouldBe "/lake/delta/events"
    GraftTestKafkaStream.lastReadOptions("maxfilespertrigger") shouldBe "4"
    spark.catalog.dropTempView(qname)
  }

  test("as-of join leftOuter keeps unmatched rows") {
    implicit val s = spark
    import spark.implicits._
    val left = Seq((1L, "u1", "2024-01-01T10:00:00"), (2L, "u2", "2024-01-01T10:00:00"))
      .toDF("id", "k", "ts_s").selectExpr("id", "k", "cast(ts_s as timestamp) as ts")
    val right = Seq(("u1", "2024-01-01T09:59:00", 100L))
      .toDF("k", "ts_s", "rid").selectExpr("k", "cast(ts_s as timestamp) as ts", "rid")
    val inner = graft.operators.AsofJoin.latestWithin(left, right, Seq("k"), "ts", "ts", 3600L, Seq("rid"))
    inner.count() shouldBe 1
    val outer = graft.operators.AsofJoin.latestWithin(left, right, Seq("k"), "ts", "ts", 3600L,
      Seq("rid"), leftOuter = true)
    outer.count() shouldBe 2
    outer.filter("k = 'u2'").select("rid").collect().head.isNullAt(0) shouldBe true
  }

  test("multimodal byte decimation downsamples deterministically") {
    implicit val s = spark
    import spark.implicits._
    val df = Seq((1L, Array.tabulate[Byte](100)(_.toByte))).toDF("id", "payload")
    val out = graft.ml.Multimodal.decimateBytes(df, 4).collect().head
    out.getAs[Array[Byte]](1).length shouldBe 25
  }

  test("text stopword ratio") {
    implicit val s = spark
    import spark.implicits._
    val df = Seq("the cat and the dog").toDF("text")
    val r = df.select(graft.ml.TextAnalysis.stopwordRatio(col("text"), "en")).collect().head.getDouble(0)
    r shouldBe 0.6 +- 1e-9 // the, and, the = 3/5
  }
}
