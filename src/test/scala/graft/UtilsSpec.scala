package graft

import graft.core.{JobContext, PipelineContext}
import graft.utils.{DataframeHelper, SparkConfActor, VariableSetter, ViewPartitioner}
import graft.source.HBaseMapping
import graft.sink.{FileWriter, SqlTableWriter}
import org.apache.spark.sql.functions._

class UtilsSpec extends SparkSpec {

  test("zipWithIndex global: contiguous 1..n, unique") {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val z = DataframeHelper.zipWithIndex(df, "idx")
    val agg = z.agg(count(lit(1)), min(col("idx")), max(col("idx")), countDistinct(col("idx"))).collect().head
    agg.getLong(0) shouldBe 6000L
    agg.getLong(1) shouldBe 1L
    agg.getLong(2) shouldBe 6000L
    agg.getLong(3) shouldBe 6000L
  }

  test("perGroupSequence equals the per-group window row_number bit-for-bit") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_orderkey") % 7).as("g"))
      .repartition(11) // scramble input partitioning before the range sort
    val fast = DataframeHelper.perGroupSequence(
        df, Seq("g"), Seq("l_orderkey", "l_linenumber"), "seq")
      .select("g", "l_orderkey", "l_linenumber", "seq")
    val window = df.withColumn("seq", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("l_orderkey"), col("l_linenumber"))).cast("long"))
      .select("g", "l_orderkey", "l_linenumber", "seq")
    fast.exceptAll(window).count() shouldBe 0L
    window.exceptAll(fast).count() shouldBe 0L
    fast.count() shouldBe 6000L
  }

  test("perGroupRunningSum equals the per-group window running sum bit-for-bit") {
    import org.apache.spark.sql.expressions.Window
    // UNIQUE order key by construction — the helper's contract (lineitem's
    // (orderkey, linenumber) is NOT unique in this testdata: tied rows
    // with different values make any running sum tie-order-dependent)
    val df = spark.range(0, 6000)
      .selectExpr("id % 5 AS g", "id AS k", "(id * 7) % 13 AS qty")
      .repartition(13)
    val fast = DataframeHelper.perGroupRunningSum(
        df, Seq("g"), Seq("k"), "qty", "run")
      .select("g", "k", "run")
    val window = df.withColumn("run", sum(col("qty")).over(
        Window.partitionBy(col("g")).orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .select("g", "k", "run")
    fast.exceptAll(window).count() shouldBe 0L
    window.exceptAll(fast).count() shouldBe 0L
    fast.count() shouldBe 6000L
  }

  test("perGroupRunningSum keeps the native sum type: fractional decimals are exact") {
    import org.apache.spark.sql.expressions.Window
    // decimal valueCol: the old per-segment cast-to-long truncated each
    // segment's partial independently, diverging from the window form
    val df = spark.range(0, 1000)
      .selectExpr("id % 3 AS g", "id AS k",
        "CAST((id % 7) + 0.25 AS DECIMAL(10,2)) AS amt")
      .repartition(7)
    val fast = DataframeHelper.perGroupRunningSum(
        df, Seq("g"), Seq("k"), "amt", "run")
      .select("g", "k", "run")
    val window = df.withColumn("run", sum(col("amt")).over(
        Window.partitionBy(col("g")).orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("g", "k", "run")
    fast.exceptAll(window).count() shouldBe 0L
    window.exceptAll(fast).count() shouldBe 0L
  }

  test("zipWithIndex partitioned: 1..k within each partition key") {
    val df = spark.read.parquet(s"$sfDir/nation.parquet")
    val z = DataframeHelper.zipWithIndex(df, "rn", Seq("n_regionkey"))
    val maxPer = z.groupBy(col("n_regionkey")).agg(max(col("rn")).as("m"), count(lit(1)).as("c"))
    maxPer.filter(col("m") =!= col("c")).count() shouldBe 0
  }

  test("split caps partition count per chunk") {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet").repartition(8)
    val chunks = DataframeHelper.split(df, 3)
    chunks.length shouldBe 3 // ceil(8/3) = 3 buckets
    chunks.map(_.count()).sum shouldBe 6000L
  }

  test("ViewPartitioner repartitions a view") {
    implicit val s = spark
    val ctx = new JobContext(PipelineContext())
    spark.read.parquet(s"$sfDir/orders.parquet").createOrReplaceTempView("vp_in")
    val out = new ViewPartitioner().viewName("vp_in").partitions(5).run(ctx).get
    out.rdd.getNumPartitions shouldBe 5
  }

  test("SparkConfActor sets session confs") {
    implicit val s = spark
    val ctx = new JobContext(PipelineContext())
    new SparkConfActor().sparkConf("spark.graft.test.flag", "on").run(ctx)
    spark.conf.get("spark.graft.test.flag") shouldBe "on"
  }

  test("VariableSetter publishes variables into the job context") {
    implicit val s = spark
    val ctx = new JobContext(PipelineContext())
    new VariableSetter().variable("stage", "prod").run(ctx)
    ctx.getVariable("stage") shouldBe Some("prod")
  }

  test("FileWriter writes and emptyWrite=no skips empty frames") {
    implicit val s = spark
    val ctx = new JobContext(PipelineContext())
    val out = tmpDir("fw")
    spark.read.parquet(s"$sfDir/region.parquet").createOrReplaceTempView("fw_v")
    new FileWriter().sinkFormat("parquet").fileUri(s"$out/full").sourceView("fw_v").run(ctx)
    spark.read.parquet(s"$out/full").count() shouldBe 5

    spark.read.parquet(s"$sfDir/region.parquet").filter("r_regionkey < 0")
      .createOrReplaceTempView("fw_empty")
    val w = new FileWriter().sinkFormat("parquet").fileUri(s"$out/empty").sourceView("fw_empty")
    w.init(Map("fileUri" -> s"$out/empty", "view" -> "fw_empty", "emptyWrite" -> "no", "format" -> "parquet"))
    w.run(ctx)
    new java.io.File(s"$out/empty").exists() shouldBe false
  }

  test("FileWriter partitionBy lays out partition directories") {
    implicit val s = spark
    val ctx = new JobContext(PipelineContext())
    val out = tmpDir("fwp")
    spark.read.parquet(s"$sfDir/nation.parquet").createOrReplaceTempView("fwp_v")
    new FileWriter().sinkFormat("parquet").fileUri(s"$out/n").sourceView("fwp_v")
      .partitionedBy("n_regionkey").run(ctx)
    new java.io.File(s"$out/n").list().count(_.startsWith("n_regionkey=")) shouldBe 5
    spark.read.parquet(s"$out/n").count() shouldBe 25
  }

  test("FileReader multi-uri + per-file metrics extra view") {
    implicit val s = spark
    val ctx = new JobContext(PipelineContext())
    val r = new graft.source.FileReader()
    r.init(Map("format" -> "parquet", "perFileMetrics" -> "true",
      "fileUri" -> s"$sfDir/region.parquet,$sfDir/nation.parquet",
      "ddlSchemaString" -> "r_regionkey int, r_name string"))
    // region+nation have different schemas; declared schema projects common shape
    val df = r.run(ctx).get
    df.count() shouldBe 30
    val extras = r.extraViews
    extras.map(_._1) should contain("__file_metrics")
    extras.head._2.count() shouldBe 2 // one row per file
  }

  test("ViewPartitioner with partition columns") {
    implicit val s = spark
    val ctx = new JobContext(PipelineContext())
    spark.read.parquet(s"$sfDir/customer.parquet").createOrReplaceTempView("vpc_in")
    val out = new ViewPartitioner().viewName("vpc_in").partitions(4)
      .partitionedBy("c_nationkey").run(ctx).get
    out.rdd.getNumPartitions shouldBe 4
    out.count() shouldBe 150
  }

  test("hbase column mapping + scan spec + rowkey parsing") {
    val props = Map(
      "columns.user_id" -> "cf:uid", "columns.score" -> "cf:s",
      "scan.keyStart" -> "a", "scan.timeStop" -> "123")
    val m = HBaseMapping.parse(props)
    m.map(c => (c.column, c.family, c.qualifier)).toSet shouldBe
      Set(("user_id", "cf", "uid"), ("score", "cf", "s"))
    val spec = HBaseMapping.scanSpec(props)
    spec.keyStart shouldBe Some("a")
    spec.tsStop shouldBe Some(123L)

    implicit val s = spark
    import spark.implicits._
    val df = Seq(("u1", 1), ("u2", 2)).toDF("user_id", "score")
    val keys = df.select(HBaseMapping.rowKeyColumn(df, Seq("user_id", "score"), "&").as("k"))
      .collect().map(_.getString(0)).sorted.toSeq
    keys shouldBe Seq("u1&1", "u2&2")
  }

  test("saltedJoin matches the plain join for inner and left") {
    import org.apache.spark.sql.functions._
    implicit val s = spark
    import spark.implicits._
    // add left rows with keys ABSENT from the right side, so the left-join
    // leg actually tests null preservation (TPC-H referential integrity
    // would otherwise make left degenerate to inner)
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
      .unionAll(Seq((-1L, -501L), (-2L, -502L)).toDF("o_orderkey", "o_custkey"))
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    for (jt <- Seq("inner", "left")) {
      val plain = orders.join(customer, Seq("o_custkey"), jt)
        .select("o_orderkey", "c_mktsegment").collect().map(_.toString).sorted
      val salted = DataframeHelper.saltedJoin(orders, customer, Seq("o_custkey"), 8, jt)
        .select("o_orderkey", "c_mktsegment").collect().map(_.toString).sorted
      salted shouldBe plain
    }
  }

  test("skewAwareJoin: salts only hot keys, result identical to plain join for inner and left") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // synthetic skew: ~90% of lineitem rows funnel into key 0; include a
    // left key absent from the right so the left-join leg preserves nulls
    val left = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(when(col("l_orderkey") % 10 < 9, lit(0L))
        .otherwise(col("l_orderkey")).as("k"), col("l_linenumber"))
      .unionAll(Seq((-7L, 99)).toDF("k", "l_linenumber"))
    val right = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(when(col("o_orderkey") % 100 === 0, lit(0L))
        .otherwise(col("o_orderkey")).as("k"), col("o_orderstatus"))
    for (jt <- Seq("inner", "left"); threshold <- Seq(100L, 1L, 1000000L)) {
      // threshold 100: only key 0 hot; 1: everything hot; 1e6: nothing hot
      val plain = left.join(right, Seq("k"), jt)
        .select("k", "l_linenumber", "o_orderstatus")
        .collect().map(_.toString).sorted
      val skew = graft.utils.DataframeHelper
        .skewAwareJoin(left, right, Seq("k"), 8, threshold, jt)
        .select("k", "l_linenumber", "o_orderstatus")
        .collect().map(_.toString).sorted
      skew shouldBe plain
    }
    // the hot set really is key-0-only at threshold 100: the cold leg must
    // not contain key 0, the hot leg must contain ONLY key 0
    val hot = left.groupBy("k").count().filter(col("count") > 100).select("k")
    hot.collect().map(_.getLong(0)).toSeq shouldBe Seq(0L)
  }

  test("saltedJoin tolerates map columns and spreads exact duplicates on request") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a MapType column on the left used to fail analysis (hash() rejects
    // maps); it must now be excluded from the salt hash, not break the join
    val left = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
      .withColumn("m", map(col("v"), col("k")))
    val right = Seq((1L, "X"), (2L, "Y")).toDF("k", "w")
    val out = DataframeHelper.saltedJoin(left, right, Seq("k"), 4)
      .select("k", "v", "w").collect().map(_.toString).sorted
    out shouldBe Seq("[1,a,X]", "[1,b,X]", "[2,c,Y]")

    // exact-duplicate rows of one hot key: content hash puts them all in a
    // single bucket; spreadDuplicates mixes in the partition id so the
    // duplicates spread across salt buckets (join result identical)
    val dup = spark.range(0, 4000).select(lit(42L).as("k"), lit("same").as("v"))
      .repartition(8)
    val plainRows = DataframeHelper
      .saltedJoin(dup, Seq((42L, "Z")).toDF("k", "w"), Seq("k"), 8, "inner", spreadDuplicates = true)
      .count()
    plainRows shouldBe 4000L
    // distinct salt buckets actually used: 1 without spreading (all rows
    // identical), >1 with partition-id spreading across 8 partitions
    val saltsUsed = (spread: Boolean) => {
      val salted = dup.withColumn("__salt_", pmod(hash(
        (if (spread) dup.columns.map(col).toIndexedSeq :+ spark_partition_id()
         else dup.columns.map(col).toIndexedSeq): _*), lit(8)))
      salted.select("__salt_").distinct().count()
    }
    saltsUsed(false) shouldBe 1L
    saltsUsed(true) should be > 1L
  }

  test("SqlTableWriter writes a catalog table") {
    implicit val s = spark
    val ctx = new JobContext(PipelineContext())
    val wh = spark.conf.get("spark.sql.warehouse.dir", "")
    spark.read.parquet(s"$sfDir/region.parquet").createOrReplaceTempView("stw_v")
    val w = new SqlTableWriter()
    w.init(Map("table" -> "stw_table", "view" -> "stw_v", "mode" -> "overwrite", "coalesce" -> "1"))
    w.run(ctx)
    spark.table("stw_table").count() shouldBe 5
    spark.sql("DROP TABLE stw_table")
  }
}
