package graft

import graft.plans.{PlanAudit, PlanAuditActor}
import org.apache.spark.sql.functions._

/**
 * The runtime plan audit (the 100 TB plan review as a product
 * feature): structural detection of scale-fatal shapes, Catalyst
 * maxRows-based downgrade of the reviewed-bounded broadcast-frame
 * idiom, and the actor's failOn gate.
 */
class PlanAuditSpec extends SparkSpec {

  private def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
  private def od = spark.read.parquet(s"$sfDir/orders.parquet")

  private def rules(df: org.apache.spark.sql.DataFrame, sev: String): Set[String] =
    PlanAudit.audit(df).filter(_.severity == sev).map(_.rule).toSet

  test("cartesian join: unbounded x unbounded is an error; vs a limit/grand-total frame it is info") {
    rules(li.crossJoin(od), "error") should contain("cartesian-join")
    // limit(16) frame: Catalyst proves the side bounded -> broadcast idiom
    val vsLimit = li.crossJoin(od.limit(16))
    rules(vsLimit, "error") should not contain "cartesian-join"
    rules(vsLimit, "info") should contain("bounded-cross-join")
    // 1-row grand-total aggregate frame (t16's corpus-stats shape)
    val vsTotal = li.crossJoin(od.agg(sum("o_totalprice").as("t")))
    rules(vsTotal, "error") should not contain "cartesian-join"
    rules(vsTotal, "info") should contain("bounded-cross-join")
  }

  test("partitionless window: error on unbounded input, info after a limit") {
    import org.apache.spark.sql.expressions.{Window => W}
    val w = W.orderBy("l_orderkey")
    rules(li.withColumn("rn", row_number().over(w)), "error") should
      contain("partitionless-window")
    val afterLimit = li.limit(100).withColumn("rn", row_number().over(w))
    rules(afterLimit, "error") should not contain "partitionless-window"
    rules(afterLimit, "info") should contain("partitionless-window")
  }

  test("bounded-key window: warn when ALL partition keys are low-cardinality, clean with a high-card key") {
    import org.apache.spark.sql.expressions.{Window => W}
    val docs = li.withColumn("lang", col("l_returnflag"))
    val byLang = docs.withColumn("rn",
      row_number().over(W.partitionBy("lang").orderBy("l_orderkey")))
    rules(byLang, "warn") should contain("bounded-key-window")
    val byLangAndKey = docs.withColumn("rn",
      row_number().over(W.partitionBy("lang", "l_orderkey").orderBy("l_linenumber")))
    rules(byLangAndKey, "warn") should not contain "bounded-key-window"
    // per-deployment extension of the key set
    val byTier = docs.withColumn("tier", col("l_linestatus")).withColumn("rn",
      row_number().over(W.partitionBy("tier").orderBy("l_orderkey")))
    rules(byTier, "warn") should not contain "bounded-key-window"
    PlanAudit.audit(byTier, PlanAudit.DefaultLowCardKeys + "tier")
      .filter(_.severity == "warn").map(_.rule) should contain("bounded-key-window")
  }

  test("global sort: warn without a limit, clean when it plans as top-k") {
    rules(li.orderBy("l_orderkey"), "warn") should contain("global-sort")
    rules(li.orderBy("l_orderkey").limit(10), "warn") should not contain "global-sort"
    // layout writes use repartitionByRange + sortWithinPartitions: no global sort node
    rules(li.repartitionByRange(4, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey"), "warn") should not contain "global-sort"
  }

  test("non-equi join: warn for inner range-only condition, error for outer; equi conjunct makes it clean") {
    val rangeOnly = li.join(od, col("l_orderkey") < col("o_orderkey"))
    rules(rangeOnly, "warn") should contain("non-equi-join")
    val outerRange = li.join(od, col("l_orderkey") < col("o_orderkey"), "left")
    rules(outerRange, "error") should contain("non-equi-join")
    val withEqui = li.join(od,
      col("l_orderkey") === col("o_orderkey") && col("l_tax") < col("o_totalprice"))
    rules(withEqui, "warn") should not contain "non-equi-join"
    rules(withEqui, "error") shouldBe empty
  }

  test("bounded-key-window: catalog column stats override the name heuristic") {
    import org.apache.spark.sql.expressions.{Window => W}
    // column stats only reach Statistics.attributeStats under CBO
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      spark.sql("DROP TABLE IF EXISTS pa_stats")
      li.select(col("l_orderkey").as("label"), (col("l_linenumber") % 2).as("parity"),
          col("l_quantity"))
        .write.mode("overwrite").saveAsTable("pa_stats")
      spark.sql("ANALYZE TABLE pa_stats COMPUTE STATISTICS FOR COLUMNS label, parity")
      val t = spark.table("pa_stats")
      // 'parity' (2 distinct, NOT a known bounded-key name): stats flag it
      val wLow = t.withColumn("rn",
        row_number().over(W.partitionBy("parity").orderBy("label")))
      rules(wLow, "warn") should contain("bounded-key-window")
      // 'label' IS on the name list, but stats prove it high-cardinality
      // (at this SF ~1.5k distinct; pass a tighter boundedRows so the
      // stats land ABOVE the threshold): the name false positive is
      // suppressed
      val wHigh = t.withColumn("rn",
        row_number().over(W.partitionBy("label").orderBy("parity")))
      PlanAudit.audit(wHigh, boundedRows = 64L)
        .map(_.rule) should not contain "bounded-key-window"
      // and without stats the name heuristic still fires on 'label'
      val noStats = li.select(col("l_orderkey").as("label"), col("l_quantity"))
        .withColumn("rn", row_number().over(W.partitionBy("label").orderBy("l_quantity")))
      rules(noStats, "warn") should contain("bounded-key-window")
      // correlated-keys direction: the PRODUCT of two name-listed keys'
      // distinct counts exceeding boundedRows must NOT suppress the name
      // heuristic (independence overestimates; the true combination count
      // could be as low as max(single)). Only a SINGLE key's own count
      // above the bound may silence it.
      spark.sql("DROP TABLE IF EXISTS pa_stats2")
      li.select((col("l_orderkey") % 40).as("label"),
          (col("l_suppkey") % 50).as("band"), col("l_quantity"))
        .write.mode("overwrite").saveAsTable("pa_stats2")
      spark.sql("ANALYZE TABLE pa_stats2 COMPUTE STATISTICS FOR COLUMNS label, band")
      val t2 = spark.table("pa_stats2")
      val wCorr = t2.withColumn("rn",
        row_number().over(W.partitionBy("label", "band").orderBy("l_quantity")))
      // product ~2000 > 100 but each single key <= 100: name heuristic fires
      PlanAudit.audit(wCorr, boundedRows = 100L)
        .map(_.rule) should contain("bounded-key-window")
      spark.sql("DROP TABLE IF EXISTS pa_stats2")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.sql("DROP TABLE IF EXISTS pa_stats")
    }
  }

  test("scan facts: unpushed filters, shuffle count, scan width") {
    // a v1 parquet scan always lists its translated PushedFilters, so the
    // empty-pushdown shape comes from DSv2 connectors (Iceberg/Delta print
    // "PushedFilters: []" when a predicate fails to translate) — drive the
    // parser on that exact block shape
    val dsv2Block =
      """(1) BatchScan iceberg cat.db.events
        |Output [2]: [user_id#1L, payload#2]
        |DataFilters: [isnotnull(payload#2), (length(payload#2) > 4)]
        |PushedFilters: []
        |ReadSchema: struct<user_id:bigint,payload:string>
        |
        |(2) Filter
        |Input: [user_id#1L]
        |""".stripMargin
    PlanAudit.physicalFindings(dsv2Block)
      .filter(_.severity == "warn").map(_.rule) should contain("unpushed-filters")
    // parquet pushes the same predicate shape: no warning on a live plan
    val pq = li.filter(col("l_quantity") > 10)
    PlanAudit.audit(pq).map(_.rule) should not contain "unpushed-filters"
    // format-drift guard: the absence above must come from a PARSED scan
    // block whose PushedFilters is non-empty — not from the parser
    // silently matching nothing after a Spark explain-format change. Pin
    // the live spellings the string parser keys on.
    val live = pq.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    live.linesIterator.exists(_.matches("""^\(\d+\) (Batch)?Scan .*""")) shouldBe true
    live.linesIterator.exists(l => l.trim.startsWith("PushedFilters:") &&
      !l.split(":", 2)(1).trim.startsWith("[]")) shouldBe true
    PlanAudit.physicalFindings(live).count(_.rule == "scan-width") should be >= 1
    val agg = PlanAudit.audit(li.groupBy("l_returnflag").count())
    agg.find(_.rule == "shuffle-count").get.detail should startWith("1 ")
    val width = agg.filter(_.rule == "scan-width").map(_.detail)
    width should have size 1
    width.head should include("reads 1 column")
  }

  test("actor: failOn gate, allowRules suppression, findings view + metrics") {
    li.crossJoin(od).createOrReplaceTempView("pa_bad")
    li.filter(col("l_quantity") > 10).groupBy("l_returnflag").count()
      .createOrReplaceTempView("pa_good")
    val ctx = new graft.core.JobContext(graft.core.PipelineContext())(spark)
    implicit val s = spark

    val a = new PlanAuditActor()
    a.init(Map("view" -> "pa_bad"))
    val ex = intercept[IllegalStateException](a.run(ctx))
    ex.getMessage should include("cartesian-join")

    val allowed = new PlanAuditActor()
    allowed.init(Map("view" -> "pa_bad", "allowRules" -> "cartesian-join"))
    val out = allowed.run(ctx).get
    out.columns shouldBe Array("rule", "severity", "node", "detail")
    out.filter(col("rule") === "cartesian-join").count() shouldBe 0L
    allowed.collectMetrics(out).toMap.apply("findings_error") shouldBe "0"

    val good = new PlanAuditActor()
    good.init(Map("view" -> "pa_good", "failOn" -> "warn"))
    val report = good.run(ctx).get
    report.filter(col("severity") === "error").count() shouldBe 0L
    // info facts still reported
    report.filter(col("rule") === "shuffle-count").count() shouldBe 1L

    intercept[IllegalArgumentException] {
      new PlanAuditActor().init(Map("view" -> "pa_bad", "failOn" -> "loud"))
    }
    spark.catalog.dropTempView("pa_bad"); spark.catalog.dropTempView("pa_good")
  }

  test("streaming frames audit without executing: rules fire on the logical plan") {
    import org.apache.spark.sql.expressions.{Window => W}
    val dir = tmpDir("audit_stream")
    writeFile(dir, "a.csv", "1,x\n2,y\n")
    val stream = spark.readStream.schema("id LONG, v STRING").csv(dir)
    // pure plan inspection — no query start, no checkpoint
    val clean = PlanAudit.audit(stream.filter(col("id") > 0))
    clean.filter(_.severity == "error") shouldBe empty
    val windowed = stream.withColumn("rn",
      row_number().over(W.orderBy("id")))
    PlanAudit.audit(windowed).filter(_.severity == "error")
      .map(_.rule) should contain("partitionless-window")
  }

  test("dogfood: catalog plans adjudicate the same way the human review did") {
    def q(name: String) = Queries.all.find(_.name == name).get.run(spark, sfDir)
    // a clean pushdown query: no error-severity findings
    PlanAudit.audit(q("q2_filter_project")).filter(_.severity == "error") shouldBe empty
    // the labeled brute-force baseline: the audit flags exactly the shape
    // the PlanSpec allowlist documents
    PlanAudit.audit(q("s1_knn_bruteforce"))
      .filter(_.severity == "error").map(_.rule) should contain("cartesian-join")
    // the windowless curation rewrite (r8's weak, fixed in r9): audit-clean
    PlanAudit.audit(q("c13_quality_calibrate"))
      .filter(f => f.severity == "error" ||
        f.rule == "bounded-key-window") shouldBe empty
  }
}
