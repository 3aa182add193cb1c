package graft

import graft.core.PipelineContext
import graft.core.PipelineRunner
import graft.pipeline.PipelineBuilder

/** The docs/examples pipelines must actually RUN — docs that drift from
  * the code fail CI here, not on a user's cluster. */
class ExamplesSpec extends SparkSpec {

  private def runExample(file: String, vars: Map[String, String]): Unit = {
    implicit val s = spark
    val pipeline = PipelineBuilder.fromFile(s"docs/examples/$file", submitVars = vars)
    new PipelineRunner(PipelineContext(singleSparkSession = true)).run(pipeline)
  }

  test("every example YAML declares the plan gate and is e2e-tested here") {
    // the examples are the product's showcase: each must pass its own
    // 100 TB plan review (settings.planAudit: error) and actually RUN in
    // this suite — a new example can't silently skip either
    val yamls = new java.io.File("docs/examples").listFiles()
      .filter(_.getName.endsWith(".yaml")).map(_.getName).sorted
    yamls should not be empty
    val specSrc = {
      val src = scala.io.Source.fromFile("src/test/scala/graft/ExamplesSpec.scala", "UTF-8")
      try src.mkString finally src.close()
    }
    yamls.foreach { y =>
      val f = scala.io.Source.fromFile(s"docs/examples/$y", "UTF-8")
      val body = try f.mkString finally f.close()
      withClue(s"$y: ") {
        body should include ("planAudit: \"error\"")
        specSrc should include (y)
      }
    }
  }

  test("batch_report.yaml runs end-to-end and writes a partitioned report") {
    val out = tmpDir("ex_report")
    runExample("batch_report.yaml", Map("data_dir" -> sfDir, "out_dir" -> out))
    val report = spark.read.parquet(s"$out/report")
    report.count() should be > 0L
    report.columns.toSet shouldBe Set("l_returnflag", "l_linestatus", "orders", "total_qty")
  }

  test("stream_sessionize.yaml drains a csv stream into session parquet") {
    val in = tmpDir("ex_sess_in")
    val out = tmpDir("ex_sess_out")
    val ckpt = tmpDir("ex_sess_ckpt")
    writeFile(in, "events.csv",
      "7,2024-01-01 10:00:00\n7,2024-01-01 10:10:00\n7,2024-01-01 12:00:00\n9,2024-01-01 11:00:00\n")
    runExample("stream_sessionize.yaml",
      Map("in_dir" -> in, "out_dir" -> out, "ckpt_dir" -> ckpt))
    val sessions = spark.read.parquet(s"$out/sessions")
    // user 7: two sessions (10:00 block, 12:00); user 9: one
    sessions.count() shouldBe 3L
    sessions.columns should contain("session_start")
  }

  test("dedup_corpus.yaml emits LSH candidate pairs with the documented schema") {
    implicit val s = spark
    import org.apache.spark.sql.functions._
    val out = tmpDir("ex_dedup")
    runExample("dedup_corpus.yaml", Map("data_dir" -> sfDir, "out_dir" -> out))
    val pairs = spark.read.parquet(s"$out/candidate_pairs")
    // the raw corpus may legitimately contain few near-dups; the contract
    // here is that the pipeline runs and emits the documented shape
    pairs.columns should contain allOf ("id_a", "id_b")
    // the cdc_clean job equals the library path row-for-row, and the
    // planted shifted copies lost their duplicated chunks
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val planted = docs.select(col("doc_id"), col("text"))
      .unionAll(docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 400000).as("doc_id"),
          substring(graft.ml.Dedup.normText(col("text")), 8, Int.MaxValue).as("text")))
    val expect = graft.ml.Dedup.cdcClean(planted, "text", "doc_id")
      .collect().map(_.toSeq.mkString("|")).toSet
    val cleaned = spark.read.parquet(s"$out/cleaned")
    cleaned.collect().map(_.toSeq.mkString("|")).toSet shouldBe expect
    val copies = cleaned.filter(col("id") >= 400000)
    copies.count() should be > 0L
    // a SHORT doc's shifted copy can have no dedup-eligible chunk at all
    // (every chunk under minLen) — the pin is "the vast majority of the
    // planted copies lost chunks", not "all"
    copies.filter(col("n_kept") < col("n_chunks")).count().toDouble should be >=
      0.9 * copies.count()
  }

  test("incremental_ingest.yaml matches a new batch against the corpus index") {
    val out = tmpDir("ex_ingest")
    runExample("incremental_ingest.yaml", Map("data_dir" -> sfDir, "out_dir" -> out))
    val m = spark.read.parquet(s"$out/ingest_matches")
    m.columns shouldBe Array("new_id", "index_id", "est_jaccard")
    // every planted copy matches its base doc (new_id = base + 500000)
    val baseHits = m.filter(org.apache.spark.sql.functions.expr("index_id = new_id - 500000")).count()
    val planted = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter("doc_id % 25 = 0").count()
    baseHits shouldBe planted
  }

  test("ann_index_lifecycle.yaml: persisted cell-partitioned IVF index serves probes exactly") {
    implicit val s = spark
    import org.apache.spark.sql.functions._
    val out = tmpDir("ex_ann")
    runExample("ann_index_lifecycle.yaml", Map("data_dir" -> sfDir, "out_dir" -> out))
    // the assignments landed partitioned by cell — the file-level pruning
    // surface a probe's nprobe-cell read depends on
    val cellDirs = new java.io.File(s"$out/ivf_cells").listFiles()
      .filter(_.getName.startsWith("crank=")).map(_.getName).toSet
    cellDirs.size should be > 1
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cos_sim"), r.getAs[Int]("rank"))).toSet
    val viaIndex = key(spark.read.parquet(s"$out/neighbors"))
    // in-session reference: the one-shot ivfTopK over the same corpus
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val ref = key(graft.ml.Similarity.ivfTopK(
      emb.filter(col("vec_id") % 50 === 0), emb, "vec_id", "v",
      k = 5, numCentroids = 16, nprobe = 2))
    viaIndex shouldBe ref
    viaIndex.size should be > 0
    // the serving-form probe (stateless routing + k-pair top-k state)
    // returned the same neighbors and ranks, similarity in micro-units
    def keyU(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("cos_u"), r.getAs[Int]("rank"))).toSet
    val viaServing = keyU(spark.read.parquet(s"$out/neighbors_serving"))
    val refU = keyU(spark.read.parquet(s"$out/neighbors")
      .withColumn("cos_u", expr("cast(round(cos_sim * 1000000) AS BIGINT)")))
    viaServing shouldBe refU
  }

  test("hybrid_retrieval.yaml (semanticIndex: ivf) equals the s11 catalog query exactly") {
    val out = tmpDir("ex_hybrid")
    runExample("hybrid_retrieval.yaml", Map("data_dir" -> sfDir, "out_dir" -> out))
    val viaPipeline = spark.read.parquet(s"$out/fused").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("lex_rank"), r.getAs[Int]("sem_rank"),
        r.getAs[Long]("rrf_u"), r.getAs[Int]("rank"))).toSet
    val viaCatalog = SparkEntry.queries("s11_hybrid_rrf_ivf")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("lex_rank"), r.getAs[Int]("sem_rank"),
        r.getAs[Long]("rrf_u"), r.getAs[Int]("rank"))).toSet
    viaPipeline shouldBe viaCatalog
    viaPipeline.size should be > 0
  }

  test("index_lifecycle.yaml: build->persist->load->match equals the in-session path") {
    implicit val s = spark
    import org.apache.spark.sql.functions._
    val out = tmpDir("ex_lifecycle")
    runExample("index_lifecycle.yaml", Map("data_dir" -> sfDir, "out_dir" -> out))
    // the persisted index is a signature frame, not documents
    val idx = spark.read.parquet(s"$out/dedup_index")
    idx.columns.toSet shouldBe ("id" +: (0 until 8).map(i => s"mh$i")).toSet
    val viaIndex = spark.read.parquet(s"$out/ingest_matches").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // in-session reference: same batch matched against the RAW corpus
    // (signatures recomputed) — results must be identical, proving the
    // persisted index carries everything matching needs
    val ctx = new graft.core.JobContext(graft.core.PipelineContext())
    spark.read.parquet(s"$sfDir/documents.parquet")
      .createOrReplaceTempView("lc_corpus")
    spark.table("lc_corpus").filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"),
        concat(col("text"), lit(" ingest copy")).as("text"))
      .createOrReplaceTempView("lc_batch")
    val da = new graft.ml.DedupActor()
    da.init(Map("view" -> "lc_batch", "method" -> "incremental",
      "indexView" -> "lc_corpus", "minEstJaccard" -> "0.5"))
    val inSession = da.run(ctx).get.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    viaIndex shouldBe inSession
    viaIndex.nonEmpty shouldBe true
    // loading a NON-signature frame as an index is a clear error
    val bad = new graft.ml.DedupActor()
    bad.init(Map("view" -> "lc_batch", "method" -> "incremental",
      "indexView" -> "lc_corpus", "indexIsSignatures" -> "true"))
    val ex = intercept[IllegalArgumentException] { bad.run(ctx) }
    ex.getMessage should include("signature frame")
  }

  test("langid_lifecycle.yaml: persisted weights score identically to the in-session trainer, accurately") {
    implicit val s = spark
    import org.apache.spark.sql.functions._
    val out = tmpDir("ex_langid")
    runExample("langid_lifecycle.yaml", Map("data_dir" -> sfDir, "out_dir" -> out))
    // the persisted model is the (lang, bucket, w) weight frame
    val weights = spark.read.parquet(s"$out/langid_weights")
    weights.columns.toSet shouldBe Set("lang", "bucket", "w")
    weights.select("lang").distinct().count() shouldBe 5L
    // in-session reference: the same fixture trained + applied without
    // the persisted round-trip must score every doc identically
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val mut = docs.select(col("doc_id"), col("lang"),
      concat_ws(" ", expr(
        """transform(
          |  filter(split(lower(regexp_replace(text, '\\s+', ' ')), ' '),
          |         x -> length(x) > 0),
          |  w -> CASE WHEN lang = 'es' THEN concat(w, 'cion')
          |            WHEN lang = 'de' THEN concat(w, 'en')
          |            WHEN lang = 'fr' THEN concat('le', w)
          |            WHEN lang = 'zh' THEN reverse(w)
          |            ELSE w END)""".stripMargin)).as("text"))
    val wIn = graft.ml.TextAnalysis.langIdTrain(mut, "doc_id", "text", "lang",
      Seq("de", "en", "es", "fr", "zh"), epochs = 2, buckets = 512)
    val inSession = graft.ml.TextAnalysis.langIdApply(mut, "doc_id", "text", wIn, 512)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val viaPipeline = spark.read.parquet(s"$out/predictions")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    viaPipeline shouldBe inSession
    // and the model actually predicts: trained-on-corpus accuracy on the
    // mutated fixture is essentially perfect
    val truth = mut.select(col("doc_id").as("id"), col("lang"))
    val acc = spark.read.parquet(s"$out/predictions").join(truth, "id")
    val n = acc.count()
    val correct = acc.filter(col("lang_pred") === col("lang")).count()
    (correct * 10) should be >= (n * 9)
  }

  test("dedup_resolution_lifecycle.yaml: build->persist->verify->report/soft equals the in-session path") {
    implicit val s = spark
    import org.apache.spark.sql.functions._
    val out = tmpDir("ex_resolution")
    runExample("dedup_resolution_lifecycle.yaml", Map("data_dir" -> sfDir, "out_dir" -> out))
    // the artifact is the label frame + the stamped corpus fingerprint
    val artifact = spark.read.parquet(s"$out/resolution")
    artifact.columns.toSet shouldBe Set("id", "keep_id", "is_duplicate", "fp_n", "fp_h")
    artifact.count() should be > 0L
    // in-session reference: the same corpus resolved + reported WITHOUT
    // the artifact — the persisted-resolution path must be row-identical
    val ctx = new graft.core.JobContext(graft.core.PipelineContext())
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.select(col("doc_id"), col("text"), col("source"))
      .unionAll(docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" dup dup dup")).as("text"), col("source")))
      .createOrReplaceTempView("rl_corpus")
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toSeq.mkString("|")).toSet
    // the fingerprint SIDECAR landed beside the artifact: one stored row,
    // equal to the live corpus fingerprint (the serve-many integrity
    // check compares the artifact against THIS row, never re-scanning)
    val sidecar = spark.read.parquet(s"$out/corpus_fp")
    sidecar.columns.toSeq shouldBe Seq("fp_n", "fp_h")
    sidecar.count() shouldBe 1L
    val liveFp = graft.ml.Dedup.corpusFingerprint(
      spark.table("rl_corpus").select(col("doc_id"), col("text")),
      "text", "doc_id").head()
    sidecar.head().toSeq shouldBe liveFp.toSeq
    val repActor = new graft.ml.DedupActor()
    repActor.init(Map("view" -> "rl_corpus", "method" -> "report"))
    rows(spark.read.parquet(s"$out/dedup_report")) shouldBe rows(repActor.run(ctx).get)
    val softActor = new graft.ml.DedupActor()
    softActor.init(Map("view" -> "rl_corpus", "method" -> "soft"))
    rows(spark.read.parquet(s"$out/soft_dedup")) shouldBe rows(softActor.run(ctx).get)
    spark.read.parquet(s"$out/soft_dedup").count() shouldBe
      spark.table("rl_corpus").count()
    // the ingest job's incremental fold equals a full re-resolve over
    // (corpus ∪ batch) — the artifact is maintainable, not rebuild-only
    val batch = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 600000).as("doc_id"), col("text"))
    val fullUnion = graft.ml.Dedup.resolveDuplicates(
        graft.ml.Dedup.lshCandidatePairs(graft.ml.Dedup.minHashSignatures(
          spark.table("rl_corpus").select(col("doc_id"), col("text")).unionAll(batch),
          "text", "doc_id")), 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.read.parquet(s"$out/resolution_v2")
      .select("id", "keep_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe fullUnion
    // the updated frame is a first-class artifact: it carries the UNION
    // corpus' fingerprint, so the next resolve-load can verify it
    val v2 = spark.read.parquet(s"$out/resolution_v2")
    v2.columns.toSet shouldBe Set("id", "keep_id", "is_duplicate", "fp_n", "fp_h")
    val expectFp = graft.ml.Dedup.corpusFingerprint(
      spark.table("rl_corpus").select(col("doc_id"), col("text")).unionAll(batch),
      "text", "doc_id").head()
    v2.select("fp_n", "fp_h").distinct().collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSet shouldBe
        Set((expectFp.getLong(0), expectFp.getLong(1)))
    // the streaming ingest gate's drained weights equal the BATCH REPLAY
    // through the resolve-update path (a different composition: whole
    // batch at once vs per-micro-batch legs) — stream == batch, and the
    // gate weights are what the next maintenance fold would assign
    val gateBatch = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 600000).as("doc_id"), col("text"))
      .unionAll(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 800000).as("doc_id"), reverse(col("text")).as("text")))
      .unionAll(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 900000).as("doc_id"),
          concat(reverse(col("text")), lit(" qq zz qq zz")).as("text")))
    val replayLabels = graft.ml.Dedup.resolveUpdate(
      spark.read.parquet(s"$out/resolution"),
      graft.ml.Dedup.minHashSignatures(
        spark.table("rl_corpus").select(col("doc_id"), col("text")), "text", "doc_id"),
      graft.ml.Dedup.minHashSignatures(gateBatch, "text", "doc_id"),
      iterations = 8)
    val replayWeights = graft.ml.Dedup.softDedupWeights(
      replayLabels, gateBatch.select("doc_id"), "doc_id")
    rows(spark.read.parquet(s"$out/gate_weights")) shouldBe rows(replayWeights)
    // the within-stream pair (no index counterpart) got down-weighted
    spark.read.parquet(s"$out/gate_weights")
      .filter(col("doc_id") >= 800000 && col("weight_u") <= 500000)
      .count() should be > 0L
    // integrity: consuming the artifact against a DIFFERENT corpus fails
    // loudly at the fingerprint check instead of silently mis-reporting
    spark.table("rl_corpus").filter(col("doc_id") % 2 === 0)
      .createOrReplaceTempView("rl_other")
    spark.read.parquet(s"$out/resolution").createOrReplaceTempView("rl_res")
    val stale = new graft.ml.DedupActor()
    stale.init(Map("view" -> "rl_other", "method" -> "report",
      "resolutionView" -> "rl_res"))
    val ex = intercept[IllegalArgumentException] { stale.run(ctx) }
    ex.getMessage should include("different corpus")
    // the STORED-fingerprint path fails just as loudly: a sidecar
    // refreshed with a drifted corpus exposes the stale artifact with
    // two 1-row reads — no corpus re-scan, same failure
    graft.ml.Dedup.corpusFingerprint(spark.table("rl_other"), "text", "doc_id")
      .createOrReplaceTempView("rl_other_fp")
    val staleStored = new graft.ml.DedupActor()
    staleStored.init(Map("view" -> "rl_other", "method" -> "report",
      "resolutionView" -> "rl_res", "fingerprintView" -> "rl_other_fp"))
    val ex2 = intercept[IllegalArgumentException] { staleStored.run(ctx) }
    ex2.getMessage should include("different corpus")
    // REGRESSION (by-name corpus arg): the documented serve-many config
    // — a SIGNATURE index plus a STORED fingerprint — must verify via
    // the sidecar without ever building the (id, text) projection of
    // the signature frame (a sig frame has no text column; an eager
    // corpus argument threw AnalysisException before the check ran)
    val corpusSigs = graft.ml.Dedup.minHashSignatures(
      spark.table("rl_corpus").select(col("doc_id"), col("text")), "text", "doc_id")
    corpusSigs.createOrReplaceTempView("rl_sigs")
    graft.ml.Dedup.corpusFingerprint(
      spark.table("rl_corpus").select(col("doc_id"), col("text")), "text", "doc_id")
      .createOrReplaceTempView("rl_fp")
    batch.createOrReplaceTempView("rl_batch")
    val sigFold = new graft.ml.DedupActor()
    sigFold.init(Map("view" -> "rl_batch", "method" -> "resolve-update",
      "resolutionView" -> "rl_res", "indexView" -> "rl_sigs",
      "indexIsSignatures" -> "true", "fingerprintView" -> "rl_fp",
      "iterations" -> "8"))
    val folded = sigFold.run(ctx).get
    folded.select("id", "keep_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe fullUnion
    // a sig-index fold re-stamps in the SIGNATURE domain: the fingerprint
    // of (index sigs ∪ batch sigs) — the folded frame the next consumer's
    // index would be
    val unionSigFp = graft.ml.Dedup.signatureFingerprint(
      corpusSigs.unionAll(
        graft.ml.Dedup.minHashSignatures(batch, "text", "doc_id"))).head()
    folded.select("fp_n", "fp_h").distinct().collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSet shouldBe
        Set((unionSigFp.getLong(0), unionSigFp.getLong(1)))
    // REBASE pin (pipeline level): drain 2 ran against the REBASED
    // artifacts (rebased_labels + rebased_sigs from the stream-gate-
    // rebase job) and its weights must equal the never-rebased gate's
    // over the same two-drain history — the library-layer MlSpec pin,
    // held end-to-end through the YAML surface and parquet round-trips
    val batch2 = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 950000).as("doc_id"),
        concat(reverse(col("text")), lit(" qq zz")).as("text"))
    val g0 = new graft.ml.SoftDedupGate(
      spark.read.parquet(s"$out/resolution"),
      graft.ml.Dedup.minHashSignatures(
        spark.table("rl_corpus").select(col("doc_id"), col("text")),
        "text", "doc_id"))
    g0.ingest(gateBatch, "text", "doc_id")
    g0.ingest(batch2, "text", "doc_id")
    val neverRebased = g0.weights(batch2.select("doc_id"), "doc_id")
      .withColumnRenamed("id", "doc_id")
    rows(spark.read.parquet(s"$out/gate2_weights")) shouldBe rows(neverRebased)
    // and the drain-2 docs matched through the rebased INDEX leg (their
    // stream-internal partners are in the index now): down-weighted
    spark.read.parquet(s"$out/gate2_weights")
      .filter(col("weight_u") < 1000000L).count() should be > 0L
    // the REBASED resolution is a first-class artifact: stamped with the
    // folded index's SIGNATURE fingerprint, sidecar landed beside it,
    // and drain 2 above ran with verifyResolution: true +
    // fingerprintView through the YAML — the rebase lifecycle verifies
    // end-to-end, not just on the build side
    val rl = spark.read.parquet(s"$out/rebased_labels")
    rl.columns.toSet shouldBe Set("id", "keep_id", "is_duplicate", "fp_n", "fp_h")
    val sigFp = graft.ml.Dedup.signatureFingerprint(
      spark.read.parquet(s"$out/rebased_sigs")).head()
    val rbSidecar = spark.read.parquet(s"$out/rebased_fp")
    rbSidecar.count() shouldBe 1L
    rbSidecar.head().toSeq shouldBe sigFp.toSeq
    rl.select("fp_n", "fp_h").distinct().collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSet shouldBe
        Set((sigFp.getLong(0), sigFp.getLong(1)))
    // a STALE rebased artifact fails the sig-domain check just as loudly
    // as the text-domain one: a drifted index (here: truncated) carries
    // a fresh sidecar the old stamp can't match — two 1-row reads
    graft.ml.Dedup.signatureFingerprint(
        spark.read.parquet(s"$out/rebased_sigs").limit(5))
      .createOrReplaceTempView("rb_stale_fp")
    rl.createOrReplaceTempView("rb_res")
    val staleSig = new graft.ml.DedupActor()
    staleSig.init(Map("view" -> "rl_corpus", "method" -> "soft",
      "resolutionView" -> "rb_res", "fingerprintView" -> "rb_stale_fp"))
    val ex3 = intercept[IllegalArgumentException] { staleSig.run(ctx) }
    ex3.getMessage should include("different corpus")
  }

  test("decontamination_lifecycle.yaml: bloom build->persist->load->flag equals the in-session path") {
    implicit val s = spark
    import org.apache.spark.sql.functions._
    val out = tmpDir("ex_decon")
    runExample("decontamination_lifecycle.yaml",
      Map("data_dir" -> sfDir, "out_dir" -> out))
    // the persisted filter is ONE state row, not the eval shingle set
    val st = spark.read.parquet(s"$out/eval_bloom")
    st.columns.toSeq shouldBe Seq("bf")
    st.count() shouldBe 1L
    val viaState = spark.read.parquet(s"$out/contamination_flags").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // in-session reference: same corpus flagged against the raw eval docs
    // (filter rebuilt) — flags must be identical, proving the persisted
    // state carries everything decontamination needs
    val ctx = new graft.core.JobContext(graft.core.PipelineContext())
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.filter(col("doc_id") % 50 === 0).createOrReplaceTempView("dl_eval")
    docs.filter(col("doc_id") % 50 =!= 0).createOrReplaceTempView("dl_train")
    val da = new graft.ml.DedupActor()
    da.init(Map("view" -> "dl_train", "method" -> "decontaminate",
      "evalView" -> "dl_eval"))
    val inSession = da.run(ctx).get.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    viaState shouldBe inSession
    // the fixture plants real contamination (d10's eval rule), so the
    // flags must be non-vacuous in both directions
    viaState.values.toSet shouldBe Set(0, 1)
  }

  test("corpus_profile.yaml folds sketch states and merges them in a later job") {
    implicit val s = spark
    import org.apache.spark.sql.functions._
    val out = tmpDir("ex_profile")
    runExample("corpus_profile.yaml", Map("data_dir" -> sfDir, "out_dir" -> out))
    // intermediate states: one row per event_type, binary sketch columns
    val states = spark.read.parquet(s"$out/profile_states")
    states.columns.toSet shouldBe Set("event_type", "rows_seen",
      "users_state", "value_state", "freq_state", "sample_users")
    val profile = spark.read.parquet(s"$out/profile").head()
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    profile.getAs[Long]("total_rows") shouldBe ev.count()
    // merged HLL estimate vs exact distinct users: within the 3-sigma band
    val exact = ev.agg(countDistinct(col("user_id"))).head().getLong(0)
    val est = profile.getAs[Long]("distinct_users")
    math.abs(est - exact).toDouble should be <= math.max(3.0, exact * 0.05)
    // merged KLL median: exact rank within the error budget
    val med = profile.getAs[Double]("value_median")
    val n = ev.filter(col("value").isNotNull).count().toDouble
    val rank = ev.filter(col("value").cast("double") <= med).count() / n
    math.abs(rank - 0.5) should be < 0.03
    // merged CMS point estimate for user 1: one-sided error vs exact
    val ex1 = ev.filter(col("user_id") === 1L).count()
    val cms1 = profile.getAs[Long]("user1_events")
    cms1 should be >= ex1
    cms1 should be <= ex1 + math.ceil(2.72 * ev.count() / 2048).toLong
  }

  test("corpus_health.yaml: token drift + zipf fit + centroid drift in one health report") {
    implicit val s = spark
    import org.apache.spark.sql.functions._
    val out = tmpDir("ex_health")
    runExample("corpus_health.yaml", Map("data_dir" -> sfDir, "out_dir" -> out))
    val report = spark.read.parquet(s"$out/health_report")
    report.columns shouldBe Array("source", "n_toks", "drift_bits",
      "ppl_ratio_u", "n_ranks", "decay_u", "n_oov", "oov_u")
    // one row per source present in both snapshots; ratios are sane
    report.count() should be > 0L
    report.filter(col("ppl_ratio_u") < 900000L).count() shouldBe 0
    report.filter(col("oov_u") < 0L || col("oov_u") > 1000000L).count() shouldBe 0
    val emb = spark.read.parquet(s"$out/embedding_drift")
    emb.columns shouldBe Array("label", "n_new", "n_old", "dims", "l1_drift_u")
    emb.filter(col("n_new") < col("n_old")).count() shouldBe 0
  }

  test("training_data_run.yaml: quality -> perplexity -> dedup -> scrub -> shuffle, end to end") {
    implicit val s = spark
    import org.apache.spark.sql.functions._
    val out = tmpDir("ex_trainrun")
    runExample("training_data_run.yaml", Map(
      "data_dir" -> sfDir, "out_dir" -> out, "seed" -> "r10",
      // wide calibration band at sandbox scale: the gate mechanism is
      // what the test exercises, not a tuned threshold
      "min_quality" -> "0.05", "ppl_lo" -> "1000000", "ppl_hi" -> "60000000"))
    val docs = spark.read.parquet(s"$out/scrubbed_docs")
    docs.columns shouldBe Array("doc_id", "redacted", "n_redacted")
    val n = docs.count()
    n should be > 0L
    // dedup kept one row per doc id (exact keeps are unique)
    docs.select("doc_id").distinct().count() shouldBe n
    val order = spark.read.parquet(s"$out/train_order")
    order.columns shouldBe Array("doc_id", "epoch", "shard", "ord_key", "pos")
    // every surviving doc got a position in BOTH epochs
    order.count() shouldBe 2 * n
    order.groupBy("epoch").count().collect().map(_.getLong(1)).toSet shouldBe Set(n)
    // positions are dense 1..k within each (epoch, shard)
    val dense = order.groupBy("epoch", "shard")
      .agg(count(lit(1)).as("c"), max(col("pos")).as("mx"), min(col("pos")).as("mn"))
    dense.filter(col("mx") =!= col("c") || col("mn") =!= 1L).count() shouldBe 0
  }

  test("curate_corpus.yaml runs semdedup and bm25 through the actor surface") {
    val out = tmpDir("ex_curate")
    runExample("curate_corpus.yaml",
      Map("data_dir" -> sfDir, "out_dir" -> out, "bm25_terms" -> "dup, join, query"))
    val dups = spark.read.parquet(s"$out/semantic_dups")
    dups.columns shouldBe Array("id", "cluster", "is_dup")
    dups.count() shouldBe spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val scored = spark.read.parquet(s"$out/scored_docs")
    scored.columns should contain allOf ("quality", "n_terms", "bm25_q")
    scored.count() shouldBe spark.read.parquet(s"$sfDir/documents.parquet").count()
  }

  test("image_dedup.yaml: decode -> hash -> pair -> resolve keeps cluster minima") {
    implicit val s = spark
    import org.apache.spark.sql.functions._
    val out = tmpDir("ex_imgdedup")
    // image fixture: 20 distinct doc images + exact copies of every 4th
    // (ids shifted +1000), real PNGs on disk like a thumbnail table
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(20)
    val withCopies = docs.unionAll(
      docs.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 1000).as("doc_id"), col("text")))
    graft.ml.Multimodal.textToGrayPng(withCopies, "doc_id", "text", 16, 16)
      .write.mode("overwrite").parquet(s"$out/images")
    runExample("image_dedup.yaml",
      Map("images_dir" -> s"$out/images", "out_dir" -> out))
    val keep = spark.read.parquet(s"$out/image_keep_list")
    keep.columns shouldBe Array("id", "keep_id", "is_duplicate")
    // every planted copy resolves to its base image as the cluster min
    val copies = keep.filter(col("id") >= 1000)
    copies.count() should be >= 1L
    copies.filter(col("keep_id") =!= col("id") - 1000).count() shouldBe 0L
    copies.filter(!col("is_duplicate")).count() shouldBe 0L
  }

  test("link_analysis.yaml ranks and density-filters one co-occurrence projection") {
    implicit val s = spark
    import org.apache.spark.sql.functions._
    val out = tmpDir("ex_links")
    runExample("link_analysis.yaml", Map("data_dir" -> sfDir, "out_dir" -> out))
    val rank = spark.read.parquet(s"$out/link_rank")
    rank.columns shouldBe Array("id", "pr")
    rank.count() should be >= 1L
    // ranks respect the quantized floor (teleport term)
    rank.filter(col("pr") < 150000L).count() shouldBe 0L
    val core = spark.read.parquet(s"$out/dense_core")
    core.columns shouldBe Array("node", "deg")
    // survivors of the k=3 peeling prefix kept degree >= 3 in the last
    // peel they passed; the final recount can only shrink via later rounds
    core.filter(col("deg") < 1L).count() shouldBe 0L
    // the core is a subset of the ranked node set
    core.join(rank, core("node") === rank("id"), "left_anti").count() shouldBe 0L
  }

  test("curation_splits.yaml: calibrated view equals the c13 catalog query; splits leak-free") {
    implicit val s = spark
    import org.apache.spark.sql.functions._
    val out = tmpDir("ex_curate")
    runExample("curation_splits.yaml", Map("data_dir" -> sfDir, "out_dir" -> out))
    val viaPipeline = spark.read.parquet(s"$out/calibrated").collect()
      .map(_.toString).toSet
    val viaCatalog = SparkEntry.queries("c13_quality_calibrate")(spark, sfDir)
      .collect().map(_.toString).toSet
    viaPipeline shouldBe viaCatalog
    val splits = spark.read.parquet(s"$out/splits")
    // only the kept (top-half) docs were split, and the no-leak
    // invariant column reads 1 on every row
    splits.count() shouldBe spark.read.parquet(s"$out/calibrated")
      .filter(col("keep") === 1).count()
    splits.filter(col("fp_splits") =!= 1L).count() shouldBe 0L
  }

  test("ann_incremental_ingest.yaml: actor-composed incremental index equals the s12 catalog query") {
    implicit val s = spark
    val out = tmpDir("ex_ivf_inc")
    runExample("ann_incremental_ingest.yaml", Map("data_dir" -> sfDir, "out_dir" -> out))
    val viaPipeline = spark.read.parquet(s"$out/neighbors").collect()
      .map(_.toString).toSet
    val viaCatalog = SparkEntry.queries("s12_ivf_incremental")(spark, sfDir)
      .collect().map(_.toString).toSet
    viaPipeline shouldBe viaCatalog
    // the ingest is hash-uniform, so the health census flags nothing
    // and the composed maintenance pass (merge starved + split hot off
    // the SAME census) must be an exact no-op: the probe against the
    // maintained index returns the identical neighbor set
    val health = spark.read.parquet(s"$out/index_health")
    health.count() shouldBe 16L
    health.filter("hot = 1").count() shouldBe 0L
    health.filter("starved = 1").count() shouldBe 0L
    val viaMaintained = spark.read.parquet(s"$out/neighbors_mt").collect()
      .map(_.toString).toSet
    viaMaintained shouldBe viaCatalog
  }

  test("stream_quality_gate.yaml: offline per-source thresholds gate the stream exactly like q113") {
    implicit val s = spark
    import org.apache.spark.sql.functions._
    val out = tmpDir("ex_qgate")
    runExample("stream_quality_gate.yaml", Map("data_dir" -> sfDir,
      "out_dir" -> out, "ckpt_dir" -> tmpDir("ex_qgate_ck")))
    val admitted = spark.read.parquet(s"$out/admitted")
      .groupBy("source").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n")).toMap
    val viaCatalog = SparkEntry.queries("q113_stream_quality_gate")(spark, sfDir)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("n_kept")).toMap
    viaCatalog.foreach { case (src, kept) =>
      admitted.getOrElse(src, 0L) shouldBe kept
    }
    admitted.keySet.subsetOf(viaCatalog.keySet) shouldBe true
    admitted.values.sum should be > 0L
  }

  test("stream_pii_scrub.yaml: kafka-to-kafka streaming redaction through the doubles") {
    implicit val s = spark
    import graft.testdouble.GraftTestKafkaStream
    GraftTestKafkaStream.reset()
    runExample("stream_pii_scrub.yaml", Map("ckpt_dir" -> tmpDir("ex_spii_ck")))
    GraftTestKafkaStream.lastWriteOptions("topic") shouldBe "clean-docs"
    GraftTestKafkaStream.committedEpochs should not be empty
    val byKey = GraftTestKafkaStream.written.toMap
    byKey("1") shouldBe "contact <EMAIL> or <PHONE>"
    byKey("2") shouldBe "nothing sensitive"
  }

  test("classifier_train_apply.yaml: pipeline weights equal the library trainer; scoring is self-consistent") {
    implicit val s = spark
    import org.apache.spark.sql.functions._
    val out = tmpDir("ex_clf")
    runExample("classifier_train_apply.yaml", Map("data_dir" -> sfDir, "out_dir" -> out))
    val weights = spark.read.parquet(s"$out/weights")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // train step == library trainer, bit-for-bit
    val direct = graft.ml.TextAnalysis.perceptronTrain(docs, "doc_id", "text",
      col("lang") === "en", epochs = 3)
    weights.exceptAll(direct).count() shouldBe 0L
    direct.exceptAll(weights).count() shouldBe 0L
    // apply step: every scored doc got a prediction consistent with its score
    val scored = spark.read.parquet(s"$out/scored")
    scored.count() should be > 0L
    scored.filter((col("score") > 0) =!= (col("pred_en") === 1)).count() shouldBe 0L
    // evaluate step: n matches the scored row count
    val acc = spark.read.parquet(s"$out/accuracy").collect().head
    acc.getLong(0) shouldBe scored.count()
    acc.getLong(1) should be <= acc.getLong(0)
  }

  test("incremental_update.yaml: diff manifest gates rescoring to the delta only") {
    implicit val s = spark
    import org.apache.spark.sql.functions._
    val out = tmpDir("ex_incr")
    runExample("incremental_update.yaml", Map("data_dir" -> sfDir, "out_dir" -> out))
    val manifest = spark.read.parquet(s"$out/manifest")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // pipeline manifest == library corpusDiff on the same derivation
    val v2 = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .unionAll(docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 500000L).as("doc_id"), col("text")))
    val direct = graft.ml.Curation.corpusDiff(docs, v2, "doc_id", "text")
    manifest.exceptAll(direct).count() shouldBe 0L
    direct.exceptAll(manifest).count() shouldBe 0L
    // only added+changed docs were rescored, and all of them were
    val delta = spark.read.parquet(s"$out/delta_scored")
    val expected = manifest.filter(col("status").isin("added", "changed"))
    delta.count() shouldBe expected.count()
    delta.select("doc_id").exceptAll(expected.select("doc_id")).count() shouldBe 0L
    // the rescore actually ran the enrichment on the delta
    delta.columns should contain allOf ("quality", "lang_pred", "ws_tokens")
  }

  test("pii_scrub.yaml: audit + redact + gate; redacted output equals the library path") {
    implicit val s = spark
    import org.apache.spark.sql.functions._
    val out = tmpDir("ex_pii")
    runExample("pii_scrub.yaml", Map("data_dir" -> sfDir, "out_dir" -> out))
    val audit = spark.read.parquet(s"$out/pii_audit")
    audit.count() shouldBe spark.read.parquet(s"$sfDir/documents.parquet").count()
    val clean = spark.read.parquet(s"$out/clean")
    // the gate kept only low-density docs and carried their counts through
    clean.filter(col("n_pii") > 10).count() shouldBe 0L
    // pipeline redaction == direct library redaction on the same rows
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val direct = graft.ml.Pii.redact(docs, "doc_id", "text")
      .select(col("doc_id"), col("redacted"))
    val viaPipeline = clean.select(col("doc_id"), col("text").as("redacted"))
    viaPipeline.join(direct, "doc_id")
      .filter(viaPipeline("redacted") =!= direct("redacted"))
      .count() shouldBe 0L
  }

  test("stream_quality_monitor.yaml surfaces per-micro-batch observed metrics") {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    val in = tmpDir("ex_obs_in")
    val out = tmpDir("ex_obs_out")
    val ckpt = tmpDir("ex_obs_ckpt")
    writeFile(in, "events.csv", "1,7,1.5\n2,7,\n3,9,4.25\n4,9,0.5\n")
    // the doc's documented consumption path: a StreamingQueryListener
    // reading StreamingQueryProgress.observedMetrics per micro-batch
    val seen = java.util.Collections.synchronizedList(
      new java.util.ArrayList[org.apache.spark.sql.Row]())
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val m = e.progress.observedMetrics
        if (m.containsKey("stream_quality")) seen.add(m.get("stream_quality"))
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      runExample("stream_quality_monitor.yaml",
        Map("in_dir" -> in, "out_dir" -> out, "ckpt_dir" -> ckpt))
      // the sink's rows all arrived, metrics attached invisibly
      spark.read.parquet(s"$out/events").count() shouldBe 4L
      // progress events are delivered async on the listener bus —
      // bounded poll, then assert totals across however many batches
      // AvailableNow sliced the directory into
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(100)
      seen.isEmpty shouldBe false
      import scala.jdk.CollectionConverters._
      val rows = seen.asScala.toSeq
      rows.map(_.getAs[Long]("cnt")).sum shouldBe 4L
      rows.map(_.getAs[Long]("null_values")).sum shouldBe 1L
      rows.map(_.getAs[Double]("max_value")).max shouldBe 4.25
    } finally spark.streams.removeListener(listener)
  }

  test("plan_gate.yaml: a clean plan passes the gate and persists its findings; a cartesian fails it") {
    implicit val s = spark
    import org.apache.spark.sql.functions._
    val out = tmpDir("ex_plangate")
    runExample("plan_gate.yaml", Map("data_dir" -> sfDir, "out_dir" -> out))
    val findings = spark.read.json(s"$out/plan_audit")
    findings.filter(col("severity") === "error").count() shouldBe 0L
    findings.filter(col("rule") === "shuffle-count").count() shouldBe 1L
    spark.read.parquet(s"$out/report").count() should be > 0L

    // the same gate refuses a cartesian: swap the report view for a cross
    // join and run just the audit actor
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .crossJoin(spark.read.parquet(s"$sfDir/orders.parquet"))
      .createOrReplaceTempView("pg_cross")
    val ctx = new graft.core.JobContext(graft.core.PipelineContext())
    val gate = new graft.plans.PlanAuditActor()
    gate.init(Map("view" -> "pg_cross"))
    intercept[IllegalStateException](gate.run(ctx)).getMessage should
      include("cartesian-join")
    spark.catalog.dropTempView("pg_cross")
  }
}
