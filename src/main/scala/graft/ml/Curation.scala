package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/**
 * Corpus curation operators that sit between dedup and batch assembly:
 * score calibration, leakage-safe splitting, importance resampling, and
 * repetition filtering. Library form of the c12/c13/c14/t20 catalog
 * queries so pipelines reach them through [[CurationActor]].
 *
 * Shared contracts (the catalog queries grade these against DuckDB
 * oracles, so every function is bit-reproducible across engines):
 *  - All scores/fractions are INTEGER MICRO-UNITS (1e6 = 1.0) with
 *    floor division — no libm, no float thresholds.
 *  - Randomness is deterministic content/id hashing (md5-derived), so
 *    results are a pure function of the input.
 *
 * No counterpart in the reference (its actor set stops at relational
 * transforms); the methods follow the public data-curation literature
 * (Gopher repetition rules — Rae et al. '21; DSIR — Xie et al. '23).
 */
object Curation {

  /**
   * Per-source quality calibration (c13): rank-normalize
   * [[TextAnalysis.qualityScore]] within each source to an integer
   * micro-unit percentile, then one GLOBAL percentile cut. A raw score
   * threshold is not comparable across sources (each has its own score
   * distribution); the rank form is. Output: (idCol, sourceCol, q_u,
   * rk, pct_u, keep) with keep = pct_u >= keepAtLeastPctU.
   *
   * Scale shape: one scoring scan, a source-keyed count broadcast, and
   * the per-source rank via [[graft.utils.DataframeHelper.perGroupSequence]]
   * — the WINDOWLESS form. A `row_number() OVER (PARTITION BY source)`
   * window puts each source's entire row set in ONE task; with a small
   * source catalog over 100 TB that is a handful of corpus-sized sort
   * tasks. perGroupSequence range-sorts (source, -q_u, id) across ALL
   * tasks instead and reconstructs the identical rank from per-task
   * offsets — bit-equal to the window form because (source, q_u desc,
   * id) is unique per row (id is a key).
   */
  def calibrateQuality(df: DataFrame, idCol: String, sourceCol: String,
                       textCol: String,
                       keepAtLeastPctU: Long = 500000L): DataFrame = {
    val scored = df.select(col(idCol), col(sourceCol),
        TextAnalysis.qualityScore(col(textCol)).as("q"))
      .withColumn("q_u", expr("cast(round(q * 1000000) AS BIGINT)"))
      .drop("q")
    val counts = scored.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
    val ranked = graft.utils.DataframeHelper.perGroupSequence(
        scored.withColumn("__negq_", -col("q_u")),
        Seq(sourceCol), Seq("__negq_", idCol), "rk")
      .drop("__negq_")
    ranked.join(broadcast(counts), sourceCol)
      .withColumn("pct_u",
        when(col("n") === 1L, lit(1000000L))
          .otherwise(expr("(1000000 * (n - rk)) div (n - 1)")))
      .select(col(idCol), col(sourceCol), col("q_u"), col("rk"), col("pct_u"),
        (col("pct_u") >= keepAtLeastPctU).cast("int").as("keep"))
  }

  /**
   * Leakage-safe train/valid/test split (c14): assign by hashing the
   * CONTENT FINGERPRINT (md5 of normalized text), never the id —
   * byte-identical duplicates land in the same split by construction,
   * so a duplicated document can never sit in train while its twin
   * sits in eval. Output: (idCol, fp, bucket, split, fp_docs,
   * fp_splits); fp_splits is the per-fingerprint distinct-split count —
   * the no-leak invariant as a graded column (must read 1).
   *
   * Scale shape: one scan + one constant-width md5-keyed audit
   * aggregate (d1's exchange shape).
   */
  def leakageSafeSplit(df: DataFrame, idCol: String, textCol: String,
                       trainPct: Int = 80, validPct: Int = 10): DataFrame = {
    require(trainPct > 0 && validPct >= 0 && trainPct + validPct < 100,
      s"bad split percentages: train=$trainPct valid=$validPct")
    val base = df.select(col(idCol),
        TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .withColumn("bucket",
        pmod(Hashing.oracleHash(concat(lit("split:"), col("fp"))), lit(100L)))
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + validPct, lit("valid"))
          .otherwise(lit("test")))
    val audit = base.groupBy(col("fp"))
      .agg(count(lit(1)).as("fp_docs"), countDistinct(col("split")).as("fp_splits"))
    base.join(audit, "fp")
      .select(col(idCol), col("fp"), col("bucket"), col("split"),
        col("fp_docs"), col("fp_splits"))
  }

  /**
   * DSIR-style importance resampling (c12, Xie et al. '23): weight
   * every token by the target/source likelihood ratio
   * (tf_target/N_target)/(tf_source/N_source) in integer micro-units —
   * the log-free surrogate of DSIR's log-ratio sum (all quantities
   * non-negative, so truncating and floor division agree) — sum per
   * document, keep the top `topK` per source. `targetWhere` selects
   * the target-domain rows (e.g. `col("lang") === "en"`).
   *
   * Scale shape: one token explode feeding vocab-sized tf frames
   * (map-side partial agg; vocabulary is Zipf-small relative to the
   * corpus), a token-keyed score join back, a doc-keyed agg, and the
   * per-source top-k as a [[graft.functions.SketchAggregates.TopKPairs]]
   * AGGREGATE (<= k pairs per source per task cross the exchange;
   * non-integral ids ride a 64-bit md5 surrogate and a keyed join back
   * — never a per-source rank window). Totals ride a 1-row broadcast.
   *
   * Overflow/emptiness contracts: the weight numerator `tf_t * n_s`
   * exceeds Long once the corpus passes ~9.2e18 token-pairs (n_s IS the
   * corpus token count at 100 TB), so the ratio is computed in
   * DECIMAL(38,0) and only the bounded quotient returns to BIGINT —
   * matching DuckDB's HUGEINT promotion bit-for-bit instead of silently
   * wrapping. A `targetWhere` matching ZERO rows fails fast with an
   * explicit error (n_t = 0 would otherwise null every weight and
   * silently select garbage).
   */
  def dsirTopKPerSource(df: DataFrame, idCol: String, sourceCol: String,
                        textCol: String, targetWhere: Column,
                        topK: Int = 20): DataFrame = {
    val toks = df.select(col(idCol), col(sourceCol), targetWhere.as("__tgt_"),
      explode(filter(split(Dedup.normText(col(textCol)), " "),
        x => length(x) > 0)).as("tok"))
    val tfS = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf_s"))
    val tfT = toks.filter(col("__tgt_")).groupBy(col("tok")).agg(count(lit(1)).as("tf_t"))
    val totals = tfS.agg(sum(col("tf_s")).as("n_s"))
      .crossJoin(tfT.agg(sum(col("tf_t")).as("n_t")))
      // fail fast on an empty target selection: n_t null/0 would null
      // every weight downstream. The filter form survives column pruning
      // (a dropped assert_true projection would be optimized away).
      .filter(when(coalesce(col("n_t"), lit(0L)) > 0L, lit(true))
        .otherwise(raise_error(lit(
          "dsirTopKPerSource: targetWhere matched zero rows (n_t = 0) — " +
            "every importance weight would be null")).cast("boolean")))
    val scores = tfS.join(tfT, Seq("tok"), "left")
      .crossJoin(broadcast(totals))
      // DECIMAL(38,0) intermediates (see scaladoc): div on decimals is
      // Spark's IntegralDivide, which already returns BIGINT.
      .select(col("tok"),
        expr("(1000000 * coalesce(tf_t, 0L) * cast(n_s AS DECIMAL(38,0)))" +
          " div (tf_s * cast(n_t AS DECIMAL(38,0)))").as("w_u"))
    val perDoc = toks.join(scores, "tok")
      .groupBy(col(idCol), col(sourceCol))
      .agg(count(lit(1)).as("n_toks"), sum(col("w_u")).as("imp_u"))
    val integralId = df.schema(df.schema.fieldIndex(idCol)).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (integralId) {
      // Scale form: per-source top-k AS AN AGGREGATE
      // (graft_topk_pairs) — each task ships <= k (imp_u, id) pairs per
      // source through the exchange, where the window form ranks
      // (shuffles) every scored document. Element position is the dense
      // rank (value DESC, id ASC — the same total order as the window).
      val top = perDoc.groupBy(col(sourceCol))
        .agg(graft.functions.SketchAggregates
          .topKPairs(col("imp_u"), col(idCol), topK).as("tk"))
        .select(col(sourceCol), posexplode(col("tk")).as(Seq("pos", "p")))
        .select(col(sourceCol), col("p.id").as(idCol),
          (col("pos") + 1).cast("int").as("rk"))
      top.join(perDoc, Seq(idCol, sourceCol))
        .select(col(idCol), col(sourceCol), col("n_toks"), col("imp_u"), col("rk"))
    } else {
      // String/UUID/URL ids (what real corpora key on): the SAME
      // aggregate shape over a 64-bit md5 surrogate of the id
      // (Hashing.oracleHash — cross-engine reproducible, so a SQL
      // oracle replays the exact tie order), then a keyed join back to
      // recover the original id. Total order: (imp_u DESC, surrogate
      // ASC) — deterministic. A surrogate collision across distinct ids
      // is 2^-60-improbable; if one ever occurred the join would emit
      // the colliding ids at the same rank rather than dropping rows.
      val keyed = perDoc.withColumn("__sid_",
        Hashing.oracleHash(col(idCol).cast("string")))
      val top = keyed.groupBy(col(sourceCol))
        .agg(graft.functions.SketchAggregates
          .topKPairs(col("imp_u"), col("__sid_"), topK).as("tk"))
        .select(col(sourceCol), posexplode(col("tk")).as(Seq("pos", "p")))
        .select(col(sourceCol), col("p.id").as("__sid_"),
          (col("pos") + 1).cast("int").as("rk"))
      top.join(keyed, Seq("__sid_", sourceCol))
        .select(col(idCol), col(sourceCol), col("n_toks"), col("imp_u"), col("rk"))
    }
  }

  /**
   * Epoch-capped mixing schedule (c16): the source-repetition plan a
   * token-budget training run needs — temperature-weight each source
   * (q_s = floor(sqrt(n_s)), the α=1/2 up-weighting of small sources),
   * allocate the budget proportionally, then convert each allocation to
   * EPOCHS of the source capped at `maxEpochs` (repeating a small
   * source beyond a few epochs stops helping — the public multi-epoch
   * scaling results' rule of thumb). Everything is integer micro-unit
   * arithmetic with floor division; the three products that could
   * exceed Long at corpus scale (`(n_total div budgetDiv) * q`,
   * `1e6 * alloc`, `n_tokens * epochs_u`) ride DECIMAL(38,0) like
   * [[dsirTopKPerSource]]'s weights — at ~2.5e13 total tokens the
   * budget share (~6e12) times q (~5e6) is ~3e19 > Long.MaxValue.
   *
   * Output: (sourceCol, n_tokens, q, alloc, epochs_u, eff_tokens) —
   * epochs_u in micro-epochs (1e6 = one full epoch), eff_tokens the
   * tokens the schedule actually draws from the source.
   *
   * Scale shape: one token-count scan + a source-keyed agg, then all
   * arithmetic on the source-catalog-sized frame with a 1-row totals
   * broadcast.
   */
  def epochSchedule(df: DataFrame, sourceCol: String, textCol: String,
                    budgetDiv: Int = 4, maxEpochs: Int = 4,
                    tokenCount: Column => Column =
                      TextAnalysis.wsTokenCount(_)): DataFrame = {
    require(budgetDiv >= 1 && maxEpochs >= 1,
      s"epochSchedule: bad budgetDiv=$budgetDiv maxEpochs=$maxEpochs")
    val per = df.select(col(sourceCol),
        tokenCount(col(textCol)).cast("long").as("tokens"))
      .groupBy(col(sourceCol)).agg(sum(col("tokens")).as("n_tokens"))
    epochScheduleFromCounts(per, sourceCol, "n_tokens", budgetDiv, maxEpochs)
  }

  /**
   * [[epochSchedule]] over PRE-AGGREGATED per-source token counts —
   * the entry point when counts come from a real tokenizer run (BPE,
   * t17/t18) or a metadata table instead of the whitespace counter.
   * Same arithmetic, same DECIMAL(38,0) overflow protection.
   */
  def epochScheduleFromCounts(perSource: DataFrame, sourceCol: String,
                              tokensCol: String, budgetDiv: Int = 4,
                              maxEpochs: Int = 4): DataFrame = {
    require(budgetDiv >= 1 && maxEpochs >= 1,
      s"epochScheduleFromCounts: bad budgetDiv=$budgetDiv maxEpochs=$maxEpochs")
    val per = perSource
      .select(col(sourceCol), col(tokensCol).cast("long").as("n_tokens"))
      .withColumn("q", floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
    val tot = per.agg(sum(col("n_tokens")).as("n_total"), sum(col("q")).as("q_total"))
    per.crossJoin(broadcast(tot))
      .withColumn("alloc", expr(
        s"cast(((n_total div $budgetDiv) * cast(q AS DECIMAL(38,0))) div q_total AS BIGINT)"))
      .withColumn("epochs_u", least(lit(maxEpochs * 1000000L),
        expr("(1000000 * cast(alloc AS DECIMAL(38,0))) div n_tokens")))
      .withColumn("eff_tokens",
        expr("(cast(n_tokens AS DECIMAL(38,0)) * epochs_u) div 1000000"))
      .select(col(sourceCol), col("n_tokens"), col("q"), col("alloc"),
        col("epochs_u"), col("eff_tokens"))
  }

  /**
   * Water-filling token-budget allocation (c24): split a global budget
   * `B = n_total div budgetDiv` across sources proportional to
   * `q = floor(sqrt(n_tokens))` SUBJECT TO per-source availability caps
   * `avail = maxEpochs · n_tokens`, REDISTRIBUTING capped sources'
   * surplus — the allocator [[epochScheduleFromCounts]]'s single-pass
   * epoch cap approximates: when a small source caps, c16 silently
   * wastes its returned budget; water-filling hands it to the
   * still-uncapped sources, round by round, which is what a real
   * mixture run does with its token budget.
   *
   * Fixed `rounds` redistribution rounds (caps cascade — capping the
   * small sources raises everyone else's share, which can cap the next
   * tier), then one final proportional fill of the remaining budget
   * over the still-active set (clamped to avail; a cascade deeper than
   * `rounds` degrades gracefully to c16's clamp, never over-allocates).
   * All arithmetic is exact integer floor math — the `brem·q` product
   * rides DECIMAL(38,0) (budget ~ corpus tokens × q ~ √tokens wraps
   * Long far below 100 TB) — so any engine replays the allocation
   * bit-for-bit. Output: (sourceCol, n_tokens, q, avail, alloc,
   * capped_round) with capped_round ∈ 1..rounds, or 0 = filled at the
   * final proportional pass.
   *
   * Scale shape: everything after the upstream count scan runs on the
   * source-catalog-sized frame; each round is one aggregate + a 1-row
   * broadcast back, the frame re-rooted per round via
   * localCheckpoint(true) (the iterative-trainer discipline — without
   * the cut each round would replay the corpus scan).
   */
  def waterFill(perSource: DataFrame, sourceCol: String, tokensCol: String,
                budgetDiv: Int = 4, maxEpochs: Int = 4,
                rounds: Int = 3): DataFrame = {
    require(budgetDiv >= 1 && maxEpochs >= 1 && rounds >= 1 && rounds <= 8,
      s"waterFill: bad budgetDiv=$budgetDiv maxEpochs=$maxEpochs rounds=$rounds")
    val base = perSource
      .select(col(sourceCol).as("__src_"), col(tokensCol).cast("long").as("n_tokens"))
      .withColumn("q", floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
      .withColumn("avail", col("n_tokens") * lit(maxEpochs.toLong))
    val btot = base.agg(expr(s"sum(n_tokens) div $budgetDiv").as("b"))
    var cur = base.withColumn("capped_round", lit(0))
      .crossJoin(broadcast(btot)) // 1-row budget frame: reviewed broadcast idiom
      .localCheckpoint(true)
    def roundStats(df: DataFrame) = df.agg(
      sum(when(col("capped_round") === 0, col("q"))).as("qa"),
      coalesce(sum(when(col("capped_round") > 0, col("avail"))), lit(0L)).as("used"))
    val shareSql =
      """CASE WHEN qa IS NULL OR qa = 0 THEN 0
        |ELSE CAST((cast(b - used AS DECIMAL(38,0)) * q) div qa AS BIGINT) END""".stripMargin
    for (r <- 1 to rounds) {
      cur = cur.crossJoin(broadcast(roundStats(cur)))
        .withColumn("capped_round",
          when(col("capped_round") === 0 && expr(shareSql) >= col("avail"), lit(r))
            .otherwise(col("capped_round")))
        .select(col("__src_"), col("n_tokens"), col("q"), col("avail"),
          col("capped_round"), col("b"))
        .localCheckpoint(true)
    }
    cur.crossJoin(broadcast(roundStats(cur)))
      .withColumn("alloc",
        when(col("capped_round") > 0, col("avail"))
          .otherwise(least(expr(shareSql), col("avail"))))
      .select(col("__src_").as(sourceCol), col("n_tokens"), col("q"),
        col("avail"), col("alloc"), col("capped_round").cast("long").as("capped_round"))
  }

  /**
   * Annealed mixture schedule: per-epoch source weights interpolating
   * LINEARLY from the natural (size-proportional) mix at epoch 0 to the
   * uniform mix at the last epoch — the standard end-of-training anneal
   * that up-weights small high-quality sources as the run converges
   * without ever resampling the big head sources from scratch.
   *
   * All arithmetic is exact integer ppm: `nat_ppm = 1e6·n_s div total`,
   * `uni_ppm = 1e6 div S`, and epoch e of E gets
   * `w_ppm(e) = ((E−1−e)·nat_ppm + e·uni_ppm) div (E−1)` — any engine
   * reproduces the schedule bit-for-bit. `tokens_alloc` divides a fixed
   * per-epoch token `budget` by the weights (the number a shard writer
   * consumes). The 1e6·tokens product rides DECIMAL(38,0) (same wrap
   * protection as [[epochScheduleFromCounts]] — a 2.5e13-token corpus
   * puts 1e6·n_s past Long).
   *
   * Input is PRE-AGGREGATED per-source token counts (compose with any
   * tokenizer — c16's `tokenCount` discipline); output one row per
   * (source, epoch): (sourceCol, epoch, n_tokens, w_ppm, tokens_alloc).
   *
   * Scale shape: all work happens on the source-catalog-sized frame ×
   * epochs with a 1-row totals broadcast — the corpus is never touched
   * beyond the upstream count scan.
   */
  def mixtureAnneal(perSource: DataFrame, sourceCol: String, tokensCol: String,
                    epochs: Int, budget: Long): DataFrame = {
    require(epochs >= 2, s"mixtureAnneal: epochs must be >= 2, got $epochs")
    require(budget >= 0, s"mixtureAnneal: negative budget $budget")
    val per = perSource.select(col(sourceCol), col(tokensCol).cast("long").as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("n_total"), count(lit(1)).as("n_sources"))
    // crossJoin allowlisted: 1-row totals frame (reviewed broadcast idiom)
    per.crossJoin(broadcast(tot))
      .withColumn("nat_ppm", expr(
        "cast((1000000 * cast(n_tokens AS DECIMAL(38,0))) div n_total AS BIGINT)"))
      .withColumn("uni_ppm", expr("1000000 div n_sources"))
      .withColumn("epoch", explode(sequence(lit(0L), lit((epochs - 1).toLong))))
      .withColumn("w_ppm",
        expr(s"((${epochs - 1} - epoch) * nat_ppm + epoch * uni_ppm) div ${epochs - 1}"))
      .withColumn("tokens_alloc",
        expr(s"cast((cast(${budget}L AS DECIMAL(38,0)) * w_ppm) div 1000000 AS BIGINT)"))
      .select(col(sourceCol), col("epoch"), col("n_tokens"), col("w_ppm"),
        col("tokens_alloc"))
  }

  /**
   * Pack materialization (c17): the last mile of c3's sequence packing —
   * for each (shard, pack) turn the assigned documents into the actual
   * training sequence: texts concatenated in doc order with the ASCII
   * record separator (0x1E), per-document token-offset boundaries (the
   * attention-mask reset points), doc count and token total. The
   * sequence itself is emitted as its md5 (packs are long; the hash
   * grades the exact bytes without shipping them).
   *
   * Scale shape: c3's windowless per-shard running sum assigns packs;
   * the within-pack offset window partitions by (shard, pack_id) —
   * pack count GROWS with the corpus while each pack is bounded by the
   * token budget, so groups stay small at any scale; one keyed agg
   * builds the sequences with order-free sorted-struct aggregation.
   */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    shardMod: Int = 16, packTokens: Int = 512,
                    tokenCount: Column => Column =
                      TextAnalysis.wsTokenCount(_)): DataFrame = {
    require(shardMod >= 1 && packTokens >= 1,
      s"packSequences: bad shardMod=$shardMod packTokens=$packTokens")
    val docs = df.select(col(idCol), col(textCol).as("__text_"),
        tokenCount(col(textCol)).cast("long").as("tokens"))
      .withColumn("shard", pmod(col(idCol), lit(shardMod.toLong)))
    val packed = graft.utils.DataframeHelper.perGroupRunningSum(
        docs, Seq("shard"), Seq(idCol), "tokens", "cum_incl")
      .withColumn("pack_id", expr(s"(cum_incl - tokens) div $packTokens"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"), col("pack_id")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    packed.withColumn("off", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("pack_tokens"),
        md5(concat_ws("\u001e",
          expr(s"transform(array_sort(collect_list(struct($idCol, __text_))), x -> x.__text_)")))
          .as("pack_md5"),
        concat_ws(",",
          expr(s"transform(array_sort(collect_list(struct($idCol, off))), x -> cast(x.off AS STRING))"))
          .as("boundaries"))
  }

  /**
   * Length batching (c10): bucket documents by token count (`bucketTokens`
   * per bucket, capped at `maxBucket`), then assign a dense within-bucket
   * sequence and fixed-size `batchSize` batches — the padding-minimizing
   * batch layout a training loader wants. `tokenCount` swaps the
   * whitespace counter for a real tokenizer (c18's parameter pattern)
   * without forking the operator.
   *
   * Scale shape: the per-bucket sequence rides
   * [[graft.utils.DataframeHelper.perGroupSequence]] — bucket count is
   * bounded (maxBucket+1) so a per-bucket window would be a constant
   * fraction of the corpus in one task; the windowless form never builds
   * that group.
   */
  def lengthBatches(df: DataFrame, idCol: String, textCol: String,
                    bucketTokens: Long = 32L, maxBucket: Long = 7L,
                    batchSize: Long = 16L,
                    tokenCount: Column => Column =
                      TextAnalysis.wsTokenCount(_)): DataFrame = {
    require(bucketTokens >= 1 && maxBucket >= 0 && batchSize >= 1,
      s"lengthBatches: bad bucketTokens=$bucketTokens maxBucket=$maxBucket batchSize=$batchSize")
    val toks = df.select(col(idCol),
        tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("bucket", expr(s"least(n_tokens div $bucketTokens, ${maxBucket}L)"))
    graft.utils.DataframeHelper.perGroupSequence(
        toks, Seq("bucket"), Seq(idCol), "seq")
      .withColumn("batch_id", expr(s"(seq - 1) div $batchSize"))
      .select(col(idCol), col("n_tokens"), col("bucket"), col("seq"), col("batch_id"))
  }

  /**
   * Token-budget corpus selection (c11): rank documents by quality
   * (integer micro-units, ties to the smallest id) and keep the prefix
   * whose running token total fits `budget` — the "best N tokens" cut
   * every curation run ends with. `tokenCount` parameterizes the
   * budget's unit (whitespace default, BPE-ish via
   * [[TextAnalysis.bpeTokenCount]]).
   *
   * Scale shape: the global running sum rides
   * [[graft.utils.DataframeHelper.perGroupRunningSum]] (windowless —
   * a global ORDER BY running sum is one task holding the corpus).
   */
  def tokenBudgetSelect(df: DataFrame, idCol: String, textCol: String,
                        budget: Long = 20000L,
                        tokenCount: Column => Column =
                          TextAnalysis.wsTokenCount(_)): DataFrame = {
    require(budget >= 1, s"tokenBudgetSelect: bad budget=$budget")
    val scored = df.select(col(idCol),
        tokenCount(col(textCol)).cast("long").as("n_tokens"),
        TextAnalysis.qualityScore(col(textCol)).as("q"))
      .withColumn("q_u", expr("cast(round(q * 1000000) AS BIGINT)"))
      .withColumn("negq", -col("q_u"))
      .withColumn("g", lit(0L))
      .drop("q")
    graft.utils.DataframeHelper.perGroupRunningSum(
        scored, Seq("g"), Seq("negq", idCol), "n_tokens", "cum_tokens")
      .filter(col("cum_tokens") <= budget)
      .select(col(idCol), col("n_tokens"), col("q_u"), col("cum_tokens"))
  }

  /**
   * Corpus version diff (c19): content-hash manifests of two corpus
   * versions full-outer-joined on the document id — the bookkeeping an
   * INCREMENTAL pipeline runs before anything else, so re-ingestion,
   * re-dedup, and re-scoring touch only `added`/`changed` documents
   * instead of the whole corpus. Output: one row per id in either
   * version, (idCol, status ∈ added|removed|changed|unchanged).
   *
   * Scale shape: one md5 projection per version (no shuffle), then a
   * single id-keyed full outer join — at 100 TB the manifests are
   * id+16-byte-hash frames, a tiny fraction of corpus width, and the
   * join output feeds `WHERE status <> 'unchanged'` so downstream
   * stages are |delta|-sized, not |corpus|-sized.
   *
   * Null text hashes as the empty string (a present-but-empty document
   * is a real state — distinguishable from an absent row, which the
   * outer join surfaces as added/removed).
   */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    def manifest(df: DataFrame, h: String) =
      df.select(col(idCol), md5(coalesce(col(textCol), lit(""))).as(h))
    manifest(oldDf, "h_old")
      .join(manifest(newDf, "h_new"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("h_old").isNull, lit("added"))
          .when(col("h_new").isNull, lit("removed"))
          .when(col("h_old") === col("h_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /**
   * Gopher repetition metrics (t20, Rae et al. '21 §A1.1): per doc, the
   * character mass covered by the MOST FREQUENT word 2-gram
   * (`top_cover_u`) and by all 2-grams occurring >= 2 times
   * (`dup_2gram_u`), both as micro-unit fractions of the normalized
   * text length — the thresholds Gopher cuts on (drop if coverage >
   * 0.20 etc.). Character mass is the overlap-insensitive
   * count·len(gram) form used by the public reimplementations; the
   * argmax is a lexicographic struct-min (max count, then smallest
   * gram), deterministic with no window.
   *
   * Scale shape: one explode + two keyed aggregations on (doc, gram)
   * then (doc) — constant-width reduce state.
   */
  def gopherTopGram(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), Dedup.normText(col(textCol)).as("t"))
      .select(col(idCol), length(col("t")).as("n_chars"),
        filter(split(col("t"), " "), x => length(x) > 0).as("ts"))
    val bi = toks.filter(size(col("ts")) >= 2).selectExpr(idCol, "n_chars",
      """explode(transform(sequence(1, size(ts) - 1),
        |  i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))) AS g""".stripMargin)
    val agg = bi.groupBy(col(idCol), col("n_chars"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol), col("n_chars"))
      .agg(min(struct((-col("c")).as("nc"), col("g"))).as("top"),
        sum(when(col("c") >= 2, col("c") * length(col("g"))).otherwise(lit(0L)))
          .as("dup_chars"))
    df.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("top.g"), lit("")).as("top_2gram"),
        coalesce(-col("top.nc"), lit(0L)).as("top_count"),
        coalesce(expr("(1000000 * ((0 - top.nc) * length(top.g))) div n_chars"), lit(0L))
          .as("top_cover_u"),
        coalesce(expr("(1000000 * dup_chars) div n_chars"), lit(0L)).as("dup_2gram_u"))
  }

  /**
   * Deterministic seeded epoch reshuffle (c20): assign every document a
   * reproducible training position — `(epoch, shard, pos)` — so a
   * training run's data order is a pure function of (corpus, seed) and
   * any worker, restart, or re-run reads the identical order with zero
   * coordination. Each epoch is an independent permutation (the epoch
   * number is folded into the hash), which is exactly the "reshuffle
   * every epoch" data loaders need; `shard` routes a document to its
   * reader (hash-balanced), `pos` orders documents within the reader.
   *
   * Determinism: the sort key is [[Hashing.oracleHash]] over
   * `seed:epoch:id` — engine-reproducible, and unique per (epoch, id)
   * up to hash collisions, with the id as the documented tiebreak tail
   * so even a collision leaves one order. Positions come from
   * [[graft.utils.DataframeHelper.perGroupSequence]] — the windowless
   * per-group rank (a `PARTITION BY epoch, shard` window would put a
   * corpus-sized shard in ONE task; perGroupSequence range-sorts across
   * all tasks and reconstructs the identical rank from per-task
   * offsets). Production swaps [[Hashing.fastHash]] in for the md5.
   *
   * Output: one row per (document, epoch) —
   * (idCol, epoch, shard, ord_key, pos); pos is 1-based within
   * (epoch, shard).
   *
   * Scale shape: an `epochs`-way explode (bounded ≤ 16), one range
   * sort; epochs × shards stays broadcastable (perGroupSequence's
   * group-offset frame is one row per group).
   */
  /**
   * Deterministic span-corruption schedule (t32): assign every document
   * the token spans a denoising (T5-style) objective will mask, as a
   * pure function of (corpus, seed) — so any worker, restart, or
   * re-tokenization pass regenerates the identical masks with zero
   * coordination (c20's reproducibility contract, applied to the
   * objective instead of the data order).
   *
   * Scheme: positions partition into fixed 8-token blocks; block `b` of
   * document `d` masks the 2-token span starting at offset
   * `hash(seed:d:b) % 6` — non-overlapping BY CONSTRUCTION (offset ≤ 5,
   * span end ≤ 7), ~25% coverage, and fully parallel: no sequential
   * overlap resolution, which is what makes deterministic masking
   * feasible at corpus scale (a greedy "skip if previous span covers
   * me" walk is inherently per-document sequential). Tail blocks mask
   * whatever part of their span exists.
   *
   * Output: (idCol, n_toks, n_blocks, n_masked, mask_pos_sum, cover_u)
   * — mask_pos_sum is Σ(1-based masked positions), the order-free
   * checksum a consumer verifies its regenerated masks against;
   * cover_u the realized mask fraction in micro-units.
   *
   * Scale shape: one block-explode (|tokens|/8 rows), hash + bounded
   * arithmetic per block, one doc-keyed agg. No window, no join except
   * the doc-keyed count reattach.
   */
  def spanCorruption(df: DataFrame, idCol: String, textCol: String,
                     seed: String): DataFrame = {
    val n = df.select(col(idCol),
      size(filter(split(Dedup.normText(col(textCol)), " "),
        t => length(t) > 0)).cast("long").as("n"))
    val blocks = n.filter(col("n") > 0L)
      .select(col(idCol), col("n"),
        explode(expr("sequence(0L, (n + 7) div 8 - 1)")).as("b"))
      .withColumn("r", pmod(Hashing.oracleHash(
        concat_ws(":", lit(seed), col(idCol), col("b"))), lit(6L)))
      .withColumn("p1", col("b") * 8L + col("r"))
      .select(col(idCol),
        when(col("p1") < col("n"), lit(1L)).otherwise(lit(0L)).as("m1"),
        when(col("p1") + 1L < col("n"), lit(1L)).otherwise(lit(0L)).as("m2"),
        col("p1"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("m1") + col("m2")).as("n_masked"),
        sum((col("p1") + 1L) * col("m1") + (col("p1") + 2L) * col("m2"))
          .as("mask_pos_sum"))
    n.join(blocks, Seq(idCol), "left")
      .select(col(idCol), col("n").as("n_toks"),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"),
        coalesce(col("mask_pos_sum"), lit(0L)).as("mask_pos_sum"),
        expr("CASE WHEN n = 0 THEN 0L ELSE (1000000 * coalesce(n_masked, 0L)) div n END")
          .as("cover_u"))
  }

  def epochShuffle(df: DataFrame, idCol: String, seed: String,
                   epochs: Int = 2, shards: Int = 8): DataFrame = {
    require(epochs >= 1 && epochs <= 16,
      s"epochShuffle: epochs in [1, 16], got $epochs")
    require(shards >= 1 && shards <= 65536,
      s"epochShuffle: shards in [1, 65536], got $shards")
    val keyed = df.select(col(idCol),
        explode(expr(s"sequence(0L, ${epochs - 1}L)")).as("epoch"))
      .withColumn("ord_key", Hashing.oracleHash(
        concat_ws(":", lit(seed), col("epoch"), col(idCol))))
      .withColumn("shard", pmod(col("ord_key"), lit(shards.toLong)))
    graft.utils.DataframeHelper.perGroupSequence(
        keyed, Seq("epoch", "shard"), Seq("ord_key", idCol), "pos")
      .select(col(idCol), col("epoch"), col("shard"), col("ord_key"), col("pos"))
  }
}
