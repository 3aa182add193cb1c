#!/usr/bin/env python3
"""Scaling-curve probe: synthesize sf1 (10x sf0.1, id-offset replicas,
referential integrity preserved) and time a catalog subset at both scales
through graft.Bench. Records whether each plan's cost grows ~linearly with
data (the property the 100 TB claim rests on).

Usage: python3 tools/scalecurve.py [--build-only] [--queries a,b,c]
Output: a markdown table (paste into PLANS.md) + nonzero exit if any
query expected to be linear exceeds LINEAR_CAP x the data growth.
"""
import sys, os, json, subprocess, time
import duckdb

SRC = "/root/testdata/sf0.1"
# Overridable for beyond-sf1 probes of individual queries, e.g.
#   SCALE_REPLICAS=20 SCALE_DST=/tmp/graft_scale/sf2 \
#     python3 tools/scalecurve.py --queries d15_dedup_eval
DST = os.environ.get("SCALE_DST", "/tmp/graft_scale/sf1")
REPLICAS = int(os.environ.get("SCALE_REPLICAS", "10"))
LINEAR_CAP = 1.5  # "<= ~1.5x linear" per-unit-data budget

# FULL-CATALOG classification: every catalog query is either LINEAR
# (gated: per-unit-data cost must stay <= LINEAR_CAP) or MODELED (its
# growth follows a documented non-linear cost model in PLANS.md —
# measured and reported, not gated). A query missing from both lists,
# or listed but not measured, FAILS the probe: new catalog entries must
# be classified here (see the query-addition checklist).
LINEAR_SET = [
    # TPC-H-ish scans / joins / windows / aggregates — single-pass plans
    "q1_pricing_summary", "q2_filter_project", "q3_distinct", "q4_left_join",
    "q5_star_join_agg", "q6_window_rownum", "q7_running_sum", "q8_cte",
    "q9_scalar_setrun", "q10_tumbling_window", "q11_interval_range_join",
    "q11b_asof_join", "q12_string_funcs", "q13_topk", "q14_union",
    "q15_anti_join", "q16_conditional_agg", "q17_semi_join", "q18_having",
    "q19_rollup", "q20_date_parts", "q21_json_extract", "q22_sliding_window",
    "q23_percentile", "q24_ordered_collect", "q25_asof_bucketed",
    "q26_session_window", "q28_lead_lag", "q29_grouping_sets",
    "q30_posexplode", "q31_setops", "q32_correlated_subquery", "q33_cube",
    "q35_broadcast_hint", "q36_funnel", "q37_null_safe_eq",
    "q38_filter_clause", "q39_dml_insert", "q40_dml_merge", "q42_pivot",
    "q43_unpivot", "q46_lateral_topn", "q47_range_frame", "q49_try_cast",
    "q50_group_by_all", "q51_rank_family", "q52_string_breadth",
    "q53_date_arith", "q54_setops_all", "q55_array_hof", "q57_forward_fill",
    "q58_salted_join", "q59_exists_subquery", "q60_scalar_subquery",
    "q61_values_inline", "q62_bit_agg", "q63_date_gapfill", "q64_argminmax",
    "q65_dpp", "q66_bloom_join", "q67_scd2", "q68_full_outer",
    "q71_cdc_apply", "q72_moving_avg", "q75_corr_moments", "q76_listagg",
    "q77_dynamic_overwrite", "q78_grouping_id", "q79_median",
    "q80_regression_moments", "q81_multi_in", "q82_outer_explode",
    "q83_array_setops",
    # streaming drains: state linear in distinct keys (users replicate in
    # the sf1 build, so keys grow with data); AvailableNow re-planning is
    # a fixed per-batch overhead
    "q27_stream_tumbling", "q34_stateful_sessions", "q41_stream_dedup",
    "q44_stream_stream_join", "q48_stream_outer_join",
    "q56_stream_static_join", "q69_stream_dedup_watermark",
    "q70_stream_upsert", "q73_stream_session", "q74_tws_sessions",
    "q84_tws_timer_sessions",
    # corpus ops that are narrow maps or single keyed shuffles
    "c2_stratified_sample", "c3_token_packing", "c4_doc_chunking",
    "c5_corpus_mixing", "c6_source_upsampling",
    "d1_dedup_exact", "d2_minhash_signatures", "d5_simhash",
    "d10_decontaminate", "d11_boilerplate_strip", "d12_embed_decontaminate",
    "d16_incremental_dedup",  # keyed (band,bucket) join; batch ∝ corpus here
    "m1_binary_meta", "m2_frame_sample", "m3_resize", "m4_image_decode",
    "t1_token_counts", "t2_quality_score", "t3_lang_id", "t4_fingerprint",
    "t5_min_shingle_fp", "t6_pii_redact", "t7_corpus_stats", "t8_repetition",
    "t9_boilerplate_ratio", "t10_vocab_topk", "t11_keywords",
    "t12_kmv_sketch", "t13_lm_score", "t14_outlier_zscore",
    "t15_readability", "t16_bm25", "t17_bpe_pairs",
    # iterative BPE trainer: one corpus scan into the Zipf-small word
    # dictionary, then 6 vocab-bounded rounds (explode + agg + top-1)
    "t24_bpe_train",
    # perceptron training: one scan into the hashed bag, then per epoch
    # a broadcast-weight score agg + an id-keyed gradient join — two
    # corpus-bounded shuffles per epoch, epochs fixed
    "t25_perceptron_train",
    "t35_trained_lang_id",
    # BPE encode: t24's vocab-bounded trainer + a vocab-bounded fold
    # (1-row merge-array broadcast), token-keyed join back, doc agg
    "t26_bpe_encode",
    # zipf fit: one corpus scan into the vocab tf frame, top-k aggregate
    # (<= k pairs/group/task), then arithmetic over <= 256 rows/source
    "t27_zipf_fit",
    # corpus drift: two corpus scans into vocab tf frames, one
    # (source,tok)-keyed left join, broadcast totals, per-source agg
    "t28_corpus_drift",
    # bigram LM surprise: both corpora scan once into vocab/bigram count
    # frames; scoring stream joins them KEYED + two 1-row totals
    # broadcasts; bigrams via in-array zip (no self-join, no window)
    "t29_bigram_surprise",
    # tokenizer fertility: t24's vocab-bounded trainer + t26's
    # vocab-bounded merge fold, token-keyed join back, source agg
    "t30_tokenizer_fertility",
    # centroid drift: two scans into (group, dim)-keyed sums
    # (map-side partial agg), one small-frame join, one group agg
    "s14_centroid_drift",
    # epoch shuffle: bounded epochs-way explode + perGroupSequence's
    # range sort — one extra pid-keyed exchange, never a giant task
    "c20_epoch_shuffle",
    # quality ensemble: t23's LM scan + one perGroupSequence range sort
    # over the 3-signal union — three global ranks, zero global windows
    "t31_quality_ensemble",
    # streaming corpus health: stateless per-row maps into a windowed
    # keyed agg — state is (buckets x sources), input one pass
    "q109_stream_corpus_health",
    # streaming decontamination: stateless shingle probe vs a broadcast
    # 1-row bloom state + broadcast eval set; only the verdict aggregates
    "q110_stream_decontaminate",
    # streaming soft-dedup gate: stateless fp/signature projections into
    # stream-static keyed joins vs the prebuilt index + ONE complete-mode
    # best-match agg; weights resolve post-drain through the persisted
    # resolution artifact (built once per dir)
    "q114_stream_soft_dedup",
    # span corruption: one block-explode (|tokens|/8 rows), per-block
    # hash arithmetic, doc-keyed agg — no window, no overlap walk
    "t32_span_corruption",
    # oov rate: one scan into the vocab tf frame, global top-k
    # aggregate, broadcast k-row membership join, per-source sums
    "t33_oov_rate",
    # skew-aware join: one map-side-combined count pass + broadcast hot
    # set + salted hot leg / plain cold leg — two keyed shuffles, the
    # giant key spread over `salt` tasks instead of one
    "q108_skew_autosalt",
    "u1_zipwithindex", "v1_data_validator", "z1_zorder_locality",
    "z2_zorder3",
    # sketch aggregates: one pass + fixed-size state per group; k1/k2 pay
    # an extra exact/rank-verify pass that is itself single-shuffle
    "k1_hll_distinct", "k2_kll_quantiles", "k3_hll_merge_states",
    "k4_kll_merge_states",
    # bloom decontamination: shingle scan + fixed-size state build +
    # codegen probe; the only shuffles are the per-doc flag aggs
    "b1_bloom_decontaminate", "b2_bloom_merge_fp",
    # streaming windowed HLL: micro-batch scan + fixed-size sketch state
    # per (window, event_type) group; grading join is group-bounded
    "q85_stream_hll_window",
    # count-min heavy hitters: token scan into depth*width counters; the
    # exact top-10 GRADING side is t10's vocab shuffle (also linear)
    "k5_cms_heavy_hitters",
    # streaming per-type CMS: fixed counter block per event_type in the
    # state store; grading side is a keyed agg + WindowGroupLimit top-5
    "q86_stream_cms_heavy_users",
    # per-group bottom-k sample: one agg pass, <= k entries per group per
    # partition cross the exchange (plus an md5 per distinct id)
    "c7_per_source_sample",
    # KMV resemblance: three bottom-k signatures in one filtered pass +
    # a distinct-user grading shuffle — both linear
    "k6_kmv_jaccard",
    # streaming per-source sample: bottom-k buffer per source in the
    # state store; micro-batch scan, k entries per group per batch
    "q87_stream_sample",
    # streaming per-source top-k: fixed k-pair graft_topk_pairs buffer
    # per source in the state store (q87's shape, value-ranked)
    "q105_stream_topk",
    # q105 in update mode: same state, emits only changed groups per
    # batch + a source-keyed final-state max over the emissions
    "q106_stream_topk_update",
    # event-time TTL: one ValueState + one timer per user (state is
    # user-cardinality-bounded), expiry at watermark; drained emissions
    # join a keyed batch agg
    "q107_event_ttl",
    # chunk dedup: typed-flatMap tokenize + three keyed shuffles (md5
    # span digest, doc id x2) — all single-pass
    "d17_paragraph_dedup",
    # streaming incremental dedup: stateless per-row signatures, keyed
    # (band,bucket) stream-static join, ONE streaming agg (best-match max)
    "q90_stream_incremental_dedup",
    # URL canonicalization dedup: narrow regex chain + one content-hash
    # style shuffle on the canonical string
    "d19_url_dedup",
    # BPE merge application: one corpus scan to the weighted vocab, then
    # all merge work over vocab-sized data vs a 1-row broadcast frame
    "t18_bpe_apply",
    # SQL session variables: one scalar agg + one filtered agg — the
    # variable itself is session metadata, zero plan cost
    "q91_sql_session_vars",
    # native DataSketches HLL: two sketch passes + one exact distinct,
    # all single-shuffle aggregations
    "q92_native_hll_sketch",
    # priority sample: one scan + TakeOrdered top-k (per-partition heaps)
    "c8_weighted_sample",
    # map HOFs: two keyed aggs; map algebra is per-customer-row work
    "q88_map_hof",
    # streaming windowed KLL: fixed k=200 sketch per window in the state
    # store; grading join is window-bounded (q85's shape)
    "q89_stream_kll_window",
    # temperature mixing: corpus scan + hash gate, 20-row source-count
    # agg broadcast back, second hash gate — one partial-agg shuffle
    "c9_temperature_mix",
    # hashed linear classifier: tokenize + feature explode (~ token
    # count) + one keyed doc_id partial-agg shuffle
    "t19_quality_classifier",
    # HLL intersection: one filtered keyed state agg + 2-row state fold
    # + per-customer flag agg — all single-pass shuffles
    "k7_hll_intersection",
    # pipe syntax: pure dialect — identical plan to the classic
    # filter+agg+having form
    "q93_sql_pipe",
    # XML render->parse->extract: per-row string/parse maps + one keyed agg
    "q102_xml",
    # lateral column aliases: pure dialect — plans as the expanded projection
    "q103_lateral_alias",
    # try_*/named-args error-safe surface: narrow per-row maps, no shuffle
    "q104_error_safe",
    # variant: per-row parse/extract map + one keyed agg
    "q94_variant_json",
    # substring spans: windowed explode (~len/stride rows per doc) +
    # one md5-keyed partial-agg shuffle — d17's shape at char granularity
    "d21_substring_dedup",
    "d25_cdc_span_dedup",
    # CDC cleaning: d25's chunk stream (ALL chunks) + one md5-keyed
    # first-occurrence rank + doc-keyed reassembly — d17's shape over
    # content-defined boundaries
    "d27_cdc_clean",
    # audio: narrow per-row WAV encode+decode map + array math, no shuffle
    "m7_audio_energy",
    # audio dedup: per-row decode map + one constant-width md5-keyed
    # exchange (d1's shape on the audio modality)
    "m9_audio_dedup",
    # keyframes: narrow per-row byte-diff map + one doc-keyed agg + a
    # doc-keyed argmax window (fine-grained key)
    "m8_video_keyframes",
    # statestore read: AvailableNow drain (state ~ distinct sources) +
    # a batch read of the store files
    "q97_statestore_read",
    # observed metrics: ONE corpus pass (the noop write) carrying
    # map-side observe aggregates; result is a single row
    "q98_observe_metrics",
    # length batching: range sort + pid-keyed local ranks + two broadcast
    # joins (task-count and 8-bucket sized) — no per-bucket giant task
    "c10_length_batching",
    # token-budget selection: range sort + (pid,group)-windowed running
    # sums + a (pid x group)-sized offsets broadcast — c10's shape with
    # a value sum instead of a count
    "c11_token_budget",
    # c11/c10 with the BPE-ish token counter swapped in — identical plans
    "c21_budget_bpe",
    "c22_batch_bpe",
    # parameterized SQL / IDENTIFIER: pure dialect — plans as the plain
    # filter+agg
    "q99_parameterized_sql",
    # SQL UDF: Catalyst inlines the body — plans as q1's decimal agg
    "q100_sql_udf",
    # SQL table UDF: each invocation inlines as a filtered agg subquery
    "q101_sql_table_udf",
    # collation: one keyed agg under a non-binary collation
    "q95_collation",
    # tws profile: micro-batch scan; per-key state is k entries + a
    # type-counter map + one counter, all fixed-size per key
    "q96_tws_profile",
    # Gopher top-2-gram coverage: one explode + two keyed (doc,gram)/(doc)
    # aggs, constant-width reduce state
    "t20_gopher_topgram",
    # PII detect/redact: pure per-row regex projections, no shuffle
    "t21_pii_detect",
    "t22_pii_redact",
    # unigram surprise: c12's shape (token explode -> vocab tf frame ->
    # 1-row broadcast -> keyed join back -> doc agg)
    "t23_unigram_surprise",
    # epoch schedule: one scan + source agg + catalog-sized arithmetic
    "c16_epoch_schedule",
    # mixture anneal: c16's shape — one token-count scan + source agg,
    # then all arithmetic on the (source x epochs) frame vs a 1-row
    # totals broadcast
    "c23_mixture_anneal",
    # water-fill allocation: one token-count scan, then 3 fixed rounds
    # over the checkpointed source-catalog frame (one agg + a 1-row
    # broadcast each) — round work is |sources|-sized, never corpus
    "c24_waterfill",
    # graded contamination: d10's broadcast eval-shingle join (LEFT, so
    # clean docs still report) + ONE doc-keyed agg for both counts
    "d22_contamination_score",
    # streaming drift monitor: per-(label,dim) count+sum state (~640
    # rows regardless of stream length) + a label-keyed batch join on
    # the drained frame — s14's arithmetic tail
    "q112_stream_centroid_drift",
    # streaming quality gate: stateless per-row score + ONE broadcast
    # stream-static threshold join; state = per-source admit counters
    "q113_stream_quality_gate",
    # IVF health census: the fixture's O(N*K) broadcast assignment rank
    # (K fixed) + one cell-keyed count + a 1-row totals broadcast
    "s17_ivf_health",
    # length drift: two token-count scans into (source, log2-bin) frames
    # (~40 bins => source-catalog-sized), full-outer bin join, per-source
    # arithmetic
    "t34_length_drift",
    # incremental IVF: s3's cell-routed probe over a union index (per-row
    # assignment vs a broadcast 16-row centroid frame; no rebuild)
    "s12_ivf_incremental",
    # pack materialization: c3's windowless shard running sum + a
    # (shard, pack_id)-keyed window whose groups are budget-bounded
    "c17_pack_sequences",
    # c17 with the BPE-ish token counter swapped in — identical plan
    "c18_pack_bpe",
    # corpus diff: two md5 manifest projections + one id-keyed full
    # outer join — single-shuffle linear
    "c19_corpus_diff",
    # DSIR importance: token explode -> vocab tf frames (Zipf-small),
    # token-keyed score join, doc-keyed agg, per-source graft_topk_pairs
    # aggregate (<= k pairs per source per task cross the exchange)
    "c12_dsir_importance",
    # c12 with STRING ids: same shape over a 64-bit md5 surrogate of
    # the id + a keyed join back (no per-source rank window)
    "c15_dsir_string_ids",
    # per-source quality calibration: scoring scan + source-count
    # broadcast + perGroupSequence rank (windowless range-partitioned)
    "c13_quality_calibrate",
    # leakage-safe split: one scan + one fingerprint-keyed audit agg
    # (constant-width md5 exchange, d1's shape)
    "c14_leakage_safe_split",
    # hybrid retrieval, production legs: lexical rare-token-bounded by
    # the max-df cut, semantic through the IVF probe (each query scores
    # ~nprobe/numCentroids of the corpus instead of s10's brute leg);
    # gated linear — a superlinear regression here means the IVF routing
    # stopped pruning
    "s11_hybrid_rrf_ivf",
]
# Non-linear by documented construction (cost model in PLANS.md):
# round-dominated iterative algorithms, candidate-pair-bounded dedup,
# and the kNN family whose query set is a fixed FRACTION of the corpus
# (O(Q*N) with Q ~ N/50 — brute force is quadratic BY DESIGN as the
# labeled exact baseline; the ANN variants bound the candidate set).
MODELED = {
    "c1_kmeans":              "fixed Lloyd passes over the corpus",
    "d3_lsh_pairs":           "pair count ~ near-dup structure (bucket-bounded)",
    "d20_source_overlap":     "embeds d3's bucket-bounded pair volume; source lookups are broadcast joins on ids-only pairs",
    "d4_ngram_jaccard":       "per-pair shingle join over d3's candidate pairs",
    "d6_embed_neardup":       "label-blocked pair join: sum(|block|^2)",
    "d7_dedup_resolution":    "serves the persisted resolution ARTIFACT (write-once per dir: LSH pairs + CC rounds paid by whichever d-query runs first against a fresh dir, then a label-frame read) — a cross-scale ratio mixes warm/cold unless both dirs already carry the artifact",
    "d23_dedup_report":       "one cluster-keyed agg + a keyed source join over the persisted resolution artifact; alphabetically the FIRST artifact consumer, so it pays the one-time resolve-build against a fresh dir (warm-artifact probe is the honest per-unit number)",
    "d24_soft_dedup":         "one cluster-keyed count + two keyed joins over the persisted resolution artifact",
    "d26_resolution_update":  "one-sided batch-vs-index LSH match + batch-internal pairs + CC on the AFFECTED clusters' star edges only; the batch is a fixed fraction of the corpus by fixture design, so the per-ingest cost scales with the batch, never the corpus",
    "d8_training_pipeline":   "composite: embeds kmeans/s3 stages",
    "d9_connected_components": "O(log d) doubling rounds, scheduling-bound",
    "d13_edit_distance":      "levenshtein over LSH-bounded candidates",
    "d18_canonical_rep":      "d9's O(log d) CC rounds + one rank window",
    "m5_image_phash":         "pair volume ~ sum(|hash-bucket|^2): the synthetic corpus's aHash space is dense (similar word-distribution images), so near-dup pairs grow ~n^2/2^16 per band (measured 3.5k->632k candidates at 10x docs) — decode+hash side is linear; blocking stays bucket-bounded",
    "m6_image_dup_resolve":   "embeds m5's pair volume + 4 fixed min-label propagation rounds over the pair graph",
    "d14_semdedup":           "kmeans passes + per-cluster pair join",
    "d15_dedup_eval":         "jaccard-verify ~ LSH-bounded candidates",
    "g1_pagerank":            "fixed iteration rounds, linear per round",
    "g3_kcore":               "fixed peeling rounds; per-round degree agg + two semi-joins, edge-linear per round",
    "g4_label_propagation":   "3 fixed synchronous LPA rounds; edges capped customer-linear (<= 8 suppliers/nation), per round one keyed join + two keyed aggs",
    "g2_triangle_count":      "edge-wedge join: cost ~ sum(deg^2)",
    "g2b_triangle_oriented":  "degree-oriented edge-iterator: wedges only at the low-(deg,id) endpoint, cost ~ sum(out-deg^2) <= O(m*arboricity) — skew-robust vs g2",
    "q45_recursive_cte":      "iteration(recursion-depth)-dominated",
    "s1_knn_bruteforce":      "O(Q*N), Q ~ N/50: quadratic BY DESIGN (exact baseline)",
    "s13_hard_negatives":     "s1's O(Q*N) exact-baseline shape + different-label filter (IVF composes at scale)",
    "s2_knn_lsh":             "O(Q*candidates), bucket-bounded",
    "s3_knn_ivf":             "O(Q*nprobe*cell)",
    "s13b_hard_negatives_ivf": "s3's O(Q*nprobe*cell) probe + per-pair label filter (Q ~ N/50, cell ~ N/16)",
    "s15_ivf_rebalance":      "assignment is s3's O(N*K) broadcast rank; the split re-rank touches only oversized cells (O(|split cells| * 2)) — linear per pass, listed modeled because the planted hot cell is a fixed FRACTION of the corpus by fixture design",
    "s18_ivf_merge":          "assignment is s3's O(N*K) broadcast rank; the merge re-rank touches only the starved cells' rows (O(|starved rows| * K)) — linear per pass, listed modeled because the planted satellite cell is a fixed fraction (1/97) of the corpus by fixture design",
    "s19_ivf_maintain":       "s18's merge stage + s15's split stage off ONE centroid-complete census; both re-ranks touch only the flagged cells' rows — modeled for the same reason as s15/s18: the planted hot (1/5) and starved (1/97) cells are fixed fractions of the corpus by fixture design",
    "d28_dedup_eval_capped":  "d15's banded collision enumeration (~bucket density) feeds a TopKPairs budget — the exact-jaccard verify join then pays <= cap (4) candidates per doc, bounding the tier that made d15's per-unit cost climb; the enumeration itself remains density-driven, hence modeled",
    "q115_stream_soft_dedup_linked": "q114's batch-sized gate plus batch-internal lshCandidatePairs and the subgraph CC fold (d26's shape) — the batch is a fixed fraction of the corpus by fixture design, so per-ingest cost scales with the batch's match neighborhood, never the corpus",
    "q116_stream_gate_capped": "q115's gate under the per-doc candidate budget (capCandidatesSym top-4 per doc over the symmetrized legs) — the banded collision enumeration is still density-driven (q115's physics), but the verify/fold tier downstream of the cap is bounded at cap x batch rows; expected at or below q115's trend",
    "q111_stream_ivf_probe":  "s3's O(Q*nprobe*cell) probe as a stream-static join; routing is a stateless broadcast-array scan, top-k is k-pair state per query",
    "s4_knn_quantized":       "labeled quantized exact baseline: O(Q*N)",
    "s5_knn_pq":              "full-ADC scan: O(Q*N) compressed",
    "s6_knn_ivfpq":           "O(Q*nprobe*cell)",
    "s7_ann_recall":          "embeds s1: O(Q*N) ground truth by design",
    "s16_mrr_eval":           "embeds s1's O(Q*N) ground truth by design (eval); the rank-metric join is keyed over k rows per query",
    "s8_knn_lsh_multiprobe":  "O(Q*probed buckets)",
    "s9_knn_mmr":             "embeds s1's O(Q*N) exact pool build by design; the MMR re-rank itself is pool-bounded (<= 8^2 sims per query)",
    "s9b_mmr_ivf":            "s9 with the pool build routed through s3's IVF probe (O(Q*nprobe*cell)); the MMR re-rank stays pool-bounded",
    "s10_hybrid_rrf":         "embeds s1's O(Q*N) semantic pool by design (swap in an ANN family at scale); lexical side rare-token-bounded after the max-df cut (unpruned 706 s at sf1, pruned 22 s — the residual 1.6x/unit IS the semantic baseline)",
}


def build_sf1():
    done = f"{DST}/_DONE"
    if os.path.exists(done):
        # replicas derive from SRC: a driver testdata regeneration (it
        # rewrites in place) silently invalidates them, so compare mtimes
        src_mtime = max(os.path.getmtime(os.path.join(SRC, f))
                        for f in os.listdir(SRC) if f.endswith(".parquet"))
        if os.path.getmtime(done) >= src_mtime:
            return
        print(f"rebuilding {DST}: source {SRC} is newer than the replicas",
              file=sys.stderr)
        import shutil
        shutil.rmtree(DST)
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    # key domains for offset arithmetic (max+1 per replicated key space)
    mx = {}
    for tbl, col in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
                     ("part", "p_partkey"), ("orders", "o_orderkey"),
                     ("events", "event_id"), ("events", "user_id"),
                     ("documents", "doc_id"), ("embeddings", "vec_id")]:
        mx[col] = con.execute(
            f"SELECT max({col}) + 1 FROM '{SRC}/{tbl}.parquet'").fetchone()[0]

    def rep(table, select):
        con.execute(f"""
            COPY (SELECT {select}
                  FROM '{SRC}/{table}.parquet', range({REPLICAS}) r(i))
            TO '{DST}/{table}.parquet' (FORMAT PARQUET)""")

    # dims stay single-copy: their key domains are referenced, not offset
    for t in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                    f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    rep("customer", f"c_custkey + i * {mx['c_custkey']} AS c_custkey, "
        "c_name, c_nationkey, c_acctbal, c_mktsegment")
    rep("supplier", f"s_suppkey + i * {mx['s_suppkey']} AS s_suppkey, "
        "s_name, s_nationkey, s_acctbal")
    rep("part", f"p_partkey + i * {mx['p_partkey']} AS p_partkey, "
        "p_name, p_brand, p_type, p_size, p_retailprice")
    rep("orders", f"o_orderkey + i * {mx['o_orderkey']} AS o_orderkey, "
        f"o_custkey + i * {mx['c_custkey']} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
    rep("lineitem", f"l_orderkey + i * {mx['o_orderkey']} AS l_orderkey, "
        f"l_partkey + i * {mx['p_partkey']} AS l_partkey, "
        f"l_suppkey + i * {mx['s_suppkey']} AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate")
    # events: replicate USERS (user_id offset) so per-user session/window
    # cardinality stays constant and total state grows linearly. epoch_ns
    # writes ts as an int64-nanos column regardless of the source encoding
    # (TIMESTAMP(NANOS) historically, timestamp[us] since 2026-08-13);
    # the catalog's normalizeEventTs accepts either, so replicas and
    # driver data stay interchangeable.
    rep("events", f"event_id + i * {mx['event_id']} AS event_id, "
        "epoch_ns(ts) AS ts, "
        f"user_id + i * {mx['user_id']} AS user_id, event_type, value, props")
    # documents: perturb text per replica — byte-identical replicas would
    # turn every doc into an exact 10-duplicate and change the dedup
    # problem's shape instead of its size
    rep("documents", f"doc_id + i * {mx['doc_id']} AS doc_id, "
        "text || ' r' || CAST(i AS VARCHAR) AS text, lang, source, "
        "n_chars + 3 AS n_chars")
    rep("embeddings", f"vec_id + i * {mx['vec_id']} AS vec_id, "
        "embedding, label")
    open(f"{DST}/_DONE", "w").write("ok")
    print(f"built {DST} ({REPLICAS}x {SRC})", file=sys.stderr)


def bench(sfdir, queries):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sfdir, SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_WARM_DIR="/root/testdata/sf0.001",
               SPARK_GRAFT_ONLY=",".join(queries))
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"], env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if '"metric"' in line:
            return json.loads(line)["queries"]
    sys.exit(f"bench at {sfdir} produced no metric line:\n{out.stdout[-2000:]}")


def main():
    build_sf1()
    if "--build-only" in sys.argv:
        return
    queries = sorted(LINEAR_SET + list(MODELED))
    dup = set(LINEAR_SET) & set(MODELED)
    if dup:
        sys.exit(f"classified twice: {sorted(dup)}")
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a.startswith("--queries"):
            # accept both --queries=a,b,c and --queries a,b,c
            val = a.split("=", 1)[1] if "=" in a else (
                argv[i + 1] if i + 1 < len(argv) else
                sys.exit("--queries needs a comma-separated list"))
            queries = [q for q in val.split(",") if q]
    t01 = bench(SRC, queries)
    t1 = bench(DST, queries)
    # a classified query with no measurement (typo, renamed catalog entry)
    # must fail the gate, not silently vanish from it — and a catalog
    # query the bench ran but this file doesn't classify is equally fatal
    unmeasured = [q for q in queries if t01.get(q) is None or t1.get(q) is None]
    if unmeasured:
        sys.exit(f"no measurement for {unmeasured} — unknown query name(s)?")
    unclassified = sorted(set(t01) - set(LINEAR_SET) - set(MODELED))
    if unclassified and "--queries" not in " ".join(argv):
        sys.exit(f"catalog queries with no scale class: {unclassified} — "
                 "add them to LINEAR_SET or MODELED in this file")
    rows, bad = [], []
    for q in sorted(queries):
        a, b = t01.get(q), t1.get(q)
        ratio = b / a if a > 0 else float("inf")
        linear = q in LINEAR_SET
        # per-unit-data cost ratio: 1.0 = perfectly linear, <1 = sublinear
        unit = ratio / REPLICAS
        verdict = ("OK" if not linear else
                   "OK" if unit <= LINEAR_CAP else "SUPERLINEAR")
        if verdict == "SUPERLINEAR":
            bad.append(q)
        cls = (f"linear {verdict}" if linear else f"modeled: {MODELED[q]}")
        rows.append((q, a, b, ratio, unit, cls))
    print(f"| query | sf0.1 s | {REPLICAS}x s | x | x/{REPLICAS} (1.0=linear) | class |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r[0]} | {r[1]:.2f} | {r[2]:.2f} | {r[3]:.1f} | "
              f"{r[4]:.2f} | {r[5]} |")
    t01sum, t1sum = sum(t01[q] for q in queries), sum(t1[q] for q in queries)
    print(f"\n{len(queries)} queries: sf0.1 total {t01sum:.1f} s, "
          f"sf1 total {t1sum:.1f} s ({t1sum / t01sum:.1f}x for 10x data)")
    if bad:
        print(f"\nSUPERLINEAR in linear set: {bad}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
