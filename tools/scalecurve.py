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
DST = "/tmp/graft_scale/sf1"
REPLICAS = 10
LINEAR_CAP = 1.5  # "<= ~1.5x linear" per-unit-data budget

# Queries expected to scale ~linearly (narrow / keyed / single-shuffle
# plans). Anything else in RUN is measured and reported but judged by its
# own documented model, not the linear cap.
LINEAR_SET = [
    "q1_pricing_summary", "q2_filter_project", "q5_star_join_agg",
    "q6_window_rownum", "q22_sliding_window", "q43_unpivot",
    "q51_rank_family", "d1_dedup_exact", "d5_simhash", "t13_lm_score",
    "c3_token_packing", "t16_bm25", "t17_bpe_pairs",
    "d16_incremental_dedup",  # keyed (band,bucket) join; batch ∝ corpus here
]
# Round-dominated / iterative / stateful / quadratic-by-construction:
# expected flat-to-linear (or, for the kNN family whose query set is a
# fixed FRACTION of the corpus, O(Q*N) with Q ~ N/50 — brute force is
# quadratic BY DESIGN as the labeled exact baseline; s2/s6 are the scale
# path). Each has a cost model documented in PLANS.md.
MODELED_SET = ["d9_connected_components", "c1_kmeans", "g1_pagerank",
               "q45_recursive_cte", "q69_stream_dedup_watermark",
               "s1_knn_bruteforce", "s2_knn_lsh", "s6_knn_ivfpq",
               "d14_semdedup",   # kmeans passes + per-cluster pair join
               "s7_ann_recall",  # embeds s1: O(Q*N) by design
               "d15_dedup_eval"] # O(LSH-bounded candidates x shingles/doc)


def build_sf1():
    if os.path.exists(f"{DST}/_DONE"):
        return
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
    # cardinality stays constant and total state grows linearly. ts must
    # stay an int64-nanos column (the source is TIMESTAMP(NANOS), which
    # Spark reads as LONG under nanosAsLong and the catalog divides to
    # micros) — a plain duckdb COPY would rewrite it as timestamp[us].
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
    queries = LINEAR_SET + MODELED_SET
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
    # a requested query with no measurement (typo, renamed catalog entry)
    # must fail the gate, not silently vanish from it
    unmeasured = [q for q in queries if t01.get(q) is None or t1.get(q) is None]
    if unmeasured:
        sys.exit(f"no measurement for {unmeasured} — unknown query name(s)?")
    rows, bad = [], []
    for q in queries:
        a, b = t01.get(q), t1.get(q)
        ratio = b / a if a > 0 else float("inf")
        linear = q in LINEAR_SET
        # per-unit-data cost ratio: 1.0 = perfectly linear, <1 = sublinear
        unit = ratio / REPLICAS
        verdict = ("OK" if not linear else
                   "OK" if unit <= LINEAR_CAP else "SUPERLINEAR")
        if verdict == "SUPERLINEAR":
            bad.append(q)
        rows.append((q, a, b, ratio, unit,
                     ("linear-set " + verdict) if linear else "modeled"))
    print("| query | sf0.1 s | sf1 s | x | x/10 (1.0=linear) | class |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r[0]} | {r[1]:.2f} | {r[2]:.2f} | {r[3]:.1f} | "
              f"{r[4]:.2f} | {r[5]} |")
    if bad:
        print(f"\nSUPERLINEAR in linear set: {bad}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
