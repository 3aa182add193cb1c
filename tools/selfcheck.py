#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify at a
scale factor, then run each oracle SQL in DuckDB over the same parquet
tables and compare (columns sorted by name, rows sorted, values hashed).

Usage: python3 tools/selfcheck.py [sfdir] [outdir] [--strict]
  --strict: exit nonzero if any query is vacuous (OK-EMPTY), not just on failures
"""
import sys, os, json, subprocess, glob
import duckdb
import pyarrow.parquet as pq
import decimal, datetime, math

_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
SF = _pos[0] if len(_pos) > 0 else "/root/testdata/sf0.001"
OUT = _pos[1] if len(_pos) > 1 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def table_key(rows, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return out

def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(OUT)):
        d = os.path.join(OUT, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        tbl = pq.read_table(files[0])
        snames = tbl.column_names
        # The driver's comparator renders Spark-side decimals at full scale
        # ('0.500') but DuckDB-side decimals trailing-zero-stripped ('0.5'),
        # so ANY decimal output column is a latent hash mismatch (r01: every
        # decimal-typed query failed the gate). Forbid them outright.
        dec_cols = [n for n in snames if "decimal" in str(tbl.schema.field(n).type)]
        if dec_cols:
            results[name] = f"DECIMAL_OUTPUT (driver-unsafe, cast to DOUBLE/BIGINT/STRING): {dec_cols}"
            continue
        # The driver's pandas comparator cannot sort/hash ndarray cells
        # (r07: c7/q87 went red on array<string> sample columns while this
        # checker's list-normalization kept them green — a checker-
        # divergence trap). Forbid nested top-level output types outright.
        nested_cols = [n for n in snames
                       if any(t in str(tbl.schema.field(n).type)
                              for t in ("list", "map", "struct"))]
        if nested_cols:
            results[name] = (f"NESTED_OUTPUT (driver-unsafe, array_join/to_json"
                             f" to STRING): {nested_cols}")
            continue
        pylist = tbl.to_pylist()
        spark_rows = table_key([[r[c] for c in snames] for r in pylist], snames)
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(spark_rows)}"
            continue
        try:
            cur = con.execute(oracle[name])
            dnames = [d0[0] for d0 in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {e}"
            continue
        dec_duck = [dnames[i] for i in range(len(dnames))
                    if any(isinstance(r[i], decimal.Decimal) for r in drows[:100])]
        if dec_duck:
            results[name] = f"DECIMAL_ORACLE_OUTPUT (driver-unsafe): {dec_duck}"
            continue
        duck_rows = table_key(drows, dnames)
        if sorted(snames) != sorted(dnames):
            results[name] = f"SCHEMA_MISMATCH spark={sorted(snames)} duck={sorted(dnames)}"
        elif len(spark_rows) != len(duck_rows):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(spark_rows)} duck={len(duck_rows)}"
        elif spark_rows != duck_rows:
            diff = next((i, a, b) for i, (a, b) in enumerate(zip(spark_rows, duck_rows)) if a != b)
            results[name] = f"VALUE_MISMATCH first_diff_row={diff[0]} spark={diff[1]} duck={diff[2]}"
        elif len(spark_rows) == 0:
            # both engines agree on ZERO rows — usually a filter constant
            # missing the data's real domain, i.e. a vacuous pass
            results[name] = "OK-EMPTY rows=0 (vacuous: both engines returned nothing)"
        else:
            results[name] = f"OK rows={len(spark_rows)}"
    # OK-EMPTY is a vacuous agreement (0 rows on both engines), NOT a pass:
    # count it separately so a query that silently filters everything away
    # can never inflate the pass total, and fail the gate under --strict
    ok = sum(1 for v in results.values() if v.startswith("OK") and not v.startswith("OK-EMPTY"))
    vacuous = sum(1 for v in results.values() if v.startswith("OK-EMPTY"))
    for k, v in sorted(results.items()):
        tag = ('WARN' if v.startswith('OK-EMPTY')
               else 'PASS' if v.startswith('OK')
               else 'INFO' if v.startswith('ROWS_ONLY') else 'FAIL')
        print(f"{tag:5s} {k}: {v}")
    checked = len([r for r in results.values() if not r.startswith('ROWS_ONLY')])
    print(f"\n{ok}/{checked} oracle-checked queries pass"
          + (f" ({vacuous} vacuous OK-EMPTY excluded)" if vacuous else ""))
    strict = "--strict" in sys.argv
    if ok + vacuous < checked or (strict and vacuous):
        sys.exit(1)

if __name__ == "__main__":
    main()
