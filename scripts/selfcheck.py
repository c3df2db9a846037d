#!/usr/bin/env python3
"""Local mirror of the driver's t2 differential check.

Usage: python3 scripts/selfcheck.py <verify_out_dir> <sf_dir> [key ...]

Reads each <out>/<name> parquet (Spark result) and runs the matching SQL
from <out>/oracle_sql.json in DuckDB over views named after the testdata
tables. Compares schema (column names), row count, and values (columns
sorted by name; rows compared in order, with a sorted-rows fallback noted).
"""
import json, math, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm(x)}" for k, x in sorted(v.items())) + "}"
    return repr(v)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_rel = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols = [c[0] for c in spark_rel.description]
            s_rows = spark_rel.fetchall()
            d_rel = con.execute(sql)
            d_cols = [c[0] for c in d_rel.description]
            d_rows = d_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
            n_fail += 1
            continue
        s_ix = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
        d_ix = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
        s_vals = [tuple(norm(r[i]) for i in s_ix) for r in s_rows]
        d_vals = [tuple(norm(r[i]) for i in d_ix) for r in d_rows]
        if s_vals == d_vals:
            print(f"PASS {name} ({len(s_vals)} rows)")
            n_pass += 1
        elif sorted(s_vals) == sorted(d_vals):
            print(f"PASS* {name} (row order differs; {len(s_vals)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: spark {len(s_vals)} rows vs duck {len(d_vals)} rows")
            seen = set(d_vals)
            diff = [r for r in s_vals if r not in seen][:3]
            seen_s = set(s_vals)
            diff_d = [r for r in d_vals if r not in seen_s][:3]
            for r in diff:
                print(f"  spark-only: {r}")
            for r in diff_d:
                print(f"  duck-only:  {r}")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
