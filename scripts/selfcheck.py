#!/usr/bin/env python3
"""Local mirror of the driver's t2 differential check.

Usage: python3 scripts/selfcheck.py <verify_out_dir> <sf_dir> [key ...]

Mimics the driver's pipeline shape: both the Spark result parquet and the
DuckDB oracle result are materialized as *pandas* DataFrames (duckdb
.df()), columns sorted by name, rows sorted by all columns, values
compared exactly. Going through pandas is load-bearing:

  - DuckDB sum(BIGINT) returns HUGEINT, which pandas renders as float64 —
    so an int64 Spark column vs an uncast DuckDB sum hash-mismatches even
    when the values are identical. Oracles must CAST such sums to BIGINT.
  - pandas sort_values crashes on array-typed cells (numpy.ndarray is
    unhashable) — so no oracled query may output an array/struct column.

Keys without an oracle entry get the driver's weaker check: the Spark
parquet must still load and row-sort in pandas without crashing.
"""
import glob, json, math, os, sys

import duckdb
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    """Exact, dtype-sensitive scalar rendering (float64 bits must match)."""
    if v is None:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)  # full precision: 1-ulp diffs and .0-vs-int both surface
    if isinstance(v, (np.integer, int)):
        return repr(int(v)) + "i"
    if isinstance(v, np.bool_):
        return repr(bool(v))
    if isinstance(v, bytes):
        return "b" + v.hex()
    if isinstance(v, np.ndarray) or isinstance(v, (list, dict)):
        raise TypeError(f"array/nested cell in output: {type(v).__name__}")
    return repr(str(v)) if not isinstance(v, (str, bool)) else repr(v)


def sorted_vals(df, label, name):
    cols = sorted(df.columns)
    df = df[cols]
    try:
        df = df.sort_values(cols).reset_index(drop=True)
    except Exception as e:
        raise RuntimeError(f"{name}: pandas sort of {label} result would crash "
                           f"driver-side: {e}") from e
    out = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("NULL*")  # None and NaN collapse post-pandas
            else:
                vals.append(norm(v))
        out.append(tuple(vals))
    return cols, out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    result_keys = sorted(
        os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p))
    n_pass = n_fail = 0
    for name in result_keys:
        if only and name not in only:
            continue
        try:
            s_df = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            s_cols, s_vals = sorted_vals(s_df, "spark", name)
        except Exception as e:
            print(f"FAIL {name}: spark-side load/sort: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"PASS {name} (no oracle; {len(s_vals)} rows load+sort clean)")
            n_pass += 1
            continue
        try:
            d_df = con.execute(oracle[name]).df()
            d_cols, d_vals = sorted_vals(d_df, "duckdb", name)
        except Exception as e:
            print(f"FAIL {name}: oracle-side: {e}")
            n_fail += 1
            continue
        if s_cols != d_cols:
            print(f"FAIL {name}: cols spark={s_cols} duck={d_cols}")
        elif s_vals == d_vals:
            print(f"PASS {name} ({len(s_vals)} rows)")
            n_pass += 1
            continue
        else:
            print(f"FAIL {name}: spark {len(s_vals)} rows vs duck {len(d_vals)} rows")
            seen = set(d_vals)
            for r in [r for r in s_vals if r not in seen][:3]:
                print(f"  spark-only: {r}")
            seen_s = set(s_vals)
            for r in [r for r in d_vals if r not in seen_s][:3]:
                print(f"  duck-only:  {r}")
        n_fail += 1
    # An oracled key with no result directory means the Spark run crashed on
    # it (or the registry/oracle keys diverged) — that is a FAIL, not a skip.
    have = set(result_keys)
    for name in sorted(oracle):
        if only and name not in only:
            continue
        if name not in have:
            print(f"FAIL {name}: oracled key has no result directory under {out_dir}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
