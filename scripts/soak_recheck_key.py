#!/usr/bin/env python3
"""Surgically re-check ONE soak key and patch the artifact — for keys
whose first pass failed on an environmental fault (disk-full spill,
watchdog interrupt) rather than a semantic mismatch. Runs the exact
oracle text the main checker would (committed, or its soak override),
with the same tuned connection and guard.

Usage: python3 scripts/soak_recheck_key.py <soak_dir> <out_dir> <artifact.json> <key>
"""
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from selfcheck import TABLES, sorted_vals  # noqa: E402
from soak_check import (tuned, run_guarded, soak_oracles,  # noqa: E402
                        prepare_shared, fail_counts, clean_duck_tmp,
                        preserve_original)


def main():
    try:
        run()
    finally:
        clean_duck_tmp()


def run():
    soak_dir, out_dir, artifact, key = sys.argv[1:5]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    oracle.update(soak_oracles(oracle))
    con = tuned(duckdb.connect())
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{soak_dir}/{t}.parquet/*.parquet'")
    sql = oracle[key]
    if "soak_pairs" in sql:
        prepare_shared(con)
    entry = {"rows_match": False, "schema_match": False,
             "hash_match": False, "spark_rows": None,
             "oracle_rows": None, "err": None}
    s_df = con.execute(f"SELECT * FROM '{out_dir}/{key}/*.parquet'").df()
    s_cols, s_vals = sorted_vals(s_df, "spark", key)
    entry["spark_rows"] = len(s_vals)
    d_df = run_guarded(con, sql)
    d_cols, d_vals = sorted_vals(d_df, "duckdb", key)
    entry["oracle_rows"] = len(d_vals)
    entry["rows_match"] = len(s_vals) == len(d_vals)
    entry["schema_match"] = s_cols == d_cols
    entry["hash_match"] = entry["schema_match"] and s_vals == d_vals
    status = "PASS" if entry["hash_match"] else "FAIL"
    print(f"query {status} {key}: spark={len(s_vals)} oracle={len(d_vals)}")
    doc = json.load(open(artifact))
    preserve_original(doc, key, entry)
    doc["fail_count"], doc["env_fail_count"] = fail_counts(doc)
    with open(artifact, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"== patched {artifact}: fail_count={doc['fail_count']} "
          f"env_fail_count={doc['env_fail_count']}")
    sys.exit(0 if entry["hash_match"] else 1)


if __name__ == "__main__":
    main()
