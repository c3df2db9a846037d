#!/usr/bin/env python3
"""SF10 soak verifier (100-fold documents) -- the soak_check.py pipeline
scoped to the O(n) tier graft.tools.Soak100 runs:

1. CORPUS: the one ScaleFold rule restated at folds=100 over the BASE
   documents table, EXCEPT-compared against the amplified parquet.
2. QUERIES: every key's COMMITTED oracle text run verbatim over the
   500k-document soak corpus (the tier is linear, so no override is
   needed -- which is the point of scoping the SF10 soak to it).

Writes a CORRECTNESS-shaped artifact merging both gates plus the Spark
timings from soak_timings.json.

Usage: python3 scripts/soak100_check.py <base_dir> <soak_dir> <out_dir> <artifact.json>
"""
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from soak_check import (tuned, rule_sql, fail_counts,  # noqa: E402
                        clean_duck_tmp, check_queries)

FOLDS = 100


TABLES_SF10 = ["documents", "events"]


def check_corpus_sf10(con, base_dir, soak_dir):
    out = {}
    for t in TABLES_SF10:
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{base_dir}/{t}.parquet'").fetchall()]
        rule = rule_sql(t, base_dir, cols, folds=FOLDS)
        written = f"SELECT * FROM '{soak_dir}/{t}.parquet/*.parquet'"
        n_rule = con.execute(f"SELECT count(*) FROM ({rule})").fetchone()[0]
        n_soak = con.execute(
            f"SELECT count(*) FROM ({written})").fetchone()[0]
        diff = con.execute(
            f"SELECT count(*) FROM (({rule} EXCEPT ALL {written}) "
            f"UNION ALL ({written} EXCEPT ALL {rule}))").fetchone()[0]
        out[t] = {"rule_rows": n_rule, "soak_rows": n_soak,
                  "match": bool(diff == 0 and n_rule == n_soak)}
        status = "PASS" if out[t]["match"] else "FAIL"
        print(f"corpus {status} {t}: rule={n_rule} soak={n_soak} "
              f"diff={diff}")
    return out


def main():
    base_dir, soak_dir, out_dir, artifact = sys.argv[1:5]
    try:
        con = tuned(duckdb.connect())
        corpus = check_corpus_sf10(con, base_dir, soak_dir)
        # the keys read documents + events; committed oracles run verbatim
        for t in TABLES_SF10:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"'{soak_dir}/{t}.parquet/*.parquet'")
        committed = set(json.load(open(f"{out_dir}/oracle_sql.json")))
        queries = check_queries(con, out_dir, only=committed)
        timings = {}
        tpath = f"{out_dir}/soak_timings.json"
        if os.path.exists(tpath):
            timings = json.load(open(tpath))
        doc = {"scale": f"sf0.1 documents x {FOLDS} folds (~SF10, 500k docs)",
               "base_dir": base_dir, "corpus": corpus,
               "oracle_equivalence": {},  # committed texts run verbatim
               "queries": queries, "timings": timings}
        doc["fail_count"], doc["env_fail_count"] = fail_counts(doc)
        with open(artifact, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        print(f"== soak100: {doc['fail_count']} engine failures, "
              f"{doc['env_fail_count']} oracle-env failures -> {artifact}")
        # unrecovered env-failures are loud — see soak_check.main
        sys.exit(1 if doc["fail_count"]
                 else (2 if doc["env_fail_count"] else 0))
    finally:
        clean_duck_tmp()


if __name__ == "__main__":
    main()
