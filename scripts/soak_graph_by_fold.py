#!/usr/bin/env python3
"""Per-fold soak check for the recursive graph keys.

The ScaleFold rule shifts every join key by k*10M consistently, so the
~SF1 co-purchase graph is the DISJOINT union of 10 shards: co-purchase
edges come from the lineitem self-join on l_orderkey, and every key of
an order is shifted by the same fold, so no edge can cross folds. Every
graph key here factorizes over connected components, hence over folds —
so running the COMMITTED oracle text on each fold's view and comparing
against the Spark output's rows for that fold is a complete, exact
check of all rows, while keeping each single-node oracle evaluation
sf0.1-sized (the whole-corpus recursive CTEs spilled past the machine's
disk: q_graph_bfs alone wrote >79 GB of DuckDB temp at ~SF1).

Per-node keys (bfs / kcore / pagerank / ppr) compare rows fold by fold
and assert the fold row counts sum to the full output. The aggregate
key q_label_prop emits (round, n_labels, max_members): labels are
fold-local node ids, so the full-corpus row is the fold-wise SUM of
n_labels and MAX of max_members per round — recombined from all ten
per-fold oracle runs, no isomorphism assumption.

Decomposability is not merely asserted — it is VALIDATED by the
comparison itself: the per-fold oracle is compared against the full
Spark output, so an oracle whose formulation were NOT component-local
(a 1/N teleport over the whole corpus, a global round count) would
produce a spurious FAIL, never a false PASS. Concretely, the committed
q_pagerank/q_ppr texts teleport within the seed/component structure and
q_label_prop runs a fixed round count, all component-local; if a future
oracle edit broke that, this check fails loudly and the mismatch means
"fold assumption broken", not "Spark bug" — check the oracle text first.

Usage: python3 scripts/soak_graph_by_fold.py <soak_dir> <out_dir> <artifact.json> [key ...]
"""
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from selfcheck import TABLES, sorted_vals  # noqa: E402
from soak_check import (tuned, run_guarded, fail_counts,  # noqa: E402
                        preserve_original,
                        clean_duck_tmp, soak_oracles, check_equivalence)

SHIFT = 10_000_000
FOLDS = 10

# fold-determining column per table (graph oracles read lineitem/part;
# the rest are filtered consistently for hygiene)
FOLD_COL = {
    "part": "p_partkey", "lineitem": "l_orderkey", "orders": "o_orderkey",
    "customer": "c_custkey", "supplier": "s_suppkey",
    "events": "event_id", "documents": "doc_id",
    "embeddings": "vec_id",
}

ID_COL = {"q_graph_bfs": "part", "q_kcore": "node",
          "q_pagerank": "part", "q_ppr": "part"}

# q_ppr's committed text ends in a GLOBAL `ORDER BY rank_e9 DESC, part
# LIMIT 25` — not component-local, so the full-corpus answer is the
# top-25 of the UNION of per-fold results (exact: any global top-25 row
# has < 25 rows above it globally, hence < 25 within its own fold, so
# it survives the fold's LIMIT). Seeds (src % 97 = 0) exist in every
# fold since the 10^7 shift permutes residues mod 97.
TOP_LIMIT = {"q_ppr": (25, ["rank_e9", "part"], [False, True])}

DEFAULT_KEYS = ["q_graph_bfs", "q_kcore", "q_label_prop",
                "q_pagerank", "q_ppr"]


def fold_con(soak_dir, fold):
    con = tuned(duckdb.connect())
    for t in TABLES:
        src = f"'{soak_dir}/{t}.parquet/*.parquet'"
        if t in FOLD_COL:
            c = FOLD_COL[t]
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src} "
                        f"WHERE {c} // {SHIFT} = {fold}")
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    return con


def main():
    try:
        run()
    finally:
        clean_duck_tmp()


def run():
    soak_dir, out_dir, artifact = sys.argv[1:4]
    keys = sys.argv[4:] or DEFAULT_KEYS
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # the scalable-override texts are EXCEPT-proven equivalent to the
    # committed ones at sf0.01 (artifact `oracle_equivalence` block);
    # q_kcore's committed IN-subquery peel plans catastrophically in
    # DuckDB even at per-fold size, so use the same override here
    overrides = {k: v for k, v in soak_oracles(oracle).items() if k in keys}
    doc = json.load(open(artifact))
    if overrides:
        # re-pin equivalence for the override texts THIS run uses (the
        # artifact may hold pins for an older text) — compare against
        # the still-pristine committed dict BEFORE installing them
        doc["oracle_equivalence"].update(
            check_equivalence(oracle, overrides))
    oracle.update(overrides)
    plain = duckdb.connect()
    for key in keys:
        entry = {"rows_match": False, "schema_match": False,
                 "hash_match": False, "spark_rows": None,
                 "oracle_rows": None,
                 "err": None, "method": "per-fold oracle (10 disjoint "
                 "shards by the fold rule; see scripts/soak_graph_by_fold.py)"}
        s_df = plain.execute(
            f"SELECT * FROM '{out_dir}/{key}/*.parquet'").df()
        entry["spark_rows"] = len(s_df)
        try:
            if key == "q_label_prop":
                per = []
                for k in range(FOLDS):
                    con = fold_con(soak_dir, k)
                    per.append(run_guarded(con, oracle[key]))
                    con.close()
                import pandas as pd
                allf = pd.concat(per)
                d_df = (allf.groupby("round", as_index=False)
                        .agg(n_labels=("n_labels", "sum"),
                             max_members=("max_members", "max")))
                # preserve committed column order
                d_df = d_df[list(per[0].columns)]
            else:
                import pandas as pd
                idc = ID_COL[key]
                parts, n_spark_covered = [], 0
                for k in range(FOLDS):
                    con = fold_con(soak_dir, k)
                    got = run_guarded(con, oracle[key])
                    con.close()
                    sf = s_df[(s_df[idc] // SHIFT) == k]
                    n_spark_covered += len(sf)
                    parts.append((k, got, sf))
                assert n_spark_covered == len(s_df), \
                    f"{key}: fold partition lost rows"
                d_df = pd.concat([g for _, g, _ in parts])
                if key in TOP_LIMIT:
                    n, by, asc = TOP_LIMIT[key]
                    d_df = d_df.sort_values(by, ascending=asc).head(n)
            s_cols, s_vals = sorted_vals(s_df, "spark", key)
            d_cols, d_vals = sorted_vals(d_df, "duckdb", key)
            entry["oracle_rows"] = len(d_vals)
            entry["rows_match"] = len(s_vals) == len(d_vals)
            entry["schema_match"] = s_cols == d_cols
            entry["hash_match"] = entry["schema_match"] and s_vals == d_vals
        except Exception as e:
            entry["err"] = f"oracle-side: {e}"
        status = "PASS" if entry["hash_match"] else "FAIL"
        print(f"query {status} {key}: spark={entry['spark_rows']} "
              f"oracle={entry['oracle_rows']} err={entry['err']}", flush=True)
        preserve_original(doc, key, entry)
    doc["fail_count"], doc["env_fail_count"] = fail_counts(doc)
    with open(artifact, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"== patched {artifact}: fail_count={doc['fail_count']} "
          f"env_fail_count={doc['env_fail_count']}")


if __name__ == "__main__":
    main()
