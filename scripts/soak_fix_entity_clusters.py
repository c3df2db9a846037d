#!/usr/bin/env python3
"""Surgical re-check of q_entity_clusters for the soak artifact.

The committed oracle closes the match graph with a DuckDB recursive
reachability CTE (r(a,b) = every reachable node per node) — correct, but
at ~SF1 the fold-amplified clusters make that quadratic-in-cluster-size
and the checker's per-key watchdog interrupts it. The connected-component
closure here is a plain union-find over the SAME pair set (pairs come
from the distinct-name levenshtein SQL the checker's override uses, which
is EXCEPT-proven equivalent to the committed pair CTE at sf0.01), and the
union-find itself is equivalence-pinned against the committed recursive
CTE at sf0.01 before the ~SF1 run — the same machine-checked-override
discipline, with the closure in the driver-side tool instead of SQL.

Usage: python3 scripts/soak_fix_entity_clusters.py <soak_dir> <out_dir> <artifact.json>
"""
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from selfcheck import sorted_vals  # noqa: E402
from soak_check import fail_counts, preserve_original  # noqa: E402

PAIRS = """
WITH dn AS (SELECT DISTINCT p_brand, p_name FROM part),
np AS (SELECT a.p_brand, a.p_name AS na, b.p_name AS nb
  FROM dn a JOIN dn b ON a.p_brand = b.p_brand AND a.p_name <= b.p_name
  WHERE abs(len(a.p_name) - len(b.p_name)) <= 2
    AND levenshtein(a.p_name, b.p_name) <= 2)
SELECT least(ka.p_partkey, kb.p_partkey) AS pa,
       greatest(ka.p_partkey, kb.p_partkey) AS pb
FROM np JOIN part ka ON ka.p_brand = np.p_brand AND ka.p_name = np.na
        JOIN part kb ON kb.p_brand = np.p_brand AND kb.p_name = np.nb
WHERE np.na <> np.nb OR ka.p_partkey < kb.p_partkey
"""


def entity_rows(part_path):
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    con.execute(f"CREATE VIEW part AS SELECT * FROM '{part_path}'")
    pairs = con.execute(PAIRS).fetchall()
    keys = [r[0] for r in con.execute(
        "SELECT p_partkey FROM part ORDER BY 1").fetchall()]
    parent = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN so the root IS the canonical min id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return [(k, find(k)) for k in keys]


def main():
    soak_dir, out_dir, artifact = sys.argv[1:4]
    # equivalence pin at sf0.01: union-find closure == committed
    # recursive-CTE closure, row for row
    committed = json.load(open(f"{out_dir}/oracle_sql.json"))
    eq = duckdb.connect()
    eq.execute("SET threads TO 16")
    eq.execute("CREATE VIEW part AS SELECT * FROM "
               "'/root/testdata/sf0.01/part.parquet'")
    ref = eq.execute(committed["q_entity_clusters"]).fetchall()
    uf = entity_rows("/root/testdata/sf0.01/part.parquet")
    assert [tuple(r) for r in ref] == uf, \
        "union-find disagrees with committed recursive CTE at sf0.01"
    print(f"equiv PASS q_entity_clusters union-find vs recursive CTE "
          f"(sf0.01, {len(uf)} rows)")

    # ~SF1 check against the Spark output parquet
    got = entity_rows(f"{soak_dir}/part.parquet/*.parquet")
    con = duckdb.connect()
    s_df = con.execute(
        f"SELECT * FROM '{out_dir}/q_entity_clusters/*.parquet'").df()
    s_cols, s_vals = sorted_vals(s_df, "spark", "q_entity_clusters")
    import pandas as pd
    d_df = pd.DataFrame(got, columns=["p_partkey", "entity_id"])
    d_cols, d_vals = sorted_vals(d_df, "duckdb", "q_entity_clusters")
    entry = {
        "rows_match": len(s_vals) == len(d_vals),
        "schema_match": s_cols == d_cols,
        "hash_match": s_cols == d_cols and s_vals == d_vals,
        "spark_rows": len(s_vals), "oracle_rows": len(d_vals),
        "err": None,
        "method": ("union-find closure over the distinct-name pair set, "
                   "equivalence-pinned vs the committed recursive CTE at "
                   "sf0.01; see scripts/soak_fix_entity_clusters.py"),
    }
    status = "PASS" if entry["hash_match"] else "FAIL"
    print(f"query {status} q_entity_clusters: spark={len(s_vals)} "
          f"oracle={len(d_vals)}")
    doc = json.load(open(artifact))
    preserve_original(doc, "q_entity_clusters", entry)
    doc["fail_count"], doc["env_fail_count"] = fail_counts(doc)
    with open(artifact, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"== patched {artifact}: fail_count={doc['fail_count']} "
          f"env_fail_count={doc['env_fail_count']}")
    sys.exit(1 if not entry["hash_match"] else 0)


if __name__ == "__main__":
    main()
