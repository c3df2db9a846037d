#!/usr/bin/env python3
"""Pruned-branch gate equivalence (VERDICT r13 #1 discipline, scripted
in r15 after two rounds of ad-hoc compares): the four gate keys re-run
at soak scale with SPARK_GRAFT_PRUNE_BYTES=0 (candidates-pruned store
fetch forced on every batch) must EXCEPT-match the scan-branch outputs
of the main soak run row for row.

Usage:
  python3 scripts/pruned_gates_check.py <main_out_dir> <pruned_out_dir> \
      <artifact.json> [key ...]
Default keys: the four streaming gates. Exit 1 on any mismatch.
"""
import json
import sys

import duckdb

DEFAULT_KEYS = ["q_stream_ann_delete", "q_stream_ann_ingest",
                "q_stream_emb_gate", "q_stream_ingest_gate"]


def main():
    main_out, pruned_out, artifact = sys.argv[1:4]
    keys = sys.argv[4:] or DEFAULT_KEYS
    con = duckdb.connect()
    res = {}
    for k in sorted(keys):
        a = f"SELECT * FROM '{main_out}/{k}/*.parquet'"
        b = f"SELECT * FROM '{pruned_out}/{k}/*.parquet'"
        # a missing/unreadable parquet dir must record a per-key FAIL and
        # keep checking (and still write the artifact), not abort with a
        # traceback and no artifact (ADVICE r15)
        try:
            diff = con.execute(
                f"SELECT count(*) FROM (({a} EXCEPT ALL {b}) "
                f"UNION ALL ({b} EXCEPT ALL {a}))").fetchone()[0]
            rows = con.execute(f"SELECT count(*) FROM ({a})").fetchone()[0]
            res[k] = {"diff_rows": diff, "match": bool(diff == 0),
                      "rows": rows}
            print(f"pruned {'PASS' if diff == 0 else 'FAIL'} {k}: "
                  f"rows={rows} diff={diff}")
        except Exception as e:  # noqa: BLE001 - record any per-key error
            res[k] = {"match": False, "err": f"{type(e).__name__}: {e}"}
            print(f"pruned FAIL {k}: {type(e).__name__}: {e}")
    doc = {"keys": res,
           "what": "~SF1 gate replays re-run with SPARK_GRAFT_PRUNE_BYTES=0 "
                   "(candidates-pruned store fetch forced on every batch) "
                   "and EXCEPT-compared against the scan-branch outputs of "
                   "the main soak run"}
    with open(artifact, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"-> {artifact}")
    sys.exit(0 if all(v["match"] for v in res.values()) else 1)


if __name__ == "__main__":
    main()
