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
                        clean_duck_tmp, check_queries, run_guarded)

FOLDS = 100
SHIFT = 10000000


TABLES_SF10 = ["documents", "events", "embeddings"]


# ---------------------------------------------------------------------
# Fold-structured oracle for q_stream_ingest_gate (r15, VERDICT r14 #6).
#
# The committed gate oracle is an all-pairs shingle-Jaccard statement;
# verbatim at 500k documents the posting self-join costs sum(df^2) over
# tokens, and fold amplification multiplies every df by FOLDS -- x10^4
# the base join, infeasible. But the ScaleFold rule makes the TRUE pair
# structure fold-class-decomposable: copy (b, j) has shingles
# B(b) + {fs(b, j)} where B(b) is the base shingle set and fs the ONE
# trailing shingle containing the fold token "f<j>". Under the checked
# assumption that no BASE token looks like a fold suffix (^f[0-9]+$ --
# fail-loud guard below), the Jaccard of any cross-copy pair depends
# only on its CLASS, not the fold ids:
#   J_diag(a,b): copies in the SAME fold (suffix tokens equal)
#   J_off(a,b):  copies of different docs in DIFFERENT folds
#   J_same(b):   two copies of the same doc (always different folds)
# Each class is computable at BASE scale from two constructed variants
# (suffixes ' f0' and ' f1'). The gate's min-predecessor rule then
# reduces to: copy (b, j>=1) takes the smallest fold-0 predecessor
# (J_off over any other doc, or J_same over its own fold-0 copy);
# failing that, the smallest same-fold predecessor a<b with J_diag,
# shifted to fold j; copy (b, 0) sees only fold-0 predecessors
# (J_diag, a<b). Equivalence vs the committed verbatim text is
# EXCEPT-proven at small scale (sf0.01 x 12 folds, two-digit fold
# included) before the full-scale check runs.
# ---------------------------------------------------------------------

_SH_VARIANT = """SELECT doc_id,
    list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                   for i in range(1, len(t) - 1)]) AS sh
  FROM (SELECT doc_id, string_split(text || ' f{k}', ' ') AS t FROM base)
  WHERE len(t) >= 3"""


def gate_fold_sql(base_docs_glob, folds, shift=SHIFT):
    s0 = _SH_VARIANT.format(k=0)
    s1 = _SH_VARIANT.format(k=1)
    return f"""
WITH base AS (SELECT doc_id, text FROM '{base_docs_glob}'),
s0 AS MATERIALIZED ({s0}),
s1 AS MATERIALIZED ({s1}),
n0 AS (SELECT doc_id, len(sh) AS n FROM s0),
n1 AS (SELECT doc_id, len(sh) AS n FROM s1),
p0 AS (SELECT doc_id, unnest(sh) AS tok FROM s0),
p1 AS (SELECT doc_id, unnest(sh) AS tok FROM s1),
cdiag AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS c
          FROM p0 a JOIN p0 b ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
jdiag AS (SELECT a, b FROM cdiag
          JOIN n0 na ON na.doc_id = a JOIN n0 nb ON nb.doc_id = b
          WHERE 2 * c >= na.n + nb.n - c),
coff AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS c
         FROM p0 a JOIN p1 b ON a.tok = b.tok AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
joff AS (SELECT a, b FROM coff
         JOIN n0 na ON na.doc_id = a JOIN n1 nb ON nb.doc_id = b
         WHERE 2 * c >= na.n + nb.n - c),
jsame AS (SELECT s0.doc_id AS b
          FROM s0 JOIN s1 ON s0.doc_id = s1.doc_id
          WHERE 2 * len(list_intersect(s0.sh, s1.sh))
                >= len(s0.sh) + len(s1.sh)
                   - len(list_intersect(s0.sh, s1.sh))),
m0 AS (SELECT b, min(a) AS m FROM (
         SELECT a, b FROM joff
         UNION ALL SELECT b AS a, a AS b FROM joff
         UNION ALL SELECT b AS a, b FROM jsame) GROUP BY b),
md AS (SELECT b, min(a) AS m FROM jdiag GROUP BY b),
f AS (SELECT unnest(range({folds})) AS j),
amp AS (SELECT d.doc_id AS base_id, d.doc_id + j * {shift} AS doc_id, j
        FROM base d CROSS JOIN f)
SELECT amp.doc_id,
  (CASE WHEN amp.j = 0 THEN md.m
        ELSE coalesce(m0.m, md.m + amp.j * {shift}) END) IS NULL
    AS admitted,
  CAST(CASE WHEN amp.j = 0 THEN md.m
            ELSE coalesce(m0.m, md.m + amp.j * {shift}) END AS BIGINT)
    AS dup_src
FROM amp
LEFT JOIN m0 ON m0.b = amp.base_id
LEFT JOIN md ON md.b = amp.base_id
ORDER BY doc_id"""


def check_gate_token_safety(con, base_dir):
    """The fold-class reduction is exact only if no base token can
    collide with a fold-suffix token; violated -> fail loud rather than
    compare against an unsound restatement."""
    n = con.execute(
        f"SELECT count(*) FROM (SELECT unnest(string_split(text, ' ')) "
        f"AS tok FROM '{base_dir}/documents.parquet') "
        f"WHERE regexp_matches(tok, '^f[0-9]+$')").fetchone()[0]
    if n:
        raise RuntimeError(
            f"{n} base tokens match ^f[0-9]+$ -- the fold-structured "
            f"gate oracle is unsound on this corpus; use the verbatim "
            f"committed text or change the fold suffix")


def check_gate_equivalence(committed_text, base_small="/root/testdata/sf0.01",
                           folds_small=12):
    """EXCEPT-prove the fold-structured form against the committed
    verbatim text over a corpus small enough for the quadratic form:
    every base doc involved in a true near-dup pair plus a 100-doc
    prefix, amplified 12-fold (two-digit fold included, so the
    suffix-width edge is in scope). The full sf0.01 base x 12 is
    quadratic-infeasible per check run (~18M list-op pairs measured
    >25 min); the subset keeps all cross-doc pair classes while
    cutting the verbatim side ~100x -- an equivalence proof needs the
    same corpus on both sides, not the whole corpus."""
    import tempfile
    import shutil
    eq = tuned(duckdb.connect())
    tmpd = tempfile.mkdtemp(prefix="gate_eq_")
    try:
        check_gate_token_safety(eq, base_small)
        eq.execute(f"""COPY (
  WITH s AS (
    SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                  for i in range(1, len(t) - 1)]) AS sh
    FROM (SELECT doc_id, string_split(text, ' ') AS t
          FROM '{base_small}/documents.parquet')
    WHERE len(t) >= 3),
  n AS (SELECT doc_id, len(sh) AS n FROM s),
  post AS (SELECT doc_id, unnest(sh) AS tok FROM s),
  c AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS c
        FROM post a JOIN post b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
  -- slack band (ADVICE r15): the fold classes admit pairs one
  -- intersection-count below the base threshold (the trailing fold
  -- shingle adds +1 to both set sizes and, for same-fold pairs with
  -- matching last-two tokens, +1 to the intersection), so the proof
  -- corpus must include the threshold-BOUNDARY pairs too -- exactly
  -- the class where the fold-structured restatement could diverge
  pairs AS (SELECT a, b FROM c
            JOIN n na ON na.doc_id = a JOIN n nb ON nb.doc_id = b
            WHERE 2 * c >= na.n + nb.n - c - 2),
  keep AS (SELECT a AS doc_id FROM pairs
           UNION SELECT b FROM pairs)
  SELECT d.* FROM '{base_small}/documents.parquet' d
  WHERE d.doc_id < 100 OR d.doc_id IN (SELECT doc_id FROM keep)
) TO '{tmpd}/documents.parquet' (FORMAT PARQUET)""")
        cols = [r[0] for r in eq.execute(
            f"DESCRIBE SELECT * FROM "
            f"'{tmpd}/documents.parquet'").fetchall()]
        eq.execute(f"CREATE VIEW documents AS "
                   f"{rule_sql('documents', tmpd, cols, folds=folds_small)}")
        eq.execute(f"CREATE VIEW v_quad AS {committed_text}")
        eq.execute(f"CREATE VIEW v_fold AS "
                   f"{gate_fold_sql(tmpd + '/documents.parquet', folds_small)}")
        diff = int(run_guarded(
            eq,
            "SELECT count(*) FROM ((SELECT * FROM v_fold EXCEPT ALL "
            "SELECT * FROM v_quad) UNION ALL (SELECT * FROM v_quad "
            "EXCEPT ALL SELECT * FROM v_fold))").iloc[0, 0])
        print(f"equiv {'PASS' if diff == 0 else 'FAIL'} "
              f"q_stream_ingest_gate: fold-structured vs committed "
              f"diff={diff} (sf0.01 pair-subset x {folds_small})")
        return {"q_stream_ingest_gate":
                {"diff_rows": diff, "match": bool(diff == 0)}}
    finally:
        eq.close()
        shutil.rmtree(tmpd, ignore_errors=True)


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
        committed_map = json.load(open(f"{out_dir}/oracle_sql.json"))
        committed = set(committed_map)
        overrides, equiv = {}, {}
        if "q_stream_ingest_gate" in committed:
            # the one pair-generating key in this soak: fold-structured
            # oracle (the verbatim text is x10^4 the base posting join
            # here), equivalence-proven first, token-safety fail-loud
            equiv = check_gate_equivalence(
                committed_map["q_stream_ingest_gate"])
            check_gate_token_safety(con, base_dir)
            overrides["q_stream_ingest_gate"] = gate_fold_sql(
                f"{base_dir}/documents.parquet", FOLDS)
        queries = check_queries(con, out_dir, only=committed,
                                overrides=overrides)
        timings = {}
        tpath = f"{out_dir}/soak_timings.json"
        if os.path.exists(tpath):
            timings = json.load(open(tpath))
        doc = {"scale": f"sf0.1 documents x {FOLDS} folds (~SF10, 500k docs)",
               "base_dir": base_dir, "corpus": corpus,
               "oracle_equivalence": equiv,  # other texts run verbatim
               "pruned_fetches": timings.get("pruned_fetches"),
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
