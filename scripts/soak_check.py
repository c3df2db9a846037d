#!/usr/bin/env python3
"""10x-soak verifier (driver-side tooling, like selfcheck.py).

Two gates, both in DuckDB:

1. CORPUS: restate the ScaleFold amplification rule (ops/ScaleFold.scala
   carries the same text) as SQL over the BASE dir and EXCEPT-compare
   each amplified table against the parquet the Spark derivation wrote.
   Zero diff rows = the two statements of the one rule agree.

2. QUERIES: run every soak key's oracle SQL over the soak corpus and
   compare to the Spark result parquet, exactly the driver's pipeline
   shape (pandas frames, columns sorted by name, rows sorted, values
   compared exactly -- reusing selfcheck.py's normalization).

Writes a CORRECTNESS-shaped artifact merging both gates plus the Spark
timings from soak_timings.json.

Usage: python3 scripts/soak_check.py <base_dir> <soak_dir> <out_dir> <artifact.json>
"""
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from selfcheck import TABLES, sorted_vals  # noqa: E402

SHIFT = 10_000_000

# The ONE rule, restated (ops/ScaleFold.scala `shifted` + documents /
# embeddings text):
SHIFTED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "nation": [],
    "region": [],
    "embeddings": ["vec_id"],
}

# ScaleFold.EmbEps: exactly 2^-7 — float->double is exact, k*EMB_EPS is
# exact for k <= 9, one IEEE double add + one round-to-float are
# correctly rounded identically in Spark and DuckDB, so the EXCEPT
# compare below is a bit-level gate on the whole perturbation.
EMB_EPS = "0.0078125"



DUCK_TMP = "target/duck_tmp"


def tuned(con):
    """Bound DuckDB so a blown-up plan spills to disk instead of
    ballooning resident memory (r11: the committed q_dedup_eval oracle
    passed 90 GB RSS at ~SF1 before this guard existed). Spill itself is
    capped too: r11's q_graph_bfs oracle wrote >79 GB of temp before
    dying on a full disk, and the leaked files then starved its sibling
    keys — a runaway recursive CTE must fail fast and per-key instead."""
    con.execute("SET threads TO 16")
    con.execute(f"SET memory_limit='{os.environ.get('SOAK_MEM', '48GB')}'")
    os.makedirs(DUCK_TMP, exist_ok=True)
    con.execute(f"SET temp_directory='{DUCK_TMP}'")
    con.execute("SET max_temp_directory_size='"
                f"{os.environ.get('SOAK_TMP_MAX', '24GB')}'")
    return con


def clean_duck_tmp():
    """Remove leaked spill files; DuckDB only reclaims temp on a clean
    connection close, so an interrupted/OOM-killed oracle leaves its
    duckdb_temp_storage-*.tmp behind (r11: 62 GB, disk at 80%). Called
    from a finally block on every soak-script exit path."""
    import shutil
    shutil.rmtree(DUCK_TMP, ignore_errors=True)


# Known ENVIRONMENT failure signatures on the oracle side: the watchdog
# interrupt (run_guarded), disk-full spill, the temp-directory cap, and
# allocator OOM. Matched case-insensitively as substrings of the error.
ENV_SIGS = ("interrupt", "no space left on device", "out of memory",
            "outofmemory", "cannot allocate memory",
            "max_temp_directory_size", "failed to offload")


def classify(entry):
    """status enum: pass | engine_fail | oracle_env. Only an oracle-side
    error matching a KNOWN environment signature (ENV_SIGS: watchdog
    interrupt, disk-full spill, temp cap, OOM) is an environment fault;
    any OTHER oracle-side exception — binder error, bad table reference,
    syntax — is evidence the COMMITTED ORACLE is broken, so it counts as
    engine_fail and fails the soak's exit code instead of silently
    skipping the key (ADVICE r12)."""
    if entry.get("hash_match"):
        return "pass"
    err = (entry.get("err") or "").lower()
    if err.startswith("oracle-side:") and any(s in err for s in ENV_SIGS):
        return "oracle_env"
    return "engine_fail"


def preserve_original(doc, key, new_entry):
    """Patch doc['queries'][key] without erasing the round's original
    failure evidence (ADVICE r12: the r11 artifact was rewritten in
    place, losing the original error strings): the superseded failing
    entry rides along under `recovered_from`."""
    old = doc.get("queries", {}).get(key)
    if old is not None and not old.get("hash_match"):
        new_entry = dict(new_entry)
        new_entry["recovered_from"] = {
            "err": old.get("err"), "status": old.get("status"),
            "hash_match": old.get("hash_match")}
    doc["queries"][key] = new_entry


def fail_counts(doc):
    """(engine fail_count, env_fail_count) over all three gates."""
    eng = (sum(0 if v["match"] else 1 for v in doc["corpus"].values()) +
           sum(0 if v["match"] else 1
               for v in doc["oracle_equivalence"].values()))
    env = 0
    for v in doc["queries"].values():
        v["status"] = classify(v)
        if v["status"] == "engine_fail":
            eng += 1
        elif v["status"] == "oracle_env":
            env += 1
    return eng, env


def run_guarded(con, sql, seconds=3600):
    """Execute with a wall-clock watchdog: interrupt the query after
    `seconds` so one pathological oracle records a per-key failure
    instead of hanging the whole artifact (the r10 soak never landed
    because one key ground forever). An hour is deliberately generous:
    the guard exists for unbounded hangs, not to shave minutes off a
    legitimately heavy single-node oracle at ~SF1 (q_dedup_minhash's
    prefix-join oracle needs >15 min there)."""
    import threading
    t = threading.Timer(seconds, con.interrupt)
    t.start()
    try:
        return con.execute(sql).df()
    finally:
        t.cancel()


def rule_sql(table, base_dir, cols, folds=10):
    """DuckDB restatement of the amplified table (folds 0..folds-1)."""
    shifts = set(SHIFTED[table])
    if not shifts:
        return f"SELECT * FROM '{base_dir}/{table}.parquet'"
    sel = []
    for c in cols:
        if c in shifts:
            sel.append(f"{c} + k * {SHIFT} AS {c}")
        elif table == "documents" and c == "text":
            sel.append(f"text || ' f' || CAST(k AS VARCHAR) AS text")
        elif table == "documents" and c == "n_chars":
            # 2 + digits(k): +3 for the single-digit folds of the ~SF1
            # soak (the historical rule), +4 at two digits (SF10)
            sel.append("n_chars + 2 + len(CAST(k AS VARCHAR)) AS n_chars")
        elif table == "embeddings" and c == "embedding":
            # (k % 10): the bounded perturbation alphabet (r16) -- a
            # no-op at the ~SF1 soak's 10 folds, the anti-collapse rule
            # at SF10's 100 (see ScaleFold.scala's embeddings rule)
            sel.append(f"[CAST(CAST(x AS DOUBLE) + k % 10 * {EMB_EPS} "
                       f"AS FLOAT) for x in embedding] AS embedding")
        else:
            sel.append(c)
    return (f"SELECT {', '.join(sel)} FROM '{base_dir}/{table}.parquet', "
            f"(SELECT unnest(range({folds})) AS k)")


def check_corpus(con, base_dir, soak_dir):
    out = {}
    for t in TABLES:
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{base_dir}/{t}.parquet'").fetchall()]
        # embeddings included: DuckDB EXCEPT ALL compares LIST(FLOAT)
        # cells element-wise, so the perturbation rule is gated at the
        # bit level like every scalar column
        rule = rule_sql(t, base_dir, cols)
        written = f"SELECT * FROM '{soak_dir}/{t}.parquet/*.parquet'"
        n_rule = con.execute(f"SELECT count(*) FROM ({rule})").fetchone()[0]
        n_soak = con.execute(f"SELECT count(*) FROM ({written})").fetchone()[0]
        diff = con.execute(
            f"SELECT count(*) FROM (({rule} EXCEPT ALL {written}) "
            f"UNION ALL ({written} EXCEPT ALL {rule}))").fetchone()[0]
        out[t] = {"rule_rows": n_rule, "soak_rows": n_soak,
                  "match": bool(diff == 0 and n_rule == n_soak)}
        status = "PASS" if out[t]["match"] else "FAIL"
        print(f"corpus {status} {t}: rule={n_rule} soak={n_soak} diff={diff}")
    return out


# --- Scalable-but-equivalent soak oracles -----------------------------
#
# Four committed oracles are written as O(n^2) all-pairs joins (fine at
# the driver's sf0.01 gate, infeasible at 10x soak scale: the minhash
# oracle alone ran >9 min at 5k docs). The soak gate swaps in EXACT
# reformulations of the same semantics:
#
#   - dedup trio `truth`: candidate pairs from a PREFIX-FILTERED
#     inverted index (AllPairs/PPJoin bound: J(A,B) >= 0.5 forces the
#     rarity-ordered prefixes of length |X| - ceil(|X|/2) + 1 to share
#     a shingle), then exact Jaccard on candidates only.
#   - q_dedup_eval `pred`: hamming(a,b) <= 3 over a 64-bit simhash in
#     4x16-bit words forces >= 1 word EXACTLY equal (pigeonhole), so
#     candidates come from 4 banded equi-joins, verified exactly.
#   - q_kcore: the IN-subquery peel rounds (which DuckDB planned
#     catastrophically: >64 s at pilot) become explicit joins (0.4 s).
#
# Equivalence is not assumed: check_equivalence() EXCEPT-compares every
# override against the committed text at sf0.01, where both are fast.

_SHINGLE_S = """
  SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                for i in range(1, len(t) - 1)]) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  WHERE len(t) >= 3"""

_PREFIX_PAIRS = f"""
s AS ({_SHINGLE_S}),
post AS (SELECT doc_id, unnest(sh) AS tok FROM s),
dfreq AS (SELECT tok, count(*) AS df FROM post GROUP BY 1),
ranked AS (SELECT p.doc_id, p.tok,
             row_number() OVER (PARTITION BY p.doc_id
                                ORDER BY d.df, p.tok) AS rn,
             count(*) OVER (PARTITION BY p.doc_id) AS n
           FROM post p JOIN dfreq d USING (tok)),
pref AS (SELECT doc_id, tok FROM ranked
         WHERE rn <= n - CAST(ceil(n * 0.5) AS BIGINT) + 1),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM pref a JOIN pref b ON a.tok = b.tok AND a.doc_id < b.doc_id),
p AS (SELECT doc_a, doc_b,
        len(list_intersect(sa.sh, sb.sh)) * 1.0 /
        len(list_distinct(list_concat(sa.sh, sb.sh))) AS jac
      FROM cand JOIN s sa ON sa.doc_id = doc_a
                JOIN s sb ON sb.doc_id = doc_b)"""


# The expensive prefix-filtered pair set is shared by THREE overrides
# (minhash pairs, ngram pairs, and the streaming ingest gate's
# min-predecessor rule). Materialize it once per connection as a temp
# table; the overrides then read soak_pairs instead of each re-running
# the prefix join (r11: one evaluation at ~SF1 costs tens of minutes).
# Exact J >= 0.5 pairs WITHOUT per-pair list ops: |A intersect B| is a
# posting-list self-join counted per pair (pure vectorized join+agg;
# the per-pair list_intersect verify measured 40+ GB / >1 h at ~SF1,
# this form runs in minutes), and the threshold is the integer form
# 2c >= |A|+|B|-c, exactly equivalent to jac >= 0.5.
_PAIRS_TABLE_SQL = f"""CREATE OR REPLACE TEMP TABLE soak_pairs AS
WITH s AS ({_SHINGLE_S}),
n AS (SELECT doc_id, len(sh) AS n FROM s),
post AS (SELECT doc_id, unnest(sh) AS tok FROM s),
c AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM post a JOIN post b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
SELECT doc_a, doc_b, c * 1.0 / (na.n + nb.n - c) AS jac
FROM c JOIN n na ON na.doc_id = c.doc_a JOIN n nb ON nb.doc_id = c.doc_b
WHERE 2 * c >= na.n + nb.n - c"""

_JACCARD_PAIRS_FROM_TABLE = """SELECT doc_a, doc_b,
  CAST(floor(jac * 1000000) AS BIGINT) AS jaccard_e6
FROM soak_pairs ORDER BY doc_a, doc_b"""

_GATE_FROM_TABLE = """SELECT d.doc_id, (p.dup_src IS NULL) AS admitted,
  p.dup_src
FROM documents d LEFT JOIN (
  SELECT doc_b AS doc_id, CAST(min(doc_a) AS BIGINT) AS dup_src
  FROM soak_pairs GROUP BY 1) p USING (doc_id)
ORDER BY doc_id"""


def prepare_shared(con, seconds=3600):
    """Build the shared temp tables on `con` (guarded)."""
    import threading
    t = threading.Timer(seconds, con.interrupt)
    t.start()
    try:
        con.execute(_PAIRS_TABLE_SQL)
    finally:
        t.cancel()



# Every CTE MATERIALIZED: each e_n is referenced three times (by e_n+1
# and twice inside d_n's UNION ALL); DuckDB's default inlining expands
# e3 into 3^3 copies of the e0 self-join, each with its own hash-join
# memory — measured 22+ GiB of spill on a 1.2M-edge fold where the
# materialized form runs in seconds.
_KCORE_SQL = """
WITH li AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e0 AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v
      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
d0 AS (SELECT src, count(*) AS dg FROM
    (SELECT u AS src FROM e0 UNION ALL SELECT v FROM e0)
  GROUP BY 1),
k0 AS MATERIALIZED (SELECT src FROM d0 WHERE dg >= 2),
e1 AS MATERIALIZED (SELECT u, v FROM e0
  JOIN k0 ku ON e0.u = ku.src JOIN k0 kv ON e0.v = kv.src),
d1 AS (SELECT src, count(*) AS dg FROM
    (SELECT u AS src FROM e1 UNION ALL SELECT v FROM e1)
  GROUP BY 1),
k1 AS MATERIALIZED (SELECT src FROM d1 WHERE dg >= 2),
e2 AS MATERIALIZED (SELECT u, v FROM e1
  JOIN k1 ku ON e1.u = ku.src JOIN k1 kv ON e1.v = kv.src),
d2 AS (SELECT src, count(*) AS dg FROM
    (SELECT u AS src FROM e2 UNION ALL SELECT v FROM e2)
  GROUP BY 1),
k2 AS MATERIALIZED (SELECT src FROM d2 WHERE dg >= 2),
e3 AS MATERIALIZED (SELECT u, v FROM e2
  JOIN k2 ku ON e2.u = ku.src JOIN k2 kv ON e2.v = kv.src)
SELECT src AS node, CAST(count(*) AS BIGINT) AS dg FROM
  (SELECT u AS src FROM e3 UNION ALL SELECT v FROM e3)
GROUP BY 1 ORDER BY node"""


def _dedup_eval_sql(committed):
    """Rewrite BOTH all-pairs joins in the committed q_dedup_eval text,
    keeping the (long, generated) simhash CTEs verbatim: `truth` becomes
    the prefix-filtered pair set; `pred`'s all-pairs hamming join becomes
    the 4-band pigeonhole equi-join over the same sh0..sh3 words.
    """
    quad_truth = ("truth AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b\n"
                  "      FROM s a JOIN s b ON a.doc_id < b.doc_id\n"
                  "      WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /\n"
                  "            len(list_distinct(list_concat(a.sh, b.sh)))"
                  " >= 0.5),")
    fast_truth = f"""post AS (SELECT doc_id, unnest(sh) AS tok FROM s),
dfreq AS (SELECT tok, count(*) AS df FROM post GROUP BY 1),
ranked AS (SELECT p.doc_id, p.tok,
             row_number() OVER (PARTITION BY p.doc_id
                                ORDER BY d.df, p.tok) AS rn,
             count(*) OVER (PARTITION BY p.doc_id) AS n
           FROM post p JOIN dfreq d USING (tok)),
pref AS (SELECT doc_id, tok FROM ranked
         WHERE rn <= n - CAST(ceil(n * 0.5) AS BIGINT) + 1),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM pref a JOIN pref b ON a.tok = b.tok AND a.doc_id < b.doc_id),
truth AS (SELECT doc_a, doc_b
      FROM cand JOIN s sa ON sa.doc_id = doc_a
                JOIN s sb ON sb.doc_id = doc_b
      WHERE len(list_intersect(sa.sh, sb.sh)) * 1.0 /
            len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.5),"""
    quad_pred = ("pred AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b\n"
                 "      FROM sh2 a JOIN sh2 b ON a.doc_id < b.doc_id\n"
                 "      WHERE bit_count(xor(a.sh0, b.sh0)) +"
                 " bit_count(xor(a.sh1, b.sh1)) +"
                 " bit_count(xor(a.sh2, b.sh2)) +"
                 " bit_count(xor(a.sh3, b.sh3)) <= 3),")
    fast_pred = """pcand AS (
  SELECT DISTINCT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sh2 a JOIN sh2 b
      ON a.sh0 = b.sh0 AND a.doc_id < b.doc_id
    UNION ALL SELECT a.doc_id, b.doc_id FROM sh2 a JOIN sh2 b
      ON a.sh1 = b.sh1 AND a.doc_id < b.doc_id
    UNION ALL SELECT a.doc_id, b.doc_id FROM sh2 a JOIN sh2 b
      ON a.sh2 = b.sh2 AND a.doc_id < b.doc_id
    UNION ALL SELECT a.doc_id, b.doc_id FROM sh2 a JOIN sh2 b
      ON a.sh3 = b.sh3 AND a.doc_id < b.doc_id)),
pred AS (SELECT doc_a, doc_b
      FROM pcand JOIN sh2 a ON a.doc_id = doc_a
                 JOIN sh2 b ON b.doc_id = doc_b
      WHERE bit_count(xor(a.sh0, b.sh0)) + bit_count(xor(a.sh1, b.sh1)) +
            bit_count(xor(a.sh2, b.sh2)) + bit_count(xor(a.sh3, b.sh3))
            <= 3),"""
    assert quad_truth in committed and quad_pred in committed, \
        "committed q_dedup_eval text changed; update the soak override"
    return committed.replace(quad_truth, fast_truth) \
                    .replace(quad_pred, fast_pred)



_EC_QUAD = """WITH RECURSIVE p AS MATERIALIZED (
  SELECT a.p_partkey AS pa, b.p_partkey AS pb
  FROM part a JOIN part b
    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
  WHERE abs(len(a.p_name) - len(b.p_name)) <= 2
    AND levenshtein(a.p_name, b.p_name) <= 2),"""
_EC_FAST = """WITH RECURSIVE dn AS MATERIALIZED (
  SELECT DISTINCT p_brand, p_name FROM part),
np AS MATERIALIZED (
  SELECT a.p_brand, a.p_name AS na, b.p_name AS nb
  FROM dn a JOIN dn b
    ON a.p_brand = b.p_brand AND a.p_name <= b.p_name
  WHERE abs(len(a.p_name) - len(b.p_name)) <= 2
    AND levenshtein(a.p_name, b.p_name) <= 2),
p AS MATERIALIZED (
  SELECT least(ka.p_partkey, kb.p_partkey) AS pa,
         greatest(ka.p_partkey, kb.p_partkey) AS pb
  FROM np
  JOIN part ka ON ka.p_brand = np.p_brand AND ka.p_name = np.na
  JOIN part kb ON kb.p_brand = np.p_brand AND kb.p_name = np.nb
  WHERE np.na <> np.nb OR ka.p_partkey < kb.p_partkey),"""


def _entity_clusters_sql(committed):
    """The committed pair CTE re-verifies levenshtein once per KEY pair;
    the soak corpus copies every name 10x, so that is 100x duplicated DP
    work (the exact pathology the r11 Spark derivation fixed by deduping
    to the distinct name domain first). Same rewrite here; equivalence is
    EXCEPT-proven at sf0.01 like every other override."""
    assert _EC_QUAD in committed, "entity_clusters oracle text drifted"
    return committed.replace(_EC_QUAD, _EC_FAST)


def soak_oracles(committed):
    """name -> scalable oracle; every other key uses its committed text."""
    out = {
        "q_dedup_minhash": _JACCARD_PAIRS_FROM_TABLE,
        "q_dedup_ngram": _JACCARD_PAIRS_FROM_TABLE,
        "q_kcore": _KCORE_SQL,
    }
    if "q_stream_ingest_gate" in committed:
        out["q_stream_ingest_gate"] = _GATE_FROM_TABLE
    if "q_dedup_eval" in committed:
        out["q_dedup_eval"] = _dedup_eval_sql(committed["q_dedup_eval"])
    if "q_entity_clusters" in committed:
        out["q_entity_clusters"] = _entity_clusters_sql(
            committed["q_entity_clusters"])
    return out


def check_equivalence(committed, overrides):
    """Prove each override computes the committed semantics: run both over
    the sf0.01 base (where the quadratic forms are fast) and require a
    zero EXCEPT-diff. A fresh connection so the soak views don't leak in.
    """
    eq = tuned(duckdb.connect())
    for t in TABLES:
        eq.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                   f"'/root/testdata/sf0.01/{t}.parquet'")
    try:
        prepare_shared(eq)
    except Exception as e:
        print(f"shared-pairs build (sf0.01) FAILED: {e}", flush=True)
    out = {}
    for k, fast in sorted(overrides.items()):
        eq.execute(f"CREATE OR REPLACE VIEW v_fast AS {fast}")
        eq.execute(f"CREATE OR REPLACE VIEW v_quad AS {committed[k]}")
        diff = int(run_guarded(eq,
            "SELECT count(*) FROM ((SELECT * FROM v_fast EXCEPT ALL "
            "SELECT * FROM v_quad) UNION ALL (SELECT * FROM v_quad "
            "EXCEPT ALL SELECT * FROM v_fast))").iloc[0, 0])
        out[k] = {"diff_rows": diff, "match": bool(diff == 0)}
        print(f"equiv {'PASS' if diff == 0 else 'FAIL'} {k}: "
              f"override vs committed diff={diff} (sf0.01)")
    eq.close()
    return out


def check_queries(con, out_dir, only=None, overrides=None):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    oracle.update(soak_oracles(oracle))
    # caller-supplied scalable forms (soak100_check's fold-structured
    # gate oracle) win over both the committed text and soak_oracles
    oracle.update(overrides or {})
    if only is not None:
        # callers with a scoped key set (soak100_check) drop the
        # unconditional overrides for keys they never ran
        oracle = {k: v for k, v in oracle.items() if k in only}
    res = {}
    for name in sorted(oracle):
        entry = {"rows_match": False, "schema_match": False,
                 "hash_match": False, "spark_rows": None,
                 "oracle_rows": None, "err": None}
        res[name] = entry
        try:
            s_df = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            s_cols, s_vals = sorted_vals(s_df, "spark", name)
            entry["spark_rows"] = len(s_vals)
        except Exception as e:
            entry["err"] = f"spark-side: {e}"
            print(f"query FAIL {name}: {entry['err']}")
            continue
        try:
            d_df = run_guarded(con, oracle[name])
            d_cols, d_vals = sorted_vals(d_df, "duckdb", name)
            entry["oracle_rows"] = len(d_vals)
        except Exception as e:
            entry["err"] = f"oracle-side: {e}"
            print(f"query FAIL {name}: {entry['err']}")
            continue
        entry["rows_match"] = len(s_vals) == len(d_vals)
        entry["schema_match"] = s_cols == d_cols
        entry["hash_match"] = entry["schema_match"] and s_vals == d_vals
        status = "PASS" if entry["hash_match"] else "FAIL"
        print(f"query {status} {name}: spark={len(s_vals)} oracle={len(d_vals)}")
        if not entry["hash_match"] and entry["rows_match"]:
            for a, b in [(a, b) for a, b in zip(s_vals, d_vals) if a != b][:2]:
                print(f"  spark: {a}\n  duck:  {b}")
    return res


def main():
    base_dir, soak_dir, out_dir, artifact = sys.argv[1:5]
    try:
        con = tuned(duckdb.connect())
        corpus = check_corpus(con, base_dir, soak_dir)
        committed = json.load(open(f"{out_dir}/oracle_sql.json"))
        equiv = check_equivalence(committed, soak_oracles(committed))
        # oracle views read the SOAK corpus -- both engines see the same
        # files
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"'{soak_dir}/{t}.parquet/*.parquet'")
        print("building shared soak_pairs table (posting-join count)...",
              flush=True)
        try:
            prepare_shared(con)
        except Exception as e:
            print(f"shared-pairs build FAILED: {e} -- dependent keys will "
                  f"record per-key failures", flush=True)
        queries = check_queries(con, out_dir)
        timings = {}
        tpath = f"{out_dir}/soak_timings.json"
        if os.path.exists(tpath):
            timings = json.load(open(tpath))
        doc = {"scale": "sf0.1 x 10 folds (~SF1)", "base_dir": base_dir,
               "corpus": corpus, "oracle_equivalence": equiv,
               "queries": queries, "timings": timings}
        doc["fail_count"], doc["env_fail_count"] = fail_counts(doc)
        with open(artifact, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        print(f"== soak: {doc['fail_count']} engine failures, "
              f"{doc['env_fail_count']} oracle-env failures -> {artifact}")
        # An UNRECOVERED environment failure is loud (exit 2), not a
        # clean run (VERDICT r13 #7): the artifact still lands so the
        # recovery scripts (e.g. soak_graph_by_fold.py) can patch the
        # env-failed keys — after which the patched artifact carries
        # hash_match=True entries with the original failure preserved
        # under `recovered_from`, and re-running this gate exits 0.
        sys.exit(1 if doc["fail_count"]
                 else (2 if doc["env_fail_count"] else 0))
    finally:
        clean_duck_tmp()


if __name__ == "__main__":
    main()


