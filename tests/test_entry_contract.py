"""Replicates the driver's correctness gate locally: every queries() entry
runs at sf0.001, and every oracle_sql() entry is executed in DuckDB on the
same parquet tables; row counts, column sets, and order-insensitive values
must match.
"""

from __future__ import annotations

import json
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, normalize(x)) for k, x in v.items()))
    return v


def df_to_multiset(cols, rows):
    out = {}
    for r in rows:
        key = tuple(normalize(r[c]) for c in cols)
        out[key] = out.get(key, 0) + 1
    return out


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "kind", "text", "media_ref", "offset"}


def test_every_query_runs(spark):
    """Queries WITHOUT an oracle still must run (the oracle-backed ones
    execute in test_query_matches_oracle — no need to run them twice)."""
    qs = entrymod.queries()
    oracled = set(entrymod.oracle_sql())
    assert len(qs) >= 20
    for name, fn in qs.items():
        if name in oracled:
            continue
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_query_matches_oracle(spark, con, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_DIR)
    srows = sdf.collect()
    scols = sorted(sdf.columns)

    ores = con.execute(entrymod.oracle_sql()[name])
    ocols_all = [d[0] for d in ores.description]
    orows = ores.fetchall()
    ocols = sorted(ocols_all)

    assert scols == ocols, f"{name}: column sets differ: {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: row counts {len(srows)} vs {len(orows)}"

    s_ms = df_to_multiset(scols, [r.asDict() for r in srows])
    o_ms = df_to_multiset(ocols, [dict(zip(ocols_all, r)) for r in orows])
    if s_ms != o_ms:
        only_s = {k for k in s_ms if s_ms[k] != o_ms.get(k)}
        only_o = {k for k in o_ms if o_ms[k] != s_ms.get(k)}
        raise AssertionError(
            f"{name}: value mismatch; spark-only={list(only_s)[:3]} "
            f"oracle-only={list(only_o)[:3]}"
        )


def test_training_corpus_leaves_no_persisted_rdds(spark):
    """VERDICT r3 "What's wrong" #2: the extraction-body materialization
    boundary must not leak cached blocks into the rest of the session —
    it's now an explicit temp-table write, so the query must not ADD any
    persistent RDDs. Compare id sets, not counts: earlier tests' cached
    RDDs are unpersisted asynchronously by the ContextCleaner once their
    references are GC'd, so the pre-existing set can legitimately shrink
    while this query runs."""
    ids_before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    df = entrymod.queries()["training_corpus"](spark, SF_DIR)
    assert df.count() > 0
    ids_after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    leaked = ids_after - ids_before
    assert not leaked, leaked


def test_driver_window_holds_stale_queries():
    """Staleness rotation rule (VERDICT r3 #1): the driver's correctness
    gate covers only the FIRST 50 registry entries, so a query may sit in
    the tail ONLY while its dependency fingerprint (its function source +
    every package function/class/constant it transitively references + its
    oracle SQL — scripts/dep_fingerprint.py) is byte-identical to the
    state its last green driver round actually verified, as recorded in
    tests/driver_verified_hashes.json. Editing any code a tail query
    transitively imports trips this test until the query is rotated into
    the window (or the edit reverted). Refresh the manifest as the LAST
    step of a round: `python scripts/refresh_dep_manifest.py <round>`."""
    import json

    from scripts.dep_fingerprint import query_fingerprint

    manifest_path = os.path.join(os.path.dirname(__file__),
                                 "driver_verified_hashes.json")
    with open(manifest_path) as f:
        manifest = json.load(f)

    manifest.pop("_meta", None)
    latest = max(rec["round"] for rec in manifest.values())
    names = list(entrymod.queries())
    problems = []
    for n in names[50:]:
        rec = manifest.get(n)
        if rec is None:
            problems.append(f"{n}: never driver-verified")
        elif query_fingerprint(n) != rec["hash"]:
            problems.append(
                f"{n}: deps changed since driver round {rec['round']}")
        elif rec["round"] < latest - 2:
            # Age bound (VERDICT r4 #4): fingerprints can't see Spark
            # upgrades or testdata-layout changes, so an unchanged query
            # still may not skip the driver gate forever.
            problems.append(
                f"{n}: last driver row r{rec['round']} is more than 2 "
                f"rounds behind the window (r{latest})")
    assert problems == [], (
        "stale queries outside the driver's 50-entry gate window — move "
        "them into the first 50 of queries():\n  " + "\n  ".join(problems))


def test_fingerprints_stable_across_hash_seeds():
    """ADVICE r4 (medium): repr() of set/frozenset constants follows
    per-process hash-randomized iteration order, so fingerprints computed
    in different processes could spuriously differ, breaking the rotation
    rule. _const_repr canonicalizes set-bearing values; this pins the fix
    by comparing the FULL fingerprint dict under two different
    PYTHONHASHSEEDs (r5: a single hand-picked query missed a leak through
    module-level strings BUILT from set iteration — queries._TB_ABBR_ALT —
    which the whole-dict comparison catches for every query at once).
    """
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = ("import sys, json; sys.path.insert(0, %r); "
            "from scripts.dep_fingerprint import all_fingerprints; "
            "print(json.dumps(all_fingerprints(), sort_keys=True))" % repo)
    outs = []
    for seed in ("1", "2"):
        env = dict(os.environ, PYTHONHASHSEED=seed)
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, cwd=repo)
        assert r.returncode == 0, r.stderr
        outs.append(json.loads(r.stdout.strip().splitlines()[-1]))
    diff = {k for k in outs[0] if outs[0][k] != outs[1].get(k)}
    assert not diff, f"fingerprints differ across seeds for: {sorted(diff)}"
