#!/usr/bin/env python
"""Local replica of the driver's CORRECTNESS gate at sf0.01.

Runs every queries() entry on Spark and its oracle_sql() in DuckDB over the
same parquet tables, then compares rows / schema / order-insensitive value
hash the way the driver does (columns sorted by name, rows sorted by all
columns, floats rounded, md5 over the canonical frame). Also flags output
columns whose dtype would break a pandas sort_values canonicalizer
(object cells holding lists/dicts).

Usage: python scripts/driver_mimic.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def canon(df: pd.DataFrame) -> tuple[pd.DataFrame, list[str]]:
    """Driver-style canonicalization; returns (frame, problems)."""
    problems = []
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            bad = df[c].map(lambda v: isinstance(v, (list, dict, set))).any()
            if bad:
                problems.append(f"column {c} holds unhashable objects")
                df[c] = df[c].map(lambda v: json.dumps(v, sort_keys=True, default=str))
        try:
            is_float = pd.api.types.is_float_dtype(df[c])
        except Exception:
            is_float = False
        if is_float:
            df[c] = df[c].round(6)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df, problems


def value_hash(df: pd.DataFrame) -> str:
    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            # isfinite first: int(inf) raises OverflowError (ADVICE r2)
            if math.isfinite(v) and abs(v) < 1e15 and v == int(v):
                return str(int(v))
            return repr(v)
        return str(v)

    h = hashlib.md5()
    for row in df.itertuples(index=False):
        h.update("\x1f".join(cell(v) for v in row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("driver_mimic")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_bad = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            spark_pd = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if name not in oracles:
            cf, probs = canon(spark_pd)
            note = f" CANON-RISK: {probs}" if probs else ""
            print(f"ok   {name}: rows-only ({len(spark_pd)} rows, "
                  f"{time.time()-t0:.1f}s){note}")
            continue
        try:
            rel = con.sql(oracles[name])
            # HUGEINT / unsigned oracle columns land in pandas as float64
            # while Spark emits int64 — the real driver's hash does NOT
            # forgive the dtype (events_sessionize, red in r1+r2). Make the
            # whole class a loud local failure.
            bad_types = [
                f"{c}:{t}" for c, t in zip(rel.columns, map(str, rel.types))
                if str(t).upper() in ("HUGEINT", "UHUGEINT", "UBIGINT",
                                      "UINTEGER", "USMALLINT", "UTINYINT")
            ]
            if bad_types:
                print(f"FAIL {name}: oracle emits driver-hostile dtypes "
                      f"{bad_types} — cast to BIGINT/DOUBLE in the SQL")
                n_bad += 1
                continue
            ora_pd = rel.fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {type(e).__name__}: {e}")
            n_bad += 1
            continue
        rows_ok = len(spark_pd) == len(ora_pd)
        schema_ok = sorted(spark_pd.columns) == sorted(ora_pd.columns)
        sc, sp = canon(spark_pd)
        oc, op = canon(ora_pd)
        hash_ok = value_hash(sc) == value_hash(oc) if rows_ok and schema_ok else False
        status = "ok  " if (rows_ok and schema_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            n_bad += 1
        probs = sp + op
        note = f" CANON-RISK: {probs}" if probs else ""
        print(f"{status} {name}: rows={rows_ok}({len(spark_pd)}/{len(ora_pd)}) "
              f"schema={schema_ok} hash={hash_ok} ({time.time()-t0:.1f}s){note}")
        if status == "FAIL" and rows_ok and schema_ok:
            merged = sc.compare(oc) if sc.shape == oc.shape else None
            if merged is not None and not merged.empty:
                print(merged.head(5).to_string())
    print(f"\n{n_bad} failures")
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
