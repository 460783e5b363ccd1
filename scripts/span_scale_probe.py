#!/usr/bin/env python
"""Scale-up evidence for the substring span-dedup plane (VERDICT r5 #6):
run duplicate_token_spans + remove_duplicate_spans at 1x (the sf0.1
documents table, 5k docs) and 10x (50k docs), same code, same session
config, and record wall, output rows and plan shape.

The 10x corpus = the 1x docs plus 9 deterministic replicas whose tokens
carry a per-replica suffix ("_r1".."_r9"): every replica keeps the SAME
within-doc duplicate-run structure (positions/lengths identical), while
cross-replica shingles never collide — so the probe scales the shingle
volume and hot-shingle distribution 10x without manufacturing a
degenerate every-doc-duplicates-every-doc corpus.

Usage: python scripts/span_scale_probe.py [out_json]
Emits ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plan_shape(df) -> dict:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    return {
        "exchanges": plan.count("Exchange"),
        "python_stages": sum(plan.count(t) for t in
                             ("BatchEvalPython", "ArrowEvalPython",
                              "MapInArrow", "MapInPandas")),
        "smj": plan.count("SortMergeJoin"),
        "bhj": plan.count("BroadcastHashJoin"),
    }


def main() -> None:
    import bench
    from pyspark.sql import functions as F

    spark = bench.make_session("local[32]", 32)
    from wikicrawler_spark.pipeline import dedup as D

    docs1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet") \
        .select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    reps = [docs1]
    for r in range(1, 10):
        toks = F.filter(F.split(F.col("text"), "\\s+"),
                        lambda t: t != F.lit(""))
        suffixed = F.array_join(
            F.transform(toks, lambda t: F.concat(t, F.lit(f"_r{r}"))), " ")
        reps.append(docs1.select(
            F.concat(F.col("doc_id"), F.lit(f"_r{r}")).alias("doc_id"),
            suffixed.alias("text")))
    docs10 = reps[0]
    for p in reps[1:]:
        docs10 = docs10.unionByName(p)
    # materialize the 10x input so its construction is not charged to the
    # measured pipeline (mirrors reading a 10x table from storage)
    path10 = "/tmp/wcs_span_probe_10x"
    docs10.repartition(32).write.mode("overwrite").parquet(path10)
    docs10 = spark.read.parquet(path10)

    out = {}
    for tag, d in (("1x", docs1), ("10x", docs10)):
        n = d.count()
        spans = D.duplicate_token_spans(d, n=8, max_docs_per_shingle=50)
        t0 = time.monotonic()
        n_spans = spans.count()
        t_spans = round(time.monotonic() - t0, 3)
        rw = D.remove_duplicate_spans(d, n=8, max_docs_per_shingle=50)
        t0 = time.monotonic()
        rw.write.format("noop").mode("overwrite").save()
        t_rw = round(time.monotonic() - t0, 3)
        out[tag] = {"docs": n, "spans_rows": n_spans,
                    "spans_secs": t_spans, "rewrite_secs": t_rw,
                    "rewrite_plan": plan_shape(rw)}
    r1, r10 = out["1x"], out["10x"]
    out["wall_ratio_rewrite"] = round(r10["rewrite_secs"]
                                      / max(r1["rewrite_secs"], 1e-9), 2)
    out["plan_shape_equal"] = r1["rewrite_plan"] == r10["rewrite_plan"]
    spark.stop()
    print(json.dumps(out))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
