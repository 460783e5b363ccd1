#!/usr/bin/env python
"""Extra benchmarks for optimization work (guide §1) — NOT the driver's
harness. bench.py is frozen for measurement; this file exists so the
round's before/after numbers and plan dumps can be produced without
touching it.

Modes:
  python bench_extra.py queries [name ...]   best-of-N noop timing per query
  python bench_extra.py plans <outdir> [name ...]   explain("formatted") dumps
  python bench_extra.py crawl                 instrumented crawl run (bench args)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32), WCS_BENCH_REPEATS (default 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("WCS_BENCH_REPEATS", "2"))


def make_session():
    import bench
    return bench.make_session(f"local[{CPUS}]", CPUS)


def run_noop(df):
    df.write.format("noop").mode("overwrite").save()


def headline_names():
    import bench
    return list(bench.HEADLINE)


def cmd_queries(names):
    from wikicrawler_spark import queries as Q

    spark = make_session()
    registry = Q.queries()
    per = {}
    for _ in range(REPEATS):
        for name in names:
            fn = registry[name]
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            try:
                t0 = time.monotonic()
                run_noop(fn(spark, SF_DIR))
                dt = round(time.monotonic() - t0, 3)
                if name not in per or 0 < dt < per[name]:
                    per[name] = dt
            except Exception as e:  # noqa: BLE001
                per[name] = -1.0
                print(f"# {name} FAILED: {e}", file=sys.stderr)
    spark.stop()
    print(json.dumps(per, indent=1, sort_keys=True))


def cmd_plans(outdir, names):
    from wikicrawler_spark import queries as Q

    os.makedirs(outdir, exist_ok=True)
    spark = make_session()
    registry = Q.queries()
    for name in names:
        try:
            df = registry[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
                f.write(plan)
            print(f"wrote {name}")
        except Exception as e:  # noqa: BLE001
            print(f"# {name} FAILED: {e}", file=sys.stderr)
    spark.stop()


def cmd_crawl():
    import shutil
    import tempfile

    spark = make_session()
    from wikicrawler_spark import corpus as C
    from wikicrawler_spark.frontier import crawl as run_crawl

    corpus_path = os.environ.get("SPARK_GRAFT_BENCH_CORPUS",
                                 "/tmp/wcs_bench_corpus_300000")
    docs = spark.read.parquet(corpus_path)
    ck = tempfile.mkdtemp(prefix="wcs_extra_crawl_")
    seeds = [C.doc_id_for("basic_article", 0),
             C.doc_id_for("media_interleaved", 0)]
    t0 = time.monotonic()
    res = run_crawl(spark, docs, seeds, max_waves=6, use_bloom=True,
                    num_partitions=64, visited_buckets=32, ckpt_dir=ck)
    n_visited = res.visited.count()
    dt = round(time.monotonic() - t0, 3)
    shutil.rmtree(ck, ignore_errors=True)
    spark.stop()
    print(json.dumps({"secs": dt, "visited": n_visited,
                      "wave_sizes": res.wave_sizes,
                      "wave_stages": res.wave_stages}))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "queries":
        cmd_queries(sys.argv[2:] or headline_names())
    elif mode == "plans":
        cmd_plans(sys.argv[2], sys.argv[3:] or headline_names())
    elif mode == "crawl":
        cmd_crawl()
    else:
        sys.exit(__doc__)
