#!/usr/bin/env python
"""Scale-up evidence run (VERDICT r3 #4): the headline extraction pass and
the full training-corpus chain at 1x (300k docs, the bench corpus) and 10x
(3M docs), same code, same session config, local[32].

What the 100 TB claims need evidenced at sandbox scale:
  * near-linear wall-time growth doc-count -> 10x doc-count (a super-linear
    blowup here means a hidden all-pairs / skew / driver bottleneck);
  * UNCHANGED physical plan shape (exchange/python-stage counts must not
    grow with data size — plans that add exchanges at scale re-plan into
    shuffles at 100 TB);
  * bounded memory (peak user RSS) and spill accounted for, no OOM.

Usage: python scripts/scale_run.py <n_docs> [out_json]
Emits ONE JSON line; BENCH/BASELINE.md records the 1x-vs-10x table.

Metrics sources: wall = monotonic around noop writes; spill/shuffle = Spark
REST API (ui on an ephemeral port — the only place executor spill metrics
surface in local mode); peak memory = max over 0.5 s samples of summed
VmRSS of this uid's processes (single-tenant sandbox: the JVM + pyspark
workers dominate; labeled as a proxy, not an executor-exact number).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _user_rss_kb() -> int:
    uid = os.getuid()
    total = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/status") as fh:
                rss = owner = None
                for line in fh:
                    if line.startswith("VmRSS:"):
                        rss = int(line.split()[1])
                    elif line.startswith("Uid:"):
                        owner = int(line.split()[1])
                if owner == uid and rss:
                    total += rss
        except OSError:
            continue
    return total


class PeakRss(threading.Thread):
    def __init__(self) -> None:
        super().__init__(daemon=True)
        self.peak = 0
        self._stop = threading.Event()

    def run(self) -> None:
        while not self._stop.is_set():
            self.peak = max(self.peak, _user_rss_kb())
            self._stop.wait(0.5)

    def stop(self) -> int:
        self._stop.set()
        return self.peak


def _spill_totals(spark) -> dict:
    """Sum spill/shuffle bytes across completed stages via the REST API."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages",
                                    timeout=10) as r:
            stages = json.loads(r.read())
        return {
            "memory_spilled_mb": round(sum(
                s.get("memoryBytesSpilled", 0) for s in stages) / 2**20, 1),
            "disk_spilled_mb": round(sum(
                s.get("diskBytesSpilled", 0) for s in stages) / 2**20, 1),
            "shuffle_write_mb": round(sum(
                s.get("shuffleWriteBytes", 0) for s in stages) / 2**20, 1),
            "n_stages": len(stages),
        }
    except Exception as e:  # noqa: BLE001
        return {"error": str(e)[:200]}


def _plan_shape(df) -> dict:
    p = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchange": p.count("Exchange") - p.count("BroadcastExchange"),
        "broadcast": p.count("BroadcastExchange"),
        "python": (p.count("MapInPandas") + p.count("MapInArrow")
                   + p.count("ArrowEvalPython")),
    }


def main() -> None:
    n_docs = int(sys.argv[1])
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    corpus_path = f"/tmp/wcs_bench_corpus_{n_docs}"

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName(f"wcs_scale_{n_docs}")
        .config("spark.sql.shuffle.partitions", "128")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "true")  # REST API = spill metrics
        .config("spark.ui.port", "0")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from wikicrawler_spark import corpus
    from wikicrawler_spark.kernel import extract_from_parquet, extract_spans
    from wikicrawler_spark.pipeline.curate import curate_corpus
    from wikicrawler_spark.pipeline import text_quality as Q

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    result: dict = {"n_docs": n_docs}

    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        t0 = time.monotonic()
        # ~6k docs/task at 3M over 512 tasks; same layout as bench.py
        corpus.corpus_df(spark, n_docs, partitions=512) \
            .write.mode("overwrite").parquet(corpus_path)
        result["gen_secs"] = round(time.monotonic() - t0, 1)
    result["corpus_gb"] = round(sum(
        os.path.getsize(os.path.join(corpus_path, f))
        for f in os.listdir(corpus_path) if f.endswith(".parquet")) / 2**30, 2)

    mon = PeakRss()
    mon.start()

    # -- phase 1: headline extraction (scan-fused), warm + timed ----------
    n_tasks = 32 * 8
    ext = extract_from_parquet(spark, corpus_path, num_tasks=n_tasks)
    result["extract_plan"] = _plan_shape(ext)
    noop(extract_from_parquet(spark, corpus_path, num_tasks=n_tasks))  # warm
    t0 = time.monotonic()
    noop(extract_from_parquet(spark, corpus_path, num_tasks=n_tasks))
    dt = time.monotonic() - t0
    result["extract_secs"] = round(dt, 1)
    result["extract_docs_per_sec"] = round(n_docs / dt, 1)

    # -- phase 2: training-corpus chain on the SAME corpus ----------------
    # extraction -> per-doc body assembly -> explicit materialization
    # boundary -> curation funnel -> context chunks. Mirrors
    # q_training_corpus with the doc-assembly step a multi-paragraph
    # corpus needs (wrapped_docs has one <p>/doc; this corpus has many).
    t0 = time.monotonic()
    spans = extract_spans(spark.read.parquet(corpus_path)) \
        .select("doc_id", F.inline("spans"))
    body = (spans.filter(F.col("kind") == "paragraph")
            .groupBy("doc_id")
            .agg(F.concat_ws(" ", F.collect_list("text")).alias("text")))
    stage = f"/tmp/wcs_scale_body_{n_docs}"
    body.write.mode("overwrite").parquet(stage)
    body = spark.read.parquet(stage)
    curated = curate_corpus(body)
    kept = curated.select("doc_id").join(body, "doc_id")
    chunks = Q.chunk_documents(kept, chunk_tokens=32, overlap=8)
    result["chain_plan"] = _plan_shape(chunks)
    n_chunks = chunks.count()
    dt = time.monotonic() - t0
    result["chain_secs"] = round(dt, 1)
    result["chain_docs_per_sec"] = round(n_docs / dt, 1)
    result["n_chunks"] = n_chunks

    result["peak_user_rss_gb"] = round(mon.stop() / 2**20, 2)
    result["spill"] = _spill_totals(spark)
    spark.stop()

    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
