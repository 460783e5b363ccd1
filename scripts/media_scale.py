#!/usr/bin/env python
"""Scaling evidence for the multimodal decode plane (round 4).

The media queries' 100 TB claim is "decoding 10^12 assets is a map":
payload synthesis is JVM-native (md5/unhex), decode+featurize is ONE
Arrow-batched mapInPandas stage, zero exchanges. This harness runs that
exact plan over N synthetic image assets at two local parallelism levels
(same input, same code — the sandbox stand-in the north rule's
two-cluster-size criterion uses everywhere else in BENCH/BASELINE.md)
and prints one JSON line with assets/s at both levels + the efficiency.

Usage: python scripts/media_scale.py [--assets 2000000] [--levels 8,32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_level(cores: int, n_assets: int) -> float:
    from pyspark.sql import SparkSession, functions as F

    from wikicrawler_spark.pipeline import multimodal as MM

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"media_scale_{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.range(n_assets).select(
        F.col("id").cast("string").alias("doc_id"))

    def one_pass():
        MM.decode_and_featurize(
            MM.synth_image_assets(docs).repartition(cores * 4),
            use_fake_codec=True,
        ).write.format("noop").mode("overwrite").save()

    one_pass()  # warm: python worker spawn + JIT excluded, like a long job
    t0 = time.monotonic()
    one_pass()
    secs = time.monotonic() - t0
    spark.stop()
    return round(n_assets / secs, 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--assets", type=int, default=2_000_000)
    ap.add_argument("--levels", default="8,32")
    a = ap.parse_args()
    levels = [int(x) for x in a.levels.split(",")]
    rates = {c: run_level(c, a.assets) for c in levels}
    lo, hi = levels[0], levels[-1]
    eff = round((rates[hi] / rates[lo]) / (hi / lo), 3)
    print(json.dumps({"assets": a.assets,
                      "assets_per_sec": {str(k): v for k, v in rates.items()},
                      "efficiency": min(eff, 1.0)}))


if __name__ == "__main__":
    main()
