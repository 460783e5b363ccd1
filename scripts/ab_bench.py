"""Same-host interleaved A/B of two code states for named registry queries.

VERDICT r4 "next round" #1: several r4 bench walls regressed 20-67% vs r3
with verified-unchanged plans; r3 set the evidentiary standard for such
deltas — both code states loaded in ONE Spark session, samples interleaved
so a host-contention burst hits both variants equally, best-of-N compared.

Usage:
  git worktree add --detach /tmp/ab_A <refA>
  git worktree add --detach /tmp/ab_B <refB>
  python scripts/ab_bench.py /tmp/ab_A /tmp/ab_B q1,q2,... [rounds]

Each variant's package is imported from its own tree and its full module
snapshot (wikicrawler_spark.* + __spark_entry__) is kept; before every
timed call the caller's snapshot is installed into sys.modules so lazy
in-function imports resolve against the right tree. Variant order
alternates per round. Prints one JSON line plus a markdown table.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _purge() -> None:
    for k in list(sys.modules):
        if k == "__spark_entry__" or k == "wikicrawler_spark" \
                or k.startswith("wikicrawler_spark."):
            del sys.modules[k]


def _load_variant(tree: str):
    _purge()
    sys.path.insert(0, tree)
    try:
        import __spark_entry__ as entrymod  # noqa: F401
        snapshot = {k: v for k, v in sys.modules.items()
                    if k == "__spark_entry__" or k == "wikicrawler_spark"
                    or k.startswith("wikicrawler_spark.")}
        return entrymod.queries(), snapshot
    finally:
        sys.path.remove(tree)


def _install(snapshot: dict) -> None:
    _purge()
    sys.modules.update(snapshot)


def main() -> None:
    tree_a, tree_b, qcsv = sys.argv[1], sys.argv[2], sys.argv[3]
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    names = qcsv.split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    reg_a, snap_a = _load_variant(tree_a)
    reg_b, snap_b = _load_variant(tree_b)
    variants = {"A": (tree_a, reg_a, snap_a), "B": (tree_b, reg_b, snap_b)}

    sys.path.insert(0, tree_b)  # bench session helper from the newer tree
    from bench import make_session, run_noop

    spark = make_session(f"local[{cpus}]", cpus)
    samples: dict = {n: {"A": [], "B": []} for n in names}
    rows: dict = {n: {} for n in names}

    # untimed warm pass (scan caching, JVM warmup) — hits both variants.
    # The equality check hashes CONTENT (count alone can certify a
    # value-changing regression as "equal"): order-insensitive md5 over
    # every row's repr, computed distributed (no driver collect).
    def _content_hash(df) -> str:
        from pyspark.sql import functions as F
        h = df.select(F.md5(F.to_json(F.struct(*sorted(df.columns))))
                      .alias("h"))
        agg = h.agg(F.count("*").alias("n"),
                    F.sha2(F.concat_ws("", F.sort_array(F.collect_list("h"))),
                           256).alias("digest")).collect()[0]
        return f"{agg['n']}:{agg['digest']}"

    for tag in ("A", "B"):
        _, reg, snap = variants[tag]
        _install(snap)
        for n in names:
            run_noop(reg[n](spark, sf_dir))
            rows[n][tag] = _content_hash(reg[n](spark, sf_dir))

    for r in range(rounds):
        order = ("A", "B") if r % 2 == 0 else ("B", "A")
        for n in names:
            for tag in order:
                _, reg, snap = variants[tag]
                _install(snap)
                t0 = time.monotonic()
                run_noop(reg[n](spark, sf_dir))
                samples[n][tag].append(round(time.monotonic() - t0, 3))

    out = {"trees": {"A": tree_a, "B": tree_b}, "rounds": rounds,
           "sf_dir": sf_dir, "cpus": cpus, "queries": {}}
    print(f"\n| query | A best | B best | ratio B/A | rows equal |")
    print("|---|---|---|---|---|")
    for n in names:
        ba, bb = min(samples[n]["A"]), min(samples[n]["B"])
        eq = rows[n]["A"] == rows[n]["B"]
        out["queries"][n] = {"A": samples[n]["A"], "B": samples[n]["B"],
                             "A_best": ba, "B_best": bb,
                             "ratio": round(bb / ba, 3),
                             "content_hash": rows[n], "rows_equal": eq}
        n_rows = rows[n]["A"].split(":", 1)[0]
        print(f"| {n} | {ba:.2f} s | {bb:.2f} s | {bb/ba:.2f} | "
              f"{'yes' if eq else 'NO'} ({n_rows} rows) |")
    print()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
