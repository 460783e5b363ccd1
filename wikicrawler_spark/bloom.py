"""Broadcastable Bloom filter with distributed build.

Role (SURVEY.md T9 / §4.2): the reference dedups fetches with a per-URL
SQLite probe (/root/reference/src/wikicrawler/core/grabber.py:169). At
frontier scale that becomes: Bloom filter broadcast as a CHEAP PRE-FILTER
that prunes most already-visited doc_ids before the shuffle, with the exact
``left_anti`` join remaining the authority — Bloom false positives would
otherwise DROP docs, so the filter is only ever used in the
"definitely-not-visited fast path" direction.

Hashing is BLAKE2b-based (stable across processes/seeds — Python's builtin
``hash`` is salted per process and must never be used for data-plane
hashing). k index functions derive from double hashing h1 + i*h2 (Kirsch &
Mitzenmacher 2006, public result).

Scale note: bits are sized from the expected visited count at ~1% FPR;
at 10^12 docs a single monolithic Bloom is ~1.2 TB, so the cap below keeps
the broadcast bounded and the FPR simply degrades (pre-filter prunes less;
the exact anti-join still guarantees correctness). A production variant
would shard the filter by doc_id bucket and broadcast per-bucket.
"""

import math
from hashlib import blake2b

import numpy as np

# NOTE: no `from __future__ import annotations` here — pyspark's pandas_udf
# type-hint resolution needs REAL pd.Series annotations, not strings.

_MAX_BITS = 1 << 30  # 128 MiB broadcast cap (sandbox-friendly)


def _hash_pair(item: str) -> tuple[int, int]:
    d = blake2b(item.encode("utf-8"), digest_size=16).digest()
    return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little")


class BloomFilter:
    """Bit-array Bloom filter over strings; numpy-backed, picklable."""

    def __init__(self, n_items, fpr=0.01):
        n_items = max(n_items, 1)
        n_bits = int(-n_items * math.log(fpr) / (math.log(2) ** 2))
        self.n_bits = min(max(n_bits, 64), _MAX_BITS)
        self.k = max(1, round(self.n_bits / n_items * math.log(2)))
        self.bits = np.zeros(self.n_bits // 8 + 1, dtype=np.uint8)

    def _indices(self, item):
        h1, h2 = _hash_pair(item)
        return [(h1 + i * h2) % self.n_bits for i in range(self.k)]

    def add(self, item):
        for idx in self._indices(item):
            self.bits[idx >> 3] |= 1 << (idx & 7)

    def add_many(self, items):
        for it in items:
            self.add(it)
        return self

    def might_contain(self, item):
        return all(self.bits[i >> 3] & (1 << (i & 7)) for i in self._indices(item))

    def contains_array(self, items):
        return np.fromiter(
            (self.might_contain(it) for it in items), dtype=bool, count=len(items)
        )

    def merge(self, other):
        assert self.n_bits == other.n_bits and self.k == other.k
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self


def build_bloom(df, column, n_items, fpr=0.01, n_bits=None, k=None):
    """Distributed build: each partition fills a local filter (mapInPandas,
    Arrow-batched); partial bitarrays are OR-merged on the driver. One pass,
    no shuffle. Pass (n_bits, k) to build with a FIXED geometry so the
    result can be merged into an existing filter (frontier.py's incremental
    per-wave builds)."""
    import pandas as pd

    proto = BloomFilter(n_items, fpr)
    if n_bits is not None:
        proto.n_bits = n_bits
        proto.k = k
        proto.bits = np.zeros(n_bits // 8 + 1, dtype=np.uint8)
    n_bits, k = proto.n_bits, proto.k

    def partial(batches):
        bf = BloomFilter(1, fpr)
        bf.n_bits, bf.k = n_bits, k
        bf.bits = np.zeros(n_bits // 8 + 1, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if len(pdf):
                seen = True
                bf.add_many(pdf[column].astype(str))
        if seen:
            yield pd.DataFrame({"bits": [bf.bits.tobytes()]})

    parts = df.select(column).mapInPandas(partial, schema="bits binary").collect()
    for row in parts:
        proto.bits |= np.frombuffer(row["bits"], dtype=np.uint8)
    return proto


def _maybe_visited_udf(bloom, spark):
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    bc = spark.sparkContext.broadcast(bloom)

    @F.pandas_udf(T.BooleanType())
    def maybe_visited(s: pd.Series) -> pd.Series:
        bf = bc.value
        return pd.Series(bf.contains_array(s.tolist()))

    return maybe_visited


def bloom_prefilter(df, column, bloom, spark):
    """Keep only rows whose ``column`` is NOT (probably) in the filter —
    the definitely-new fast path. Bloom has no false negatives, so nothing
    visited survives this filter. Vectorized pandas UDF over the broadcast
    filter; a pure map — no shuffle."""
    from pyspark.sql import functions as F

    return df.filter(~_maybe_visited_udf(bloom, spark)(F.col(column)))


def bloom_split(df, column, bloom, spark):
    """(definitely_new, maybe_seen): a FILTER-based split — both branches
    are map-only over the scan. The complementary maybe_seen set (true
    positives + ~fpr false positives, i.e. tiny when most docs are new)
    still needs the exact anti-join; the join's left side has shrunk from
    |df| to |maybe_seen|, which is the whole point of the pre-filter."""
    from pyspark.sql import functions as F

    udf = _maybe_visited_udf(bloom, spark)
    return df.filter(~udf(F.col(column))), df.filter(udf(F.col(column)))
