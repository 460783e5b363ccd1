"""Tests for the training-mix assembly operators (pipeline/mixing.py) and
connected components (graph.py) — python-reference parity plus the
invariants the DuckDB oracles can't express (determinism under
repartitioning, convergence on adversarial graph shapes).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from wikicrawler_spark.graph import connected_components
from wikicrawler_spark.pipeline import mixing as M


# ------------------------------------------------------- connected components

def _py_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find reference: node -> min node of its component."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp: dict[int, list[int]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {n: min(ns) for ns in comp.values() for n in ns}


def _cc_spark(spark, edges):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    out = connected_components(df)
    return {r["node"]: r["component"] for r in out.collect()}


def test_cc_random_graphs_vs_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        nodes = list(range(trial * 100, trial * 100 + 60))
        edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(50)]
        edges = [(a, b) for a, b in edges if a != b]
        assert _cc_spark(spark, edges) == _py_components(edges)


def test_cc_long_chain_converges(spark):
    """A 120-node path is the adversarial case for min-label propagation
    (needs 120 rounds); large/small-star must collapse it within the
    default max_iterations (O(log^2 n))."""
    edges = [(i, i + 1) for i in range(120)]
    got = _cc_spark(spark, edges)
    assert got == {i: 0 for i in range(121)}


def test_cc_star_and_isolated_pair(spark):
    edges = [(10, i) for i in range(11, 20)] + [(100, 101)]
    got = _cc_spark(spark, edges)
    assert got == _py_components(edges)


# ------------------------------------------------------------------ sampling

@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, " ".join(f"w{(i * 7 + j) % 13}" for j in range((i % 40) + 5)),
             ["en", "de", "fr"][i % 3]) for i in range(300)]
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_stratified_sample_deterministic_and_rate(docs):
    rates = {"en": 0.5, "de": 1.0, "fr": 0.0}
    s1 = M.stratified_sample(docs, rates=rates)
    s2 = M.stratified_sample(docs.repartition(7), rates=rates)
    ids1 = sorted(r["doc_id"] for r in s1.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in s2.select("doc_id").collect())
    assert ids1 == ids2  # sample is a function of the row, not the plan
    per = {r["lang"]: r["c"] for r in
           s1.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    assert per.get("de") == 100          # rate 1.0 keeps everything
    assert "fr" not in per               # rate 0.0 keeps nothing
    assert 30 <= per.get("en", 0) <= 70  # ~50 of 100 (hash-bernoulli)


def test_stratified_sample_default_rate(docs):
    out = M.stratified_sample(docs, rates={"en": 1.0}, default_rate=0.0)
    assert {r["lang"] for r in out.select("lang").distinct().collect()} == {"en"}


def test_mix_weights_sum_to_one_and_monotone(docs):
    rows = {r["key"]: r for r in M.mix_weights(docs, alpha=0.5).collect()}
    assert abs(sum(r["weight"] for r in rows.values()) - 1.0) < 1e-4
    # alpha<1 compresses: the doc-count ratio en/de is 1 here, weights equalish;
    # compare against alpha=1 on a skewed frame instead
    skew = docs.filter((F.col("lang") != "fr") |
                       (F.col("doc_id") < 30))  # fr becomes small stratum
    w_half = {r["key"]: r["weight"]
              for r in M.mix_weights(skew, alpha=0.5).collect()}
    w_one = {r["key"]: r["weight"]
             for r in M.mix_weights(skew, alpha=1.0).collect()}
    assert w_half["fr"] > w_one["fr"]  # temperature upsamples the small stratum


# ------------------------------------------------------------------- packing

def test_pack_sequences_invariants(docs):
    cap = 64
    out = M.pack_sequences(docs, capacity=cap, n_groups=4).toPandas()
    assert len(out) == 300
    fills = out.groupby(["pack_group", "bin_id"])["n_tokens"].sum()
    over = fills[fills > cap]
    # a bin may exceed capacity only when it holds a single over-long doc
    for (grp, b) in over.index:
        members = out[(out.pack_group == grp) & (out.bin_id == b)]
        assert len(members) == 1 and members.n_tokens.iloc[0] > cap
    # within a group, ids in bin order are sorted (greedy takes id order)
    for grp, g in out.groupby("pack_group"):
        g = g.sort_values(["bin_id", "bin_pos"])
        assert list(g["id"]) == sorted(g["id"])
        # bin_pos counts 0..k within each bin
        for _, bing in g.groupby("bin_id"):
            assert list(bing["bin_pos"]) == list(range(len(bing)))


def test_pack_sequences_python_parity(docs, spark):
    cap = 64
    # add a zero-token doc (empty text is possible in real corpora): the
    # reference loop below must use the implementation's `not first` bin
    # condition, which differs from `if fill and ...` exactly on 0-token
    # docs (ADVICE r2)
    extra = spark.createDataFrame(
        [(10_001, "", "en")], "doc_id bigint, text string, lang string")
    docs = docs.unionByName(extra)
    out = M.pack_sequences(docs, capacity=cap, n_groups=4).toPandas()
    assert (out[out.id == 10_001].n_tokens == 0).all()
    toks = {r["id"]: r["n_tokens"] for _, r in out.iterrows()}
    groups: dict[int, list[int]] = {}
    for _, r in out.iterrows():
        groups.setdefault(r["pack_group"], []).append(r["id"])
    expect = {}
    for grp, ids in groups.items():
        b, fill, first = 0, 0, True
        for pos_id in sorted(ids):
            t = toks[pos_id]
            # same condition as the implementation and the DuckDB oracle:
            # a non-first doc opens a new bin when it would overflow
            if not first and fill + t > cap:
                b, fill = b + 1, 0
            first = False
            expect[pos_id] = b
            fill += t
    got = {r["id"]: r["bin_id"] for _, r in out.iterrows()}
    assert got == expect


def test_pack_group_count_scales_with_input():
    # the r2 sandbox default (8 groups) would put ~10^11 rows in a single
    # pandas frame at 10^12 docs; the derived count must bound every group
    # to PACK_GROUP_MAX_ROWS rows regardless of corpus size
    for n_docs in (0, 1, 300, 10**6, 10**9, 10**12):
        for par in (1, 32, 4000):
            g = M._derive_pack_groups(n_docs, par)
            assert g >= max(1, par)
            assert g >= -(-n_docs // M.PACK_GROUP_MAX_ROWS)
    assert M._derive_pack_groups(10**12, 4000) == 10**6


def test_pack_sequences_default_groups_derived(docs):
    # default n_groups=None derives from count + parallelism: with 300 docs
    # the bound is parallelism, and every group stays under the row cap
    out = M.pack_sequences(docs, capacity=64).toPandas()
    assert len(out) == 300
    par = docs.sparkSession.sparkContext.defaultParallelism
    assert out["pack_group"].max() < max(par, 1)
    assert out.groupby("pack_group").size().max() <= M.PACK_GROUP_MAX_ROWS


# ------------------------------------------------------------- contamination

def test_contamination_finds_planted_copy(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(0, base, "en"),                        # bench (0 % 20 == 0)
            (1, base + " extra words here", "en"),  # contaminated copy
            (2, "totally different words with no overlap at all", "en"),
            (3, "alpha beta unrelated tail of text here", "en")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    out = M.contamination(df, n=3, benchmark_mod=20, min_shared=2).collect()
    pairs = {(r["corpus_id"], r["bench_id"]): r for r in out}
    assert (1, 0) in pairs
    assert pairs[(1, 0)]["score"] == 1.0  # every bench 3-gram appears in doc 1
    assert (2, 0) not in pairs
    assert (3, 0) not in pairs  # only one shared 3-gram < min_shared


def test_contamination_short_docs_no_grams(spark):
    rows = [(0, "one two", "en"), (1, "one two", "en")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    assert M.contamination(df, n=3).count() == 0


# --------------------------------------------------------------------- bm25

def test_bm25_ranks_planted_doc_first(spark):
    from wikicrawler_spark.pipeline.bm25 import bm25_topk

    filler = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    rows = [(0, "spark join spark join spark fast query"),   # dense in query
            (1, f"{filler} spark {filler}"),                 # one hit, long
            (2, f"{filler} {filler}"),                       # no hits
            (3, "spark fast " + filler)]                     # two hits
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = bm25_topk(df, "spark fast join", k=3).collect()
    assert [r["doc_id"] for r in got] == [0, 3, 1]
    assert got[0]["score"] > got[1]["score"] > got[2]["score"] > 0


def test_bm25_idf_downweights_common_terms(spark):
    from wikicrawler_spark.pipeline.bm25 import bm25_topk

    # 'the' appears in every doc -> near-zero idf; 'rare' in one
    rows = [(i, "the common filler text") for i in range(9)]
    rows.append((9, "the rare token"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r["score"] for r in bm25_topk(df, "the rare", k=10).collect()}
    assert max(got, key=got.get) == 9
    assert got[9] > 10 * max(v for k, v in got.items() if k != 9)


def test_bm25_empty_query_raises(spark):
    import pytest as _pytest

    from wikicrawler_spark.pipeline.bm25 import bm25_topk

    df = spark.createDataFrame([(0, "x")], "doc_id bigint, text string")
    with _pytest.raises(ValueError):
        bm25_topk(df, "   ")
