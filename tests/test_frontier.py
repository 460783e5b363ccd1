"""Frontier-expansion pipeline tests (SURVEY.md §5.2 item 4):
BFS closure on the known link_graph, dedup (no doc extracted twice),
resume-from-checkpoint == uninterrupted run, bounded-shuffle cap,
Bloom pre-filter correctness (no false positives ever drop docs).

Crawl runs are expensive (one Spark job round-trip per wave), so the two
canonical runs (with/without Bloom) are module fixtures shared across
assertions.
"""

from __future__ import annotations

import pytest

from wikicrawler_spark import corpus
from wikicrawler_spark.bloom import BloomFilter, build_bloom
from wikicrawler_spark.extract_job import links_of, run_extract
from wikicrawler_spark.frontier import crawl


def expected_closure(seeds):
    """Pure-python BFS over corpus.link_graph_edges — independent of the
    engine (and of the kernel: edges come from the generator spec)."""
    seen = set(seeds)
    frontier = sorted(seeds)
    waves = [set(seeds)]
    while frontier:
        nxt = set()
        for i in frontier:
            for j in corpus.link_graph_edges(i):
                if j not in seen:
                    seen.add(j)
                    nxt.add(j)
        if not nxt:
            break
        waves.append(nxt)
        frontier = sorted(nxt)
    return seen, waves


def ids(nums):
    return [corpus.doc_id_for("link_graph", i) for i in nums]


@pytest.fixture(scope="module")
def graph_df(spark):
    return corpus.link_graph_df(spark).cache()


@pytest.fixture(scope="module")
def crawl_bloom(spark, graph_df):
    return crawl(spark, graph_df, ids([0, 1]), max_waves=30, use_bloom=True)


@pytest.fixture(scope="module")
def crawl_exact(spark, graph_df):
    return crawl(spark, graph_df, ids([0, 1]), max_waves=30, use_bloom=False)


def test_bfs_closure(crawl_exact):
    got = {r["doc_id"] for r in crawl_exact.visited.collect()}
    want, _ = expected_closure([0, 1])
    assert got == set(ids(sorted(want)))


def test_wave_structure_matches_bfs(crawl_exact):
    _, waves = expected_closure([0, 1])
    got = {(r["doc_id"], r["wave"]) for r in crawl_exact.visited.collect()}
    want = {(corpus.doc_id_for("link_graph", i), w)
            for w, wave in enumerate(waves) for i in wave}
    assert got == want


def test_no_doc_extracted_twice(crawl_bloom):
    docs_extracted = [r["doc_id"] for r in crawl_bloom.spans.select("doc_id").collect()]
    assert docs_extracted, "crawl extracted nothing"
    assert len(docs_extracted) == len(set(docs_extracted))
    dup_vis = crawl_bloom.visited.groupBy("doc_id").count().filter("count > 1").count()
    assert dup_vis == 0


def test_bloom_path_equals_exact_path(crawl_bloom, crawl_exact):
    """Bloom is a pre-filter only — identical closure and wave tagging."""
    a = {(r["doc_id"], r["wave"]) for r in crawl_bloom.visited.collect()}
    b = {(r["doc_id"], r["wave"]) for r in crawl_exact.visited.collect()}
    assert a == b


def test_metrics_and_lineage_populated(crawl_exact):
    m = crawl_exact.metrics.collect()
    assert sum(r["docs_in"] for r in m) > 0
    assert all(r["spans_out"] >= r["docs_in"] for r in m)
    parents = {r["doc_id"]: r["parent_doc_id"] for r in crawl_exact.lineage.collect()}
    assert parents[corpus.doc_id_for("link_graph", 0)] is None
    assert any(p is not None for p in parents.values())


def test_per_wave_limit_bounded_and_deterministic(spark, graph_df):
    seeds = ids([12])  # clique start: fan-out of 7 in one wave
    r1 = crawl(spark, graph_df, seeds, max_waves=3, per_wave_limit=4, use_bloom=False)
    r2 = crawl(spark, graph_df, seeds, max_waves=3, per_wave_limit=4, use_bloom=False)
    assert r1.wave_sizes == r2.wave_sizes
    assert all(s <= 4 for s in r1.wave_sizes[1:])
    a = sorted(r["doc_id"] for r in r1.visited.collect())
    b = sorted(r["doc_id"] for r in r2.visited.collect())
    assert a == b


def test_resume_equals_uninterrupted(spark, graph_df, tmp_path, crawl_exact):
    ck = str(tmp_path / "ckpt")
    partial = crawl(spark, graph_df, ids([0, 1]), max_waves=3, ckpt_dir=ck,
                    use_bloom=False)
    assert partial.waves == 3
    resumed = crawl(spark, graph_df, ids([0, 1]), max_waves=30, ckpt_dir=ck,
                    resume=True, use_bloom=False)
    got = {(r["doc_id"], r["wave"]) for r in resumed.visited.collect()}
    want = {(r["doc_id"], r["wave"]) for r in crawl_exact.visited.collect()}
    assert got == want
    # recovered spans cover every visited doc exactly once
    span_docs = [r["doc_id"] for r in resumed.spans.select("doc_id").collect()]
    assert len(span_docs) == len(set(span_docs)) == len(want)


def test_links_of_extraction(spark, graph_df):
    spans = run_extract(spark, graph_df)
    edges = {(r["src_doc_id"], r["dst_doc_id"]) for r in links_of(spans).collect()}
    want = set()
    for i in range(corpus.LINK_GRAPH_N):
        for j in corpus.link_graph_edges(i):
            want.add((corpus.doc_id_for("link_graph", i),
                      corpus.doc_id_for("link_graph", j)))
    assert edges == want


# ---------------------------------------------------------------- bloom

def test_bloom_no_false_negatives():
    bf = BloomFilter(1000)
    items = [f"wiki/x_{i}" for i in range(1000)]
    bf.add_many(items)
    assert all(bf.might_contain(i) for i in items)


def test_bloom_fpr_reasonable():
    bf = BloomFilter(1000, fpr=0.01)
    bf.add_many(f"wiki/x_{i}" for i in range(1000))
    fresh = [f"wiki/y_{i}" for i in range(10000)]
    fp = int(sum(bf.contains_array(fresh)))
    assert fp < 500  # ~1% expected; generous bound


def test_distributed_bloom_build(spark):
    df = spark.range(2000).selectExpr("concat('wiki/z_', id) as doc_id").repartition(7)
    bf = build_bloom(df, "doc_id", 2000)
    assert all(bf.might_contain(f"wiki/z_{i}") for i in range(2000))


def test_hot_skew_fanout(spark):
    """FIXTURES hot_skew: a 'List of…' doc with 10^4 links must fan the
    frontier out to every target in one wave (link-dense paragraphs feed
    the crawl even though their text is boilerplate-suppressed)."""
    hot = corpus.corpus_df(spark, 400, families=("hot_skew",), partitions=8)
    res = crawl(spark, hot, [corpus.doc_id_for("hot_skew", 0)], max_waves=3,
                use_bloom=True, num_partitions=8)
    assert res.wave_sizes[0] == 1
    assert res.wave_sizes[1] == 399  # full fan-out, deduped
    assert res.spans.count() == 400


def test_resume_with_bloom(spark, graph_df, tmp_path, crawl_exact):
    """Resume seeds the incremental Bloom from the checkpointed visited set;
    closure must still equal the exact path."""
    ck = str(tmp_path / "ckpt_bloom")
    crawl(spark, graph_df, ids([0, 1]), max_waves=3, ckpt_dir=ck, use_bloom=True)
    resumed = crawl(spark, graph_df, ids([0, 1]), max_waves=30, ckpt_dir=ck,
                    resume=True, use_bloom=True)
    got = {(r["doc_id"], r["wave"]) for r in resumed.visited.collect()}
    want = {(r["doc_id"], r["wave"]) for r in crawl_exact.visited.collect()}
    assert got == want


def test_bucketed_visited_equals_plain_and_colocates(spark, graph_df,
                                                     tmp_path, crawl_exact):
    """visited_buckets: same crawl result, and the anti-join against the
    bucketed visited table needs NO exchange on the visited side (the probe
    side shuffles into the bucket layout instead)."""
    res = crawl(spark, graph_df, ids([0, 1]), max_waves=30, use_bloom=False,
                ckpt_dir=str(tmp_path / "ck"), visited_buckets=4)
    assert sorted(r["doc_id"] for r in res.visited.collect()) == \
        sorted(r["doc_id"] for r in crawl_exact.visited.collect())
    assert res.waves == crawl_exact.waves

    # plan audit: bucketed side joins without an Exchange even when
    # broadcast is off (the growing-table side never reshuffles)
    probe = spark.createDataFrame(
        [(d,) for d in ids([0, 5, 7, 9999])], "doc_id string")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (probe.join(res.visited.select("doc_id"), "doc_id", "left_anti")
                ._jdf.queryExecution().executedPlan().toString())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert plan.count("Exchange") == 1, plan  # probe side only
