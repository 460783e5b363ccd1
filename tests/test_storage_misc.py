"""Storage ops (S3/S6), analysis-level gating (A12), fmov (T6), and the
salted-repartition skew defusal."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikicrawler_spark import corpus
from wikicrawler_spark.extract_job import salted_repartition
from wikicrawler_spark.kernel import extract_spans
from wikicrawler_spark.storage import latest_view, merge_upsert, validate_doc_ids


def test_validate_doc_ids(spark):
    df = spark.createDataFrame(
        [("wiki/Star",), ("wiki/basic_article_000001",),
         ("http://evil.example/x",), ("",), ("wiki/has space",)],
        "doc_id string",
    )
    ok, bad = validate_doc_ids(df)
    assert {r["doc_id"] for r in ok.collect()} == {
        "wiki/Star", "wiki/basic_article_000001"}
    assert bad.count() == 3


def test_merge_upsert_last_write_wins(spark):
    existing = spark.createDataFrame(
        [("a", 0, "v0"), ("b", 0, "v0")], "doc_id string, wave int, payload string")
    updates = spark.createDataFrame(
        [("b", 1, "v1"), ("c", 1, "v1")], "doc_id string, wave int, payload string")
    got = {r["doc_id"]: (r["wave"], r["payload"])
           for r in merge_upsert(existing, updates).collect()}
    assert got == {"a": (0, "v0"), "b": (1, "v1"), "c": (1, "v1")}


def test_latest_view_idempotent(spark):
    rows = [("a", w, f"v{w}") for w in range(5)] * 2
    df = spark.createDataFrame(rows, "doc_id string, wave int, payload string")
    out = latest_view(df).collect()
    assert len(out) == 1 and out[0]["payload"] == "v4"


def test_analyze_level_gating(spark):
    from wikicrawler_spark.analytics import analyze

    df = spark.createDataFrame(
        [("d", "star cluster core star cluster core star cluster core")],
        "doc_id string, body string")
    assert set(analyze(df, level=1)) == {"word_freq"}
    assert set(analyze(df, level=2)) == {"word_freq", "bigrams"}
    lvl3 = analyze(df, level=3)
    assert set(lvl3) == {"word_freq", "bigrams", "trigrams"}
    assert lvl3["trigrams"].count() > 0


def test_autosearch_fmov(spark):
    from wikicrawler_spark.traversal import autosearch

    docs = [corpus.generate_doc("basic_article", i) for i in range(6)]
    df = spark.createDataFrame(
        [(d["doc_id"], [tuple(s.values()) for s in d["spans"]]) for d in docs],
        schema=corpus.DOC_SCHEMA,
    )
    spans = extract_spans(df).localCheckpoint()
    res = autosearch(spark, spans, docs[0]["doc_id"], n=2, move="freq")
    assert len(res.hops) == 2
    assert all(h.best_colloc is None for h in res.hops)  # fmov: word probe
    assert res.hops[0].top_word is not None


def test_salted_repartition_uniform(spark):
    """Skewed input partitioning (everything in 1 partition) must spread
    ~uniformly over the kernel stage's partitions."""
    docs = corpus.corpus_df(spark, 2000).coalesce(1)
    parts = (
        salted_repartition(docs, 16, salt=3)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid").count().collect()
    )
    counts = [r["count"] for r in parts]
    assert len(counts) == 16
    assert max(counts) < 2 * (2000 / 16)  # no partition more than 2x mean
