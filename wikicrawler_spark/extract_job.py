"""The extract job: scan -> anti-join visited -> salted repartition ->
kernel -> spans + metrics/lineage (SURVEY.md §3.2).

This is the Spark re-expression of the reference's ``retrieve`` path
(/root/reference/src/wikicrawler/core/grabber.py:159-199): cache-probe
short-circuit becomes an exact ``left_anti`` join (optionally Bloom-pruned),
fetch+parse becomes the fused mapInPandas kernel, and the SQLite upsert
becomes an idempotent append keyed by (doc_id, wave).

Scale design:
  * The anti-join's visited side is the big shuffle risk at 10^12 docs —
    AQE + the Bloom pre-filter (bloom.py) prune it; doc_id bucketing of the
    visited table makes it a co-located join on a real cluster.
  * Salted repartition spreads docs evenly before the Python stage: AQE can
    re-split skewed JOIN partitions but not a skewed UDF stage (SURVEY §4.2),
    and upstream partitioning (e.g. by crawl wave or by source bucket) is
    routinely skewed. Hashing doc_id with a wave salt gives uniform task
    sizes; Arrow batch caps bound per-batch memory for giant docs.
  * Metrics come from the DATA PATH (native aggregation over
    spark_partition_id()), not accumulators — accumulators are not
    exactly-once under task retries (SURVEY §4.2 item 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .kernel import WIKI_BASE, extract_spans

LINK_PREFIX = WIKI_BASE + "/wiki/"


def anti_join_visited(docs: DataFrame, visited: DataFrame | None,
                      bloom=None, spark=None) -> DataFrame:
    """Drop already-visited docs. Bloom (if given) prunes cheaply first;
    the exact left_anti join is the authority (false positives from the
    Bloom would drop docs — never allowed)."""
    if visited is None:
        return docs
    if bloom is not None and spark is not None:
        from .bloom import NativeBloom, bloom_split

        # filter-based split: the big side never shuffles; only the tiny
        # maybe_seen branch (bloom true+false positives) pays the anti-join.
        # NativeBloom probes with whole-stage-codegen bit tests (no Python
        # stage on the prune path — VERDICT r5 #2); the legacy python
        # BloomFilter keeps the pandas-UDF probe for compatibility.
        if isinstance(bloom, NativeBloom):
            definitely_new, maybe_seen = bloom.split(docs, "doc_id")
        else:
            definitely_new, maybe_seen = bloom_split(docs, "doc_id", bloom, spark)
        checked = maybe_seen.join(visited.select("doc_id"), "doc_id", "left_anti")
        return definitely_new.unionByName(checked)
    return docs.join(visited.select("doc_id"), "doc_id", "left_anti")


def salted_repartition(docs: DataFrame, num_partitions: int, salt: int = 0) -> DataFrame:
    """Uniform task sizing for the kernel stage: hash(doc_id, salt) spreads
    docs regardless of upstream key skew. ``salt`` varies per wave so a
    pathological doc_id set cannot hit the same partitioning twice."""
    return docs.repartition(num_partitions, F.xxhash64("doc_id", F.lit(salt)))


def links_of(spans_df: DataFrame) -> DataFrame:
    """Extracted wikilink edges: (src_doc_id, dst_doc_id). Only absolutized
    in-wiki link spans resolve back to doc_ids (corpus hrefs are
    /wiki/<family>_<idx>, absolutized by the kernel per grabber.py:224)."""
    return (
        spans_df.select(F.col("doc_id").alias("src_doc_id"), F.inline("spans"))
        .filter((F.col("kind") == "link") & F.col("media_ref").startswith(LINK_PREFIX))
        .select(
            "src_doc_id",
            F.concat(F.lit("wiki/"),
                     F.substring(F.col("media_ref"), len(LINK_PREFIX) + 1, 1 << 20)
                     ).alias("dst_doc_id"),
        )
    )


def partition_metrics(spans_df: DataFrame, wave: int, wall_ms: int) -> DataFrame:
    """Per-partition exactly-once metrics from the data path
    (FIXTURES.md metrics schema). wall_ms is the wave's driver-measured
    wall clock (per-partition timing would need a kernel side-channel;
    counts are the scaling-relevant signal)."""
    return (
        spans_df.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("docs_in"),
            F.sum(F.size("spans")).cast("long").alias("spans_out"),
            F.sum(
                F.size(F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("link")))
            ).cast("long").alias("links_out"),
        )
        .select(
            F.lit(wave).cast("int").alias("wave"),
            F.col("partition_id").cast("int"),
            "docs_in", "spans_out", "links_out",
            F.lit(wall_ms).cast("long").alias("wall_ms"),
        )
    )


def run_extract(spark, docs: DataFrame, visited: DataFrame | None = None, *,
                latex: bool = False, num_partitions: int | None = None,
                salt: int = 0, bloom=None) -> DataFrame:
    """One extraction pass: anti-join visited -> salted repartition ->
    kernel. Lazy; callers materialize and call partition_metrics with their
    measured wall clock."""
    todo = anti_join_visited(docs, visited, bloom=bloom, spark=spark)
    if num_partitions:
        todo = salted_repartition(todo, num_partitions, salt=salt)
    return extract_spans(todo, latex=latex)
