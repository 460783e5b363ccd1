"""Structured Streaming ingestion for the extraction kernel.

The reference has no streaming surface (SURVEY.md §2.5: no watermarks, no
event time anywhere), and the crawl itself is deliberately batch-per-wave
(frontier.py). This module covers the adjacent production need the
reference's cache-on-fetch behavior implies: documents ARRIVING over time
are extracted incrementally, exactly once, resumable.

Spark-first shape: the SAME mapInPandas kernel runs unchanged on a
streaming DataFrame (map-only operators are streaming-compatible), with a
file source (``maxFilesPerTrigger`` = admission control, the scan-layer
analog of the reference's rate limiter at core/grabber.py:84-101 — SURVEY
S2) and a checkpointed parquet sink (exactly-once file sink semantics).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .kernel import extract_spans
from .schemas import DOC_SCHEMA


def stream_extract(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    latex: bool = False,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    dedup_doc_ids: bool = False,
):
    """Incremental extraction: new doc parquet files -> span parquet.

    Returns the started StreamingQuery. With ``available_now`` the query
    drains everything currently present and stops at the next
    ``awaitTermination()`` — the batch-like mode used in tests and backfills;
    otherwise it runs continuously.

    ``dedup_doc_ids`` adds the built-in STATEFUL streaming dedup
    (dropDuplicates over the state store): a doc_id re-delivered in a later
    micro-batch (at-least-once upstreams, re-crawled pages) is extracted
    once — the streaming analog of the batch visited anti-join (SURVEY T9).
    """
    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_dir)
    if dedup_doc_ids:
        docs = docs.dropDuplicates(["doc_id"])
    spans = extract_spans(docs, latex=latex)
    writer = (
        spans.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_span_rates(spark, input_dir: str, *, window: str = "10 seconds"):
    """Processing-time span-rate monitor: per-kind counts over ingest-time
    windows (the corpus carries no event time — SURVEY §2.5 notes the
    reference has none either; ingest time is the only clock)."""
    docs = spark.readStream.schema(DOC_SCHEMA).parquet(input_dir)
    flat = docs.select(F.inline("spans")).withColumn("ingest_ts", F.current_timestamp())
    return (
        flat.withWatermark("ingest_ts", "0 seconds")
        .groupBy(F.window("ingest_ts", window), "kind")
        .agg(F.count("*").alias("n"))
    )
