"""Sinks (SURVEY.md §2.1 S9-S11).

markdown_export — the reference writes one .md file per page: title, the
paragraphs containing a top-5 collocation, then top-5 of each stats family
(/root/reference/src/wikicrawler/seer/markdown.py:21-51). Here the whole
document is BUILT natively (concat of HOF expressions) and written with the
text datasource partitioned by doc bucket — a distributed sink, not a
driver loop.

media_manifest — the reference downloads media bytes on daemon threads
(core/grabber.py:334-346); at engine scale media bytes never enter the data
plane: the sink materializes a (doc_id, media_ref, kind) manifest parquet
that a separate fetch job can consume (SURVEY S9).

write_state / read_state — the reference persists crawl state as JSON
files (arbiter/script.py:92-114); the engine equivalent is the frontier
checkpoint (frontier.py) plus this tiny json helper for driver-side
pointers.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, functions as F

from .analytics import (collocations, kept_paragraphs_expr,
                        paragraphs_col, top5_stats, word_freq)
from .page_view import page_view


def markdown_doc(spans_df: DataFrame) -> DataFrame:
    """(doc_id, markdown) — reference-shaped markdown per page, built
    natively. Sections: '# title', '## Paragraphs' (only those containing a
    top-5 collocation — markdown.py:36-39), '## Stats' with top-5
    frequencies and collocations (markdown.py:42-48)."""
    pages = page_view(spans_df).select("doc_id", "title")
    bodies = spans_df.select(
        "doc_id",
        paragraphs_col(F.col("spans")).alias("paragraphs"),
        F.array_join(paragraphs_col(F.col("spans")), "").alias("body"),
    )
    freq5 = (
        top5_stats(word_freq(bodies))
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("rank", "token")).alias("f"))
        .select("doc_id", F.transform(F.array_sort("f"), lambda x: x["token"])
                .alias("top_tokens"))
    )
    coll5 = (
        collocations(bodies)
        .filter((F.col("family") == 0) & (F.col("rank") <= 5))
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("rank", "colloc")).alias("c"))
        .select("doc_id",
                F.transform(F.array_sort("c"),
                            lambda x: F.array_join(x["colloc"], " "))
                .alias("top_collocs"))
    )
    assembled = (
        pages.join(bodies, "doc_id")
        .join(freq5, "doc_id", "left")
        .join(coll5, "doc_id", "left")
        .withColumn("top_collocs",
                    F.coalesce("top_collocs", F.array().cast("array<string>")))
        .withColumn("top_tokens",
                    F.coalesce("top_tokens", F.array().cast("array<string>")))
    )
    kept = kept_paragraphs_expr(F.col("paragraphs"), F.col("top_collocs"))
    md = F.concat(
        F.lit("# "), F.coalesce("title", F.lit("")), F.lit("\n## Paragraphs\n"),
        F.array_join(kept, " "), F.lit("\n## Stats\n\n### frequencies\n"),
        F.array_join(F.transform("top_tokens",
                                 lambda t: F.concat(F.lit("#"), t)), "\n"),
        F.lit("\n\n### collocations\n"),
        F.array_join(F.transform("top_collocs",
                                 lambda c: F.concat(F.lit("#"), c)), "\n"),
        F.lit("\n"),
    )
    return assembled.select("doc_id", md.alias("markdown"))


def markdown_export(spans_df: DataFrame, out_dir: str, buckets: int = 64) -> None:
    """Distributed markdown sink: one text row per page, bucketed output
    dirs (NOT one task per page — a 10^12-doc export is a partitioned
    dataset, the per-page-file layout of the reference does not survive
    scale)."""
    (
        markdown_doc(spans_df)
        .withColumn("bucket", F.abs(F.hash("doc_id")) % buckets)
        .select("bucket", F.concat(F.lit("<!-- "), "doc_id", F.lit(" -->\n"),
                                   "markdown").alias("value"))
        .repartition("bucket")
        .write.mode("overwrite").partitionBy("bucket").text(out_dir)
    )


def media_manifest(spans_df: DataFrame) -> DataFrame:
    """(doc_id, media_ref, seq) for every media span, in document order —
    the fetch-job input that replaces the reference's in-line downloads."""
    return (
        spans_df.select("doc_id", F.inline("spans"))
        .filter((F.col("kind") == "media") & F.col("media_ref").isNotNull())
        .select("doc_id", "media_ref", F.col("offset").alias("seq"))
    )


def write_state(path: str, state: dict) -> None:
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(state, f, sort_keys=True)
    os.replace(tmp, path)  # atomic like the reference's save_state intent


def read_state(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as f:
        return json.load(f)
