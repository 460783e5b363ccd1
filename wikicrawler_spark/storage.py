"""Storage-layer operators (SURVEY.md §2.1 S3, S6).

validate_doc_ids — the reference rejects non-wikipedia URLs with regexes
(core/grabber.py:48-49,148-149); here a native ``rlike`` filter splitting
valid from rejected rows.

merge_upsert / latest_view — the reference upserts pages by primary key via
``session.merge`` (core/db/cacher.py:48-50): last write wins. Without
Iceberg MERGE INTO in this sandbox, the engine uses the classic
append-then-dedup-view pattern: append rows carrying a monotonically
increasing version (wave), read back through a keep-latest window. Iceberg
deployment swaps these for a real ``MERGE INTO`` on the bucketed key —
semantics identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# mirrors wiki_regex/link_regex intent (grabber.py:48-49) on doc_ids
DOC_ID_PATTERN = r"^wiki/[A-Za-z0-9_.:%-]+$"


def validate_doc_ids(df: DataFrame, pattern: str = DOC_ID_PATTERN,
                     id_col: str = "doc_id") -> tuple[DataFrame, DataFrame]:
    """(valid, rejected) — native rlike, no UDF (the reference's S7 regexp
    UDF is unnecessary on Spark: rlike is built in)."""
    ok = df.filter(F.col(id_col).rlike(pattern))
    bad = df.filter(~F.col(id_col).rlike(pattern))
    return ok, bad


def merge_upsert(existing: DataFrame, updates: DataFrame, key: str = "doc_id",
                 version_col: str = "wave") -> DataFrame:
    """Append-style upsert: union then keep the highest-version row per key
    (ties: this is only deterministic if version is unique per key per
    batch, which the wave counter guarantees)."""
    appended = existing.unionByName(updates)
    return latest_view(appended, key=key, version_col=version_col)


def latest_view(appended: DataFrame, key: str = "doc_id",
                version_col: str = "wave") -> DataFrame:
    """Keep-latest dedup view over an append-only table — the reference's
    last-write-wins PK semantics (cacher.py:50) as a window."""
    w = Window.partitionBy(key).orderBy(F.col(version_col).desc())
    return (
        appended.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
