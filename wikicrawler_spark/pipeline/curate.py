"""Composed corpus-curation pipeline: the operators this package provides
individually (quality scoring, language ID, exact dedup, MinHash-LSH
near-dup removal, fingerprinting), chained the way a training-data
curation job actually runs them. One call = one declarative plan; Catalyst
sees the whole chain, so filters push into the scans and each doc's text
is tokenized where needed rather than materialized between "steps".

Stage order follows the standard cheap-to-expensive funnel: per-doc
filters (quality, language) first so the pairwise near-dup stage only
sees survivors; exact dedup before MinHash so identical prefixes don't
waste candidate budget; fingerprints computed last, on the kept set only.

Survivor rules are deterministic so the DuckDB oracle can replay the
whole chain end-to-end: exact dedup keeps the min doc_id per content
hash; near-dup removal drops the GREATER id of every verified pair
(id_a < id_b ordering — chains collapse toward their smallest id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from . import dedup as D
from . import text_quality as Q


def curate_corpus(docs: DataFrame, *, min_quality: float = 0.5,
                  lang: str = "en", near_threshold: float = 0.5,
                  prefix_len: int = 30) -> DataFrame:
    """(doc_id, text) -> curated (doc_id, n_tokens, quality, fingerprint).

    Funnel: quality >= min_quality AND detected language == lang, then
    exact dedup on md5 of the first ``prefix_len`` chars (keep min
    doc_id), then MinHash-LSH near-dup removal at ``near_threshold``
    (drop id_b of every verified pair), then fingerprint the kept docs."""
    q = Q.quality_scores(docs).select("doc_id", "n_tokens", "quality")
    l = Q.language_id(docs).select("doc_id", "lang_guess")
    base = (
        docs.join(q, "doc_id").join(l, "doc_id")
        .filter((F.col("quality") >= min_quality)
                & (F.col("lang_guess") == lang))
    )
    w = Window.partitionBy(
        F.md5(F.substring("text", 1, prefix_len))).orderBy("doc_id")
    survivors = (
        base.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1).drop("__rn", "lang_guess")
    )
    pairs = D.minhash_near_duplicates(
        survivors.select("doc_id", "text"), threshold=near_threshold)
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    kept = survivors.join(dropped, "doc_id", "left_anti")
    fp = Q.fingerprint(kept.select("doc_id", "text"))
    return (
        kept.select("doc_id", "n_tokens", "quality")
        .join(fp, "doc_id")
        .select("doc_id", F.col("n_tokens").cast("int").alias("n_tokens"),
                "quality", "fingerprint")
    )
