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
    (drop id_b of every verified pair), then fingerprint the kept docs.

    Tokenizes each doc ONCE: the token array is aliased as an attribute in
    the first projection and threaded through quality, language-ID, both
    MinHash shingle passes, and the fingerprint fold (HOF lambdas defeat
    codegen CSE, so without the shared attribute every stage re-split the
    text). Quality + langid are computed in the same projection — no
    doc_id self-joins in the per-doc stage."""
    toked = docs.select("doc_id", "text",
                        Q._tokens(F.col("text")).alias("__toks"))
    scored = toked.select(
        "doc_id", "text", "__toks",
        Q.quality_struct(F.col("text"), F.col("__toks")).alias("__q"),
        Q.langid_struct(F.col("text"), F.col("__toks")).alias("__l"),
    )
    base = (
        scored.filter((F.col("__q.quality") >= min_quality)
                      & (F.col("__l.lang_guess") == lang))
        .select("doc_id", "text", "__toks",
                F.col("__q.n_tokens").alias("n_tokens"),
                F.col("__q.quality").alias("quality"))
    )
    w = Window.partitionBy(
        F.md5(F.substring("text", 1, prefix_len))).orderBy("doc_id")
    survivors = (
        base.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1).drop("__rn")
    )
    pairs = D.minhash_near_duplicates(
        survivors.select("doc_id", "text", "__toks"),
        threshold=near_threshold, tokens_col="__toks")
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    kept = survivors.join(dropped, "doc_id", "left_anti")
    fp = Q.fingerprint(kept.select("doc_id", "__toks"), tokens_col="__toks")
    return (
        kept.select("doc_id", "n_tokens", "quality")
        .join(fp, "doc_id")
        .select("doc_id", F.col("n_tokens").cast("int").alias("n_tokens"),
                "quality", "fingerprint")
    )
