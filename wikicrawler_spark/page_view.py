"""Reference page-dict view: reassemble the extractor's span sequences into
the exact shape the reference builds at
/root/reference/src/wikicrawler/core/grabber.py:187-194:

    { url, title, paragraphs, paragraph_links, see_also, toc_links,
      references, media }

…as one nested DataFrame row per document, so a user of the reference can
switch engines and keep their downstream shape. Everything is native
higher-order functions over the nested span array — per-doc, zero shuffle.

Shape mapping (SURVEY.md §1.2):
    url              doc_id -> 'https://en.wikipedia.org/<doc_id>'
    title            string
    paragraphs       array<string>
    paragraph_links  array<struct<text,url>>   (flattened across paragraphs;
                     the reference keys a dict per <p> — dict-of-str is
                     map<string,string> per paragraph in SQL, but link TEXT
                     is not unique at scale, so the engine keeps (text,url)
                     pairs and documents the divergence)
    see_also / toc_links / references  map<string,string>
    media            array<string>
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .kernel import WIKI_BASE


def _texts_of(kind: str):
    return F.transform(
        F.filter("spans", lambda s: s["kind"] == F.lit(kind)),
        lambda s: s["text"],
    )


def _pairs_of(kind: str):
    return F.transform(
        F.filter("spans", lambda s: s["kind"] == F.lit(kind)),
        lambda s: F.struct(s["text"].alias("text"), s["media_ref"].alias("url")),
    )


def _map_of(kind: str):
    # reference semantics: dict comprehension — LAST duplicate key wins in
    # python dicts; map_from_entries throws on duplicates, so dedup keeping
    # the last occurrence first
    pairs = _pairs_of(kind)
    # reverse, keep first occurrence per key, build map
    rev = F.reverse(pairs)
    deduped = F.aggregate(
        rev,
        F.array().cast("array<struct<text:string,url:string>>"),
        lambda acc, x: F.when(
            F.exists(acc, lambda y: y["text"] == x["text"]), acc
        ).otherwise(F.array_append(acc, x)),
    )
    return F.map_from_entries(F.reverse(deduped))


def page_view(spans_df: DataFrame) -> DataFrame:
    """Extracted (doc_id, spans) -> one reference-shaped page row per doc."""
    first_title = F.try_element_at(_texts_of("title"), F.lit(1))
    return spans_df.select(
        F.col("doc_id"),
        F.concat(F.lit(WIKI_BASE + "/"), F.col("doc_id")).alias("url"),
        first_title.alias("title"),
        _texts_of("paragraph").alias("paragraphs"),
        _pairs_of("link").alias("paragraph_links"),
        _map_of("see_also").alias("see_also"),
        _map_of("toc").alias("toc_links"),
        _map_of("reference").alias("references"),
        F.transform(
            F.filter("spans", lambda s: s["kind"] == F.lit("media")),
            lambda s: s["media_ref"],
        ).alias("media"),
        _map_of("category").alias("categories"),
    )
