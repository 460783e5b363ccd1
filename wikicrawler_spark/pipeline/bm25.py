"""BM25 full-text ranked retrieval over the corpus.

The reference's ``search`` delegates ranking to Wikipedia's remote search
engine (/root/reference/src/wikicrawler/core/seeker.py:49-68 just scrapes
the result page); a standalone engine needs its own ranked retrieval.
This is the Spark-native version: an inverted-index formulation of
Okapi BM25, fully Catalyst-expressible (no Python stage) and replayed
verbatim by the DuckDB oracle.

Scale shape (the plan, verified in tests/test_plans.py):
  * the postings build filters to the QUERY'S terms before any
    aggregation — the (doc, term, tf) groupBy only ever sees rows whose
    term is in the query (an InSet predicate under the explode), so its
    shuffle is proportional to matching postings, not corpus tokens;
  * corpus stats (N, avgdl) and per-term document frequencies are
    broadcast 1-row / |query|-row aggregates;
  * top-k is a rounded-score ORDER BY ... LIMIT k with doc_id tiebreak —
    rank is deterministic cross-engine because the float is rounded
    BEFORE ranking (module rule, queries.py).

On a real deployment the postings index would be materialized once
(bucketed by term) and shared across queries; ``bm25_topk`` builds it
inline so each registry query stays self-contained.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text_quality import _tokens


def _query_terms(query: str) -> list[str]:
    out: list[str] = []
    for t in query.lower().split():
        if t and t not in out:
            out.append(t)
    return out


def bm25_topk(docs: DataFrame, query: str, *, k: int = 10, k1: float = 1.2,
              b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Top-k docs for ``query`` under Okapi BM25 (idf = ln(1 + (N-df+0.5)/
    (df+0.5)), tf saturation k1, length normalization b). Returns
    (doc_id, score, rank) with score rounded to 6 before ranking.
    """
    terms = _query_terms(query)
    if not terms:
        raise ValueError("bm25_topk: empty query")

    base = docs.select(
        F.col(id_col).alias("id"),
        _tokens(F.lower(F.col(text_col))).alias("w"),
    ).select("id", "w", F.size("w").cast("double").alias("dl"))

    # corpus stats: one 1-row aggregate, broadcast everywhere below
    stats = base.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    # postings restricted to query terms BEFORE the tf aggregation: the
    # explode emits corpus tokens, but the InSet filter sits directly on
    # the generator output, so the shuffle carries matching postings only
    postings = (
        base.select("id", "dl", F.explode("w").alias("term"))
        .filter(F.col("term").isin(*terms))
        .groupBy("id", "dl", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )

    df_per_term = postings.groupBy("term").agg(
        F.count("*").cast("double").alias("df"))

    scored = (
        postings
        .join(F.broadcast(df_per_term), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "contrib",
            F.log(F.lit(1.0)
                  + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf")
               + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("id"))
        .limit(k)
        .select(F.col("id").alias(id_col), "score")
    )


def bm25_oracle_sql(query: str, *, k: int = 10, k1: float = 1.2,
                    b: float = 0.75) -> str:
    """DuckDB replay of ``bm25_topk`` over the ``documents`` view, same
    expression shape, same round-before-rank rule."""
    terms = _query_terms(query)
    term_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH base AS (
  SELECT doc_id::BIGINT AS id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS w
  FROM documents
), dls AS (
  SELECT id, len(w)::DOUBLE AS dl, w FROM base
), stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dls
), postings AS (
  SELECT id, dl, term, count(*)::DOUBLE AS tf FROM (
    SELECT id, dl, unnest(w) AS term FROM dls
  ) WHERE term IN ({term_list})
  GROUP BY 1, 2, 3
), dfs AS (
  SELECT term, count(*)::DOUBLE AS df FROM postings GROUP BY 1
), scored AS (
  SELECT id,
         round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                   * (tf * ({k1} + 1.0))
                   / (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl))), 6) AS score
  FROM postings JOIN dfs USING (term), stats
  GROUP BY id
)
SELECT id AS doc_id, score FROM scored
ORDER BY score DESC, id LIMIT {k}
"""
