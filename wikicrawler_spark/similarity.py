"""Jaro-Winkler most-similar operators A14/A15 (SURVEY.md §2.3).

The reference scans a page's collocations / frequency keys with nltk's
``jaro_winkler_similarity`` keeping the max
(/root/reference/src/wikicrawler/arbiter/prompt.py:80-89,104-115). Spark has
no jaro-winkler built-in (only levenshtein/soundex), so scoring is a
vectorized pandas UDF (Arrow-batched); the argmax is a native window.

The similarity definition is the standard Winkler variant (p=0.1, prefix
cap 4, boost only when jaro > 0.7) — verified byte-identical to DuckDB's
``jaro_winkler_similarity`` so the driver's oracle can cross-check scores.
"""

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T


def jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    window = max(len1, len2) // 2 - 1
    if window < 0:
        window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    m = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(i + window + 1, len2)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags1[i] = flags2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    return (m / len1 + m / len2 + (m - t) / m) / 3.0


def jaro_winkler(s1: str, s2: str, p: float = 0.1, max_l: int = 4,
                 boost_threshold: float = 0.7) -> float:
    j = jaro(s1, s2)
    if j <= boost_threshold:
        return j
    l = 0
    for a, b in zip(s1[:max_l], s2[:max_l]):
        if a != b:
            break
        l += 1
    return j + l * p * (1.0 - j)


def jaro_winkler_udf(phrase: str):
    """Vectorized scorer against a fixed phrase (the pointer-query shape of
    A14/A15: one phrase vs N candidates)."""

    @F.pandas_udf(T.DoubleType())
    def score(s: pd.Series) -> pd.Series:
        return s.map(lambda x: jaro_winkler(x, phrase) if x is not None else 0.0)

    return score


def most_similar(df: DataFrame, candidate_col: str, phrase: str,
                 group_col: str = "doc_id") -> DataFrame:
    """Per group, the candidate most similar to ``phrase`` (ties -> smallest
    candidate string, pinned). Returns (group, best_<col>, best_sim)."""
    scored = df.withColumn("sim", jaro_winkler_udf(phrase)(F.col(candidate_col)))
    rk = Window.partitionBy(group_col).orderBy(
        F.col("sim").desc(), F.col(candidate_col)
    )
    return (
        scored.withColumn("__rk", F.row_number().over(rk))
        .filter(F.col("__rk") == 1)
        .select(
            group_col,
            F.col(candidate_col).alias(f"best_{candidate_col}"),
            F.col("sim").alias("best_sim"),
        )
    )
