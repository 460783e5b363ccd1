"""Sentiment operators A9/A10 (SURVEY.md §2.3).

The reference scores each sentence and each word with VADER
(/root/reference/src/wikicrawler/core/sentiment/paragraph.py:40-48) and
blends them 50/50 per key (sentiment/utils/dict_add.py:1-6):
    blended[k] = 0.5 * sentence_score[k] + 0.5 * word_score[k]

nltk/vaderSentiment are not available in this runtime, so scoring uses a
small deterministic valence lexicon with VADER-shaped outputs
(neg/neu/pos/compound, compound normalized x/sqrt(x^2+15) like VADER's
normalize()) — a pinned, documented stand-in. If nltk's VADER is importable
it is preferred (import-try), keeping outputs compatible where available.

Scoring runs as ONE vectorized pandas UDF; the 50/50 blend is native
arithmetic on struct fields (A10), not Python.
"""

import math

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

# Deterministic fallback lexicon (valence in [-4, 4], VADER-style scale).
_LEXICON = {
    "good": 1.9, "great": 3.1, "excellent": 3.2, "luminous": 1.5,
    "radiant": 2.0, "love": 3.2, "beautiful": 2.9, "best": 3.2,
    "ancient": 0.4, "modern": 0.8, "giant": 0.5,
    "bad": -2.5, "terrible": -2.1, "awful": -2.0, "worst": -3.1,
    "hate": -2.7, "dark": -0.7, "dead": -2.9, "collapse": -1.6,
    "failed": -2.0, "catastrophic": -2.2,
}

SENTIMENT_STRUCT = T.StructType([
    T.StructField("neg", T.DoubleType()),
    T.StructField("neu", T.DoubleType()),
    T.StructField("pos", T.DoubleType()),
    T.StructField("compound", T.DoubleType()),
])

try:  # pragma: no cover - environment-dependent
    from nltk.sentiment import SentimentIntensityAnalyzer  # type: ignore

    _SIA = SentimentIntensityAnalyzer()

    def polarity_scores(text: str) -> dict:
        return _SIA.polarity_scores(text)

except Exception:  # nltk absent: pinned deterministic scorer
    _SIA = None

    def polarity_scores(text: str) -> dict:
        tokens = text.lower().split()
        if not tokens:
            return {"neg": 0.0, "neu": 0.0, "pos": 0.0, "compound": 0.0}
        vals = [_LEXICON.get(t.strip(".,!?;:"), 0.0) for t in tokens]
        pos_sum = sum(v for v in vals if v > 0)
        neg_sum = -sum(v for v in vals if v < 0)
        neu_n = sum(1 for v in vals if v == 0)
        total = pos_sum + neg_sum + neu_n
        s = sum(vals)
        compound = s / math.sqrt(s * s + 15.0)
        if total == 0:
            return {"neg": 0.0, "neu": 0.0, "pos": 0.0, "compound": 0.0}
        return {
            "neg": round(neg_sum / total, 3),
            "neu": round(neu_n / total, 3),
            "pos": round(pos_sum / total, 3),
            "compound": round(compound, 4),
        }


@F.pandas_udf(SENTIMENT_STRUCT)
def sentiment_udf(texts: pd.Series) -> pd.DataFrame:
    rows = [polarity_scores(t or "") for t in texts]
    return pd.DataFrame(rows, columns=["neg", "neu", "pos", "compound"])


def sentence_sentiment(df: DataFrame, sentence_col: str = "sentence") -> DataFrame:
    """A9: per-sentence polarity struct."""
    return df.withColumn("sent_score", sentiment_udf(F.col(sentence_col)))


def blended_word_sentiment(sent_df: DataFrame, sentence_col: str = "sentence",
                           scale: float = 0.5) -> DataFrame:
    """A9+A10: explode each sentence into word rows; blend sentence score
    with word score per key: scale*sent + (1-scale)*word (dict_add.py:4).
    The blend is native struct arithmetic — only the two scorings cross
    into Python (Arrow-batched)."""
    from .analytics import TOKEN_PATTERN

    words = (
        sent_df.withColumn("sent_score", sentiment_udf(F.col(sentence_col)))
        .withColumn(
            "word",
            F.explode(F.regexp_extract_all(F.col(sentence_col),
                                           F.lit(TOKEN_PATTERN), F.lit(0))),
        )
        .withColumn("word_score", sentiment_udf(F.col("word")))
    )
    blend = F.struct(
        *[
            (F.col(f"sent_score.{k}") * scale
             + F.col(f"word_score.{k}") * (1.0 - scale)).alias(k)
            for k in ("neg", "neu", "pos", "compound")
        ]
    )
    return words.withColumn("blended", blend).drop("word_score")
