"""Sentiment operators A9/A10 (SURVEY.md §2.3).

The reference scores each sentence and each word with VADER
(/root/reference/src/wikicrawler/core/sentiment/paragraph.py:40-48) and
blends them 50/50 per key (sentiment/utils/dict_add.py:1-6):
    blended[k] = 0.5 * sentence_score[k] + 0.5 * word_score[k]

r4: the fallback scorer is no longer a stand-in — vader.py vendors the
FULL published VADER algorithm (Hutto & Gilbert 2014, MIT: boosters,
tri-gram negation, but-clause, allcaps + punctuation emphasis, idiom
overrides, alpha-15 normalization, the (v±1) sift), so scores are VADER's
numbers wherever the word is in the vendored lexicon subset. If nltk's
VADER is importable it is still preferred (import-try, full 7.5k lexicon);
a gated test asserts vendored == nltk verbatim on lexicon-covered text.
``_EXTRA_LEXICON`` overlays engine-pinned values for fixture vocabulary
absent from the vendored subset — those words score deterministically but
are NOT claimed as VADER lexicon values.

Scoring runs as ONE vectorized pandas UDF; the 50/50 blend is native
arithmetic on struct fields (A10), not Python.
"""

import os

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from . import vader as _vader

# Engine-pinned additions for fixture vocabulary (valence in [-4, 4]).
_EXTRA_LEXICON = {
    "luminous": 1.5, "radiant": 2.0, "ancient": 0.4, "modern": 0.8,
    "giant": 0.5, "dark": -0.7, "dead": -2.9, "collapse": -1.6,
    "failed": -2.0, "catastrophic": -2.2,
}

# Optional full published lexicon: point WCS_VADER_LEXICON at a
# vader_lexicon.txt (the 7.5k-entry MIT data file the runtime doesn't
# ship) and the vendored algorithm runs with full coverage. Published
# values take precedence over the engine-pinned extras.
_ENV_LEXICON: dict = {}
_env_path = os.environ.get("WCS_VADER_LEXICON")
if _env_path and os.path.exists(_env_path):  # pragma: no cover - env hook
    try:
        _ENV_LEXICON = _vader.load_lexicon_file(_env_path)
    except OSError:
        _ENV_LEXICON = {}
_FULL_LEXICON = {**_vader.LEXICON, **_EXTRA_LEXICON, **_ENV_LEXICON}

#: The deterministic lexicon the driver-gate row scores with: vendored
#: subset + pinned extras ONLY — never the env overlay and never nltk, so
#: the sentence_sentiment oracle replays identically on any host.
PINNED_LEXICON = {**_vader.LEXICON, **_EXTRA_LEXICON}

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

except Exception:  # nltk absent: the vendored VADER algorithm
    _SIA = None

    def polarity_scores(text: str) -> dict:
        return _vader.polarity_scores(text, _FULL_LEXICON)


@F.pandas_udf(SENTIMENT_STRUCT)
def sentiment_udf(texts: pd.Series) -> pd.DataFrame:
    rows = [polarity_scores(t or "") for t in texts]
    return pd.DataFrame(rows, columns=["neg", "neu", "pos", "compound"])


@F.pandas_udf(SENTIMENT_STRUCT)
def pinned_sentiment_udf(texts: pd.Series) -> pd.DataFrame:
    """Vendored algorithm + PINNED_LEXICON, regardless of nltk presence or
    the WCS_VADER_LEXICON overlay — the host-independent scoring path the
    sentence_sentiment driver row (and its DuckDB oracle) is built on."""
    rows = [_vader.polarity_scores(t or "", PINNED_LEXICON) for t in texts]
    return pd.DataFrame(rows, columns=["neg", "neu", "pos", "compound"])


def sentence_sentiment(df: DataFrame, sentence_col: str = "sentence") -> DataFrame:
    """A9: per-sentence polarity struct."""
    return df.withColumn("sent_score", sentiment_udf(F.col(sentence_col)))


def blended_word_sentiment(sent_df: DataFrame, sentence_col: str = "sentence",
                           scale: float = 0.5,
                           score_udf=None) -> DataFrame:
    """A9+A10: explode each sentence into word rows; blend sentence score
    with word score per key: scale*sent + (1-scale)*word (dict_add.py:4).
    The blend is native struct arithmetic — only the two scorings cross
    into Python (Arrow-batched). ``score_udf`` overrides the scorer (e.g.
    pinned_sentiment_udf for the deterministic driver row)."""
    from .analytics import TOKEN_PATTERN

    if score_udf is None:
        score_udf = sentiment_udf
    words = (
        sent_df.withColumn("sent_score", score_udf(F.col(sentence_col)))
        .withColumn(
            "word",
            # explode_OUTER + null filter: a plain explode's inferred
            # `size(...) > 0` guard re-runs regexp_extract_all per sentence
            # in a pushed-down filter (see pipeline.dedup.shingle_table);
            # extracted words are never NULL, so the null check drops
            # exactly the empty-sentence padding rows.
            F.explode_outer(F.regexp_extract_all(F.col(sentence_col),
                                                 F.lit(TOKEN_PATTERN),
                                                 F.lit(0))),
        )
        .filter(F.col("word").isNotNull())
        .withColumn("word_score", score_udf(F.col("word")))
    )
    blend = F.struct(
        *[
            (F.col(f"sent_score.{k}") * scale
             + F.col(f"word_score.{k}") * (1.0 - scale)).alias(k)
            for k in ("neg", "neu", "pos", "compound")
        ]
    )
    return words.withColumn("blended", blend).drop("word_score")
