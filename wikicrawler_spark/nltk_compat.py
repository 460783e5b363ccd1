"""Optional nltk tokenizer backend (import-try, mirrors sentiment.py's
VADER pattern).

The reference tokenizes with ``nltk.sent_tokenize`` / ``nltk.word_tokenize``
(/root/reference/src/wikicrawler/core/sentiment/paragraph.py:72-73). nltk is
not shipped in this runtime, so the engine's DEFAULT is the pinned native
regex spec in analytics.py (JVM-side, codegen) and every golden/oracle is
computed against it. When nltk IS importable (and its punkt model data is
resolvable), these Arrow-batched pandas UDFs provide reference-exact
punkt/Penn-Treebank tokenization; opt in per session with
``analytics.set_tokenizer_backend("nltk")`` — an explicit flag, never
autodetected, so results don't silently change with the environment.
"""

# NOTE: no `from __future__ import annotations` — pandas_udf needs real
# type hints, not strings (pyspark 4.1 cannot resolve deferred annotations).

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - environment-dependent
    from nltk.tokenize import sent_tokenize, word_tokenize

    # sent_tokenize lazily loads the punkt model; probe it now so a missing
    # data package reads as "backend unavailable", not a mid-job crash
    sent_tokenize("Probe. Ok.")
    HAS_NLTK = True
except Exception:  # noqa: BLE001 - any import/data failure means absent
    HAS_NLTK = False


if HAS_NLTK:  # pragma: no cover - environment-dependent

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def nltk_word_tokens(body: pd.Series) -> pd.Series:
        return body.map(lambda s: word_tokenize(s) if s else [])

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def nltk_sentences(body: pd.Series) -> pd.Series:
        return body.map(lambda s: sent_tokenize(s) if s else [])

else:
    nltk_word_tokens = None
    nltk_sentences = None


# Vendored Penn Treebank backend (treebank.py): exact NLTKWordTokenizer
# cascade, no library needed. Sentence boundaries come from the
# punkt-approximating heuristic splitter (punkt itself is a trained model
# and stays library-gated), so the word-level step is reference-exact and
# the only residual divergence vs real nltk is sentence segmentation on
# constructs the heuristic misses (measured in BENCH/NLTK_PARITY.md).

@F.pandas_udf(T.ArrayType(T.StringType()))
def treebank_word_tokens(body: pd.Series) -> pd.Series:
    from .treebank import punktish_sentence_split, treebank_word_tokenize

    return body.map(lambda s: [t for sent in punktish_sentence_split(s or "")
                               for t in treebank_word_tokenize(sent)])


@F.pandas_udf(T.ArrayType(T.StringType()))
def treebank_sentences(body: pd.Series) -> pd.Series:
    from .treebank import punktish_sentence_split

    return body.map(lambda s: punktish_sentence_split(s or ""))
