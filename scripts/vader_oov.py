"""Lexicon-coverage (OOV) report for the sentiment plane (VERDICT r4 #5).

Measures what fraction of the bench corpus's token stream the vendored
VADER lexicon subset (+ engine-pinned extras) can assign a nonzero-capable
valence to, vs how much falls back to 0-valence. Run:

    python scripts/vader_oov.py

Corpora measured (no Spark needed — token streams are derived the same
way analytics.TOKEN_PATTERN does):
  * testdata documents.text at sf0.1 (the bench tables)
  * the extraction corpus paragraph text (corpus.py generators, 500 docs)
  * the sentence_sentiment driver-row templates' sentiment vocabulary

Output: one JSON line per corpus with distinct-type and token-occurrence
coverage, plus the sentiment-bearing-template coverage (which is the
number that matters for scoring fidelity — neutral tech words are absent
from the full published 7.5k lexicon too, by design).
"""
from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from wikicrawler_spark.analytics import TOKEN_PATTERN
from wikicrawler_spark.sentiment import PINNED_LEXICON
from wikicrawler_spark import corpus, vader

TOK = re.compile(TOKEN_PATTERN)  # analytics' pattern is already a py regex


def coverage(name: str, tokens: list[str]) -> dict:
    words = [t.lower() for t in tokens if any(c.isalpha() for c in t)]
    types = set(words)
    in_lex_occ = sum(1 for w in words if w in PINNED_LEXICON)
    in_lex_typ = sum(1 for w in types if w in PINNED_LEXICON)
    return {
        "corpus": name,
        "token_occurrences": len(words),
        "distinct_types": len(types),
        "lexicon_hit_occurrences": in_lex_occ,
        "lexicon_hit_types": in_lex_typ,
        "oov_rate_occurrences": round(1 - in_lex_occ / max(len(words), 1), 4),
        "oov_rate_types": round(1 - in_lex_typ / max(len(types), 1), 4),
    }


def main() -> None:
    con = duckdb.connect()
    rows = con.execute(
        "SELECT text FROM read_parquet('/root/testdata/sf0.1/documents.parquet')"
    ).fetchall()
    doc_toks = [t for (txt,) in rows for t in TOK.findall(txt or "")]
    print(json.dumps(coverage("testdata_documents_sf0.1", doc_toks)))

    para_toks: list[str] = []
    tag = re.compile(r"<[^>]+>")
    for i in range(500):
        for span in corpus.gen_basic_article(i):
            t = span.get("text") or ""
            if t.startswith("<p>"):
                para_toks.extend(TOK.findall(tag.sub(" ", t)))
    print(json.dumps(coverage("extraction_corpus_paragraphs", para_toks)))

    template_vocab = ("good great nice " "really very so never not no but "
                      "least at was is has the plan").split()
    sentiment_bearing = [w for w in template_vocab
                         if w in PINNED_LEXICON or w in vader.BOOSTER_DICT
                         or w in vader.NEGATE]
    print(json.dumps({
        "corpus": "sentence_sentiment_templates",
        "sentiment_bearing_words": sentiment_bearing,
        "all_covered": all(
            w in PINNED_LEXICON for w in ("good", "great", "nice")),
        "note": ("neutral corpus words score 0 under the full published "
                 "lexicon too; coverage that matters is the "
                 "sentiment-bearing vocabulary, which is 100% vendored. "
                 "For full published coverage set WCS_VADER_LEXICON to a "
                 "vader_lexicon.txt (vader.load_lexicon_file)."),
    }))


if __name__ == "__main__":
    main()
