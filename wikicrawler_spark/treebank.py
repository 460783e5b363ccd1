r"""Vendored Penn Treebank word tokenizer — exact A3 parity without nltk.

The reference tokenizes words with ``nltk.word_tokenize``
(/root/reference/src/wikicrawler/core/sentiment/paragraph.py:73). nltk is
absent from this runtime, but — unlike punkt sentence splitting, which is a
trained model — the word-level step is a deterministic, fully published
regex cascade: Robert MacIntyre's Penn Treebank ``tokenizer.sed`` (1995),
as maintained in NLTK's ``nltk.tokenize.destructive.NLTKWordTokenizer``
(Apache-2.0). This module reimplements that cascade rule-for-rule so the
``treebank`` backend (analytics.set_tokenizer_backend) produces nltk's
token stream exactly: contractions split as [is, n't] / [wo, n't],
``U.S.``/``3.14`` kept whole, ``...`` as one token, double quotes rewritten
to \`\` / ''.

One scope note: ``nltk.word_tokenize`` runs punkt sentence splitting FIRST
and PTB-tokenizes each sentence (the final-period rule is anchored at
sentence end). The ``treebank`` backend substitutes the pinned regex
sentence split for punkt, so any remaining divergence from real nltk is
punkt's sentence boundaries only — measured per-construct in
BENCH/NLTK_PARITY.md's three-way table.
"""

from __future__ import annotations

import re

# -- rule tables: order is load-bearing, mirrors destructive.py exactly --

STARTING_QUOTES = [
    (re.compile("([«“‘„]|[`]+)"), r" \1 "),
    (re.compile(r"^\""), r"``"),
    (re.compile(r"(``)"), r" \1 "),
    (re.compile(r"([ \(\[{<])(\"|\'{2})"), r"\1 `` "),
    (re.compile(r"(?i)(\')(?!re|ve|ll|m|t|s|d|n)(\w)\b"), r"\1 \2"),
]

PUNCTUATION = [
    (re.compile(r'([^\.])(\.)([\]\)}>"\'' "»”’ " r"]*)\s*$"),
     r"\1 \2 \3 "),
    (re.compile(r"([:,])([^\d])"), r" \1 \2"),
    (re.compile(r"([:,])$"), r" \1 "),
    (re.compile(r"\.{2,}"), r" \g<0> "),
    (re.compile(r"[;@#$%&]"), r" \g<0> "),
    (re.compile(r'([^\.])(\.)([\]\)}>"\']*)\s*$'), r"\1 \2\3 "),
    (re.compile(r"[?!]"), r" \g<0> "),
    (re.compile(r"([^'])' "), r"\1 ' "),
    (re.compile(r"[*]"), r" \g<0> "),
]

PARENS_BRACKETS = (re.compile(r"[\]\[\(\)\{\}\<\>]"), r" \g<0> ")

DOUBLE_DASHES = (re.compile(r"--"), r" -- ")

ENDING_QUOTES = [
    (re.compile("([»”’])"), r" \1 "),
    (re.compile(r"''"), " '' "),
    (re.compile(r'"'), " '' "),
    (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') "), r"\1 \2 "),
    (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r"\1 \2 "),
]

# MacIntyre contraction splits ("cannot" -> "can not", "gonna" -> "gon na");
# CONTRACTIONS4 exists upstream but is unused by the tokenizer, same here
CONTRACTIONS2 = [re.compile(p) for p in (
    r"(?i)\b(can)(?#X)(not)\b",
    r"(?i)\b(d)(?#X)('ye)\b",
    r"(?i)\b(gim)(?#X)(me)\b",
    r"(?i)\b(gon)(?#X)(na)\b",
    r"(?i)\b(got)(?#X)(ta)\b",
    r"(?i)\b(lem)(?#X)(me)\b",
    r"(?i)\b(more)(?#X)('n)\b",
    r"(?i)\b(wan)(?#X)(na)(?=\s)",
)]
CONTRACTIONS3 = [re.compile(p) for p in (
    r"(?i) ('t)(?#X)(is)\b",
    r"(?i) ('t)(?#X)(was)\b",
)]


# -- punkt-approximating sentence splitter ------------------------------
#
# nltk.word_tokenize = punkt sentence split THEN the PTB cascade per
# sentence (the final-period rule is $-anchored). punkt is a TRAINED model
# and cannot be vendored exactly; this heuristic reproduces its decisions
# on common prose: a '.' boundary is suppressed when the next word starts
# lowercase, or when the preceding word is a known abbreviation / single
# initial / dotted acronym (U.S., p.m.). '!' and '?' always split. The
# word-level cascade above IS exact — this feed heuristic is the entire
# residual divergence vs real nltk, measured row-by-row in
# BENCH/NLTK_PARITY.md.

ABBREVIATIONS = frozenset(
    "dr mr mrs ms prof rev fr st jr sr vs etc e.g i.e cf al inc ltd co "
    "corp dept univ assn bros no vol fig figs ed eds p pp ch sec art op "
    "gen sen rep gov lt col maj capt sgt adm hon jan feb mar apr jun jul "
    "aug sep sept oct nov dec mon tue wed thu fri sat sun".split()
)

_DOTTED_ACRONYM = re.compile(r"^(?:[A-Za-z]\.)+[A-Za-z]$")  # U.S / p.m
_BOUNDARY = re.compile(r"([.!?])(['\")\]]*)(\s+)")


def _suppress_period_split(prev_word: str, next_char: str) -> bool:
    if next_char.islower() or next_char.isdigit():
        return True
    w = prev_word.rstrip(".")
    return (w.lower() in ABBREVIATIONS or len(w) == 1
            or bool(_DOTTED_ACRONYM.match(w)))


def punktish_sentence_split(text: str) -> list[str]:
    """Heuristic punkt stand-in feeding the PTB cascade (see above)."""
    if not text:
        return []
    out, start = [], 0
    for m in _BOUNDARY.finditer(text):
        if m.group(1) == ".":
            before = text[start:m.start(1)].rsplit(None, 1)
            prev_word = before[-1] if before else ""
            nxt = text[m.end(3):m.end(3) + 1]
            if _suppress_period_split(prev_word, nxt):
                continue
        out.append(text[start:m.end(2)])
        start = m.end(3)
    if start < len(text):
        out.append(text[start:])
    return [s for s in out if s]


def treebank_word_tokenize(text: str) -> list[str]:
    """Tokenize ONE sentence with the exact NLTKWordTokenizer cascade."""
    for regexp, substitution in STARTING_QUOTES:
        text = regexp.sub(substitution, text)
    for regexp, substitution in PUNCTUATION:
        text = regexp.sub(substitution, text)
    text = PARENS_BRACKETS[0].sub(PARENS_BRACKETS[1], text)
    text = DOUBLE_DASHES[0].sub(DOUBLE_DASHES[1], text)
    text = " " + text + " "
    for regexp, substitution in ENDING_QUOTES:
        text = regexp.sub(substitution, text)
    for regexp in CONTRACTIONS2:
        text = regexp.sub(r" \1 \2 ", text)
    for regexp in CONTRACTIONS3:
        text = regexp.sub(r" \1 \2 ", text)
    return text.split()
