"""Vendored VADER sentiment algorithm (Hutto & Gilbert 2014, ICWSM; the
reference scores with nltk's SentimentIntensityAnalyzer at
/root/reference/src/wikicrawler/core/sentiment/paragraph.py:40-48).

The ALGORITHM — booster/dampener scaling, tri-gram negation with the
never-so/without-doubt exceptions, the but-clause reweighting, allcaps
emphasis, punctuation amplification, idiom overrides, least-check, the
alpha-15 normalization, and the (v±1) sift into neg/neu/pos — is published
(MIT) and reimplemented here rule-for-rule, so scores are VADER's numbers,
not a stand-in's. The full 7.5k-entry lexicon is data this runtime does not
ship; ``LEXICON`` vendors a compact subset with the published mean-valence
values, and ``polarity_scores`` accepts any larger lexicon dict. When nltk
IS importable, sentiment.py still prefers the real library (import-try),
and the gated test compares this implementation against it verbatim.
"""

from __future__ import annotations

import math
import string

B_INCR = 0.293
B_DECR = -0.293
C_INCR = 0.733
N_SCALAR = -0.74

NEGATE = frozenset([
    "aint", "arent", "cannot", "cant", "couldnt", "darent", "didnt",
    "doesnt", "ain't", "aren't", "can't", "couldn't", "daren't", "didn't",
    "doesn't", "dont", "hadnt", "hasnt", "havent", "isnt", "mightnt",
    "mustnt", "neither", "don't", "hadn't", "hasn't", "haven't", "isn't",
    "mightn't", "mustn't", "neednt", "needn't", "never", "none", "nope",
    "nor", "not", "nothing", "nowhere", "oughtnt", "shant", "shouldnt",
    "uhuh", "wasnt", "werent", "oughtn't", "shan't", "shouldn't", "uh-uh",
    "wasn't", "weren't", "without", "wont", "wouldnt", "won't", "wouldn't",
    "rarely", "seldom", "despite",
])

BOOSTER_DICT = {
    "absolutely": B_INCR, "amazingly": B_INCR, "awfully": B_INCR,
    "completely": B_INCR, "considerable": B_INCR, "considerably": B_INCR,
    "decidedly": B_INCR, "deeply": B_INCR, "effing": B_INCR,
    "enormous": B_INCR, "enormously": B_INCR, "entirely": B_INCR,
    "especially": B_INCR, "exceptional": B_INCR, "exceptionally": B_INCR,
    "extreme": B_INCR, "extremely": B_INCR, "fabulously": B_INCR,
    "flipping": B_INCR, "flippin": B_INCR, "frackin": B_INCR,
    "fracking": B_INCR, "fricking": B_INCR, "frickin": B_INCR,
    "frigging": B_INCR, "friggin": B_INCR, "fully": B_INCR,
    "fucking": B_INCR, "greatly": B_INCR, "hella": B_INCR, "highly": B_INCR,
    "hugely": B_INCR, "incredible": B_INCR, "incredibly": B_INCR,
    "intensely": B_INCR, "major": B_INCR, "majorly": B_INCR, "more": B_INCR,
    "most": B_INCR, "particularly": B_INCR, "purely": B_INCR,
    "quite": B_INCR, "really": B_INCR, "remarkably": B_INCR, "so": B_INCR,
    "substantially": B_INCR, "thoroughly": B_INCR, "total": B_INCR,
    "totally": B_INCR, "tremendous": B_INCR, "tremendously": B_INCR,
    "uber": B_INCR, "unbelievably": B_INCR, "unusually": B_INCR,
    "utter": B_INCR, "utterly": B_INCR, "very": B_INCR,
    "almost": B_DECR, "barely": B_DECR, "hardly": B_DECR,
    "just enough": B_DECR, "kind of": B_DECR, "kinda": B_DECR,
    "kindof": B_DECR, "kind-of": B_DECR, "less": B_DECR, "little": B_DECR,
    "marginal": B_DECR, "marginally": B_DECR, "occasional": B_DECR,
    "occasionally": B_DECR, "partly": B_DECR, "scarce": B_DECR,
    "scarcely": B_DECR, "slight": B_DECR, "slightly": B_DECR,
    "somewhat": B_DECR, "sort of": B_DECR, "sorta": B_DECR,
    "sortof": B_DECR, "sort-of": B_DECR,
}

SPECIAL_CASES = {
    "the shit": 3.0, "the bomb": 3.0, "bad ass": 1.5, "badass": 1.5,
    "bus stop": 0.0, "yeah right": -2.0, "kiss of death": -1.5,
    "to die for": 3.0, "beating heart": 3.1, "broken heart": -2.9,
}

#: Compact subset of the published VADER lexicon (mean valence column of
#: vader_lexicon.txt). Only entries whose published value is vendored here
#: participate in the exact-parity claim; sentiment.py may overlay
#: engine-pinned additions for fixture vocabulary, which are NOT claimed
#: as VADER values.
LEXICON = {
    "good": 1.9, "great": 3.1, "excellent": 2.7, "best": 3.2,
    "beautiful": 2.9, "love": 3.2, "happy": 2.7, "wonderful": 2.7,
    "amazing": 2.8, "nice": 1.8,
    "bad": -2.5, "terrible": -2.1, "awful": -2.0, "worst": -3.1,
    "hate": -2.7, "horrible": -2.5, "sad": -2.1,
}

_PUNC = string.punctuation


def _strip_punc_if_word(token: str) -> str:
    stripped = token.strip(_PUNC)
    if len(stripped) <= 2:
        return token
    return stripped


def _words_and_emoticons(text: str) -> list[str]:
    return [_strip_punc_if_word(t) for t in text.split()]


def _allcap_differential(words: list[str]) -> bool:
    allcap = sum(1 for w in words if w.isupper())
    return 0 < allcap < len(words)


def negated(input_words: list[str], include_nt: bool = True) -> bool:
    words = [str(w).lower() for w in input_words]
    for word in words:
        if word in NEGATE:
            return True
    if include_nt:
        for word in words:
            if "n't" in word:
                return True
    return False


def normalize(score: float, alpha: float = 15.0) -> float:
    norm = score / math.sqrt(score * score + alpha)
    if norm < -1.0:
        return -1.0
    if norm > 1.0:
        return 1.0
    return norm


def scalar_inc_dec(word: str, valence: float, is_cap_diff: bool) -> float:
    scalar = 0.0
    wl = word.lower()
    if wl in BOOSTER_DICT:
        scalar = BOOSTER_DICT[wl]
        if valence < 0:
            scalar *= -1
        if word.isupper() and is_cap_diff:
            scalar += C_INCR if valence > 0 else -C_INCR
    return scalar


def _negation_check(valence: float, wl: list[str], start_i: int,
                    i: int) -> float:
    if start_i == 0:
        if negated([wl[i - 1]]):
            valence *= N_SCALAR
    if start_i == 1:
        if wl[i - 2] == "never" and wl[i - 1] in ("so", "this"):
            valence *= 1.25
        elif wl[i - 2] == "without" and wl[i - 1] == "doubt":
            pass
        elif negated([wl[i - (start_i + 1)]]):
            valence *= N_SCALAR
    if start_i == 2:
        if wl[i - 3] == "never" and (wl[i - 2] in ("so", "this")
                                     or wl[i - 1] in ("so", "this")):
            valence *= 1.25
        elif wl[i - 3] == "without" and (wl[i - 2] == "doubt"
                                         or wl[i - 1] == "doubt"):
            pass
        elif negated([wl[i - (start_i + 1)]]):
            valence *= N_SCALAR
    return valence


def _special_idioms_check(valence: float, wl: list[str], i: int) -> float:
    onezero = f"{wl[i - 1]} {wl[i]}"
    twoonezero = f"{wl[i - 2]} {wl[i - 1]} {wl[i]}"
    twoone = f"{wl[i - 2]} {wl[i - 1]}"
    threetwoone = f"{wl[i - 3]} {wl[i - 2]} {wl[i - 1]}"
    threetwo = f"{wl[i - 3]} {wl[i - 2]}"
    for seq in (onezero, twoonezero, twoone, threetwoone, threetwo):
        if seq in SPECIAL_CASES:
            valence = SPECIAL_CASES[seq]
            break
    if len(wl) - 1 > i:
        zeroone = f"{wl[i]} {wl[i + 1]}"
        if zeroone in SPECIAL_CASES:
            valence = SPECIAL_CASES[zeroone]
    if len(wl) - 1 > i + 1:
        zeroonetwo = f"{wl[i]} {wl[i + 1]} {wl[i + 2]}"
        if zeroonetwo in SPECIAL_CASES:
            valence = SPECIAL_CASES[zeroonetwo]
    for n_gram in (threetwoone, threetwo, twoone):
        if n_gram in BOOSTER_DICT:
            valence += BOOSTER_DICT[n_gram]
    return valence


def _least_check(valence: float, words: list[str], i: int,
                 lexicon: dict) -> float:
    if i > 1 and words[i - 1].lower() not in lexicon \
            and words[i - 1].lower() == "least":
        if words[i - 2].lower() not in ("at", "very"):
            valence *= N_SCALAR
    elif i > 0 and words[i - 1].lower() not in lexicon \
            and words[i - 1].lower() == "least":
        valence *= N_SCALAR
    return valence


def _but_check(words: list[str], sentiments: list[float]) -> list[float]:
    wl = [str(w).lower() for w in words]
    if "but" in wl:
        bi = wl.index("but")
        for sentiment in sentiments:
            # .index(sentiment) (not enumerate) is canonical VADER — with
            # duplicate values it rescales the FIRST equal entry; kept
            # verbatim for parity
            si = sentiments.index(sentiment)
            if si < bi:
                sentiments.pop(si)
                sentiments.insert(si, sentiment * 0.5)
            elif si > bi:
                sentiments.pop(si)
                sentiments.insert(si, sentiment * 1.5)
    return sentiments


def _sentiment_valence(valence: float, words: list[str], is_cap_diff: bool,
                       item: str, i: int, sentiments: list[float],
                       lexicon: dict) -> None:
    il = item.lower()
    if il in lexicon:
        valence = lexicon[il]
        if il == "no" and i != len(words) - 1 \
                and words[i + 1].lower() in lexicon:
            valence = 0.0
        wl = [str(w).lower() for w in words]
        if (i > 0 and wl[i - 1] == "no") or (i > 1 and wl[i - 2] == "no") \
                or (i > 2 and wl[i - 3] == "no"
                    and wl[i - 1] in ("or", "nor")):
            valence = lexicon[il] * N_SCALAR
        if item.isupper() and is_cap_diff:
            valence += C_INCR if valence > 0 else -C_INCR
        for start_i in range(0, 3):
            if i > start_i and words[i - (start_i + 1)].lower() not in lexicon:
                s = scalar_inc_dec(words[i - (start_i + 1)], valence,
                                   is_cap_diff)
                if start_i == 1 and s != 0:
                    s *= 0.95
                if start_i == 2 and s != 0:
                    s *= 0.9
                valence += s
                valence = _negation_check(valence, wl, start_i, i)
                if start_i == 2:
                    valence = _special_idioms_check(valence, wl, i)
        valence = _least_check(valence, words, i, lexicon)
    sentiments.append(valence)


def _punctuation_emphasis(text: str) -> float:
    ep_count = min(text.count("!"), 4)
    ep = ep_count * 0.292
    qm_count = text.count("?")
    qm = 0.0
    if qm_count > 1:
        qm = qm_count * 0.18 if qm_count <= 3 else 0.96
    return ep + qm


def _sift_sentiment_scores(sentiments: list[float]):
    pos_sum = neg_sum = 0.0
    neu_count = 0
    for s in sentiments:
        if s > 0:
            pos_sum += float(s) + 1
        if s < 0:
            neg_sum += float(s) - 1
        if s == 0:
            neu_count += 1
    return pos_sum, neg_sum, neu_count


def _score_valence(sentiments: list[float], text: str) -> dict:
    if sentiments:
        sum_s = float(sum(sentiments))
        punct = _punctuation_emphasis(text)
        if sum_s > 0:
            sum_s += punct
        elif sum_s < 0:
            sum_s -= punct
        compound = normalize(sum_s)
        pos_sum, neg_sum, neu_count = _sift_sentiment_scores(sentiments)
        if pos_sum > math.fabs(neg_sum):
            pos_sum += punct
        elif pos_sum < math.fabs(neg_sum):
            neg_sum -= punct
        total = pos_sum + math.fabs(neg_sum) + neu_count
        pos = math.fabs(pos_sum / total)
        neg = math.fabs(neg_sum / total)
        neu = math.fabs(neu_count / total)
    else:
        compound = pos = neg = neu = 0.0
    return {"neg": round(neg, 3), "neu": round(neu, 3),
            "pos": round(pos, 3), "compound": round(compound, 4)}


def load_lexicon_file(path: str) -> dict:
    """Parse the published ``vader_lexicon.txt`` format (MIT; tab-separated
    ``token<TAB>mean_valence<TAB>std<TAB>raw_ratings``) into a lexicon dict
    usable with ``polarity_scores(text, lexicon)``. The 7.5k-entry file is
    data this runtime does not ship; drop it anywhere and point
    ``WCS_VADER_LEXICON`` at it (sentiment.py picks it up at import) to run
    the vendored algorithm with full published coverage."""
    lex: dict[str, float] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 2 and parts[0].strip():
                try:
                    lex[parts[0]] = float(parts[1])
                except ValueError:
                    continue
    return lex


def polarity_scores(text: str, lexicon: dict | None = None) -> dict:
    """VADER polarity for one sentence: {neg, neu, pos, compound}."""
    lex = LEXICON if lexicon is None else lexicon
    words = _words_and_emoticons(text)
    is_cap_diff = _allcap_differential(words)
    sentiments: list[float] = []
    for i, item in enumerate(words):
        valence = 0.0
        if item.lower() in BOOSTER_DICT:
            sentiments.append(valence)
            continue
        if (i < len(words) - 1 and item.lower() == "kind"
                and words[i + 1].lower() == "of"):
            sentiments.append(valence)
            continue
        _sentiment_valence(valence, words, is_cap_diff, item, i,
                           sentiments, lex)
    sentiments = _but_check(words, sentiments)
    return _score_valence(sentiments, text)
