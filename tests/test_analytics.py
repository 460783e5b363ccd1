"""Analytics parity tests (SURVEY.md §5.2 item 3): native Spark operators
vs independent pure-python references (collections.Counter, hand-rolled
Dunning LLR, python slicing) and vs DuckDB for jaro-winkler.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import duckdb
import pytest

from wikicrawler_spark import analytics as A
from wikicrawler_spark import corpus
from wikicrawler_spark.kernel import extract_doc
from wikicrawler_spark.similarity import jaro_winkler, most_similar


def py_tokens(body: str) -> list[str]:
    return re.findall(A.TOKEN_PATTERN, body)


def py_filtered(tokens: list[str]) -> list[str]:
    bl = set(A.BLACKLIST)
    return [t for t in tokens if t.lower() not in bl and not re.fullmatch(r"[0-9]+", t)]


def make_body(family: str, i: int) -> tuple[str, str]:
    d = corpus.generate_doc(family, i)
    spans = extract_doc(d["doc_id"], d["spans"])
    body = "".join(s["text"] for s in spans if s["kind"] == "paragraph")
    return d["doc_id"], body


@pytest.fixture(scope="module")
def bodies():
    out = [make_body("basic_article", i) for i in range(4)]
    out.append(("doc/handmade",
                "the star cluster is a star cluster. a star cluster shines. "
                "the giant star cluster is near the star cluster core. 42 stars."))
    return out


@pytest.fixture(scope="module")
def body_df(spark, bodies):
    return spark.createDataFrame(bodies, "doc_id string, body string").cache()


def test_tokens_and_filter_native_vs_python(spark, body_df, bodies):
    from pyspark.sql import functions as F

    got = {
        r["doc_id"]: (list(r["toks"]), list(r["ftoks"]))
        for r in body_df.select(
            "doc_id",
            A.tokens_col(F.col("body")).alias("toks"),
            A.filtered_tokens_col(A.tokens_col(F.col("body"))).alias("ftoks"),
        ).collect()
    }
    for doc_id, body in bodies:
        toks = py_tokens(body)
        assert got[doc_id][0] == toks, doc_id
        assert got[doc_id][1] == py_filtered(toks), doc_id


def test_word_freq_vs_counter(body_df, bodies):
    freq = A.word_freq(body_df)
    got = {}
    for r in freq.collect():
        got.setdefault(r["doc_id"], {})[r["token"]] = r["cnt"]
    for doc_id, body in bodies:
        want = Counter(py_filtered(py_tokens(body)))
        assert got.get(doc_id, {}) == dict(want), doc_id


def test_argmax_freq_vs_python(body_df, bodies):
    top = {r["doc_id"]: (r["top_token"], r["top_cnt"])
           for r in A.argmax_freq(A.word_freq(body_df)).collect()}
    for doc_id, body in bodies:
        c = Counter(py_filtered(py_tokens(body)))
        if not c:
            continue
        best_cnt = max(c.values())
        best_tok = min(t for t, n in c.items() if n == best_cnt)
        assert top[doc_id] == (best_tok, best_cnt), doc_id


def py_llr(n_ii, n_ix, n_xi, n_xx):
    def term(obs, exp):
        return obs * math.log(obs / exp) if obs > 0 else 0.0

    n_io, n_oi = n_ix - n_ii, n_xi - n_ii
    n_oo = n_xx - n_ix - n_xi + n_ii
    return 2.0 * (
        term(n_ii, n_ix * n_xi / n_xx)
        + term(n_io, n_ix * (n_xx - n_xi) / n_xx)
        + term(n_oi, (n_xx - n_ix) * n_xi / n_xx)
        + term(n_oo, (n_xx - n_ix) * (n_xx - n_xi) / n_xx)
    )


def py_bigrams(body: str, k: int = 15):
    toks = py_tokens(body)
    bis = list(zip(toks, toks[1:]))
    if not bis:
        return []
    c = Counter(bis)
    left = Counter(w1 for w1, _ in bis)
    right = Counter(w2 for _, w2 in bis)
    n = len(bis)
    sw = set(A.ENGLISH_STOPWORDS)

    def ok(w):
        return len(w) >= 3 and w.lower() not in sw

    scored = [
        (w1, w2, cnt, round(py_llr(cnt, left[w1], right[w2], n), 6))
        for (w1, w2), cnt in c.items()
        if ok(w1) and ok(w2)
    ]
    scored.sort(key=lambda x: (-x[3], x[0], x[1]))
    return scored[:k]


def test_bigram_collocations_vs_python(body_df, bodies):
    got = {}
    for r in A.bigram_collocations(body_df).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["w1"], r["w2"], r["cnt"], r["llr"])
        )
    for doc_id, body in bodies:
        want = py_bigrams(body)
        rows = sorted(got.get(doc_id, []))
        assert len(rows) == len(want), doc_id
        for (rank, w1, w2, cnt, llr), (pw1, pw2, pcnt, pllr) in zip(rows, want):
            assert (w1, w2, cnt) == (pw1, pw2, pcnt), doc_id
            assert abs(llr - pllr) < 1e-9, doc_id


def test_trigram_freq_filter(spark):
    # 'star cluster core' appears 3x -> kept; 'red dwarf star' 2x -> dropped
    body = ("star cluster core alpha " * 3) + ("red dwarf star beta " * 2)
    df = spark.createDataFrame([("d", body)], "doc_id string, body string")
    rows = A.trigram_collocations(df).collect()
    tris = {(r["w1"], r["w2"], r["w3"]) for r in rows}
    assert ("star", "cluster", "core") in tris
    assert ("red", "dwarf", "star") not in tris
    assert all(r["cnt"] >= 3 for r in rows)


def test_collocations_union_shape(body_df):
    un = A.collocations(body_df).collect()
    fams = {r["family"] for r in un}
    assert fams <= {0, 1}
    assert all(len(r["colloc"]) == 2 for r in un if r["family"] == 0)
    assert all(len(r["colloc"]) == 3 for r in un if r["family"] == 1)


def test_sentence_slices_match_python(spark):
    sents = [f"Sentence number {i} ends here." for i in range(12)]
    body = " ".join(sents)
    df = spark.createDataFrame([("d", body)], "doc_id string, body string")
    row = A.sentence_slices(df, amount=0.25).collect()[0]
    n = len(sents)
    tp = int(0.33 * n)
    stop = tp + int(0.25 * n)
    assert list(row["first5"]) == sents[:5]
    assert list(row["pivot"]) == sents[tp:stop]
    assert list(row["last5"]) == sents[-5:]


def test_markdown_filter(spark):
    d = corpus.generate_doc("basic_article", 0)
    spans = extract_doc(d["doc_id"], d["spans"])
    sdf = spark.createDataFrame(
        [(d["doc_id"], [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans])],
        corpus.DOC_SCHEMA,
    )
    body = "".join(s["text"] for s in spans if s["kind"] == "paragraph")
    bdf = spark.createDataFrame([(d["doc_id"], body)], "doc_id string, body string")
    collocs = A.collocations(bdf)
    kept = A.markdown_paragraph_filter(sdf, collocs).collect()[0]["kept_paragraphs"]
    top5 = [
        " ".join(r["colloc"])
        for r in collocs.filter("family = 0 and rank <= 5").collect()
    ]
    paras = [s["text"] for s in spans if s["kind"] == "paragraph"]
    want = [p for p in paras if any(t in p for t in top5)]
    assert list(kept) == want


# ------------------------------------------------------------ similarity

JW_CASES = [
    ("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("JELLYFISH", "SMELLYFISH"),
    ("star cluster", "star luster"), ("abc", "abc"), ("", "x"), ("a", "b"),
    ("CRATE", "TRACE"), ("DWAYNE", "DUANE"), ("abqqqqqq", "abzzzzzz"),
    ("ab", "az"), ("abcdefgh", "abzyxwvu"), ("star", "start"),
]


def test_jaro_winkler_matches_duckdb():
    con = duckdb.connect()
    for a, b in JW_CASES:
        want = con.execute("select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        assert abs(jaro_winkler(a, b) - want) < 1e-12, (a, b)


def test_most_similar_colloc(spark):
    rows = [("d1", "star cluster"), ("d1", "giant nebula"), ("d1", "star luster"),
            ("d2", "alpha beta")]
    df = spark.createDataFrame(rows, "doc_id string, colloc string")
    got = {r["doc_id"]: r["best_colloc"]
           for r in most_similar(df, "colloc", "star cluster").collect()}
    assert got["d1"] == "star cluster"
    assert got["d2"] == "alpha beta"


# ------------------------------------------------------------ sentiment

def test_sentiment_blend(spark):
    from wikicrawler_spark.sentiment import blended_word_sentiment, polarity_scores

    df = spark.createDataFrame(
        [("d", "the radiant star is beautiful")], "doc_id string, sentence string"
    )
    rows = blended_word_sentiment(df).collect()
    assert rows, "no word rows"
    sent = polarity_scores("the radiant star is beautiful")
    for r in rows:
        word = polarity_scores(r["word"])
        for k in ("neg", "neu", "pos", "compound"):
            assert abs(r["blended"][k] - (0.5 * sent[k] + 0.5 * word[k])) < 1e-9


# ---- nltk 8-cell trigram LLR parity (reference: paragraph.py:89-93) ----
# Pure-python replica of nltk.metrics.TrigramAssocMeasures.likelihood_ratio
# + TrigramCollocationFinder.from_words marginals (published algorithm,
# Manning & Schutze 5.3.4 as implemented in nltk.metrics.association).

_SMALL = 1e-20


def py_tri_llr(n_iii, n_iix_tuple, n_ixx_tuple, n_xxx):
    import math

    (n_iix, n_ixi, n_xii) = n_iix_tuple
    (n_ixx, n_xix, n_xxi) = n_ixx_tuple
    n_oii = n_xii - n_iii
    n_ioi = n_ixi - n_iii
    n_iio = n_iix - n_iii
    n_ooi = n_xxi - n_iii - n_oii - n_ioi
    n_oio = n_xix - n_iii - n_oii - n_iio
    n_ioo = n_ixx - n_iii - n_ioi - n_iio
    n_ooo = n_xxx - n_iii - n_oii - n_ioi - n_iio - n_ooi - n_oio - n_ioo
    cont = (n_iii, n_oii, n_ioi, n_ooi, n_iio, n_oio, n_ioo, n_ooo)
    n_all = sum(cont)
    bits = [1, 2, 4]
    total = 0.0
    for i in range(8):
        exp = 1.0
        for j in bits:
            exp *= sum(cont[x] for x in range(8) if (x & j) == (i & j))
        exp /= n_all ** 2
        obs = cont[i]
        if obs > 0:
            total += obs * math.log(obs / (exp + _SMALL) + _SMALL)
    return 3 * total


def py_trigrams(body: str, k: int = 10, min_freq: int = 3):
    toks = py_tokens(body)
    word_fd = Counter(toks)
    bigram_fd = Counter(zip(toks, toks[1:]))
    wild_fd = Counter(zip(toks, toks[2:]))
    tri_fd = Counter(zip(toks, toks[1:], toks[2:]))
    n_all = len(toks)
    sw = set(A.ENGLISH_STOPWORDS)

    def ok(w):
        return len(w) >= 3 and w.lower() not in sw

    scored = []
    for (w1, w2, w3), cnt in tri_fd.items():
        if cnt < min_freq or not (ok(w1) and ok(w2) and ok(w3)):
            continue
        llr = py_tri_llr(
            cnt,
            (bigram_fd[(w1, w2)], wild_fd[(w1, w3)], bigram_fd[(w2, w3)]),
            (word_fd[w1], word_fd[w2], word_fd[w3]),
            n_all,
        )
        scored.append((w1, w2, w3, cnt, round(llr, 6)))
    scored.sort(key=lambda x: (-x[4], x[0], x[1], x[2]))
    return scored[:k]


def test_trigram_llr_nltk_8cell_parity(spark):
    bodies = [
        ("d1", ("star cluster core alpha " * 4)
               + ("red dwarf star beta " * 3)
               + "star cluster core omega point final words"),
        ("d2", ("galaxy arm spiral dust lane " * 5) + "galaxy arm spiral end"),
        ("d3", "tiny doc no repeats at all here"),
    ]
    df = spark.createDataFrame(bodies, "doc_id string, body string")
    got = {}
    for r in A.trigram_collocations(df, min_freq=2).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["w1"], r["w2"], r["w3"], r["cnt"], r["llr"])
        )
    for doc_id, body in bodies:
        want = py_trigrams(body, min_freq=2)
        rows = sorted(got.get(doc_id, []))
        assert len(rows) == len(want), (doc_id, rows, want)
        for (rank, w1, w2, w3, cnt, llr), (pw1, pw2, pw3, pcnt, pllr) in zip(
            rows, want
        ):
            assert (w1, w2, w3, cnt) == (pw1, pw2, pw3, pcnt), doc_id
            assert abs(llr - pllr) < 1e-6, (doc_id, w1, w2, w3, llr, pllr)


# ---- tokenizer backend switch (A2/A3 nltk parity behind import-try) ----

def test_tokenizer_backend_default_and_validation():
    from wikicrawler_spark import nltk_compat

    assert A.tokenizer_backend() == "regex"
    with pytest.raises(ValueError):
        A.set_tokenizer_backend("punkt5000")
    if not nltk_compat.HAS_NLTK:
        with pytest.raises(RuntimeError, match="nltk"):
            A.set_tokenizer_backend("nltk")
        assert A.tokenizer_backend() == "regex"  # unchanged on failure


def test_regex_nltk_fixture_parity(spark):
    """CI-style gate (VERDICT r2 ask #6): on the fixture corpus — whose
    grammar has no abbreviations/contractions/decimals — the pinned regex
    default must EQUAL nltk punkt/PTB output, through the real Spark
    columns in both backends. Runs only where nltk + punkt data exist;
    elsewhere the checked-in BENCH/NLTK_PARITY.md (regenerated below)
    records the divergence corpus instead."""
    import os
    import subprocess
    import sys as _sys

    from wikicrawler_spark import corpus, nltk_compat

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # the report script is itself part of the contract: it must run clean
    # (exit 0 = no fixture-parity violation when nltk is present); the
    # byte-identical regeneration check only applies in the environment
    # class that produced the checked-in report (nltk absent + driver
    # testdata present) — elsewhere the regenerated content legitimately
    # differs (live nltk sections, different body counts) (review r3)
    import tempfile

    report = os.path.join(repo, "BENCH", "NLTK_PARITY.md")
    with open(report) as fh:
        checked_in = fh.read()
    regen = os.path.join(tempfile.mkdtemp(), "regen.md")
    out = subprocess.run(
        [_sys.executable, os.path.join(repo, "scripts", "nltk_parity_report.py"),
         regen],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr
    same_env = (not nltk_compat.HAS_NLTK
                and os.path.exists("/root/testdata/sf0.001/documents.parquet"))
    if same_env:
        with open(regen) as fh:
            assert fh.read() == checked_in, \
                "BENCH/NLTK_PARITY.md is stale — rerun scripts/nltk_parity_report.py"

    if not nltk_compat.HAS_NLTK:
        pytest.skip("nltk absent: report regeneration checked; live "
                    "fixture-parity needs an nltk-capable environment")
    from nltk.tokenize import sent_tokenize, word_tokenize

    docs = [corpus.generate_doc("sections", i) for i in range(6)]
    from oracle_extractor import oracle_extract
    bodies = ["".join(s["text"] for s in oracle_extract(d["doc_id"], d["spans"])
                      if s["kind"] == "paragraph" and s["text"])
              for d in docs]
    df = spark.createDataFrame([(str(i), b) for i, b in enumerate(bodies)],
                               "doc_id string, body string")
    regex_rows = {r["doc_id"]: (list(r["s"]), list(r["t"])) for r in df.select(
        "doc_id", A.sentences_col(F.col("body")).alias("s"),
        A.tokens_col(F.col("body")).alias("t")).collect()}
    for i, b in enumerate(bodies):
        assert regex_rows[str(i)][0] == sent_tokenize(b)
        assert regex_rows[str(i)][1] == word_tokenize(b)


def test_tokenizer_backend_nltk_parity(spark):
    """Only runs where nltk + punkt data exist: the UDF path must equal
    direct nltk calls (reference: paragraph.py:72-73)."""
    from wikicrawler_spark import nltk_compat

    if not nltk_compat.HAS_NLTK:
        pytest.skip("nltk absent in this runtime")
    from nltk.tokenize import sent_tokenize, word_tokenize

    bodies = [
        "Dr. Smith went to Washington. He arrived at 5 p.m. sharp!",
        "Contractions don't confuse PTB, e.g. isn't and won't.",
        "",
    ]
    df = spark.createDataFrame([(str(i), b) for i, b in enumerate(bodies)],
                               "doc_id string, body string")
    A.set_tokenizer_backend("nltk")
    try:
        rows = {r["doc_id"]: (list(r["s"]), list(r["t"])) for r in df.select(
            "doc_id",
            A.sentences_col(F.col("body")).alias("s"),
            A.tokens_col(F.col("body")).alias("t"),
        ).collect()}
    finally:
        A.set_tokenizer_backend("regex")
    for i, b in enumerate(bodies):
        assert rows[str(i)][0] == (sent_tokenize(b) if b else [])
        assert rows[str(i)][1] == (word_tokenize(b) if b else [])


# ---- vendored Treebank backend (r4: exact PTB cascade, no library) ----

def _load_parity_module():
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "nltk_parity_report",
        os.path.join(repo, "scripts", "nltk_parity_report.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_vendored_treebank_matches_expected_nltk_rows():
    """VERDICT r3 #2 'done' criterion: on the adversarial corpus the
    vendored backend's output equals the expected-nltk column — the rows
    the two prior rounds called 'irreducible without the library'
    (contractions -> n't, ellipsis -> ..., quote rewriting, U.S./3.14 kept
    whole, abbreviation-aware sentence boundaries)."""
    from wikicrawler_spark.treebank import punktish_sentence_split

    npr = _load_parity_module()
    for case in npr.ADVERSARIAL:
        t = case["text"]
        if "expected_nltk_tokens" in case:
            assert npr.vendored_tokens(t) == case["expected_nltk_tokens"], t
        if "expected_nltk_sentences" in case:
            assert punktish_sentence_split(t) == \
                case["expected_nltk_sentences"], t


def test_treebank_backend_spark_columns(spark):
    """set_tokenizer_backend('treebank') must route the REAL Spark columns
    through the vendored cascade (always runnable — no library needed),
    and the session must come back to the regex default afterwards."""
    from pyspark.sql import functions as F

    from wikicrawler_spark.treebank import punktish_sentence_split

    npr = _load_parity_module()
    bodies = [c["text"] for c in npr.ADVERSARIAL] + [""]
    df = spark.createDataFrame([(str(i), b) for i, b in enumerate(bodies)],
                               "doc_id string, body string")
    A.set_tokenizer_backend("treebank")
    try:
        rows = {r["doc_id"]: (list(r["s"]), list(r["t"])) for r in df.select(
            "doc_id",
            A.sentences_col(F.col("body")).alias("s"),
            A.tokens_col(F.col("body")).alias("t"),
        ).collect()}
    finally:
        A.set_tokenizer_backend("regex")
    assert A.tokenizer_backend() == "regex"
    for i, b in enumerate(bodies):
        assert rows[str(i)][0] == punktish_sentence_split(b), b
        assert rows[str(i)][1] == npr.vendored_tokens(b), b


def test_vendored_treebank_vs_live_nltk():
    """Only runs where nltk exists: the vendored cascade must equal
    nltk.word_tokenize verbatim on the adversarial corpus AND the fixture
    corpus — the strongest form of the parity claim."""
    from wikicrawler_spark import nltk_compat

    if not nltk_compat.HAS_NLTK:
        pytest.skip("nltk absent in this runtime")
    from nltk.tokenize import word_tokenize

    npr = _load_parity_module()
    for case in npr.ADVERSARIAL:
        assert npr.vendored_tokens(case["text"]) == \
            word_tokenize(case["text"]), case["text"]
    for doc_id, body in npr.fixture_bodies(4):
        assert npr.vendored_tokens(body) == word_tokenize(body), doc_id


# ---- vendored VADER algorithm (r4: A9 without the library) ----

def test_vendored_vader_hand_computed():
    """Hand-derived expected values through the published algorithm
    (Hutto & Gilbert 2014) with the vendored lexicon subset: booster
    (+0.293), negation (x-0.74), but-clause (0.5/1.5), allcaps (+0.733),
    '!' amplification (+0.292), alpha-15 normalization, (v+-1) sift."""
    from wikicrawler_spark.vader import polarity_scores as ps

    # good=1.9; sum 1.9 -> compound 1.9/sqrt(1.9^2+15)=0.4404;
    # sift pos=2.9, neu=3 -> pos .492 neu .508
    assert ps("The movie was good.") == \
        {"neg": 0.0, "neu": 0.508, "pos": 0.492, "compound": 0.4404}
    # very-boosted 1.9+0.293=2.193, '!' adds 0.292 to the sum AND the
    # dominant pos mass: compound 2.485/sqrt(2.485^2+15)=0.54
    assert ps("The movie was very good!") == \
        {"neg": 0.0, "neu": 0.534, "pos": 0.466, "compound": 0.54}
    # negated: 1.9*-0.74=-1.406 -> compound -0.3412; sift neg=-2.406 neu=4
    assert ps("The movie was not good.") == \
        {"neg": 0.376, "neu": 0.624, "pos": 0.0, "compound": -0.3412}
    # but-clause: pre-but 1.9*0.5, post-but -2.1*1.5 -> sum -2.2 ->
    # compound -0.4939
    assert ps("The movie was good but the ending was terrible.") == \
        {"neg": 0.317, "neu": 0.534, "pos": 0.149, "compound": -0.4939}
    # allcaps emphasis with mixed-case text: 1.9+0.733 -> 0.5622
    assert ps("GOOD day, sir.") == \
        {"neg": 0.0, "neu": 0.355, "pos": 0.645, "compound": 0.5622}
    assert ps("") == {"neg": 0.0, "neu": 0.0, "pos": 0.0, "compound": 0.0}


def test_vendored_vader_vs_live_nltk():
    """Only runs where nltk + vader_lexicon exist: on text whose words all
    sit in the vendored lexicon subset, the vendored algorithm must equal
    nltk's SentimentIntensityAnalyzer verbatim."""
    from wikicrawler_spark.sentiment import _SIA
    from wikicrawler_spark.vader import LEXICON, polarity_scores

    if _SIA is None:
        pytest.skip("nltk VADER absent in this runtime")
    sentences = [
        "The movie was good.",
        "The movie was very good!",
        "The movie was not good.",
        "The movie was good but the ending was terrible.",
        "GOOD day, sir.",
        "I love it, you hate it.",
        "never so bad",
        "the worst, truly the worst??",
    ]
    # nltk's analyzer uses the full 7.5k lexicon; restrict it to the
    # vendored subset so both sides score the same word set
    full = dict(_SIA.lexicon)
    try:
        _SIA.lexicon.clear()
        _SIA.lexicon.update(LEXICON)
        for s in sentences:
            assert polarity_scores(s) == _SIA.polarity_scores(s), s
    finally:
        _SIA.lexicon.clear()
        _SIA.lexicon.update(full)


def test_vader_lexicon_file_loader(tmp_path):
    """r5 (VERDICT r4 #5): load_lexicon_file parses the published
    vader_lexicon.txt format (token<TAB>mean<TAB>std<TAB>raw) and the
    loaded values drive polarity_scores via the lexicon argument."""
    from wikicrawler_spark.vader import load_lexicon_file, polarity_scores

    p = tmp_path / "vader_lexicon.txt"
    p.write_text(
        "splendid\t3.0\t0.5\t[3, 3, 3]\n"
        "dire\t-2.8\t0.6\t[-3, -2, -3]\n"
        "badline\n"
        "notafloat\tx\ty\tz\n",
        encoding="utf-8",
    )
    lex = load_lexicon_file(str(p))
    assert lex == {"splendid": 3.0, "dire": -2.8}
    got = polarity_scores("That was splendid.", lex)
    # 3.0 -> compound 3/sqrt(9+15) = 0.6124
    assert got["compound"] == 0.6124


def test_pinned_sentiment_lexicon_ignores_env_overlay():
    """PINNED_LEXICON (the sentence_sentiment driver row's word set) must
    stay vendored-subset + extras regardless of the WCS_VADER_LEXICON
    overlay, so the DuckDB oracle replays identically on any host."""
    from wikicrawler_spark import vader
    from wikicrawler_spark.sentiment import PINNED_LEXICON, _EXTRA_LEXICON

    assert PINNED_LEXICON == {**vader.LEXICON, **_EXTRA_LEXICON}


def test_punktish_sentence_fixtures():
    """r5 (VERDICT r4 #7): the punktish splitter must keep matching every
    pinned punkt segmentation in the construct-fixture set (the
    discriminating corpus for the A2 residual; corpus-level agreement vs
    live punkt is measured by scripts/nltk_parity_report.py on
    nltk-capable hosts)."""
    import os
    import importlib.util as _ilu
    spec = _ilu.spec_from_file_location(
        "nltk_parity_report",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "nltk_parity_report.py"))
    mod = _ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from wikicrawler_spark.treebank import punktish_sentence_split
    for text, why, exp in mod.SENT_FIXTURES:
        assert punktish_sentence_split(text) == exp, (why, text)
