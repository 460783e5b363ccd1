"""Deterministic synthetic corpus of interleaved text+media documents.

Implements FIXTURES.md §2: every document is a pure function of
(seed, family, index) — identical tables on every run, no timestamps, no
read-time randomness. Bulk generation is distributed (``spark.range`` ->
``mapInPandas``), never a driver loop, so the bench corpus scales with the
cluster rather than the driver.

Doc ids are ``wiki/{family}_{index:06d}``; in-corpus links use hrefs
``/wiki/{family}_{index:06d}`` so the frontier loop (frontier.py) can map a
link's media_ref back to a doc_id.
"""

from __future__ import annotations

import random
from typing import Iterator

import pandas as pd

from .schemas import DOC_SCHEMA

SEED = 42

VOCAB = (
    "star galaxy nebula orbit photon quasar pulsar comet meteor cosmos "
    "gravity plasma fusion spectrum redshift parallax cluster dwarf giant "
    "binary telescope observatory eclipse aurora zenith equinox solstice "
    "luminous radiant stellar cosmic ancient modern theory model survey data"
).split()

FILLER = "the of and is a that to as in are was on from with for".split()

FAMILIES = (
    "basic_article",
    "media_interleaved",
    "sections",
    "see_also_refs",
    "disambig",
    "latex_math",
    "wikitable",
    "boilerplate",
    "edge_cases",
    "hot_skew",
    "link_graph",
)


def doc_id_for(family: str, index: int) -> str:
    return f"wiki/{family}_{index:06d}"


def href_for(family: str, index: int) -> str:
    return f"/wiki/{family}_{index:06d}"


def _span(kind: str, text: str | None = None, media_ref: str | None = None,
          offset: int = 0) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def _finalize(spans: list[dict]) -> list[dict]:
    for i, s in enumerate(spans):
        s["offset"] = i
    return spans


def _sentence(rng: random.Random, n: int) -> str:
    words = []
    for i in range(n):
        words.append(rng.choice(FILLER) if rng.random() < 0.3 else rng.choice(VOCAB))
    s = " ".join(words)
    return s[0].upper() + s[1:] + "."


def _para(rng: random.Random, n_sent: int, anchors: list[tuple[str, str]]) -> str:
    """A <p> block: n_sent sentences with the given (text, href) anchors
    spliced between sentences."""
    parts = [_sentence(rng, rng.randint(5, 12)) for _ in range(n_sent)]
    for text, href in anchors:
        pos = rng.randint(0, len(parts) - 1)
        parts[pos] = parts[pos][:-1] + f' <a href="{href}">{text}</a>.'
    return "<p>" + " ".join(parts) + "</p>"


_OPEN_SCOPE = '<div id="mw-content-text"><div class="mw-parser-output">'
_CLOSE_SCOPE = "</div></div>"


def _header(family: str, index: int, title: str | None = None) -> list[dict]:
    t = title or f"{family.replace('_', ' ').title()} {index}"
    return [
        _span("html", f'<h1 id="firstHeading">{t}</h1>'),
        _span("html", _OPEN_SCOPE),
    ]


def _link_targets(rng: random.Random, family: str, n_total: int, k: int) -> list[tuple[str, str]]:
    out = []
    for _ in range(k):
        j = rng.randrange(n_total)
        out.append((f"{family} {j}", href_for(family, j)))
    return out


# ---------------------------------------------------------------- families

def gen_basic_article(index: int, seed: int = SEED, n_total: int = 1000) -> list[dict]:
    rng = random.Random(f"{seed}:basic_article:{index}")
    spans = _header("basic_article", index)
    n_p = rng.randint(3, 6)
    for _ in range(n_p):
        anchors = _link_targets(rng, "basic_article", n_total, rng.randint(0, 4))
        spans.append(_span("html", _para(rng, rng.randint(1, 3), anchors)))
    # the three pinned paragraph-rule cases (grabber.py:221): '' and '\n'
    # dropped, ' ' kept
    spans.append(_span("html", "<p></p>"))
    spans.append(_span("html", "<p>\n</p>"))
    spans.append(_span("html", "<p> </p>"))
    spans.append(_span("html", _CLOSE_SCOPE))
    return _finalize(spans)


def gen_media_interleaved(index: int, seed: int = SEED, n_total: int = 1000) -> list[dict]:
    rng = random.Random(f"{seed}:media_interleaved:{index}")
    spans = _header("media_interleaved", index)
    dup_ref = f"https://upload.wikimedia.org/media_{index:06d}_0.png"
    for k in range(rng.randint(2, 4)):
        spans.append(_span("html", _para(rng, 2, _link_targets(rng, "media_interleaved", n_total, 1))))
        if k == 0:
            spans.append(_span("media", f"caption {index} {k}", dup_ref))
        else:
            spans.append(_span("media", None,
                               f"https://upload.wikimedia.org/media_{index:06d}_{k}.png"))
    # duplicate media ref — second occurrence still emitted in doc order
    spans.append(_span("media", f"caption dup {index}", dup_ref))
    # an a.image anchor (grabber.py:320 path)
    spans.append(_span("html",
                       f'<a class="image" href="/wiki/File:Img_{index:06d}.jpg">Img {index}</a>'))
    spans.append(_span("html", _CLOSE_SCOPE))
    return _finalize(spans)


def gen_sections(index: int, seed: int = SEED, n_total: int = 1000) -> list[dict]:
    rng = random.Random(f"{seed}:sections:{index}")
    spans = _header("sections", index)
    toc_items = []
    for si in range(1, rng.randint(2, 4) + 1):
        name = f"Section {rng.choice(VOCAB).title()} {si}"
        toc_items.append(f'<li><a href="#sec{si}"><span>{si} {name}</span></a></li>')
        # one nested sub-entry exercises the recursive find_all('li')
        if si == 1:
            toc_items.append(f'<li><a href="#sec{si}_1">{si}.1 Early {rng.choice(VOCAB)}</a></li>')
    spans.append(_span("html", f'<div id="toc"><ul>{"".join(toc_items)}</ul></div>'))
    for si in range(1, len(toc_items) + 1):
        lvl = rng.choice(["h2", "h3"])
        spans.append(_span("html", f'<{lvl}>Heading {rng.choice(VOCAB).title()} {si}</{lvl}>'))
        spans.append(_span("html", _para(rng, 2, _link_targets(rng, "sections", n_total, 1))))
    spans.append(_span("html", _CLOSE_SCOPE))
    return _finalize(spans)


def gen_see_also_refs(index: int, seed: int = SEED, n_total: int = 1000) -> list[dict]:
    rng = random.Random(f"{seed}:see_also_refs:{index}")
    spans = _header("see_also_refs", index)
    spans.append(_span("html", _para(rng, 2, [])))
    # first .div-col: anchors with AND without title attr (title-less skipped)
    sa = ['<div class="div-col"><ul>']
    for k in range(3):
        j = rng.randrange(n_total)
        if k == 1:
            sa.append(f'<li><a href="{href_for("see_also_refs", j)}">no title attr</a></li>')
        else:
            sa.append(
                f'<li><a href="{href_for("see_also_refs", j)}" '
                f'title="See also {j}">see {j}</a></li>'
            )
    sa.append("</ul></div>")
    spans.append(_span("html", "".join(sa)))
    # SECOND .div-col — must be ignored (first-only, grabber.py:286)
    spans.append(_span("html",
                       '<div class="div-col"><a href="/wiki/Ignored" title="Ignored">x</a></div>'))
    # first .references: direct children <li>, first a.external each
    refs = ['<ol class="references">']
    for k in range(2):
        refs.append(
            f'<li><span>cite</span><a class="external" '
            f'href="https://example.org/ref{index}_{k}">Ref {index} {k}</a>'
            f'<a class="external" href="https://example.org/second">second ignored</a></li>'
        )
    refs.append('<li><span>no external link here</span></li>')
    refs.append("</ol>")
    spans.append(_span("html", "".join(refs)))
    # SECOND .references — ignored (grabber.py:261 select(...)[0])
    spans.append(_span("html",
                       '<ol class="references"><li><a class="external" '
                       'href="https://example.org/ignored">ignored</a></li></ol>'))
    spans.append(_span("html", _CLOSE_SCOPE))
    return _finalize(spans)


def gen_disambig(index: int, seed: int = SEED, n_total: int = 1000) -> list[dict]:
    rng = random.Random(f"{seed}:disambig:{index}")
    spans = _header("disambig", index)
    spans.append(_span("html", _para(rng, 1, [])))
    # bare /wiki/ links with title attrs (seeker.py:40-45)
    items = ["<ul>"]
    for k in range(rng.randint(2, 4)):
        j = rng.randrange(n_total)
        items.append(
            f'<li><a href="{href_for("disambig", j)}" '
            f'title="Disambig {j}">option {j}</a></li>'
        )
    items.append('<li><a href="/wiki/NoTitle_x">skipped: no title</a></li>')
    items.append("</ul>")
    spans.append(_span("html", "".join(items)))
    spans.append(_span("html", _CLOSE_SCOPE))
    spans.append(_span("html",
                       f'<div id="catlinks" class="catlinks">'
                       f'<a href="/wiki/Category:Disambiguation_pages" '
                       f'title="Category:Disambiguation pages">Disambiguation pages</a>'
                       f'<a href="/wiki/Category:Lists" title="Category:Lists">Lists</a></div>'))
    return _finalize(spans)


def gen_latex_math(index: int, seed: int = SEED, n_total: int = 1000) -> list[dict]:
    rng = random.Random(f"{seed}:latex_math:{index}")
    spans = _header("latex_math", index)
    spans.append(_span("html",
                       f"<p>The constant \\alpha equals \\frac{{{rng.randint(1, 9)}}}{{{rng.randint(2, 9)}}} here.</p>"))
    spans.append(_span("html", "<p>Also \\beta and \\Omega appear, with $x$ inline.</p>"))
    spans.append(_span("html",
                       "<p>Energy \\text{kinetic} is \\frac{1}{2}mv^2 and "
                       "\\sqrt{x_i} grows as n^{10}.</p>"))
    spans.append(_span("html",
                       "<p>\\begin{equation}E = mc^2\\end{equation} closes "
                       "\\mathrm{proof} q_j here.</p>"))
    spans.append(_span("html", _para(rng, 2, [])))
    spans.append(_span("html", _CLOSE_SCOPE))
    return _finalize(spans)


def gen_wikitable(index: int, seed: int = SEED, n_total: int = 1000) -> list[dict]:
    rng = random.Random(f"{seed}:wikitable:{index}")
    spans = _header("wikitable", index)
    spans.append(_span("html", _para(rng, 1, [])))
    rows = ['<table class="wikitable">', "<tr><th>Name</th><th>Value</th></tr>"]
    for k in range(rng.randint(2, 4)):
        rows.append(f"<tr><td>{rng.choice(VOCAB)}</td><td>{rng.randint(0, 99)}</td></tr>")
    rows.append("</table>")
    spans.append(_span("html", "".join(rows)))
    # a plain (non-wikitable) table must NOT be captured
    spans.append(_span("html", "<table><tr><td>plain</td></tr></table>"))
    spans.append(_span("html", _para(rng, 1, [])))
    spans.append(_span("html", _CLOSE_SCOPE))
    return _finalize(spans)


def gen_boilerplate(index: int, seed: int = SEED, n_total: int = 1000) -> list[dict]:
    rng = random.Random(f"{seed}:boilerplate:{index}")
    spans = [
        # nav/footer OUTSIDE the content scope — must not leak
        _span("html", '<div id="mw-navigation"><ul><li><a href="/wiki/Main_Page">Main page</a></li>'
                      '<li><a href="/wiki/Help:Contents">Help</a></li></ul></div>'),
        _span("html", "<p>outside-scope paragraph must not leak</p>"),
    ]
    spans += _header("boilerplate", index)
    spans.append(_span("html", _para(rng, 2, _link_targets(rng, "boilerplate", n_total, 1))))
    # link-dense navbox INSIDE scope — dropped by class + link-density rule
    nav = ['<p class="navbox">']
    for k in range(8):
        j = rng.randrange(n_total)
        nav.append(f'<a href="{href_for("boilerplate", j)}">nav {j}</a>')
    nav.append("</p>")
    spans.append(_span("html", "".join(nav)))
    spans.append(_span("html", _para(rng, 1, [])))
    spans.append(_span("html", _CLOSE_SCOPE))
    spans.append(_span("html", "<footer><p>footer text must not leak</p></footer>"))
    return _finalize(spans)


def gen_edge_cases(index: int, seed: int = SEED, n_total: int = 1000) -> list[dict]:
    rng = random.Random(f"{seed}:edge_cases:{index}")
    variant = index % 3
    if variant == 0:
        # no toc/refs/see-also at all -> absent, not errors
        spans = _header("edge_cases", index)
        spans.append(_span("html", _para(rng, 2, [])))
        spans.append(_span("html", _CLOSE_SCOPE))
        return _finalize(spans)
    if variant == 1:
        # href-less anchor inside a <p>: reference aborts the paragraph loop
        # (grabber.py:226); our pinned divergence keeps extracting
        spans = _header("edge_cases", index)
        spans.append(_span("html",
                           '<p>Before <a>no href</a> and '
                           '<a href="/wiki/edge_cases_000000">after</a>.</p>'))
        spans.append(_span("html", _para(rng, 1, [])))
        spans.append(_span("html", _CLOSE_SCOPE))
        return _finalize(spans)
    # empty doc -> 0 spans out
    return []


def gen_hot_skew(index: int, seed: int = SEED, n_total: int = 10000,
                 hot_links: int = 10000) -> list[dict]:
    rng = random.Random(f"{seed}:hot_skew:{index}")
    if index == 0:
        # the 'List of…' hot doc: hot_links /wiki/ links
        spans = _header("hot_skew", 0, title="List of everything")
        chunk: list[str] = []
        for k in range(hot_links):
            j = 1 + (k % max(n_total - 1, 1))
            chunk.append(f'<a href="{href_for("hot_skew", j)}">item {j}</a> ')
            if len(chunk) >= 500:
                spans.append(_span("html", "<p>" + "".join(chunk) + "</p>"))
                chunk = []
        if chunk:
            spans.append(_span("html", "<p>" + "".join(chunk) + "</p>"))
        spans.append(_span("html", _CLOSE_SCOPE))
        return _finalize(spans)
    spans = _header("hot_skew", index)
    # every ordinary doc links back to the hot doc
    spans.append(_span("html", _para(rng, 2, [("the list", href_for("hot_skew", 0))])))
    spans.append(_span("html", _CLOSE_SCOPE))
    return _finalize(spans)


# link_graph: 40 docs; structure per FIXTURES.md — chain + clique +
# a disconnected pair + self-loop + duplicate links. Edges are a pure
# function of the index so tests can compute the BFS closure independently.
LINK_GRAPH_N = 40


def link_graph_edges(index: int) -> list[int]:
    targets: list[int] = []
    if index < 12:  # chain 0->1->...->12
        targets.append(index + 1)
    if 12 <= index < 20:  # clique 12..19
        targets.extend(j for j in range(12, 20) if j != index)
    if index == 5:
        targets.append(5)  # self-loop
        targets.append(6)  # duplicate link (6 already via chain)
    if 13 <= index < 20:
        targets.append(20 + (index - 13))  # clique fans out to 20..26
    if index == 30:  # disconnected pair, unreachable from {0,1}
        targets.append(31)
    return targets


def gen_link_graph(index: int, seed: int = SEED, n_total: int = LINK_GRAPH_N) -> list[dict]:
    rng = random.Random(f"{seed}:link_graph:{index}")
    spans = _header("link_graph", index)
    anchors = [(f"to {j}", href_for("link_graph", j)) for j in link_graph_edges(index)]
    spans.append(_span("html", _para(rng, 1, anchors) if anchors else "<p>leaf node.</p>"))
    spans.append(_span("html", _CLOSE_SCOPE))
    return _finalize(spans)


_GENERATORS = {
    "basic_article": gen_basic_article,
    "media_interleaved": gen_media_interleaved,
    "sections": gen_sections,
    "see_also_refs": gen_see_also_refs,
    "disambig": gen_disambig,
    "latex_math": gen_latex_math,
    "wikitable": gen_wikitable,
    "boilerplate": gen_boilerplate,
    "edge_cases": gen_edge_cases,
    "hot_skew": gen_hot_skew,
    "link_graph": gen_link_graph,
}


def generate_doc(family: str, index: int, seed: int = SEED, n_total: int = 1000) -> dict:
    spans = _GENERATORS[family](index, seed=seed, n_total=n_total)
    return {"doc_id": doc_id_for(family, index), "spans": spans}


def tiny_corpus(seed: int = SEED) -> list[dict]:
    """~25 docs, all families — the golden-test corpus (FIXTURES.md §4)."""
    docs = []
    for family in FAMILIES:
        n = 3 if family not in ("hot_skew", "link_graph") else 2
        for i in range(n):
            n_total = LINK_GRAPH_N if family == "link_graph" else 1000
            docs.append(generate_doc(family, i, seed=seed, n_total=n_total))
    return docs


def corpus_df(spark, n_docs: int, families: tuple[str, ...] | None = None,
              seed: int = SEED, partitions: int | None = None):
    """Distributed corpus: n_docs docs spread round-robin over families.

    Generation happens inside mapInPandas on ``spark.range`` — scales with
    executors, deterministic in content (row->doc mapping is a pure function
    of the range value, which is partition-independent).
    """
    fams = families or tuple(f for f in FAMILIES if f not in ("hot_skew", "link_graph"))
    n_fam = len(fams)
    per_family_total = max(n_docs // n_fam, 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, spans = [], []
            for v in pdf["id"]:
                family = fams[v % n_fam]
                idx = int(v) // n_fam
                d = generate_doc(family, idx, seed=seed, n_total=per_family_total)
                ids.append(d["doc_id"])
                spans.append(d["spans"])
            yield pd.DataFrame({"doc_id": ids, "spans": spans})

    rng_df = spark.range(n_docs, numPartitions=partitions)
    return rng_df.mapInPandas(gen, schema=DOC_SCHEMA)


def link_graph_df(spark, seed: int = SEED):
    """The 100-doc frontier-test graph as a DataFrame."""
    docs = [generate_doc("link_graph", i, seed=seed, n_total=LINK_GRAPH_N)
            for i in range(LINK_GRAPH_N)]
    return spark.createDataFrame(
        [(d["doc_id"], [tuple(s.values()) for s in d["spans"]]) for d in docs],
        schema=DOC_SCHEMA,
    )
