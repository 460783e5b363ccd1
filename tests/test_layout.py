"""PDF / layout parse plane (pipeline.layout): fake-codec roundtrip, the
native layout classifier (header/footer strip, heading/caption detection,
two-column reading order), and the parse->classify composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikicrawler_spark.pipeline import layout as L


def _two_page_doc():
    """2 pages with running header, numbered footers, a 24pt title, a two-
    column body, and a figure caption."""
    blocks = []
    for page in (0, 1):
        blocks.append((page, 36, 18, 540, 12, 9, "ACME Journal"))
        blocks.append((page, 36, 770, 540, 12, 9, f"Page {page + 1}"))
    blocks.append((0, 36, 60, 540, 30, 24, "A Study of Layout"))
    # column 0 then column 1, interleaved y so naive y-sort would be wrong
    blocks.append((0, 40, 120, 240, 80, 12, "left column first para"))
    blocks.append((0, 40, 220, 240, 80, 12, "left column second para"))
    blocks.append((0, 320, 100, 240, 80, 12, "right column first para"))
    blocks.append((0, 320, 200, 240, 80, 12, "Figure 1: a chart"))
    blocks.append((1, 40, 80, 240, 80, 12, "second page para"))
    return blocks


def test_fake_pdf_roundtrip(spark):
    blocks = _two_page_doc()
    payload = L.make_fake_pdf(blocks)
    df = spark.createDataFrame([("d0", payload)], "doc_id string, payload binary")
    got = [
        (r.page, r.x, r.y, r.w, r.h, r.font_size, r.text)
        for r in L.parse_pdf_blocks(df).orderBy("page", "y", "x").collect()
    ]
    want = sorted(
        ((p, float(x), float(y), float(w), float(h), float(f), t)
         for p, x, y, w, h, f, t in blocks),
        key=lambda b: (b[0], b[2], b[1]),
    )
    assert got == want


def test_layout_classifier_rules(spark):
    df = spark.createDataFrame(
        [("d0", L.make_fake_pdf(_two_page_doc()))],
        "doc_id string, payload binary",
    )
    spans = L.pdf_extract(df).orderBy("offset").collect()
    texts = [r.text for r in spans]
    kinds = {r.text: r.kind for r in spans}
    # running header + numbered footers stripped (digit-normalized
    # repetition across both pages)
    assert "ACME Journal" not in texts
    assert not any(t.startswith("Page ") for t in texts)
    # title is a heading (24 >= 1.2 * median font)
    assert kinds["A Study of Layout"] == "heading"
    assert kinds["Figure 1: a chart"] == "caption"
    assert kinds["left column first para"] == "paragraph"
    # reading order: title, whole left column, then right column, then p2
    assert texts == [
        "A Study of Layout",
        "left column first para",
        "left column second para",
        "right column first para",
        "Figure 1: a chart",
        "second page para",
    ]
    assert [r.offset for r in spans] == list(range(6))


def test_single_page_furniture_kept(spark):
    """Repetition needs >= 2 pages: a 1-page doc's header/footer survive
    (conservative strip — never delete what can't be proven furniture)."""
    blocks = [
        (0, 36, 18, 540, 12, 9, "Lone Header"),
        (0, 40, 100, 240, 80, 12, "body text here"),
    ]
    df = spark.createDataFrame(
        [("d1", L.make_fake_pdf(blocks))], "doc_id string, payload binary")
    texts = {r.text for r in L.pdf_extract(df).collect()}
    assert texts == {"Lone Header", "body text here"}


def test_partitioning_invariance(spark):
    docs = [(f"d{i}", L.make_fake_pdf(_two_page_doc())) for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id string, payload binary")
    one = sorted(map(tuple, L.pdf_extract(df.repartition(1)).collect()))
    seven = sorted(map(tuple, L.pdf_extract(df.repartition(7)).collect()))
    assert one == seven


@pytest.mark.skipif(L.HAS_PYPDF, reason="stub only without pypdf")
def test_real_pdf_stub_raises(spark):
    df = spark.createDataFrame(
        [("d0", b"%PDF-1.4 not really")], "doc_id string, payload binary")
    with pytest.raises(Exception, match="NotImplementedError|pypdf"):
        L.parse_pdf_blocks(df).collect()


def test_null_payload_skipped(spark):
    df = spark.createDataFrame(
        [("d0", None), ("d1", L.make_fake_pdf([(0, 0, 0, 10, 10, 12, "x")]))],
        "doc_id string, payload binary",
    )
    rows = L.parse_pdf_blocks(df).collect()
    assert [r.doc_id for r in rows] == ["d1"]


def _python_layout_reference(blocks, heading_ratio=1.2):
    """Independent reimplementation of the layout rules (statistics over
    a plain list, no Spark/SQL) for randomized cross-checking."""
    import math
    import statistics

    by_doc = {}
    for doc_id, page, x, y, w, h, font, text in blocks:
        by_doc.setdefault(doc_id, []).append((page, x, y, w, h, font, text))
    out = {}
    for doc_id, bs in by_doc.items():
        n_pages = len({b[0] for b in bs})
        median_font = statistics.median(sorted(float(b[5]) for b in bs))
        rep = {}
        import re
        for b in bs:
            norm = re.sub(r"[0-9]+", "#", b[6].lower())
            rep.setdefault(norm, set()).add(b[0])
        kept = []
        for page, x, y, w, h, font, text in bs:
            norm = re.sub(r"[0-9]+", "#", text.lower())
            boiler = (len(rep[norm]) >= max(2, math.ceil(n_pages / 2)) and
                      (y <= 40 or y >= 720))
            if boiler:
                continue
            if font >= median_font * heading_ratio:
                kind = "heading"
            elif re.match(r"^(figure|table) ", text.lower()):
                kind = "caption"
            else:
                kind = "paragraph"
            col = 0 if (w >= 306 or x + w / 2 < 306) else 1
            kept.append(((page, col, y, x, text), kind, text))
        kept.sort(key=lambda t: t[0])
        out[doc_id] = [(i, k, t) for i, (_, k, t) in enumerate(kept)]
    return out


def test_layout_classifier_randomized_vs_python(spark):
    """Seeded random block sets (varied pages, fonts, geometry, repeated
    furniture with and without page numbers) must classify and order
    identically to the independent python reference."""
    import random

    rng = random.Random(1234)
    blocks = []
    for d in range(12):
        doc = f"doc{d}"
        n_pages = rng.randint(1, 4)
        for page in range(n_pages):
            blocks.append((doc, page, 36.0, 18.0, 540.0, 12.0, 9.0,
                           f"Journal of Tests {d}"))
            if rng.random() < 0.7:
                blocks.append((doc, page, 250.0, 770.0, 100.0, 12.0, 9.0,
                               f"Page {page + 1}"))
            for i in range(rng.randint(1, 6)):
                x = rng.choice([40.0, 320.0, 36.0])
                w = 540.0 if x == 36.0 else 240.0
                y = float(rng.randint(50, 700))
                font = rng.choice([10.0, 12.0, 12.0, 18.0, 24.0])
                text = rng.choice([
                    f"body text {d} {page} {i} alpha",
                    f"Figure {i}: a chart about {d}",
                    f"Table {i} of results",
                    f"heading like text {i}",
                ])
                blocks.append((doc, page, x, y, w, 80.0, font, text))
    df = spark.createDataFrame(
        blocks, "doc_id string, page int, x double, y double, w double, "
                "h double, font_size double, text string")
    got = {}
    for r in L.layout_spans(df).collect():
        got.setdefault(r["doc_id"], []).append((r["offset"], r["kind"], r["text"]))
    for k in got:
        got[k].sort()
    want = _python_layout_reference(blocks)
    assert got == {k: v for k, v in want.items() if v}


def test_layout_spans_native_plan(spark):
    """The classifier stage must stay JVM-side: no Python evals in its
    plan (the only Python in the PDF plane is the byte parser)."""
    blocks = spark.createDataFrame(
        [("d0", 0, 40.0, 100.0, 240.0, 80.0, 12.0, "hello world")],
        L.BLOCK_DDL,
    )
    plan = L.layout_spans(blocks)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "MapInPandas" not in plan
