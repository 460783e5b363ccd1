"""PDF / layout parse: the non-HTML member of the extraction family that
the engine's mandate names alongside HTML boilerplate strip and DOM
heuristics (reference scope: the grabber only ever parses wiki HTML —
/root/reference/src/wikicrawler/core/grabber.py — so the layout plane is
new surface, built Spark-first).

Two stages, deliberately separated:

1. ``parse_pdf_blocks``  — binary payload -> layout blocks
   (doc_id, page, x, y, w, h, font_size, text). mapInPandas; per-batch
   python is unavoidable here (a byte-format parser is not expressible in
   Catalyst). Real decode tries pypdf at module import (same import-try
   pattern as multimodal's PIL / sentiment's VADER); when absent, the
   deterministic FAKEPDF test codec is the test path and real bytes raise
   NotImplementedError at plan-execution time.

2. ``layout_spans``      — layout blocks -> ordered spans. 100% native
   Catalyst (window functions + one groupBy join), so the whole analysis
   is SQL-replayable by the driver's DuckDB oracle:
     * running header/footer strip: digit-normalized block text that
       repeats on >= max(2, ceil(pages/2)) pages of a doc AND sits in the
       top/bottom page band is boilerplate (the readability/Boilerpipe
       cross-page repetition heuristic);
     * heading detection: font_size >= 1.2 x the doc's median font;
     * caption detection: text anchored 'figure '/'table ';
     * reading order: two-column aware — blocks sort by (page, column,
       y, x), column = which half of the 612 pt page the block's center
       falls in (blocks spanning >= half the page width read as column 0,
       so titles sort before both columns); offset is the dense
       reading-order rank of KEPT blocks.

Fake codec format (deterministic, test-only), one block per line:
    b"FAKEPDF\n" + "page\x1fx\x1fy\x1fw\x1fh\x1ffont\x1ftext" lines
"""

# NOTE: no `from __future__ import annotations` — mapInPandas needs real
# type objects at decoration time in this codebase's convention.
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

try:  # import-try: real codec when the runtime ships pypdf
    from pypdf import PdfReader as _PdfReader

    HAS_PYPDF = True
except ImportError:  # pragma: no cover - runtime-dependent
    _PdfReader = None
    HAS_PYPDF = False

PAGE_W = 612.0          # US-letter points; column split at PAGE_W / 2
PAGE_H = 792.0
HEADER_BAND = 40.0      # y <= band (top) -> header candidate
FOOTER_BAND = PAGE_H - 72.0  # y >= band -> footer candidate

BLOCK_DDL = ("doc_id string, page int, x double, y double, w double, "
             "h double, font_size double, text string")

_SEP = "\x1f"


def make_fake_pdf(blocks) -> bytes:
    """Deterministic test codec builder. ``blocks`` is an iterable of
    (page, x, y, w, h, font_size, text) tuples."""
    lines = ["FAKEPDF"]
    for page, x, y, w, h, font, text in blocks:
        assert _SEP not in text and "\n" not in text
        lines.append(_SEP.join(
            [str(page), repr(float(x)), repr(float(y)), repr(float(w)),
             repr(float(h)), repr(float(font)), text]))
    return "\n".join(lines).encode("utf-8")


def _parse_fake(payload: bytes):
    text = bytes(payload).decode("utf-8")
    rows = []
    for line in text.split("\n")[1:]:
        if not line:
            continue
        page, x, y, w, h, font, btext = line.split(_SEP)
        rows.append((int(page), float(x), float(y), float(w), float(h),
                     float(font), btext))
    return rows


def _parse_pypdf(payload):  # pragma: no cover - runtime-dependent
    """Real parse via pypdf: per-page extracted text becomes one full-page
    block (pypdf's plain extraction has no per-block geometry; geometry-
    aware splitters slot in here). Same row contract as the fake codec."""
    try:
        reader = _PdfReader(io.BytesIO(bytes(payload)))
        return [
            (i, 0.0, 0.0, PAGE_W, PAGE_H, 12.0, page.extract_text() or "")
            for i, page in enumerate(reader.pages)
        ]
    except Exception:  # noqa: BLE001 — corrupt bytes are data, not bugs
        return None


def parse_pdf_blocks(df: DataFrame, *, id_col: str = "doc_id",
                     payload_col: str = "payload",
                     use_fake_codec: bool = False) -> DataFrame:
    """Binary PDF payloads -> layout-block rows (mapInPandas; one Arrow
    batch in, one out). FAKEPDF payloads always take the fake parser (they
    are not valid PDF bytes); other bytes need pypdf or raise the marked
    NotImplementedError stub."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                if bytes(payload).startswith(b"FAKEPDF\n") or use_fake_codec:
                    parsed = _parse_fake(payload)
                elif HAS_PYPDF:
                    parsed = _parse_pypdf(payload)
                else:
                    raise NotImplementedError(
                        "real PDF parse requires pypdf (not in this "
                        "runtime); FAKEPDF payloads are the deterministic "
                        "test path"
                    )
                for page, x, y, w, h, font, text in parsed or []:
                    rows.append((doc_id, page, x, y, w, h, font, text))
            yield pd.DataFrame(
                rows, columns=["doc_id", "page", "x", "y", "w", "h",
                               "font_size", "text"],
            )

    return df.mapInPandas(op, schema=BLOCK_DDL)


def layout_spans(blocks: DataFrame, *, heading_ratio: float = 1.2) -> DataFrame:
    """Layout blocks -> ordered spans (doc_id, kind, text, offset); fully
    native so the DuckDB oracle replays it. See module docstring for the
    rules. Returns kept (non-boilerplate) blocks only, offset dense per doc
    in reading order.

    Plan shape: every per-doc statistic (page count, median font,
    cross-page repetition count) is a WINDOW aggregate, not a
    groupBy+join-back — the join formulation evaluated the ``blocks``
    subtree three times (13 exchanges; with a mapInPandas PDF parse
    upstream that re-runs the Python parse 3x), the window formulation
    scans it ONCE: one exchange on (doc_id, norm_text) whose
    hashpartitioning also satisfies the doc_id windows, then the final
    reading-order window (3 exchanges total, 1 Generate upstream)."""
    rep_w = Window.partitionBy("doc_id", "norm_text")
    doc_w = Window.partitionBy("doc_id")
    b = (
        blocks.withColumn("norm_text",
                          F.regexp_replace(F.lower(F.col("text")), "[0-9]+", "#"))
        .withColumn("column",
                    F.when(F.col("w") >= PAGE_W / 2, F.lit(0))  # spanning
                    .when(F.col("x") + F.col("w") / 2 < PAGE_W / 2, F.lit(0))
                    .otherwise(F.lit(1)))
        .withColumn("n_rep_pages", F.size(F.collect_set("page").over(rep_w)))
        .withColumn("n_pages", F.size(F.collect_set("page").over(doc_w)))
        .withColumn("median_font",
                    F.expr("percentile(font_size, 0.5)").over(doc_w))
    )
    scored = (
        b.withColumn(
            "is_boiler",
            (F.col("n_rep_pages") >= F.greatest(F.lit(2),
                                                F.ceil(F.col("n_pages") / 2)))
            & ((F.col("y") <= HEADER_BAND) | (F.col("y") >= FOOTER_BAND)),
        )
        .withColumn(
            "kind",
            F.when(F.col("font_size") >= F.col("median_font") * heading_ratio,
                   F.lit("heading"))
            .when(F.lower(F.col("text")).rlike("^(figure|table) "),
                  F.lit("caption"))
            .otherwise(F.lit("paragraph")),
        )
    )
    kept = scored.filter(~F.col("is_boiler"))
    order = Window.partitionBy("doc_id").orderBy(
        "page", "column", "y", "x", "text")
    return (
        kept.withColumn("offset", F.row_number().over(order) - 1)
        .select("doc_id", "kind", "text", "offset")
    )


def pdf_extract(pdfs: DataFrame, **kwargs) -> DataFrame:
    """parse + layout in one call: the PDF twin of kernel.extract_spans."""
    return layout_spans(parse_pdf_blocks(pdfs, **kwargs))
