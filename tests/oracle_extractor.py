"""Test-only oracle extractor — an INDEPENDENT single-process implementation
of the reference extraction semantics (SURVEY.md §5.2 item 2).

Where the engine kernel (wikicrawler_spark/kernel.py) uses a streaming regex
tokenizer over span fragments, this oracle concatenates the document and
parses it with the stdlib ``html.parser`` (the same event model bs4's
'html.parser' backend uses), then applies the cited rules from
/root/reference/src/wikicrawler/core/grabber.py & seeker.py. Divergent code
path, same pinned semantics — catches kernel drift beyond the hand-pinned
golden literals.

This module never runs in the engine's data plane.
"""

from __future__ import annotations

from html import escape
from html.parser import HTMLParser

WIKI_BASE = "https://en.wikipedia.org"
LINK_DENSITY_MAX = 0.8


class Node:
    def __init__(self, tag, attrs):
        self.tag = tag
        self.attrs = dict(attrs)
        self.children = []
        self.parent = None

    @property
    def classes(self):
        return (self.attrs.get("class") or "").split()

    def walk(self):
        stack = list(reversed(self.children))
        while stack:
            n = stack.pop()
            if isinstance(n, Node):
                yield n
                stack.extend(reversed(n.children))

    def text(self):
        out = []
        stack = list(reversed(self.children))
        while stack:
            n = stack.pop()
            if isinstance(n, str):
                out.append(n)
            else:
                stack.extend(reversed(n.children))
        return "".join(out)

    def find_all(self, tag=None, cls=None):
        return [
            n for n in self.walk()
            if (tag is None or n.tag == tag) and (cls is None or cls in n.classes)
        ]


_VOID = {"br", "img", "hr", "meta", "link", "input", "wbr", "x-media"}


class TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", [])
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        node = Node(tag, attrs)
        node.parent = self.cur
        self.cur.children.append(node)
        if tag not in _VOID:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, attrs)
        node.parent = self.cur
        self.cur.children.append(node)

    def handle_endtag(self, tag):
        n = self.cur
        while n is not self.root and n.tag != tag:
            n = n.parent
        if n is not self.root:
            self.cur = n.parent

    def handle_data(self, data):
        self.cur.children.append(data)


def _doc_to_html(spans) -> str:
    parts = []
    for s in sorted(spans, key=lambda x: x["offset"]):
        if s["kind"] == "html":
            parts.append(s["text"] or "")
        elif s["kind"] == "media":
            cap = escape(s["text"] or "", quote=True)
            ref = escape(s["media_ref"] or "", quote=True)
            parts.append(f'<x-media data-ref="{ref}" data-caption="{cap}">')
        elif s["kind"] == "text":
            parts.append(f"<x-text>{escape(s['text'] or '')}</x-text>")
    return "".join(parts)


def _latex(text: str) -> str:
    from wikicrawler_spark.latexconv import latex_to_text

    return latex_to_text(text)


def oracle_extract(doc_id: str, spans, latex: bool = False) -> list[dict]:
    """Reference-semantics extraction of one interleaved doc (see module doc)."""
    tb = TreeBuilder()
    tb.feed(_doc_to_html(spans))
    root = tb.root
    page_url = WIKI_BASE + "/" + doc_id

    # top-level blocks: root children, with the #mw-content-text >
    # .mw-parser-output subtree expanded in place (scope restriction,
    # grabber.py:214-217)
    blocks: list[tuple[Node, bool]] = []
    for child in root.children:
        if not isinstance(child, Node):
            continue
        if child.attrs.get("id") == "mw-content-text":
            po = None
            for n in child.walk():
                if "mw-parser-output" in n.classes:
                    po = n
                    break
            if po is not None:
                for c in po.children:
                    if isinstance(c, Node):
                        blocks.append((c, True))
        else:
            blocks.append((child, False))

    title = None
    body = []
    disambig_links = []
    see_also, toc, references, categories = [], [], [], []
    seen = {"div-col": False, "references": False, "toc": False, "catlinks": False}

    for el, in_scope in blocks:
        el_id = el.attrs.get("id", "")
        classes = el.classes
        if el_id == "firstHeading":
            if title is None:
                title = el.text()
            continue
        for a in ([el] if el.tag == "a" else []) + el.find_all("a"):
            if "image" in a.classes and a.attrs.get("href") is not None:
                cap = a.text()
                body.append(("media", cap if cap else None,
                             WIKI_BASE + "/" + a.attrs["href"].lstrip("/")))
        if el.tag == "x-media":
            body.append(("media", el.attrs.get("data-caption") or None,
                         el.attrs.get("data-ref")))
            continue
        if not seen["catlinks"] and el_id == "catlinks" and "catlinks" in classes:
            seen["catlinks"] = True
            for a in el.find_all("a"):
                if a.attrs.get("title") is not None and a.attrs.get("href") is not None:
                    categories.append((a.attrs["title"], a.attrs["href"]))
            continue
        if not in_scope:
            continue
        if el.tag == "x-text":
            t = el.text()
            if t not in ("", "\n"):
                body.append(("paragraph", _latex(t) if latex else t, None))
        elif el.tag == "p":
            t = el.text()
            link_len = sum(len(a.text()) for a in el.find_all("a"))
            is_nav = "navbox" in classes
            text_boiler = is_nav or (
                len(t) > 0 and link_len / len(t) > LINK_DENSITY_MAX
            )
            if not text_boiler and t not in ("", "\n"):
                body.append(("paragraph", _latex(t) if latex else t, None))
            if not is_nav:
                for a in el.find_all("a"):
                    href = a.attrs.get("href")
                    if href is not None and href.startswith("/wiki"):
                        body.append(("link", a.text(), WIKI_BASE + href))
        elif el.tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            body.append(("heading", el.text(), None))
        elif el.tag == "table" and "wikitable" in classes:
            rows = []
            for tr in el.find_all("tr"):
                cells = [c.text().strip() for c in tr.walk() if c.tag in ("th", "td")]
                if cells:
                    rows.append(" | ".join(cells))
            body.append(("wikitable", "\n".join(rows), None))
        elif el_id == "toc" and not seen["toc"]:
            seen["toc"] = True
            uls = el.find_all("ul")
            if uls:
                for li in uls[0].find_all("li"):
                    aa = li.find_all("a")
                    if not aa:
                        continue
                    parts = aa[0].text().split(" ", 1)
                    if len(parts) == 2:
                        toc.append((parts[1], page_url + aa[0].attrs.get("href", "")))
        elif "references" in classes and not seen["references"]:
            seen["references"] = True
            for child in el.children:
                if not isinstance(child, Node):
                    continue
                ext = next((a for a in child.find_all("a") if "external" in a.classes), None)
                if ext is not None and "href" in ext.attrs:
                    references.append((ext.text(), ext.attrs["href"]))
        elif "div-col" in classes and not seen["div-col"]:
            seen["div-col"] = True
            for a in el.find_all("a"):
                href = a.attrs.get("href")
                if href is not None and href.startswith("/wiki") and a.attrs.get("title") is not None:
                    see_also.append((a.attrs["title"], WIKI_BASE + href))
        elif "mw-search-results" in classes:
            for a in el.find_all("a"):
                href = a.attrs.get("href")
                if (href is not None and href.startswith("/wiki/")
                        and a.attrs.get("title") is not None):
                    body.append(("link", a.attrs["title"], href))
        elif "navbox" in classes:
            pass
        else:
            for a in ([el] if el.tag == "a" else []) + el.find_all("a"):
                href = a.attrs.get("href")
                if (href is not None and href.startswith("/wiki/")
                        and a.attrs.get("title") is not None):
                    disambig_links.append((a.attrs["title"], href))

    is_disambig = any("Disambiguation" in t for t, _ in categories)

    out = []

    def emit(kind, text, ref):
        out.append({"kind": kind, "text": text, "media_ref": ref, "offset": len(out)})

    if title is not None:
        emit("title", title, None)
    for k, t, r in body:
        emit(k, t, r)
    if is_disambig:
        for t, href in disambig_links:
            emit("link", t, href)
    for t, u in see_also:
        emit("see_also", t, u)
    for n, u in toc:
        emit("toc", n, u)
    for t, h in references:
        emit("reference", t, h)
    for t, h in categories:
        emit("category", t, h)
    return out
