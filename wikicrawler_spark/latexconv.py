"""LaTeX -> unicode paragraph transform (reference E4).

The reference pipes every paragraph through pylatexenc when config['latex']
is set (/root/reference/src/wikicrawler/core/grabber.py:177-180). pylatexenc
is not available in this runtime, so the engine ships a small deterministic
converter covering the fixture fragment grammar (greek letters, \\frac,
super/subscript markers, math delimiters). It is ALWAYS used — goldens are
computed with it — so results do not depend on optional libraries.
"""

from __future__ import annotations

import re

_GREEK = {
    "alpha": "\u03b1", "beta": "\u03b2", "gamma": "\u03b3", "delta": "\u03b4",
    "epsilon": "\u03b5", "zeta": "\u03b6", "eta": "\u03b7", "theta": "\u03b8",
    "iota": "\u03b9", "kappa": "\u03ba", "lambda": "\u03bb", "mu": "\u03bc",
    "nu": "\u03bd", "xi": "\u03be", "pi": "\u03c0", "rho": "\u03c1",
    "sigma": "\u03c3", "tau": "\u03c4", "phi": "\u03c6", "chi": "\u03c7",
    "psi": "\u03c8", "omega": "\u03c9",
    "Gamma": "\u0393", "Delta": "\u0394", "Theta": "\u0398", "Lambda": "\u039b",
    "Pi": "\u03a0", "Sigma": "\u03a3", "Phi": "\u03a6", "Psi": "\u03a8",
    "Omega": "\u03a9",
    "times": "\u00d7", "cdot": "\u22c5", "pm": "\u00b1", "infty": "\u221e",
    "leq": "\u2264", "geq": "\u2265", "neq": "\u2260", "approx": "\u2248",
    "rightarrow": "\u2192", "sum": "\u2211", "int": "\u222b", "sqrt": "\u221a",
}

_FRAC_RE = re.compile(r"\\frac\{([^{}]*)\}\{([^{}]*)\}")
_CMD_RE = re.compile(r"\\([A-Za-z]+)")

# text-mode wrappers: contents kept verbatim (LatexNodes2Text renders the
# argument of these macros as-is)
_TEXT_CMD_RE = re.compile(
    r"\\(?:text|textrm|textbf|textit|texttt|mathrm|mathbf|mathit|"
    r"operatorname)\{([^{}]*)\}"
)
_SQRT_RE = re.compile(r"\\sqrt\{([^{}]*)\}")
# \sqrt[n]{x} -> n-th root: "n√(x)" (optional-argument form, r3)
_SQRT_OPT_RE = re.compile(r"\\sqrt\[([^\[\]]*)\]\{([^{}]*)\}")
# matrix-family environments (r3): rows (\\) -> '; ', columns (&) -> ' ',
# wrapped per delimiter family — a pinned readable rendering of what
# pylatexenc lays out with alignment. The body disallows a nested \begin
# of the family (negative lookahead), so each sub pass converts only
# INNERMOST matrices; latex_to_text loops to fixpoint for nesting — a
# plain non-greedy body paired an outer \begin with the inner \end,
# garbling nested same-family matrices (ADVICE r3).
_MATRIX_FAMS = r"pmatrix|bmatrix|vmatrix|Vmatrix|matrix|smallmatrix|cases"
_MATRIX_RE = re.compile(
    r"\\begin\{(" + _MATRIX_FAMS + r")\}"
    r"((?:(?!\\begin\{(?:" + _MATRIX_FAMS + r")\}).)*?)\\end\{\1\}", re.S)
_MATRIX_WRAP = {"pmatrix": ("(", ")"), "bmatrix": ("[", "]"),
                "vmatrix": ("|", "|"), "Vmatrix": ("\u2016", "\u2016"),
                "matrix": ("", ""), "smallmatrix": ("", ""),
                # no '{' delimiter for cases: the final brace-strip would
                # delete it anyway (review r3) \u2014 rows/columns still render
                "cases": ("", "")}
# environments are structure, not content: markers dropped, contents kept
_ENV_RE = re.compile(r"\\(?:begin|end)\{[A-Za-z*]+\}")
# ^{abc} / _{abc} / ^c / _c (single non-space char)
_SCRIPT_RE = re.compile(r"([\^_])\{([^{}]*)\}|([\^_])(\S)")

_SUPERSCRIPT = dict(zip("0123456789+-=()ni",
                        "\u2070\u00b9\u00b2\u00b3\u2074\u2075\u2076\u2077"
                        "\u2078\u2079\u207a\u207b\u207c\u207d\u207e\u207f"
                        "\u2071"))
_SUBSCRIPT = dict(zip("0123456789+-=()aehijklmnoprstuvx",
                      "\u2080\u2081\u2082\u2083\u2084\u2085\u2086\u2087"
                      "\u2088\u2089\u208a\u208b\u208c\u208d\u208e\u2090"
                      "\u2091\u2095\u1d62\u2c7c\u2096\u2097\u2098\u2099"
                      "\u2092\u209a\u1d63\u209b\u209c\u1d64\u1d65\u2093"))


def _script_repl(m: re.Match) -> str:
    marker = m.group(1) or m.group(3)
    content = m.group(2) if m.group(2) is not None else m.group(4)
    table = _SUPERSCRIPT if marker == "^" else _SUBSCRIPT
    if content and all(c in table for c in content):
        return "".join(table[c] for c in content)
    return marker + content  # unmapped: keep marker, drop braces (pinned)


def _matrix_repl(m: re.Match) -> str:
    left, right = _MATRIX_WRAP[m.group(1)]
    rows = [r.strip() for r in m.group(2).split("\\\\")]
    rendered = "; ".join(
        " ".join(c.strip() for c in row.split("&")) for row in rows if row
    )
    return f"{left}{rendered}{right}"


def _wrapper_pass(text: str) -> str:
    """One inside-out resolution loop over the brace-argument wrappers."""
    prev = None
    while prev != text:
        prev = text
        text = _TEXT_CMD_RE.sub(r"\1", text)
        text = _SQRT_OPT_RE.sub("\\1\u221a(\\2)", text)
        text = _SQRT_RE.sub("\u221a(\\1)", text)
        text = _FRAC_RE.sub(r"\1/\2", text)
    return text


def latex_to_text(text: str) -> str:
    """Deterministic LaTeX fragment -> unicode. Identity on plain text.

    Pinned approximation of pylatexenc's LatexNodes2Text over the fixture
    grammar (the library is absent from this runtime; the reference uses it
    at grabber.py:177-180): matrix-family environments render rows as '; '
    and columns as ' ' inside their delimiter pair (r3), other
    environments-as-noop, \\text-family wrappers keep their argument,
    \\sqrt{x} -> \u221a(x) and \\sqrt[n]{x} -> n\u221a(x) (r3),
    \\frac{a}{b} -> a/b, ^/_ scripts -> unicode super/subscripts when
    every char has a form (else the marker is kept and braces dropped),
    greek/symbol commands via the table above, unknown commands keep their
    name, then $ { } are stripped. The wrapper loop runs once more AFTER
    script substitution (r3) so arguments that themselves contained
    ^{...}/_{...} (e.g. \\frac{a^{2}}{b}) resolve instead of passing
    through; for inputs without such nesting the second pass is a no-op,
    so all pre-r3 outputs are unchanged. Alignment chars outside the
    matrix family are left as-is (pinned divergence)."""
    if ("\\" not in text and "$" not in text and "^" not in text
            and "_" not in text):
        return text
    prev = None
    while prev != text:  # innermost-first: fixpoint resolves nesting (r4)
        prev = text
        text = _MATRIX_RE.sub(_matrix_repl, text)
    text = _ENV_RE.sub("", text)
    text = _wrapper_pass(text)
    # scripts BEFORE the command table: the table strips the backslash off
    # any command it sees, which would destroy a \frac/\sqrt whose args
    # still held ^{...}/_{...} before the second wrapper pass could fire
    text = _SCRIPT_RE.sub(_script_repl, text)
    text = _wrapper_pass(text)
    text = _CMD_RE.sub(lambda m: _GREEK.get(m.group(1), m.group(1)), text)
    text = text.replace("$", "").replace("{", "").replace("}", "")
    return text
