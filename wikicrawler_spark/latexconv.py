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


def latex_to_text(text: str) -> str:
    """Deterministic LaTeX fragment -> unicode. Identity on plain text."""
    if "\\" not in text and "$" not in text:
        return text
    # \frac{a}{b} -> a/b (repeat for simple nesting resolved inside-out)
    prev = None
    while prev != text:
        prev = text
        text = _FRAC_RE.sub(r"\1/\2", text)
    text = _CMD_RE.sub(lambda m: _GREEK.get(m.group(1), m.group(1)), text)
    text = text.replace("$", "").replace("{", "").replace("}", "")
    return text
